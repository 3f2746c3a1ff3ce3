from . import dedup, multimodal, quality, sessions, similarity, text  # noqa: F401
