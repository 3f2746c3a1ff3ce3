from . import dedup, multimodal, quality, sessions, similarity, temporal, text  # noqa: F401
