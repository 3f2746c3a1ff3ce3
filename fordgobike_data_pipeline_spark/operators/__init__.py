from . import bpe, curation, dedup, multimodal, quality, sampling, sessions, similarity, temporal, text  # noqa: F401
