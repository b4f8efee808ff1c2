"""Engine operators: keyed upsert merge, dedup family, similarity
search, latest-per-key/as-of, skew mitigation."""

from . import dedup, latest, merge, multimodal, similarity, skew  # noqa: F401
