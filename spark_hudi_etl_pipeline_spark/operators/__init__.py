"""Engine operators: keyed upsert merge, dedup family, similarity
search, latest-per-key/as-of."""

from . import dedup, latest, merge, multimodal, similarity  # noqa: F401
