"""Engine operators: keyed upsert merge (+ MERGE INTO, indexes, table
services), commit timeline (time travel, CDC, lifecycle actions), table
operation types, dedup family (exact/fuzzy/semantic), similarity search,
BPE tokenizer, latest-per-key/as-of, clustering, maintenance,
multimodal decode, sampling, skew mitigation."""

from . import (  # noqa: F401
    bpe,
    clustering,
    dedup,
    latest,
    maintenance,
    merge,
    multimodal,
    sampling,
    similarity,
    skew,
    tableops,
    timeline,
)
