"""Multimodal column operators (north-star extension): image/audio/video
as opaque ``binary`` payloads with typed metadata, processed via
Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition sizing —
is real and tested; the actual media decoding is STUBBED behind
``register_decoder`` (the image/audio libraries are not in this
container). ``deterministic_fake_decoder`` provides a reproducible
stand-in so the distributed pipeline is exercised end-to-end; a real
deployment registers e.g. a PIL/ffmpeg decoder with the same signature
and nothing else changes.

Scale design:
- media rows are large → ``repartition_for_payloads`` targets a bounded
  per-partition byte budget so Arrow batches and executor memory stay
  predictable regardless of corpus size;
- ``mapInPandas`` streams record batches (iterator→iterator), so a task
  never holds its whole partition in memory;
- metadata lives in a typed struct column next to the payload: filters
  on codec/size/duration prune via parquet statistics WITHOUT reading
  payload bytes (columnar layout does the heavy lifting).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Typed metadata carried beside every media payload.
MEDIA_METADATA_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("codec", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("meta", MEDIA_METADATA_SCHEMA, False),
    ]
)

#: Feature row produced by decode_features (fixed width so downstream
#: similarity/dedup operators can consume it like any embedding).
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature_dim", IntegerType(), False),
        StructField("feature_checksum", LongType(), False),
    ]
)

Decoder = Callable[[bytes, dict[str, Any]], dict[str, Any]]

_DECODERS: dict[str, Decoder] = {}


def register_decoder(media_type: str, decoder: Decoder) -> None:
    """Plug a real decoder: ``decoder(payload, meta) -> feature dict``
    with keys matching FEATURE_SCHEMA (minus media_id)."""
    _DECODERS[media_type] = decoder


def deterministic_fake_decoder(payload: bytes, meta: dict[str, Any]) -> dict[str, Any]:
    """STUB decoder: derives features from payload bytes alone
    (deterministic — suitable for tests/CI). A real image decoder would
    do PIL.open/resize/embed here with the identical signature."""
    checksum = 0
    for i, b in enumerate(payload[:4096]):
        checksum = (checksum * 31 + b + i) % (1 << 62)
    return {"feature_dim": 64, "feature_checksum": checksum}


def unsupported_decoder(payload: bytes, meta: dict[str, Any]) -> dict[str, Any]:
    """Explicit stub for codecs this container cannot decode."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg, not present in this environment; "
        "register a real decoder with register_decoder()"
    )


def attach_metadata(df: DataFrame, *, media_type: str, payload_col: str = "payload") -> DataFrame:
    """Build the typed metadata struct from the payload column (cheap,
    JVM-side: length; real ingest fills codec/dims from container headers)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("string").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def decode_features(
    media: DataFrame, *, batch_hint_rows: int = 64
) -> DataFrame:
    """Decode/feature-extract every media row via Arrow-batched
    ``mapInPandas`` (iterator→iterator: constant memory per task).

    Uses the registered decoder for each row's ``meta.media_type``
    (falling back to the deterministic fake so plumbing is testable
    without media libs)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                mtype = meta["media_type"] if isinstance(meta, dict) else meta.media_type
                decoder = _DECODERS.get(mtype, deterministic_fake_decoder)
                feats = decoder(bytes(row["payload"]), dict(meta) if isinstance(meta, dict) else meta._asdict())
                out.append(
                    {
                        "media_id": row["media_id"],
                        "feature_dim": feats["feature_dim"],
                        "feature_checksum": feats["feature_checksum"],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def repartition_for_payloads(
    df: DataFrame, *, total_bytes: int, target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Size partitions by payload volume, not row count: media rows are
    MBs each, so row-count-based splits would blow executor memory at
    scale. Caller supplies (estimated) total payload bytes."""
    n = max(1, total_bytes // target_partition_bytes)
    return df.repartition(n)


#: Frame row produced by sample_frames: one row PER SAMPLED FRAME (1→N
#: expansion inside mapInPandas — the shape video decode needs).
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), False),
    ]
)


def fake_frame_sampler(payload: bytes, n_frames: int) -> list[bytes]:
    """STUB frame sampler: deterministic byte slices stand in for decoded
    frames (a real implementation calls ffmpeg with the same signature:
    payload in, list of frame buffers out)."""
    if not payload:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : i * step + step] for i in range(min(n_frames, len(payload)))]


def sample_frames(media: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """Sample ``n_frames`` frames per media row via mapInPandas — the
    1→N row expansion decode shape (each input row yields multiple
    output rows, streamed batch-by-batch so a long video never
    materializes whole in memory)."""

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict[str, Any]] = []
            for _, row in pdf.iterrows():
                for i, frame in enumerate(
                    fake_frame_sampler(bytes(row["payload"]), n_frames)
                ):
                    out.append(
                        {"media_id": row["media_id"], "frame_idx": i,
                         "frame_payload": frame}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(expand, schema=FRAME_SCHEMA)


def resize_images(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize every image payload (STUB: deterministic truncate/pad to
    width*height bytes — a real decoder registers PIL resize with the
    identical signature; schema/partitioning/batching are what this
    operator actually owns)."""
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                (bytes(p)[:target]).ljust(target, b"\0") for p in pdf["payload"]
            ]
            out = pdf.copy()
            out["payload"] = resized
            yield out

    return media.mapInPandas(resize, schema=media.schema)
