"""Multimodal plumbing: schema, Arrow batch shapes, decoder registry.
Decoding itself is stubbed (no media libs in this container) — the test
asserts the distributed plumbing, which is the part that must be real."""

from __future__ import annotations

import pytest

from spark_hudi_etl_pipeline_spark.operators import multimodal as mm


@pytest.fixture()
def media_df(spark):
    rows = [(i, bytes([i % 251] * (100 + i))) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    return mm.attach_metadata(df, media_type="image")


def test_metadata_struct(spark, media_df):
    row = media_df.filter("media_id = 3").collect()[0]
    assert row["meta"]["media_type"] == "image"
    assert row["meta"]["n_bytes"] == 103
    # metadata filters never touch payload bytes (column pruning)
    assert media_df.filter("meta.n_bytes > 110").count() == 9


def test_decode_features_deterministic(spark, media_df):
    out1 = {r["media_id"]: r["feature_checksum"] for r in mm.decode_features(media_df).collect()}
    out2 = {r["media_id"]: r["feature_checksum"] for r in mm.decode_features(media_df).collect()}
    assert out1 == out2
    assert len(out1) == 20
    assert len(set(out1.values())) > 1  # features actually vary by payload


def test_decode_features_schema(spark, media_df):
    out = mm.decode_features(media_df)
    assert out.schema == mm.FEATURE_SCHEMA


def test_registered_decoder_used(spark, media_df):
    mm.register_decoder("image", lambda payload, meta: {"feature_dim": 7, "feature_checksum": 42})
    try:
        out = mm.decode_features(media_df).collect()
        assert all(r["feature_dim"] == 7 and r["feature_checksum"] == 42 for r in out)
    finally:
        mm._DECODERS.pop("image", None)


def test_unsupported_decoder_raises(spark, media_df):
    mm.register_decoder("image", mm.unsupported_decoder)
    try:
        with pytest.raises(Exception, match="NotImplementedError|media decoding"):
            mm.decode_features(media_df).collect()
    finally:
        mm._DECODERS.pop("image", None)


def test_repartition_for_payloads(spark, media_df):
    out = mm.repartition_for_payloads(media_df, total_bytes=10 << 30, target_partition_bytes=1 << 30)
    assert out.rdd.getNumPartitions() == 10


def test_sample_frames_one_to_n(spark):
    """Frame sampling is a 1→N mapInPandas expansion with deterministic
    stub frames."""
    from spark_hudi_etl_pipeline_spark.operators.multimodal import (
        attach_metadata,
        sample_frames,
    )

    rows = [(1, b"0123456789abcdef"), (2, b"xy")]
    media = attach_metadata(
        spark.createDataFrame(rows, "media_id long, payload binary"),
        media_type="video",
    )
    out = sample_frames(media, n_frames=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 4
    assert [r["frame_idx"] for r in sorted(by_id[1], key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert bytes(sorted(by_id[1], key=lambda r: r["frame_idx"])[0]["frame_payload"]) == b"0123"
    assert len(by_id[2]) == 2  # shorter payload → fewer frames


def test_resize_images_schema_stable(spark):
    from spark_hudi_etl_pipeline_spark.operators.multimodal import (
        attach_metadata,
        resize_images,
    )

    media = attach_metadata(
        spark.createDataFrame([(1, b"abcdefgh")], "media_id long, payload binary"),
        media_type="image",
    )
    out = resize_images(media, width=2, height=3)
    assert out.schema == media.schema
    row = out.collect()[0]
    assert len(bytes(row["payload"])) == 6
