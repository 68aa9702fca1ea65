"""Multimodal plumbing tests: schemas, Arrow batch shapes, 1→N frame
expansion, and column pruning of the binary payload."""

from __future__ import annotations

from pyspark.sql import functions as F

from tipoca_stream_spark.operators import multimodal as mm
from tipoca_stream_spark.operators.skew import explain_has_exchange


def media_df(spark):
    docs = spark.createDataFrame(
        [(1, "short text", "en", "s", 10), (2, "x" * 700, "en", "s", 700)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return mm.documents_as_media(docs)


def test_extract_features_shapes(spark):
    feats = {r["media_id"]: r for r in mm.extract_features(media_df(spark)).collect()}
    assert feats[1]["byte_len"] == 10
    assert feats[2]["byte_len"] == 700
    assert feats[2]["width"] == (700 % 640) + 1
    assert len(feats[1]["payload_md5"]) == 32
    assert feats[2]["n_frames"] == 70


def test_resize_bounds(spark):
    rows = {r["media_id"]: r for r in mm.resize_images(media_df(spark), max_dim=32).collect()}
    for r in rows.values():
        assert 1 <= r["width"] <= 32 and 1 <= r["height"] <= 32
        assert len(bytes(r["resized"])) <= 700


def test_sample_frames_expansion(spark):
    frames = mm.sample_frames(media_df(spark), every_nth=2, frame_bytes=100).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_no"])
    assert by_media[1] == [0]  # 10 bytes → 1 frame
    assert by_media[2] == [0, 2, 4, 6]  # 700//100=7 frames, every 2nd
    f0 = next(bytes(r["frame"]) for r in frames if r["media_id"] == 2 and r["frame_no"] == 0)
    assert f0 == b"x" * 100


def test_metadata_query_prunes_payload(spark, tmp_path):
    """Scanning only metadata must not read the binary payload column —
    the core reason payloads live in their own column."""
    p = str(tmp_path / "media")
    media_df(spark).write.parquet(p)
    scan = spark.read.parquet(p).select("media_id", "kind", "mime")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # column pruned at the parquet scan
    assert not explain_has_exchange(scan)


def test_decode_image_is_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")
