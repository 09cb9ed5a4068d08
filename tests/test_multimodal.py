"""Unit tests for the multimodal plane (binary columns, mapInPandas)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _media(spark):
    from mapreduce_server_development_spark.functions.multimodal import synth_media_col

    df = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma"), (5, "delta")], ["doc_id", "text"]
    )
    return df.select("doc_id", synth_media_col(F.col("doc_id"), F.col("text")).alias("media"))


def test_synth_media_bytes(spark):
    rows = {r["doc_id"]: bytes(r["media"]) for r in _media(spark).collect()}
    assert rows[0] == b"IMG1:16x16:alpha"
    assert rows[1] == b"AUD1:17x23:beta"
    assert rows[2] == b"VID1:18x30:gamma"


def test_binary_metadata_modality(spark):
    from mapreduce_server_development_spark.functions.multimodal import binary_metadata

    rows = {r["doc_id"]: r for r in binary_metadata(_media(spark)).collect()}
    assert rows[0]["modality"] == "image"
    assert rows[1]["modality"] == "audio"
    assert rows[2]["modality"] == "video"
    assert rows[0]["n_bytes"] == len(b"IMG1:16x16:alpha")


def test_decode_media_stub_parses_header(spark):
    from mapreduce_server_development_spark.functions.multimodal import decode_media_stub

    rows = {r["doc_id"]: r for r in decode_media_stub(_media(spark)).collect()}
    assert rows[1]["width"] == 17 and rows[1]["height"] == 23
    assert rows[1]["modality"] == "AUD1"
    assert rows[1]["n_payload_bytes"] == len(b"beta")


def test_sample_frames_only_video(spark):
    from mapreduce_server_development_spark.functions.multimodal import sample_frames_stub

    rows = sample_frames_stub(_media(spark)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # Only video docs (doc_id % 3 == 2) emit frames.
    assert set(by_doc) == {2, 5}
    assert sorted(by_doc[2]) == [0, 4, 8]  # n_frames = 8 + 2%16 = 10, stride 4
    assert sorted(by_doc[5]) == [0, 4, 8, 12]  # n_frames = 13


def test_decode_real_image_gated(spark):
    from mapreduce_server_development_spark.functions.multimodal import decode_real_image

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; stub gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_real_image(_media(spark))


def test_tensor_stats_values(spark):
    from mapreduce_server_development_spark.functions.multimodal import tensor_stats

    df = spark.createDataFrame([(1, [3.0, 4.0])], ["vec_id", "embedding"])
    r = tensor_stats(df).collect()[0]
    assert r["n_dims"] == 2
    assert r["l2_norm"] == 5.0
    assert r["mean"] == 3.5
    assert (r["vmin"], r["vmax"]) == (3.0, 4.0)


def test_malformed_headers_skip_rows_not_stage(spark):
    """PERMISSIVE posture: malformed IMG1 payloads (missing separators,
    non-numeric dims) skip the row inside mapInPandas instead of
    raising and failing the whole stage."""
    from mapreduce_server_development_spark.functions.multimodal import (
        decode_media_stub,
        tile_patches_stub,
    )

    df = spark.createDataFrame(
        [
            (0, bytearray(b"IMG1:16x16:ok")),        # well-formed
            (1, bytearray(b"IMG1 no separators")),   # missing ':'
            (2, bytearray(b"IMG1:WxH:payload")),     # non-numeric dims
            (3, bytearray(b"IMG1:16:payload")),      # missing 'x'
            (4, bytearray(b"\x00\x01\x02")),         # not media at all
        ],
        "doc_id long, media binary",
    )
    tiles = tile_patches_stub(df).collect()
    assert {r["doc_id"] for r in tiles} == {0}
    decoded = decode_media_stub(df).collect()
    assert {r["doc_id"] for r in decoded} == {0}


def test_image_ahash_finds_near_identical_images(spark, tmp_path):
    """Two images whose payloads differ by one character must collide
    on most hash bands and pair with a small hamming distance; a
    structurally different image must not pair with them at <= 8.
    Only IMG1-modality docs (doc_id % 3 == 0) participate."""
    from mapreduce_server_development_spark.plans import QUERIES

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (0, base, "en", "s", len(base)),
        (3, base[:-1] + "x", "en", "s", len(base)),
        (6, "ZZZZ aaaa ZZZZ aaaa ZZZZ aaaa ZZZZ aaaa ZZZZ aaaa ZZZZ aaaa okay", "en", "s", 64),
        (1, base, "en", "s", len(base)),  # AUD1 modality -> excluded
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in QUERIES["q_image_ahash_dedup"](spark, str(tmp_path)).collect()
    }
    assert (0, 3) in got
    assert got[(0, 3)] <= 8
    assert all(6 not in pair for pair in got)
    assert all(1 not in pair for pair in got)
