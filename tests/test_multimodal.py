"""Multimodal plumbing: non-ASCII correctness and the decode stub contract."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from p4_mapreduce_spark.operators.multimodal import decode_image, sample_frames_df


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"payload")


def test_decode_fake_uses_code_points():
    # 'é' is 2 bytes in UTF-8 but one code point: feat[0] is the byte
    # length while feat[1]/feat[2] are code points, matching the SQL
    # oracle's octet_length + ascii(substr(text, ...))
    feat = decode_image("éabé".encode(), fake=True)
    assert feat == [6.0, float(ord("é")), float(ord("é"))]


def test_frame_sample_non_ascii(spark):
    """The production sampler char-slices and hashes UTF-8 — identical
    to the oracle's substr+md5 semantics even for multi-byte text
    (the synthetic corpus is ASCII, so this is the only coverage)."""
    text = "héllo wörld çafé time"  # 21 chars, several 2-byte chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assets = df.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    rows = sorted(
        (r["frame_idx"], r["frame_bytes"], r["frame_hash"])
        for r in sample_frames_df(assets).collect()
    )
    flen = len(text) // 4
    want = sorted(
        (
            f,
            flen,
            hashlib.md5(text[f * flen : f * flen + flen].encode("utf-8")).hexdigest(),
        )
        for f in range(4)
    )
    assert rows == want


def test_decode_hash_matches_catalyst_hof_reference(spark, sf_dir):
    """r14: `_decode_hash` computes the dHash (hex + 8 row bytes)
    inside the numpy kernel; the r13 shape decoded to a 72-pixel grid
    (`_decode_px`) and rebuilt the bytes with Catalyst aggregate()
    HOFs. Both paths must agree byte-for-byte on the real corpus —
    the old path stays in-tree exactly as this test's reference."""
    from p4_mapreduce_spark.operators.multimodal import (
        _DH_ROWS,
        PHASH_HASH_SCHEMA,
        PHASH_SCHEMA,
        _decode_hash,
        _decode_px,
        _phash_hex_col,
        _phash_rowbyte_col,
        assets_from_documents,
    )

    assets = assets_from_documents(spark, sf_dir).select("doc_id", "payload")
    rbs = [f"rb{r}" for r in range(_DH_ROWS)]
    new = {
        tuple(r)
        for r in assets.mapInPandas(
            _decode_hash, schema=PHASH_HASH_SCHEMA
        ).collect()
    }
    old = {
        tuple(r)
        for r in assets.mapInPandas(_decode_px, schema=PHASH_SCHEMA)
        .select(
            "doc_id",
            _phash_hex_col().alias("phash"),
            *[_phash_rowbyte_col(r).alias(c) for r, c in enumerate(rbs)],
        )
        .collect()
    }
    assert new == old and len(new) > 0
