"""Multimodal plumbing tests: binary payload column, metadata struct,
Arrow mapInPandas batch extraction, decode stub contract."""

from __future__ import annotations

import hashlib
import math

import pytest

from twitter_followers_patterns_mapreduce_spark.operators import multimodal as M

DOCS_SCHEMA = "doc_id LONG, text STRING"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, "hello world"), (1, "another document"), (5, "third one here")]
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def test_fake_image_payload_and_meta(docs):
    r = {x["doc_id"]: x for x in M.with_fake_image(docs).collect()}
    # payload = md5 digest bytes of the text
    assert bytes(r[0]["image"]) == hashlib.md5(b"hello world").digest()
    assert r[0]["image_meta"]["width"] == 64  # (0 % 4) * 64 + 64
    assert r[5]["image_meta"]["width"] == 128  # (5 % 4) * 64 + 64
    assert r[5]["image_meta"]["height"] == 192  # (5 % 3) * 64 + 64
    assert r[0]["image_meta"]["fmt"] == "fake/md5"


def test_image_byte_stats_matches_python(docs):
    r = {x["doc_id"]: x for x in M.image_byte_stats(docs).collect()}
    for doc_id, text in [(0, "hello world"), (1, "another document")]:
        digest = hashlib.md5(text.encode()).digest()
        assert r[doc_id]["n_bytes"] == 16
        assert r[doc_id]["first_byte"] == digest[0]
        assert r[doc_id]["byte_sum"] == sum(digest)


def _bmp(width, height, rows_bgr, bpp=24, top_down=False):
    """Hand-build a spec-valid BMP: rows_bgr is top-down [[B,G,R(,A)...]]
    per visual row; storage order/padding/headers done here so the
    decoder is tested against independently-constructed bytes."""
    import struct

    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    stored = rows_bgr if top_down else rows_bgr[::-1]
    pix = b"".join(
        bytes(r) + b"\x00" * (stride - width * nch) for r in stored
    )
    h_field = -height if top_down else height
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, h_field, 1, bpp, 0, len(pix), 2835, 2835, 0, 0
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 54)
    return file_hdr + info + pix


def test_parse_bmp_bottom_up_with_padding():
    # 1x2 24-bit: stride pads each 3-byte row to 4; stored bottom-first
    buf = _bmp(1, 2, [[10, 20, 30], [40, 50, 60]])  # top row BGR=10,20,30
    w, h, px = M.parse_bmp(buf)
    assert (w, h) == (1, 2)
    # decoder must emit top-down RGB
    assert px == [30.0, 20.0, 10.0, 60.0, 50.0, 40.0]


def test_parse_bmp_top_down_and_32bit_alpha_dropped():
    rows = [[1, 2, 3, 255, 4, 5, 6, 0], [7, 8, 9, 128, 10, 11, 12, 64]]
    buf = _bmp(2, 2, rows, bpp=32, top_down=True)
    w, h, px = M.parse_bmp(buf)
    assert (w, h) == (2, 2)
    assert px == [3.0, 2.0, 1.0, 6.0, 5.0, 4.0, 9.0, 8.0, 7.0, 12.0, 11.0, 10.0]


def test_parse_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        M.parse_bmp(b"JFIF not a bmp at all, padded to length" + b"\x00" * 40)
    ok = _bmp(2, 2, [[0] * 6, [0] * 6])
    with pytest.raises(ValueError):
        M.parse_bmp(ok[:-10])  # truncated pixel data
    import struct

    rle = bytearray(ok)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8 compression
    with pytest.raises(ValueError):
        M.parse_bmp(bytes(rle))


def test_decode_image_matches_python_reference(docs):
    # end-to-end: JVM-built BMP -> Arrow batch -> stdlib codec; compare
    # against hashlib + the same independent parser on the driver
    rows = {r["doc_id"]: r for r in M.decode_image(M.with_fake_bmp(docs)).collect()}
    for doc_id, text in [(r["doc_id"], r["text"]) for r in docs.collect()]:
        d = hashlib.md5(text.encode()).digest()
        r = rows[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (2, 2, 3)
        expect = [d[i] for i in [8, 7, 6, 11, 10, 9, 2, 1, 0, 5, 4, 3]]
        assert r["pixels"] == [float(v) for v in expect]


def test_crossmodal_requires_both_modalities(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "zz yy xx ww")], schema=DOCS_SCHEMA
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.1]), (3, [0.0, 1.0])],
        schema="vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = M.crossmodal_near_dups(docs, emb).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"], r["jaccard"]) == (1, 2, 1.0)
    assert r["cosine"] > 0.99
    assert bool(r["text_dup"]) is True


def test_video_frame_sample_goldens(docs):
    rows = M.video_frame_sample(docs, stride=2).collect()
    # 3 docs × 4 sampled frames (0,2,4,6 of 8)
    assert len(rows) == 12
    by_key = {(r["doc_id"], r["frame_idx"]): r for r in rows}
    for doc_id, text in [(0, "hello world"), (5, "third one here")]:
        for i in (0, 2, 4, 6):
            d = hashlib.md5(f"{text}:{i}".encode()).digest()
            r = by_key[(doc_id, i)]
            assert r["frame_sum"] == sum(d)
            assert r["first_byte"] == d[0]


def test_video_frame_sample_stride_controls_fanout(docs):
    assert M.video_frame_sample(docs, stride=4).count() == 3 * 2  # frames 0, 4
    assert M.video_frame_sample(docs, stride=1).count() == 3 * 8


def test_audio_features_goldens(docs):
    rows = {r["doc_id"]: r for r in M.audio_features(docs).collect()}
    assert len(rows) == 3
    for doc_id, text in [(0, "hello world"), (5, "third one here")]:
        wav = []
        for i in range(8):
            wav += [b - 128 for b in hashlib.md5(f"{text}#{i}".encode()).digest()]
        r = rows[doc_id]
        assert r["n_samples"] == 128
        assert r["peak"] == max(abs(x) for x in wav)
        assert r["zero_crossings"] == sum(
            1 for a, b in zip(wav, wav[1:]) if a * b < 0
        )
        rms = math.sqrt(sum(x * x for x in wav) / 128.0)
        assert r["rms"] == math.floor(rms * 1_000_000) / 1_000_000.0
        assert r["duration_s"] == 128 / 8000.0


def test_byte_stats_arrow_equals_pandas_path(spark):
    # the mapInArrow and mapInPandas extractors must agree row-for-row
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    a = sorted(map(tuple, M.image_byte_stats(docs).collect()))
    b = sorted(map(tuple, M.image_byte_stats_arrow(docs).collect()))
    assert a == b


def test_image_ahash_matches_python_recompute_and_pairs_dups(spark):
    """aHash closed form: hashes match an independent Python recompute
    over the md5-digest grid (strict > floor-mean bits, row-major), and
    identical payloads (same text -> same digest) pair up while
    distinct payloads pair only on true 16-bit collisions."""
    import hashlib

    from twitter_followers_patterns_mapreduce_spark.operators.multimodal import (
        image_ahash,
        image_ahash_pairs,
    )

    texts = ["alpha", "beta", "gamma", "delta", "alpha", "epsilon"]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )

    def expect_hash(text: str) -> int:
        px = list(hashlib.md5(text.encode()).digest())
        mean = sum(px) // 16
        return sum(1 << i for i, p in enumerate(px) if p > mean)

    got = {r["doc_id"]: r["ahash"] for r in image_ahash(docs).collect()}
    assert got == {i: expect_hash(t) for i, t in enumerate(texts)}

    by_hash: dict[int, list[int]] = {}
    for i, t in enumerate(texts):
        by_hash.setdefault(expect_hash(t), []).append(i)
    expect_pairs = {
        (a, b)
        for ids in by_hash.values()
        for a in ids
        for b in ids
        if a < b
    }
    assert (0, 4) in expect_pairs  # the planted duplicate payload
    got_pairs = {
        (r["doc_a"], r["doc_b"]) for r in image_ahash_pairs(docs).collect()
    }
    assert got_pairs == expect_pairs
