"""Multimodal columns: opaque binary payloads with typed metadata, plus
cross-modal (text × embedding) joins — the training-data pipeline
surface the reference lacks entirely (its only type is a text edge
list, SURVEY.md §1.1).

Design for 100 TB:
  * media lives in a plain ``binary`` column + a typed metadata struct —
    partition/prune/filter on the metadata, never decode to plan;
  * decode / feature-extract runs as Arrow-batched ``mapInPandas``
    (one Python process per partition, columnar batches — never a
    row-at-a-time UDF); heavyweight codec libraries (Pillow/opencv)
    aren't in this container, so the decode step carries its own
    stdlib-only BMP parser (``decode_image``) — real header parsing,
    stride padding, bottom-up row order, BGR→RGB — exercised against a
    spec-valid BMP the engine synthesizes JVM-side;
  * the synthetic payload is ``unhex(md5(text))`` so every byte-level
    feature has a bit-for-bit DuckDB oracle via hex arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from twitter_followers_patterns_mapreduce_spark.functions.vector import (
    as_double,
    cosine,
    cosine_sql_duckdb,
    dot,
    norm,
)
from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_lsh_pairs_oracle,
)
from twitter_followers_patterns_mapreduce_spark.operators.text import quality_score_select

PAYLOAD_BYTES = 16  # md5 digest length


def with_fake_image(documents: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + typed metadata struct.

    Stand-in for real image bytes (no codecs in this container): payload
    is ``unhex(md5(text))``; metadata (width/height/channels/fmt) is
    derived from doc_id so plans can filter/partition on metadata
    without touching bytes — the pattern real multimodal tables use.
    """
    return documents.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("image"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(4)) * 64 + 64).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(3)) * 64 + 64).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit("fake/md5").alias("fmt"),
        ).alias("image_meta"),
    )


_BYTE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def image_byte_stats(documents: DataFrame) -> DataFrame:
    """Byte-level feature extraction over the binary column via
    Arrow-batched ``mapInPandas`` — the real multimodal hot path shape
    (decode/resize/frame-sample slot in exactly here).  Python touches
    only the payload batches; everything before/after stays JVM-side."""
    mm = with_fake_image(documents)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf["image"]
            meta = pdf["image_meta"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": imgs.map(len).astype("int64"),
                    "first_byte": imgs.map(lambda b: b[0]).astype("int64"),
                    "byte_sum": imgs.map(lambda b: sum(b)).astype("int64"),
                    "width": meta.map(lambda m: m["width"]).astype("int32"),
                    "height": meta.map(lambda m: m["height"]).astype("int32"),
                }
            )

    return mm.mapInPandas(extract, schema=_BYTE_STATS_SCHEMA)


def image_byte_stats_oracle() -> str:
    """Bit-for-bit oracle: the payload is unhex(md5(text)), so every byte
    is a hex pair of the digest — pure SQL arithmetic."""
    byte_sum = (
        f"list_aggregate(list_transform(range(0, {PAYLOAD_BYTES}), "
        f"i -> CAST(concat('0x', substring(md5(text), 2*i + 1, 2)) AS BIGINT)), 'sum')"
    )
    return f"""SELECT doc_id,
  CAST({PAYLOAD_BYTES} AS BIGINT) AS n_bytes,
  CAST(concat('0x', substring(md5(text), 1, 2)) AS BIGINT) AS first_byte,
  CAST({byte_sum} AS BIGINT) AS byte_sum,
  CAST((doc_id % 4) * 64 + 64 AS INT) AS width,
  CAST((doc_id % 3) * 64 + 64 AS INT) AS height
FROM documents"""


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("p00", T.LongType()),
        T.StructField("p01", T.LongType()),
        T.StructField("p10", T.LongType()),
        T.StructField("p11", T.LongType()),
    ]
)


def image_resize_pool(documents: DataFrame) -> DataFrame:
    """Codec-free RESIZE over the binary column: interpret the 16-byte
    payload as a 4×4 grayscale grid and 2×2 average-pool it to 2×2
    (integer floor mean — exact, no float).  This is the resize slot of
    a real multimodal pipeline with the numpy math real and the decode
    step factored out (the container ships no codec; a decoded image is
    exactly such an HxW array).  Arrow ``mapInPandas``, vectorized
    reshape/pool per batch — no per-row Python in the JVM boundary."""
    mm = with_fake_image(documents)

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            grids = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["image"]]
            ).reshape(-1, 4, 4).astype(np.int64)
            pooled = (
                grids.reshape(-1, 2, 2, 2, 2).sum(axis=(2, 4)) // 4
            )  # (n, 2, 2) floor means
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": np.full(len(pdf), 2, dtype=np.int32),
                    "out_height": np.full(len(pdf), 2, dtype=np.int32),
                    "p00": pooled[:, 0, 0],
                    "p01": pooled[:, 0, 1],
                    "p10": pooled[:, 1, 0],
                    "p11": pooled[:, 1, 1],
                }
            )

    return mm.mapInPandas(pool, schema=_RESIZE_SCHEMA)


def image_resize_pool_oracle() -> str:
    """Closed-form oracle: payload byte i is hex pair i of md5(text);
    pooled cell (r, c) floor-averages bytes (2r, 2c), (2r, 2c+1),
    (2r+1, 2c), (2r+1, 2c+1) of the 4×4 row-major grid."""

    def byte(i: int) -> str:
        return f"CAST(concat('0x', substring(md5(text), {2 * i + 1}, 2)) AS BIGINT)"

    def cell(r: int, c: int) -> str:
        idx = [4 * (2 * r) + 2 * c, 4 * (2 * r) + 2 * c + 1,
               4 * (2 * r + 1) + 2 * c, 4 * (2 * r + 1) + 2 * c + 1]
        return "(" + " + ".join(byte(i) for i in idx) + ") // 4"

    return f"""SELECT doc_id,
  CAST(2 AS INT) AS out_width,
  CAST(2 AS INT) AS out_height,
  {cell(0, 0)} AS p00,
  {cell(0, 1)} AS p01,
  {cell(1, 0)} AS p10,
  {cell(1, 1)} AS p11
FROM documents"""


#: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B) for a 2×2 24-bit
#: uncompressed BMP, hex-encoded: 'BM', file size 70, pixel offset 54,
#: header size 40, width 2, height 2 (positive → bottom-up), 1 plane,
#: 24 bpp, BI_RGB, image size 16 (two 8-byte stride-padded rows),
#: 2835 ppm (72 dpi) both axes.
_BMP_2X2_HEADER_HEX = (
    "424d" "46000000" "00000000" "36000000"
    "28000000" "02000000" "02000000" "0100" "1800"
    "00000000" "10000000" "130b0000" "130b0000" "00000000" "00000000"
)


def with_fake_bmp(documents: DataFrame) -> DataFrame:
    """Attach a REAL (spec-valid) 2×2 24-bit BMP whose pixel bytes are
    the md5 digest of the text — built entirely JVM-side (one concat +
    unhex per row), so a closed-form hex oracle can recompute every
    decoded pixel.  Stored layout per the format: bottom row first,
    each 6-byte BGR row padded to an 8-byte stride."""
    return documents.selectExpr(
        "doc_id",
        "unhex(concat("
        f"'{_BMP_2X2_HEADER_HEX}', "
        "substring(md5(text), 1, 12), '0000', "
        "substring(md5(text), 13, 12), '0000'"
        ")) AS image",
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ]
)


def parse_bmp(buf: bytes) -> tuple[int, int, list[float]]:
    """Stdlib-only BMP decoder: BITMAPFILEHEADER + BITMAPINFOHEADER,
    uncompressed 24/32-bit, bottom-up or top-down, 4-byte row stride.
    Returns (width, height, pixels) with pixels row-major top-down RGB
    floats in [0, 255] (alpha dropped).  Raises ValueError on anything
    that isn't a decodable BMP — corrupt media must fail loudly, not
    emit garbage features."""
    import struct

    if len(buf) < 54 or buf[0:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    bpp = struct.unpack_from("<H", buf, 28)[0]
    comp = struct.unpack_from("<I", buf, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    if data_off + stride * h > len(buf):
        raise ValueError("truncated pixel data")
    pixels: list[float] = []
    for row in range(h):
        src = row if top_down else h - 1 - row
        off = data_off + src * stride
        for x in range(w):
            px = buf[off + x * nch : off + (x + 1) * nch]
            pixels.extend((float(px[2]), float(px[1]), float(px[0])))
    return w, h, pixels


def decode_image(mm: DataFrame) -> DataFrame:
    """Decode a binary BMP column into pixel arrays via Arrow-batched
    ``mapInPandas`` — the production decode slot, with a real
    stdlib-only codec body (:func:`parse_bmp`): header struct-parse,
    stride padding, bottom-up row order, BGR→RGB.  Swapping in
    Pillow/opencv for other formats changes one function.  Output:
    (doc_id, width, height, channels, pixels row-major top-down RGB).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [parse_bmp(b) for b in pdf["image"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                    "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                    "channels": pd.Series([3] * len(decoded), dtype="int32"),
                    "pixels": [d[2] for d in decoded],
                }
            )

    return mm.mapInPandas(_decode, schema=_DECODE_SCHEMA)


#: decoded-pixel position → md5 digest byte index for the 2×2 fake BMP:
#: top row is the SECOND stored row (bottom-up), BGR reversed to RGB
_BMP_2X2_PIXEL_SRC = [8, 7, 6, 11, 10, 9, 2, 1, 0, 5, 4, 3]


def decode_image_oracle() -> str:
    """Closed-form pixel oracle: the BMP payload is header + md5 bytes,
    so each decoded pixel value is one hex pair of the digest (the
    position map inverts bottom-up row order and BGR channel order)."""
    arms = ",".join(f"({pos},{src})" for pos, src in enumerate(_BMP_2X2_PIXEL_SRC))
    return f"""WITH px AS (SELECT doc_id, md5(text) AS m FROM documents),
pos_map(pos, src) AS (SELECT * FROM (VALUES {arms}))
SELECT doc_id, CAST(2 AS INT) AS width, CAST(2 AS INT) AS height,
  CAST(pos AS INT) AS pos,
  CAST(CAST(concat('0x', substring(m, 2 * src + 1, 2)) AS BIGINT) AS DOUBLE) AS val
FROM px CROSS JOIN pos_map"""


def doc_embedding_profile(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Cross-modal per-document profile: text quality × vector norm ×
    label in one row (equi-join on doc_id = vec_id).  At 100 TB both
    sides bucket on the id so this is a co-located join."""
    q = documents.selectExpr(
        *[f"{e} AS {a}" for e, a in quality_score_select("spark")], "lang"
    )
    emb = embeddings.select(
        F.col("vec_id"), as_double("embedding").alias("v"), F.col("label")
    )
    return (
        q.join(emb, q["doc_id"] == emb["vec_id"])
        .select(
            "doc_id",
            "lang",
            "quality_score",
            F.round(norm(F.col("v")), 6).alias("emb_norm"),
            F.round(dot(F.col("v"), F.col("v")), 6).alias("emb_sq_norm"),
            F.col("label").alias("cluster_label"),
        )
    )


def doc_embedding_profile_oracle() -> str:
    from twitter_followers_patterns_mapreduce_spark.operators.text import select_sql

    qsel = select_sql("documents", quality_score_select("duckdb"))
    return f"""WITH q AS ({qsel})
SELECT d.doc_id, d.lang, q.quality_score,
  round(sqrt(list_dot_product(e.v, e.v)), 6) AS emb_norm,
  round(list_dot_product(e.v, e.v), 6) AS emb_sq_norm,
  e.label AS cluster_label
FROM documents d
JOIN q ON q.doc_id = d.doc_id
JOIN (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings) e
  ON d.doc_id = e.vec_id"""


def crossmodal_near_dups(
    documents: DataFrame, embeddings: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs that carry BOTH modalities: MinHash-LSH text pairs
    (equi-join candidate generation, dedup.py) annotated with the
    embedding cosine of the same pair — the multimodal agreement check
    a training-data pipeline runs before dropping a document."""
    pairs = minhash_lsh_pairs(documents, threshold=threshold)
    emb = embeddings.select("vec_id", as_double("embedding").alias("v"))
    ea = emb.select(F.col("vec_id").alias("doc_a"), F.col("v").alias("va"))
    eb = emb.select(F.col("vec_id").alias("doc_b"), F.col("v").alias("vb"))
    return (
        pairs.join(ea, "doc_a")
        .join(eb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
            (F.col("jaccard") >= threshold).alias("text_dup"),
        )
    )


def crossmodal_near_dups_oracle(threshold: float = 0.5) -> str:
    cos = cosine_sql_duckdb("ea.v", "eb.v")
    return f"""WITH pairs AS ({minhash_lsh_pairs_oracle(threshold=threshold)}),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT p.doc_a, p.doc_b, p.jaccard,
  round({cos}, 6) AS cosine,
  p.jaccard >= {threshold} AS text_dup
FROM pairs p
JOIN emb ea ON ea.vec_id = p.doc_a
JOIN emb eb ON eb.vec_id = p.doc_b"""


# ---------------------------------------------------------------------------
# Video: frame sampling over a multi-frame binary payload

N_FRAMES = 8
FRAME_BYTES = 16  # one md5 digest per fake frame


def with_fake_video(documents: DataFrame) -> DataFrame:
    """Attach a deterministic multi-frame binary payload: frame i is
    ``unhex(md5(text || ':' || i))``, concatenated — 128 bytes of
    "video" whose every byte has a closed-form hex oracle — plus the
    typed metadata struct real video tables carry."""
    frames = [
        F.unhex(F.md5(F.concat(F.col("text"), F.lit(f":{i}")))) for i in range(N_FRAMES)
    ]
    return documents.select(
        "doc_id",
        F.concat(*frames).alias("video"),
        F.struct(
            F.lit(N_FRAMES).alias("n_frames"),
            F.lit(FRAME_BYTES).alias("frame_bytes"),
            F.lit(4).alias("fps"),
            F.lit("fake/md5").alias("codec"),
        ).alias("video_meta"),
    )


_FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sum", T.LongType()),
        T.StructField("first_byte", T.LongType()),
    ]
)


def video_frame_sample(documents: DataFrame, stride: int = 2) -> DataFrame:
    """Sample every ``stride``-th frame and extract per-frame byte
    features — the fan-out shape of real frame sampling (one input row
    → n_frames/stride output rows), as Arrow-batched ``mapInPandas``.
    Frame boundaries come from the metadata struct, not hard-coded, so
    the same plumbing serves variable-length media."""
    mm = with_fake_video(documents)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[int] = []
            idxs: list[int] = []
            sums: list[int] = []
            firsts: list[int] = []
            for doc_id, blob, meta in zip(pdf["doc_id"], pdf["video"], pdf["video_meta"]):
                nf, fb = meta["n_frames"], meta["frame_bytes"]
                for i in range(0, nf, stride):
                    fr = blob[i * fb : (i + 1) * fb]
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    sums.append(sum(fr))
                    firsts.append(fr[0])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sum": pd.Series(sums, dtype="int64"),
                    "first_byte": pd.Series(firsts, dtype="int64"),
                }
            )

    return mm.mapInPandas(sample, schema=_FRAME_SAMPLE_SCHEMA)


N_AUDIO_CHUNKS = 8
#: fake 8-bit PCM: 8 md5 digests = 128 unsigned samples centered at 128
AUDIO_SAMPLES = N_AUDIO_CHUNKS * PAYLOAD_BYTES
AUDIO_RATE = 8000


def with_fake_audio(documents: DataFrame) -> DataFrame:
    """Attach a deterministic single-channel "waveform": chunk i is
    ``unhex(md5(text || '#' || i))``, concatenated — 128 bytes of fake
    8-bit PCM whose every sample has a closed-form hex oracle — plus
    the typed metadata struct real audio tables carry."""
    chunks = [
        F.unhex(F.md5(F.concat(F.col("text"), F.lit(f"#{i}")))) for i in range(N_AUDIO_CHUNKS)
    ]
    return documents.select(
        "doc_id",
        F.concat(*chunks).alias("audio"),
        F.struct(
            F.lit(AUDIO_SAMPLES).alias("n_samples"),
            F.lit(AUDIO_RATE).alias("sample_rate"),
            F.lit(8).alias("bit_depth"),
            F.lit("fake/md5").alias("codec"),
        ).alias("audio_meta"),
    )


_AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def audio_features(documents: DataFrame) -> DataFrame:
    """Per-document waveform features via Arrow-batched ``mapInPandas``
    (the slot a real spectrogram/MFCC extractor plugs into): samples
    are bytes centered at 128; peak / zero-crossing counts are exact
    integers, and RMS is emitted via exact integer floor at 6 dp
    (sum-of-squares is integer, /128 is a power-of-two division, so
    both engines sqrt the identical double)."""
    import math

    import numpy as np

    mm = with_fake_audio(documents)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, peaks, zcs, rmss = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                s = np.frombuffer(blob, dtype=np.uint8).astype(np.int64) - 128
                doc_ids.append(doc_id)
                peaks.append(int(np.abs(s).max()))
                zcs.append(int(np.sum(s[:-1] * s[1:] < 0)))
                rms = math.sqrt(int(np.sum(s * s)) / float(len(s)))
                rmss.append(math.floor(rms * 1_000_000) / 1_000_000.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "n_samples": pd.Series([AUDIO_SAMPLES] * len(doc_ids), dtype="int64"),
                    "peak": pd.Series(peaks, dtype="int64"),
                    "zero_crossings": pd.Series(zcs, dtype="int64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "duration_s": pd.Series(
                        [AUDIO_SAMPLES / float(AUDIO_RATE)] * len(doc_ids), dtype="float64"
                    ),
                }
            )

    return mm.mapInPandas(extract, schema=_AUDIO_FEATURES_SCHEMA)


def audio_features_oracle() -> str:
    """Closed-form hex oracle: sample k is byte k%16 of
    ``md5(text || '#' || k//16)``, centered at 128."""
    byte_k = (
        "CAST(concat('0x', substring(md5(text || '#' || CAST(k // 16 AS VARCHAR)), "
        "2 * (k % 16) + 1, 2)) AS BIGINT)"
    )
    n = AUDIO_SAMPLES
    return f"""WITH s AS (
  SELECT doc_id, list_transform(range(0, {n}), k -> {byte_k} - 128) AS w
  FROM documents
)
SELECT doc_id,
  CAST({n} AS BIGINT) AS n_samples,
  CAST(list_aggregate(list_transform(w, x -> abs(x)), 'max') AS BIGINT) AS peak,
  CAST(list_aggregate(list_transform(range(0, {n - 1}), i -> CASE WHEN w[i + 1] * w[i + 2] < 0 THEN 1 ELSE 0 END), 'sum') AS BIGINT) AS zero_crossings,
  CAST(FLOOR(sqrt(list_aggregate(list_transform(w, x -> x * x), 'sum') / {float(n)!r}) * 1000000) AS DOUBLE) / 1000000.0 AS rms,
  CAST({AUDIO_SAMPLES} AS DOUBLE) / {float(AUDIO_RATE)!r} AS duration_s
FROM s"""


def video_frame_sample_oracle(stride: int = 2) -> str:
    """Closed-form hex oracle: frame i's bytes are the md5 digest of
    ``text || ':' || i``."""
    sampled = list(range(0, N_FRAMES, stride))
    digest = "md5(text || ':' || f.frame_idx)"
    frame_sum = (
        f"list_aggregate(list_transform(range(0, {FRAME_BYTES}), "
        f"i -> CAST(concat('0x', substring({digest}, 2*i + 1, 2)) AS BIGINT)), 'sum')"
    )
    return f"""SELECT doc_id,
  CAST(f.frame_idx AS INT) AS frame_idx,
  CAST({frame_sum} AS BIGINT) AS frame_sum,
  CAST(concat('0x', substring({digest}, 1, 2)) AS BIGINT) AS first_byte
FROM documents CROSS JOIN (SELECT unnest({sampled}) AS frame_idx) f"""


def image_byte_stats_arrow(documents: DataFrame) -> DataFrame:
    """The same byte-feature extraction via ``mapInArrow`` — the
    zero-copy tier of the Python batch surface (§2.8): batches arrive as
    ``pyarrow.RecordBatch``, so the binary payloads are sliced straight
    out of the Arrow buffers without pandas Series materialization —
    the right shape when the per-batch work is thin relative to payload
    bytes.  Same output and oracle as :func:`image_byte_stats`; parity
    between the two paths is itself pinned by the shared oracle."""
    import pyarrow as pa

    mm = with_fake_image(documents)

    def extract(batches):
        for batch in batches:
            doc_id = batch.column("doc_id")
            imgs = batch.column("image").to_pylist()
            meta = batch.column("image_meta")
            yield pa.RecordBatch.from_arrays(
                [
                    doc_id,
                    pa.array([len(b) for b in imgs], type=pa.int64()),
                    pa.array([b[0] for b in imgs], type=pa.int64()),
                    pa.array([sum(b) for b in imgs], type=pa.int64()),
                    meta.field("width"),
                    meta.field("height"),
                ],
                names=["doc_id", "n_bytes", "first_byte", "byte_sum", "width", "height"],
            )

    return mm.mapInArrow(extract, schema=_BYTE_STATS_SCHEMA)


_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def image_ahash(documents: DataFrame) -> DataFrame:
    """Perceptual average-hash per image: interpret the payload as the
    4×4 grayscale grid, set bit i iff pixel i is STRICTLY brighter than
    the floor-mean brightness — 16 bits packed row-major into one
    BIGINT.  Exact integer math end to end (mean is ``sum // 16``), so
    the hash has a closed-form hex oracle like every mm op here.
    Vectorized numpy over Arrow ``mapInPandas`` batches — the pHash
    slot of a real pipeline with the codec factored out."""
    mm = with_fake_image(documents).select("doc_id", "image")

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            px = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["image"]]
            ).astype(np.int64)  # (n, 16)
            mean = px.sum(axis=1, keepdims=True) // PAYLOAD_BYTES
            bits = (px > mean).astype(np.int64)
            weights = 1 << np.arange(PAYLOAD_BYTES, dtype=np.int64)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash": (bits * weights).sum(axis=1)}
            )

    return mm.mapInPandas(hash_batches, schema=_AHASH_SCHEMA)


def image_ahash_pairs(documents: DataFrame) -> DataFrame:
    """Image near-dup candidates by perceptual-hash blocking: documents
    whose average-hashes collide EXACTLY (Hamming distance 0) pair up
    within their hash bucket — the image-side mirror of the text
    family's SimHash table (``dedup.py``).  The join is a bucket
    equi-join on the 16-bit hash, never an all-pairs cross; bucket
    population follows birthday statistics (E[pairs] ≈ n²/2·2⁻¹⁶), so
    the candidate set — and hence the exact-verification cost a real
    pipeline pays downstream — shrinks exponentially with hash width
    (64-bit production hashes make collisions pure signal).  Output:
    doc_a < doc_b, shared ahash."""
    h = image_ahash(documents)
    a = h.select(F.col("doc_id").alias("doc_a"), "ahash")
    b = h.select(F.col("doc_id").alias("doc_b"), "ahash")
    return (
        a.join(b, "ahash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ahash")
    )


def _ahash_sql_duckdb() -> str:
    """Closed-form DuckDB aHash: byte i is hex pair i of md5(text)."""
    byte = "CAST(concat('0x', substring(md5(text), 2*i + 1, 2)) AS BIGINT)"
    total = (
        f"list_aggregate(list_transform(range(0, {PAYLOAD_BYTES}), i -> {byte}), 'sum')"
    )
    bit = (
        f"CASE WHEN {byte} > mean THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END"
    )
    return f"""SELECT doc_id,
  CAST(list_aggregate(list_transform(range(0, {PAYLOAD_BYTES}), i -> {bit}),
       'sum') AS BIGINT) AS ahash
FROM (SELECT doc_id, text, {total} // {PAYLOAD_BYTES} AS mean FROM documents) m"""


def image_ahash_pairs_oracle() -> str:
    return f"""WITH h AS ({_ahash_sql_duckdb()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.ahash
FROM h a JOIN h b ON a.ahash = b.ahash AND a.doc_id < b.doc_id"""
