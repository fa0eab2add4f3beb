"""Named multimodal queries — binary columns with typed metadata,
Arrow-batched byte-level feature extraction, and cross-modal
(documents × embeddings) joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from twitter_followers_patterns_mapreduce_spark.operators import multimodal as M
from twitter_followers_patterns_mapreduce_spark.plans.registry import register
from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table


@register(
    "mm_image_byte_stats",
    oracle=M.image_byte_stats_oracle(),
    description="byte-level features over a binary media column via Arrow mapInPandas",
)
def mm_image_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.image_byte_stats(load_table(spark, sf_dir, "documents"))


@register(
    "mm_doc_embedding_profile",
    oracle=M.doc_embedding_profile_oracle(),
    description="cross-modal per-doc profile: text quality × embedding norm × cluster label",
)
def mm_doc_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.doc_embedding_profile(
        load_table(spark, sf_dir, "documents"), load_table(spark, sf_dir, "embeddings")
    )


@register(
    "mm_crossmodal_near_dups",
    oracle=M.crossmodal_near_dups_oracle(threshold=0.5),
    description="MinHash text near-dup pairs annotated with embedding cosine agreement",
)
def mm_crossmodal_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.crossmodal_near_dups(
        load_table(spark, sf_dir, "documents"), load_table(spark, sf_dir, "embeddings")
    )


@register(
    "mm_image_resize_pool",
    oracle=M.image_resize_pool_oracle(),
    description="codec-free image RESIZE: 4x4 grayscale grid average-pooled to 2x2 "
    "with exact integer math via Arrow mapInPandas, closed-form hex oracle",
)
def mm_image_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.image_resize_pool(load_table(spark, sf_dir, "documents"))


@register(
    "mm_video_frame_sample",
    oracle=M.video_frame_sample_oracle(stride=2),
    description="video frame sampling: metadata-driven byte slicing fan-out via Arrow "
    "mapInPandas (1 row -> n_frames/stride rows), closed-form hex oracle",
)
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.video_frame_sample(load_table(spark, sf_dir, "documents"), stride=2)


@register(
    "mm_audio_features",
    oracle=M.audio_features_oracle(),
    description="audio waveform features (peak / zero-crossings / RMS) over fake 8-bit "
    "PCM via Arrow mapInPandas, closed-form hex oracle",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.audio_features(load_table(spark, sf_dir, "documents"))


@register(
    "mm_image_decode",
    oracle=M.decode_image_oracle(),
    description="REAL image decode: a spec-valid 2x2 24-bit BMP is synthesized "
    "JVM-side (header + md5 pixel bytes), then parsed by a stdlib-only BMP codec "
    "in Arrow mapInPandas (struct headers, stride padding, bottom-up rows, "
    "BGR->RGB); decoded pixels explode to rows and hash-gate against the "
    "closed-form hex oracle",
)
def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    dec = M.decode_image(M.with_fake_bmp(load_table(spark, sf_dir, "documents")))
    return dec.select(
        "doc_id", "width", "height", F.posexplode("pixels").alias("pos", "val")
    ).selectExpr("doc_id", "width", "height", "pos", "CAST(val AS DOUBLE) AS val")


@register(
    "mm_image_byte_stats_arrow",
    oracle=M.image_byte_stats_oracle(),
    description="the byte-stats extraction via mapInArrow (zero-copy RecordBatch tier "
    "of the Python batch surface) — same closed-form oracle as the mapInPandas path",
)
def mm_image_byte_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.image_byte_stats_arrow(load_table(spark, sf_dir, "documents"))


@register(
    "mm_image_ahash_pairs",
    oracle=M.image_ahash_pairs_oracle(),
    description="image near-dup candidates by perceptual average-hash blocking: "
    "16-bit aHash per image (strictly-brighter-than-floor-mean bits, exact integer "
    "math, vectorized numpy over Arrow mapInPandas), then a bucket equi-join on the "
    "hash — the image-side mirror of the SimHash table, never an all-pairs cross; "
    "closed-form hex oracle",
)
def mm_image_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.image_ahash_pairs(load_table(spark, sf_dir, "documents"))
