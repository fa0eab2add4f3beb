"""Streaming KLL quantile view — a mergeable quantile sketch maintained
as versioned micro-batch state (fourteenth gated streaming class).

The batch operators (``operators/stats.py::kll_quantile_profile`` /
``_merged``) build the sketch in one pass / one merge level; here each
micro-batch builds a |batch|-local KLL sketch and merges it into the
accumulated state sketch — the property that makes KLL THE streaming
quantile structure at 100 TB/day: state is one fixed-size sketch (k=200
⇒ ~a few KB) regardless of stream length, and per-batch cost is
|batch| + one 2-row merge.  Exact ``percentile`` as streaming state
would hold every value ever seen.

State follows the keep-2 replay-idempotent version discipline of
``streaming/scd2.py``: one (sk BINARY, n BIGINT) row per committed
``v=<batch_id>`` dir, each batch merging against the version strictly
below its own id, so a crash-replayed batch re-derives (never
double-counts) its contribution.

The gate: the final state sketch's quantile estimates must satisfy the
SAME rank-error band as the batch build (est(q) ∈ [exact(q−ε),
exact(q+ε)]), so the registered query shares
``kll_quantile_profile_oracle`` with the batch form — streamed
maintenance == batch build == plain-SQL oracle, the CMS-streamed
discipline applied to quantiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.streaming.graph import (
    _latest_version,
    _prune_versions,
)

#: Schema of staged value-feed files.
VALUE_SCHEMA = "event_id LONG, value DOUBLE"


def value_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source value stream, one staged file per micro-batch."""
    return (
        spark.readStream.schema(VALUE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def kll_apply_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    batch_ids: list[int] | None = None,
) -> None:
    """Drain ``stream`` (availableNow) into the versioned KLL state:
    per batch, one |batch|-local sketch agg + a ≤2-row merge agg.
    Blocks until drained."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_ids is not None:
            batch_ids.append(batch_id)
        bsk = batch_df.selectExpr("CAST(value AS DOUBLE) AS x").agg(
            F.expr("kll_sketch_agg_double(x)").alias("sk"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        )
        prev = _latest_version(state_dir, below=batch_id)
        if prev is not None:
            old = spark.read.parquet(f"{state_dir}/v={prev}")
            merged = old.select("sk", "n").unionByName(bsk).agg(
                F.expr("kll_merge_agg_double(sk)").alias("sk"),
                F.expr("CAST(SUM(n) AS BIGINT)").alias("n"),
            )
        else:
            merged = bsk
        merged.write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")
        _prune_versions(state_dir)

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def kll_profile_from_state(
    spark: SparkSession,
    state_dir: str,
    df: DataFrame,
    value_col: str,
    probes: tuple[float, ...] | None = None,
    eps: float = 0.02,
) -> DataFrame:
    """(q, n, exact_q, kll_ok) readout of the drained state sketch —
    the batch profile's contract, with the sketch coming from streaming
    state and the exact companions from the replayed table (the gate's
    cost, exactly the kll/theta discipline)."""
    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        _KLL_PROBES,
        _kll_probe_readout,
    )

    probes = probes or _KLL_PROBES
    v = _latest_version(state_dir)
    if v is None:
        raise FileNotFoundError(f"no KLL state at {state_dir}")
    state = spark.read.parquet(f"{state_dir}/v={v}").select("sk")
    lohiq = []
    for q in probes:
        lohiq += [max(0.0, q - eps), q, min(1.0, q + eps)]
    arr = ", ".join(f"CAST({v_!r} AS DOUBLE)" for v_ in lohiq)
    exact = df.selectExpr(f"CAST({value_col} AS DOUBLE) AS x").agg(
        F.expr(f"percentile(x, array({arr}))").alias("ex"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
    )
    one = exact.crossJoin(F.broadcast(state))  # 1 × 1 declared cross
    return _kll_probe_readout(one, probes)
