"""Lazy localCheckpoint with plan-history severance — the shared form
of ``operators/graph_iter._ckpt`` (see that docstring for the measured
round-8 exponential the bare-LogicalRDD rebuild prevents, and the
round-12 measurements extending it to non-iterative reuse barriers:
ann_mmr_topk 2.44→2.11 s, dedup_semantic 5.56→4.72 s,
ann_topk_ivf_kmeans 2.83→2.26 s warm — the origin-capture cost is paid
per ``localCheckpoint`` CALL, loops or not).

Trade-off to know before swapping a site: the bare rebuild drops the
origin dataset's CAPTURED STATS, so the static planner can no longer
prove the checkpointed frame small enough to auto-broadcast (AQE still
converts at runtime from actual shuffle sizes, and explicit
``F.broadcast`` pins are unaffected).  Sites whose downstream joins
rely on static auto-broadcast of the checkpointed side should keep the
plain form — which is why call sites opt in one by one, with an A/B,
rather than via a global swap.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

#: count of successful bare-LogicalRDD rebuilds (pinned by test — a
#: Spark upgrade that drops the private API must fail loudly)
_FAST_PATH_USES = 0
_FALLBACK_WARNED = False


def lazy_ckpt(df: DataFrame) -> DataFrame:
    """Rebuild a bare ``LogicalRDD`` from ``df``'s physical RDD (no
    origin-state capture) and lazily localCheckpoint THAT.  Values and
    schema are byte-identical to ``df.localCheckpoint(eager=False)``;
    only the captured optimizer state (and its per-call cost) is shed.
    Degrades loudly to the plain form if the private API drifts."""
    global _FAST_PATH_USES, _FALLBACK_WARNED
    spark = df.sparkSession
    try:
        jdf = df._jdf
        jrdd = jdf.queryExecution().toRdd()
        j2 = spark._jsparkSession.internalCreateDataFrame(jrdd, jdf.schema(), False)
        df = DataFrame(j2, spark)
        _FAST_PATH_USES += 1
    except Exception as exc:  # private-API drift fallback
        if not _FALLBACK_WARNED:
            _FALLBACK_WARNED = True
            warnings.warn(
                "lazy_ckpt bare-LogicalRDD rebuild unavailable"
                f" ({type(exc).__name__}: {exc}); falling back to plain"
                " localCheckpoint — reuse barriers regain the captured"
                " optimizer-state cost this fast path removes",
                RuntimeWarning,
                stacklevel=2,
            )
    return df.localCheckpoint(eager=False)
