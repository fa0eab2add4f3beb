"""Zero-extra-scan pipeline observability (``Dataset.observe``).

A 100 TB curation job cannot afford a second pass just to learn how
many rows a filter dropped; ``observe`` attaches named aggregate
metrics to a plan node and collects them as a side effect of the run
the job was already doing (public Spark ``Observation`` API — metrics
ride the existing tasks, no extra action, no extra scan).

Typical use::

    df, obs = observed(load_table(spark, sf, "documents"), "ingest")
    kept = curate(df)
    kept.write.parquet(out)          # the one and only scan
    m = obs.get                      # {'ingest.rows': ..., 'ingest.null_text': ...}

Batch only — streaming queries surface the same metrics through
``StreamingQueryProgress.observedMetrics`` instead of ``Observation``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame,
    name: str,
    *metrics: Column,
    null_check: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach row-count (always) plus optional custom aggregate metrics
    to ``df``; returns the instrumented frame and its ``Observation``.

    ``null_check``: convenience — also count NULLs in that column, the
    most common ingest-health probe."""
    cols = [F.count(F.lit(1)).alias("rows"), *metrics]
    if null_check is not None:
        cols.append(
            F.sum(F.when(F.col(null_check).isNull(), 1).otherwise(0)).alias(
                f"null_{null_check}"
            )
        )
    obs = Observation(name)
    return df.observe(obs, *cols), obs


def funnel(*stages: tuple[str, DataFrame]) -> tuple[list[DataFrame], list[Observation]]:
    """Instrument a chain of progressively-filtered frames so one action
    yields the whole keep/drop funnel (rows surviving each stage)."""
    out_dfs: list[DataFrame] = []
    out_obs: list[Observation] = []
    for name, df in stages:
        d, o = observed(df, name)
        out_dfs.append(d)
        out_obs.append(o)
    return out_dfs, out_obs
