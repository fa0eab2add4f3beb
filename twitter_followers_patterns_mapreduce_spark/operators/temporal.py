"""Temporal join operators over the ``events`` table — as-of join and
range join, the two event-time joins Spark lacks as built-ins.

The reference is batch-only with no time semantics (SURVEY.md §2.7);
these extend the engine's event-time surface (windows/sessionize in
``operators/events.py``) with the join forms an LLM-training-data
pipeline needs for attribution and leakage checks.

Scale design (the whole point — a naive formulation of either is a
per-user cross join):

* **as-of join**: no join at all.  Union the left and right streams,
  shuffle ONCE by ``user_id``, and carry the right side forward with
  ``last(value, ignorenulls=True)`` over an ordered window.  This is
  the merge-join formulation every kdb/TimescaleDB as-of implementation
  uses, expressed as one Spark window — O(n log n) per user partition,
  zero candidate pairs materialized.  Skewed users are bounded by the
  window sort, not a pair blow-up.
* **range join**: candidate generation must be an equi-join, never an
  inequality-only theta join (Spark would pick
  BroadcastNestedLoopJoin — O(n·m)).  Bucket time into
  ``window_us``-wide bins; a right row in bin b can only pair with left
  rows in bins {b-1, b} , so explode the left side to 2 candidate bins,
  equi-join on (user_id, bin), then apply the exact range predicate.
  Candidates are within 2× of the true pairs, independent of data size.

Cross-engine notes (oracle determinism): tie-breaks are total —
(ts, kind, event_id) — so ``last_value IGNORE NULLS`` agrees between
Spark and DuckDB; lags cross the boundary as integer-microsecond
differences floor-divided to seconds, never as doubles or timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: attribution window for the range join: right event within 4 hours
#: AFTER the left event (wide enough for ~80 matched users at sf0.01).
RANGE_WINDOW_US = 14_400 * 1_000_000


def asof_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """For each ``left_type`` event, attach the most recent
    ``right_type`` event of the same user with ``r.ts <= l.ts``
    (inclusive; ties among rights broken by highest event_id).

    Returns (event_id, user_id, left_value, asof_value, asof_lag_s);
    lefts with no prior right keep NULLs (left-outer as-of).
    """
    t = F.unix_micros(F.col("ts"))
    left = events.where(F.col("event_type") == left_type).select(
        "user_id",
        t.alias("t_us"),
        "event_id",
        F.lit(1).alias("kind"),
        F.col("value").alias("l_value"),
        F.lit(None).cast("double").alias("r_value"),
        F.lit(None).cast("long").alias("r_us"),
    )
    right = events.where(F.col("event_type") == right_type).select(
        "user_id",
        t.alias("t_us"),
        "event_id",
        F.lit(0).alias("kind"),
        F.lit(None).cast("double").alias("l_value"),
        F.col("value").alias("r_value"),
        t.alias("r_us"),
    )
    # kind=0 sorts before kind=1 at equal ts → a right event at exactly
    # l.ts is visible to the left row (inclusive as-of).
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).select(
        "user_id",
        "t_us",
        "event_id",
        "kind",
        "l_value",
        F.last("r_value", ignorenulls=True).over(w).alias("asof_value"),
        F.last("r_us", ignorenulls=True).over(w).alias("asof_us"),
    )
    return merged.where(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        F.col("l_value").alias("left_value"),
        "asof_value",
        F.expr("(t_us - asof_us) div 1000000").cast("long").alias("asof_lag_s"),
    )


def asof_join_oracle(left_type: str = "purchase", right_type: str = "click") -> str:
    """DuckDB oracle: identical union + last_value IGNORE NULLS window
    (DuckDB's native ASOF JOIN has no deterministic tie-break, so the
    oracle mirrors the merge formulation instead)."""
    return f"""WITH u AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, 1 AS kind,
         value AS l_value, CAST(NULL AS DOUBLE) AS r_value, CAST(NULL AS BIGINT) AS r_us
  FROM events WHERE event_type = '{left_type}'
  UNION ALL
  SELECT user_id, epoch_us(ts) AS t_us, event_id, 0 AS kind,
         CAST(NULL AS DOUBLE) AS l_value, value AS r_value, epoch_us(ts) AS r_us
  FROM events WHERE event_type = '{right_type}'
), m AS (
  SELECT user_id, t_us, event_id, kind, l_value,
    last_value(r_value IGNORE NULLS) OVER w AS asof_value,
    last_value(r_us IGNORE NULLS) OVER w AS asof_us
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY t_us, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, l_value AS left_value, asof_value,
  CAST((t_us - asof_us) // 1000000 AS BIGINT) AS asof_lag_s
FROM m WHERE kind = 1"""


def range_join_attribution(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    window_us: int = RANGE_WINDOW_US,
) -> DataFrame:
    """Per-user attribution counts for (left, right) event pairs with
    ``l.ts <= r.ts < l.ts + window_us``.

    Candidate generation is an equi-join on (user_id, time_bin): the
    left side is exploded to the two bins its window can reach, so the
    plan is scan → explode(2) → shuffle hash join → filter, never a
    nested-loop theta join.  Returns
    (user_id, n_pairs, n_right_attributed).
    """
    t = F.unix_micros(F.col("ts"))
    left = events.where(F.col("event_type") == left_type).select(
        F.col("user_id").alias("l_user"),
        t.alias("l_us"),
    )
    # a left at bin b pairs with rights in bins {b, b+1}: emit both keys.
    # Integer `div`, not double `/`: epoch micros ≈ 1.7e15 sit near the
    # 2^53 double mantissa edge where float bins can misassign rows.
    lbin = F.expr(f"l_us div {window_us}")
    left_binned = left.withColumn("l_bin", F.explode(F.array(lbin, lbin + F.lit(1))))
    right = events.where(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"),
        t.alias("r_us"),
        F.col("event_id").alias("r_event_id"),
    ).withColumn("r_bin", F.expr(f"r_us div {window_us}"))
    pairs = left_binned.join(
        right,
        (F.col("l_user") == F.col("r_user")) & (F.col("l_bin") == F.col("r_bin")),
    ).where((F.col("r_us") >= F.col("l_us")) & (F.col("r_us") - F.col("l_us") < window_us))
    return pairs.groupBy(F.col("l_user").alias("user_id")).agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("r_event_id").alias("n_right_attributed"),
    )


def range_join_oracle(
    left_type: str = "view",
    right_type: str = "purchase",
    window_us: int = RANGE_WINDOW_US,
) -> str:
    """DuckDB oracle: the plain inequality join (fine at sf0.01; DuckDB
    plans IEJoin for range predicates)."""
    return f"""SELECT l.user_id AS user_id,
  COUNT(*) AS n_pairs,
  COUNT(DISTINCT r.event_id) AS n_right_attributed
FROM (SELECT * FROM events WHERE event_type = '{left_type}') l
JOIN (SELECT * FROM events WHERE event_type = '{right_type}') r
  ON l.user_id = r.user_id
 AND epoch_us(r.ts) >= epoch_us(l.ts)
 AND epoch_us(r.ts) - epoch_us(l.ts) < {window_us}
GROUP BY 1"""


def multitouch_attribution(
    events: DataFrame,
    touch_type: str = "view",
    convert_type: str = "purchase",
    window_us: int = RANGE_WINDOW_US,
) -> DataFrame:
    """Linear multi-touch revenue attribution: each conversion's value
    splits EQUALLY across its preceding touches within the window
    (``t.ts <= c.ts < t.ts + window``), and credited revenue rolls up
    by touch hour-of-day — the marketing-analytics staple one level up
    from :func:`range_join_attribution`'s pair counts (first/last-touch
    are the n=1 degenerate cases; linear is the one that needs the
    credit-splitting machinery).

    Plan shape: same time-bin equi-join candidate generation as the
    range join (explode×2 on the touch side, never a nested-loop theta
    join), then ONE window count per conversion (partitioned by the
    conversion's event_id — bounded per-user fan-in, no global sort)
    and a 24-row hash agg.

    Exactness: credit = value / n_touches is one closed-form double
    division, immediately rounded to micro-units BIGINT per pair and
    summed exactly — double-sum order-dependence never reaches the
    comparable output.  Output (≤ 24 rows): (touch_hour, n_touches,
    credited_revenue).
    """
    t = F.unix_micros(F.col("ts"))
    touch = events.where(F.col("event_type") == touch_type).select(
        F.col("user_id").alias("t_user"),
        t.alias("t_us"),
    )
    tbin = F.expr(f"t_us div {window_us}")
    touch_binned = touch.withColumn("t_bin", F.explode(F.array(tbin, tbin + F.lit(1))))
    conv = events.where(F.col("event_type") == convert_type).select(
        F.col("user_id").alias("c_user"),
        t.alias("c_us"),
        F.col("event_id").alias("c_event_id"),
        F.col("value").alias("c_value"),
    ).withColumn("c_bin", F.expr(f"c_us div {window_us}"))
    pairs = touch_binned.join(
        conv,
        (F.col("t_user") == F.col("c_user")) & (F.col("t_bin") == F.col("c_bin")),
    ).where((F.col("c_us") >= F.col("t_us")) & (F.col("c_us") - F.col("t_us") < window_us))
    w = Window.partitionBy("c_event_id")
    credited = pairs.select(
        F.hour(F.timestamp_micros(F.col("t_us"))).cast("int").alias("touch_hour"),
        (F.col("c_value") / F.count("*").over(w)).alias("credit"),
    ).selectExpr(
        "touch_hour",
        "CAST(round(credit * 1000000) AS BIGINT) AS credit_micro",
    )
    return credited.groupBy("touch_hour").agg(
        F.count("*").cast("long").alias("n_touches"),
        F.expr("floor(CAST(SUM(credit_micro) AS DOUBLE)) / 1000000").alias(
            "credited_revenue"
        ),
    )


def multitouch_attribution_oracle(
    touch_type: str = "view",
    convert_type: str = "purchase",
    window_us: int = RANGE_WINDOW_US,
) -> str:
    return f"""WITH pairs AS (
  SELECT epoch_us(t.ts) AS t_us, c.event_id AS c_event_id, c.value AS c_value
  FROM (SELECT * FROM events WHERE event_type = '{touch_type}') t
  JOIN (SELECT * FROM events WHERE event_type = '{convert_type}') c
    ON t.user_id = c.user_id
   AND epoch_us(c.ts) >= epoch_us(t.ts)
   AND epoch_us(c.ts) - epoch_us(t.ts) < {window_us}),
credited AS (
  SELECT CAST(hour(make_timestamp(t_us)) AS INT) AS touch_hour,
         CAST(round(c_value / (COUNT(*) OVER (PARTITION BY c_event_id)) * 1000000)
              AS BIGINT) AS credit_micro
  FROM pairs)
SELECT touch_hour,
  CAST(COUNT(*) AS BIGINT) AS n_touches,
  floor(CAST(SUM(credit_micro) AS DOUBLE)) / 1000000 AS credited_revenue
FROM credited GROUP BY 1"""
