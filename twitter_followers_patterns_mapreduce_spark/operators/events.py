"""Event-time operators over the ``events`` table — tumbling/sliding
windows, sessionization, JSON prop extraction.  Batch forms here; the
structured-streaming forms (same logical aggregations with watermarks)
live in ``streaming/windows.py``.

The reference is batch-only with no time semantics (SURVEY.md §2.7);
this is the engine's event-time extension surface.

Cross-engine notes: window starts are emitted as formatted strings
(timestamps never cross the oracle boundary as raw values — Spark
session TZ is pinned UTC, DuckDB is UTC-naive); double sums go through
DECIMAL for exact aggregation; gap comparisons use integer epoch
microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(18,6)"
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _dec_sum(col: str) -> F.Column:
    return F.sum(F.col(col).cast(DEC)).cast("double")


def tumbling_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type via Spark's native
    ``window()`` (epoch-aligned), start emitted as a string key."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _dec_sum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


TUMBLING_HOURLY_ORACLE = f"""SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2"""


def sliding_1h_30m(events: DataFrame) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide) — each event lands in two
    windows; Spark's ``window()`` enumerates them natively."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), _dec_sum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


#: Spark's sliding windows are epoch-aligned: an event at t belongs to the
#: windows starting at floor30(t) and floor30(t) − 30 min.
#: NB: ``epoch_us`` (integer micros) — ``epoch(ts)::BIGINT`` would ROUND
#: fractional seconds and misassign boundary-adjacent events.
SLIDING_ORACLE = f"""WITH starts AS (
  SELECT to_timestamp((epoch_us(ts) // 1800000000) * 1800) AS w0, value FROM events
), expanded AS (
  SELECT w0 AS wstart, value FROM starts
  UNION ALL
  SELECT w0 - INTERVAL 30 MINUTE AS wstart, value FROM starts
)
SELECT strftime(wstart, '{TS_FMT_DUCK}') AS window_start,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM expanded GROUP BY 1"""


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Per-user sessionization: a new session starts when the gap to the
    previous event exceeds ``gap_us``.  Classic lag + running-sum window
    pair; output one row per session."""
    w_user = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    t = F.unix_micros(F.col("ts"))
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(t - F.lag(t).over(w_user) > gap_us, 1).otherwise(0).alias("new_session"),
    )
    sessioned = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), TS_FMT_SPARK).alias("session_start"),
            F.count("*").alias("n_events"),
            ((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / F.lit(1_000_000))
            .cast("long")
            .alias("duration_sec"),
        )
        .select("user_id", F.col("session_seq").cast("long").alias("session_seq"),
                "session_start", "n_events", "duration_sec")
    )


SESSIONIZE_ORACLE = f"""WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessioned AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
  strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
  COUNT(*) AS n_events,
  CAST((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS BIGINT) AS duration_sec
FROM sessioned GROUP BY user_id, session_seq"""


def session_window_native(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions via Spark's NATIVE ``session_window`` operator —
    the same gap semantics :func:`sessionize` builds from lag+running-sum,
    expressed as a single groupBy (and the form that carries over to
    Structured Streaming unchanged, where the window-pair form cannot).

    Boundary pinned for the oracle (and by test): an event exactly
    ``gap`` after the previous one EXTENDS the session — session_window
    treats its end as inclusive for merging — so the oracle uses the
    same strict ``>`` as :data:`SESSIONIZE_ORACLE`.  Session end =
    last event + gap, truncated to seconds on output.
    """
    sw = F.session_window("ts", gap)
    return (
        events.groupBy(sw.alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", TS_FMT_SPARK).alias("session_start"),
            F.date_format("sw.end", TS_FMT_SPARK).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_window_oracle(gap_minutes: int = 30) -> str:
    """Oracle for :func:`session_window_native`, generated from the SAME
    gap parameter — a hard-coded interval silently invalidates the pair
    for any non-default gap."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""WITH flagged AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {gap_us} THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessioned AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id,
  strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
  strftime(MAX(ts) + INTERVAL {gap_minutes} MINUTE, '{TS_FMT_DUCK}') AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sessioned GROUP BY user_id, session_seq"""


#: default-gap instance kept for existing callers
SESSION_WINDOW_ORACLE = session_window_oracle(30)


def json_prop_stats(events: DataFrame) -> DataFrame:
    """Extract the integer ``k`` from the JSON ``props`` column and
    aggregate per event_type — semi-structured column handling."""
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


JSON_PROP_ORACLE = """SELECT event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type"""


def user_interaction_edges(events: DataFrame, modulus: int = 997) -> DataFrame:
    """Derive a user-interaction edge table from the event stream
    (consecutive events by the same user_id bucket → edge), feeding the
    graph operators — demonstrates the edge-table abstraction is source-
    agnostic exactly like the reference's CSV input.

    Thin view over :func:`temporal_edges` (single source of truth for
    the derivation): dropping the first-seen timestamp leaves exactly
    the distinct edge set."""
    return temporal_edges(events, modulus).select("src", "dst")


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_decile_type_pivot(events: DataFrame) -> DataFrame:
    """Pivot event counts into one column per event type, per user
    decile.  The pivot values are DECLARED (not discovered) so the
    plan is a single groupBy with conditional aggregates — no extra
    distinct-scan job, and the 100 TB plan shape is one shuffle."""
    decile = F.pmod(F.col("user_id"), F.lit(10)).cast("long")
    pivoted = (
        events.select(decile.alias("user_decile"), "event_type")
        .groupBy("user_decile")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    # Spark's pivot leaves NULL in a declared cell with zero matching
    # rows (PivotFirst over per-value pre-aggregates); the SQL
    # COUNT(*) FILTER form yields 0 — fill so sparse data can't diverge
    # from the oracle (or hand a consumer NULL where 0 is meant)
    return pivoted.na.fill(0, list(EVENT_TYPES))


USER_DECILE_PIVOT_ORACLE = """SELECT user_id % 10 AS user_decile,
  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
  COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY 1"""


def typed_json_props(events: DataFrame) -> DataFrame:
    """Parse ``props`` once into a typed struct with ``from_json`` and
    aggregate on the struct field — schema-on-read for semi-structured
    columns (vs per-access ``get_json_object`` re-parsing)."""
    parsed = events.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("p.k").alias("n_with_k"),
        F.sum(F.col("p.k").cast("long")).alias("sum_k"),
        F.max("p.k").cast("long").alias("max_k"),
    )


TYPED_JSON_ORACLE = """SELECT event_type,
  COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type"""


def type_streaks(events: DataFrame) -> DataFrame:
    """Longest run of CONSECUTIVE same-type events per (user, type) —
    the gaps-and-islands window idiom: two row_numbers (global per user
    vs per (user, type)) differ by a constant within an unbroken run,
    so their difference is the island key; one more aggregate gets run
    lengths.  Streak analytics (failed-login runs, repeated-action
    bursts) with zero self-joins.

    Plan: both row_numbers share ONE window partition (user_id) — a
    single shuffle + per-partition sort feeds the whole query; islands
    and maxima are hash aggregates on top.
    """
    w_user = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_ut = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    islands = events.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_user) - F.row_number().over(w_ut)).alias("island"),
    )
    runs = islands.groupBy("user_id", "event_type", "island").agg(
        F.count("*").alias("run_len")
    )
    return runs.groupBy("user_id", "event_type").agg(
        F.max("run_len").cast("long").alias("max_streak"),
        F.count("*").cast("long").alias("n_runs"),
    )


TYPE_STREAKS_ORACLE = """WITH islands AS (
  SELECT user_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC)
      AS island
  FROM events
), runs AS (
  SELECT user_id, event_type, island, COUNT(*) AS run_len
  FROM islands GROUP BY user_id, event_type, island
)
SELECT user_id, event_type,
  CAST(MAX(run_len) AS BIGINT) AS max_streak,
  CAST(COUNT(*) AS BIGINT) AS n_runs
FROM runs GROUP BY user_id, event_type"""


def funnel_conversion(
    events: DataFrame,
    first_step: str = "click",
    convert_step: str = "purchase",
    window_us: int = 3_600_000_000,
) -> DataFrame:
    """First-touch funnel: per user-decile cohort, how many users had a
    ``first_step`` event and how many converted with a ``convert_step``
    within ``window_us`` AFTER their FIRST ``first_step``.

    Two hash aggregates and one equi-join, all keyed on user_id — the
    first-touch aggregate collapses each user to one row BEFORE the
    join, so the conversion probe joins |users| × |convert events of
    one type|, never event × event.
    """
    firsts = (
        events.where(F.col("event_type") == first_step)
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("first_us"))
    )
    conv = events.where(F.col("event_type") == convert_step).select(
        "user_id", F.unix_micros("ts").alias("conv_us")
    )
    per_user = (
        firsts.join(conv, "user_id", "left")
        .groupBy("user_id", "first_us")
        .agg(
            F.max(
                F.when(
                    (F.col("conv_us") > F.col("first_us"))
                    & (F.col("conv_us") <= F.col("first_us") + window_us),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return (
        per_user.groupBy((F.col("user_id") % 10).cast("long").alias("user_decile"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.round(F.sum("converted") / F.count("*"), 6).alias("conversion_rate"),
        )
    )


FUNNEL_ORACLE = """WITH firsts AS (
  SELECT user_id, MIN(epoch_us(ts)) AS first_us
  FROM events WHERE event_type = 'click' GROUP BY user_id
), per_user AS (
  SELECT f.user_id, f.first_us,
    MAX(CASE WHEN c.conv_us > f.first_us AND c.conv_us <= f.first_us + 3600000000
             THEN 1 ELSE 0 END) AS converted
  FROM firsts f
  LEFT JOIN (SELECT user_id, epoch_us(ts) AS conv_us FROM events
             WHERE event_type = 'purchase') c ON f.user_id = c.user_id
  GROUP BY f.user_id, f.first_us
)
SELECT CAST(user_id % 10 AS BIGINT) AS user_decile,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(converted) AS BIGINT) AS n_converted,
  round(SUM(converted) / COUNT(*), 6) AS conversion_rate
FROM per_user GROUP BY user_id % 10"""


def gapfill_hourly(events: DataFrame) -> DataFrame:
    """Time-series gap filling: a dense hourly spine per event type
    with zero-filled counts — the resample/asfreq primitive every
    time-series stack needs and plain GROUP BY can't produce (groups
    with no rows don't exist to group).

    Plan shape: a 1-row global agg pins the corpus's [min, max] hour
    span; ``sequence()`` + ``explode`` generates the spine rows
    engine-side (never a driver loop), the distinct type list
    cross-joins it (broadcast — both sides are dimension-sized), and
    the observed hourly counts LEFT-join the spine on the (hour, type)
    equi-key.  At 100 TB the spine is |hours|·|types| rows — tiny next
    to the fact table — so the only real shuffle is the counts agg.
    NB in the LEFT join it is the COUNTS side that broadcasts (Spark
    cannot build the preserved left side of a left-outer broadcast hash
    join) — fine, since the counts aggregate is itself bounded by
    |hours|·|types|.

    The reference has no temporal surface at all (SURVEY.md §2.5);
    this extends the event-window family (`tumbling_hourly`)."""
    span = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine_hours = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    )
    types = events.select("event_type").distinct()
    spine = spine_hours.crossJoin(F.broadcast(types))
    counts = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    return (
        spine.join(counts, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        )
    )


GAPFILL_HOURLY_ORACLE = """WITH span AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
), spine_hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM span
), spine AS (
  SELECT h.hour, t.event_type
  FROM spine_hours h CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), counts AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT s.hour, s.event_type,
       COALESCE(c.n_events, 0) AS n_events,
       COALESCE(c.sum_value, 0.0) AS sum_value
FROM spine s LEFT JOIN counts c ON s.hour = c.hour AND s.event_type = c.event_type"""


def value_moving_1h(events: DataFrame) -> DataFrame:
    """Trailing 1-hour per-user moving aggregate via a RANGE window
    frame — the time-interval frame ROWS BETWEEN cannot express (rows
    at irregular timestamps; the frame is defined by VALUE distance,
    not row count).

    Plan shape: one shuffle on user_id, one per-partition sort by the
    epoch-seconds order key; the RANGE frame is evaluated by a sliding
    aggregate over the sorted run.  Partitioned by user (never a
    global window); the sum reduces in DECIMAL so the emitted value is
    order-exact cross-engine."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3599, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_1h"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count("*").over(w),
            6,
        ).alias("avg_1h"),
    )


#: NB the order key must FLOOR to whole seconds exactly like Spark's
#: ``ts.cast("long")`` — ``CAST(epoch(ts) AS BIGINT)`` ROUNDS fractional
#: seconds (the epoch-vs-epoch_us trap at the top of this module), which
#: shifts the RANGE-frame key for sub-second timestamps and flips frame
#: membership at the 3599s boundary.  epoch_us // 1_000_000 floors.
VALUE_MOVING_1H_ORACLE = """SELECT event_id, user_id, ts,
  COUNT(*) OVER w AS n_1h,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h,
  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
        / COUNT(*) OVER w, 6) AS avg_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)"""


def variant_prop_deciles(events: DataFrame) -> DataFrame:
    """Semi-structured access through the Spark 4 VARIANT type:
    ``parse_json`` ingests ``props`` ONCE into the binary variant
    encoding (no declared schema — the schema-free dual of
    :func:`typed_json_props`), ``variant_get`` does typed path access.

    At scale this is the open-table-format "shredding" story: variant
    columns store parsed binary (no per-query JSON re-parse), and typed
    ``variant_get`` paths can push into the scan.  Aggregation buckets
    k into deciles — count + exact sum per (event_type, k decile)."""
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy(
            "event_type", (F.col("k") - F.col("k") % 10).cast("long").alias("k_decile")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
        )
    )


VARIANT_PROP_DECILES_ORACLE = """SELECT event_type,
  CAST(k - (k % 10) AS BIGINT) AS k_decile,
  COUNT(*) AS n_events,
  CAST(SUM(k) AS BIGINT) AS sum_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
WHERE k IS NOT NULL
GROUP BY 1, 2"""


def hourly_anomaly_zscores(events: DataFrame, trail: int = 24, min_hours: int = 12) -> DataFrame:
    """Per-type hourly anomaly scores over the GAP-FILLED series: each
    hour's event count z-scored against its trailing ``trail``-hour
    window (population stddev).  Composes :func:`gapfill_hourly` —
    without the dense spine, silent hours are missing rows and a quiet
    anomaly can never score.

    Exactness: counts are integers, so the window's Σx and Σx² are
    exact LONG sums; mean/variance/z are then a fixed expression tree
    of IEEE double ops on identical integers in both engines (no float
    accumulation), emitted at 6 dp.  Hours with fewer than
    ``min_hours`` of history or zero variance emit NULL z.

    Scale: one window shuffle partitioned by event_type over the
    |hours|x|types| spine — dimension-sized regardless of fact-table
    size; the heavy lifting happened in the gapfill counts agg."""
    filled = gapfill_hourly(events)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-(trail - 1), Window.currentRow)
    )
    sx = F.sum("n_events").over(w).cast("long")
    # square in DECIMAL: n_events * n_events in BIGINT silently wraps in
    # Spark (and errors in DuckDB) once an hour exceeds ~3.0e9 events —
    # decimal(19,0)^2 -> decimal(38,0), exact at any realistic count
    sq = (F.col("n_events").cast("decimal(19,0)") * F.col("n_events").cast("decimal(19,0)"))
    sxx = F.sum(sq).over(w)
    cnt = F.count("*").over(w).cast("long")
    mean = sx.cast("double") / cnt.cast("double")
    var = sxx.cast("double") / cnt.cast("double") - mean * mean
    z = F.when(
        (cnt >= min_hours) & (var > 0),
        F.round((F.col("n_events").cast("double") - mean) / F.sqrt(var), 6),
    )
    return filled.select(
        "hour",
        "event_type",
        "n_events",
        cnt.alias("n_hours"),
        F.round(mean, 6).alias("trailing_mean"),
        z.alias("zscore"),
    )


def hourly_anomaly_oracle(trail: int = 24, min_hours: int = 12) -> str:
    return f"""WITH filled AS ({GAPFILL_HOURLY_ORACLE}),
win AS (
  SELECT hour, event_type, n_events,
    CAST(SUM(n_events) OVER w AS BIGINT) AS sx,
    SUM(CAST(n_events AS DECIMAL(19,0)) * CAST(n_events AS DECIMAL(19,0))) OVER w AS sxx,
    CAST(COUNT(*) OVER w AS BIGINT) AS n_hours
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {trail - 1} PRECEDING AND CURRENT ROW)
)
SELECT hour, event_type, n_events, n_hours,
  round(CAST(sx AS DOUBLE) / n_hours, 6) AS trailing_mean,
  CASE WHEN n_hours >= {min_hours}
        AND CAST(sxx AS DOUBLE) / n_hours
            - (CAST(sx AS DOUBLE) / n_hours) * (CAST(sx AS DOUBLE) / n_hours) > 0
       THEN round((CAST(n_events AS DOUBLE) - CAST(sx AS DOUBLE) / n_hours)
                  / sqrt(CAST(sxx AS DOUBLE) / n_hours
                         - (CAST(sx AS DOUBLE) / n_hours) * (CAST(sx AS DOUBLE) / n_hours)), 6)
  END AS zscore
FROM win"""


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, then
    for each (cohort_week, week_offset) the count of distinct users
    active again that week — the classic product-analytics retention
    triangle, with retention as an exact bigint/bigint share.

    Shape: two hash aggregations and one join, never event×event —
    (1) first week per user (min-agg on user), (2) distinct
    (user, week) activity, (3) activity ⋈ first-week on user (the
    cohort side is user-keyed and co-partitions with activity), then
    the (cohort, offset) rollup.  Week truncation is ISO-Monday in both
    engines (verified); offsets are exact integer day arithmetic."""
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = (
        events.select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
        .distinct()
    )
    joined = active.join(first, "user_id").select(
        "user_id",
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("long").alias("week_offset"),
    )
    cohort_sizes = first.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    cells = joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    return (
        cells.join(cohort_sizes, "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )


RETENTION_COHORTS_ORACLE = """WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
), joined AS (
  SELECT a.user_id, f.cohort_week,
         CAST(date_diff('day', f.cohort_week, a.week) // 7 AS BIGINT) AS week_offset
  FROM active a JOIN first f USING (user_id)
), sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM first GROUP BY cohort_week
), cells AS (
  SELECT cohort_week, week_offset, COUNT(DISTINCT user_id) AS n_active
  FROM joined GROUP BY cohort_week, week_offset
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       c.week_offset, c.n_active, s.cohort_size,
       round(CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 6) AS retention
FROM cells c JOIN sizes s USING (cohort_week)"""


def type_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: counts and probabilities of (event_type → next
    event_type) — the sequence-model statistic behind next-action
    prediction and funnel diagnostics.

    One partitioned LEAD window per user (total order by (ts,
    event_id)), one hash agg; row probabilities are exact
    bigint/bigint divisions attached by a broadcast per-source-type
    total join."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    steps = (
        events.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    cells = steps.groupBy("from_type", "to_type").agg(F.count("*").alias("n_transitions"))
    totals = steps.groupBy("from_type").agg(F.count("*").alias("n_from"))
    return cells.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "n_from",
        F.round(
            F.col("n_transitions").cast("double") / F.col("n_from").cast("double"), 6
        ).alias("p_transition"),
    )


TYPE_TRANSITION_ORACLE = """WITH steps AS (
  SELECT user_id, event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS to_type
  FROM events
), filtered AS (SELECT * FROM steps WHERE to_type IS NOT NULL),
cells AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions FROM filtered GROUP BY 1, 2
), totals AS (SELECT from_type, COUNT(*) AS n_from FROM filtered GROUP BY 1)
SELECT c.from_type, c.to_type, c.n_transitions, t.n_from,
  round(CAST(c.n_transitions AS DOUBLE) / CAST(t.n_from AS DOUBLE), 6) AS p_transition
FROM cells c JOIN totals t USING (from_type)"""


def temporal_edges(events: DataFrame, modulus: int = 997) -> DataFrame:
    """Timestamped interaction edges: the :func:`user_interaction_edges`
    derivation with the FIRST observation time retained per (src, dst)
    — the input a temporal-motif count needs (a plain edge set cannot
    say whether hop 2 happened after hop 1)."""
    w = Window.partitionBy(F.col("user_id") % 16).orderBy("ts", "event_id")
    src = (F.col("user_id") % modulus).cast("long")
    dst = (F.lead(F.col("user_id")).over(w) % modulus).cast("long")
    return (
        events.select(src.alias("src"), dst.alias("dst"), F.unix_micros("ts").alias("ts_us"))
        .where(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.min("ts_us").alias("ts_us"))
    )


def temporal_two_hop_count(
    events: DataFrame, window_us: int = 4 * 3600 * 1_000_000
) -> DataFrame:
    """Time-respecting 2-hop path count (temporal motif, Paranjape et
    al. WSDM'17): paths x→z→y where the second edge is observed AFTER
    the first and within ``window_us`` — the temporal upgrade of the
    reference's core 2-hop join (``exact/Exact2HopCount.java:61-69``):
    same center-node equi-join, plus the time-ordering theta conjunct
    evaluated inside it (exactly how the RS variant's x≠z round-trip
    filter rides the join, SURVEY.md F3).

    Scale: identical shuffle shape to ``two_hop_paths`` — the time
    conjunct prunes join output, never expands it; AQE splits hot
    center nodes the same way.  Integer microsecond arithmetic, no
    timestamp comparisons cross the engine boundary."""
    e = temporal_edges(events).localCheckpoint(eager=False)
    e1 = e.select(F.col("src").alias("x"), F.col("dst").alias("z"), F.col("ts_us").alias("t1"))
    e2 = e.select(F.col("src").alias("z"), F.col("dst").alias("y"), F.col("ts_us").alias("t2"))
    paths = e1.join(e2, "z").where(
        (F.col("y") != F.col("x"))
        & (F.col("t2") > F.col("t1"))
        & (F.col("t2") <= F.col("t1") + F.lit(window_us))
    )
    return paths.agg(
        F.count("*").cast("long").alias("n_temporal_two_hops"),
        F.countDistinct("z").cast("long").alias("n_active_intermediaries"),
    )


def temporal_two_hop_oracle(window_us: int = 4 * 3600 * 1_000_000) -> str:
    return f"""WITH raw AS (
  SELECT user_id % 997 AS src,
         LEAD(user_id % 997) OVER (PARTITION BY user_id % 16
                                   ORDER BY ts ASC, event_id ASC) AS dst,
         epoch_us(ts) AS ts_us
  FROM events
), e AS (
  SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
         MIN(ts_us) AS ts_us
  FROM raw WHERE dst IS NOT NULL AND src <> dst
  GROUP BY src, dst
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_temporal_two_hops,
       CAST(COUNT(DISTINCT e1.dst) AS BIGINT) AS n_active_intermediaries
FROM e e1 JOIN e e2 ON e1.dst = e2.src
WHERE e2.dst <> e1.src
  AND e2.ts_us > e1.ts_us
  AND e2.ts_us <= e1.ts_us + {window_us}"""


def hourly_anomaly_robust(events: DataFrame, z_cut: float = 3.5) -> DataFrame:
    """Robust (median/MAD) outlier detection over the gap-filled hourly
    series — the Iglewicz–Hoaglin modified z-score
    ``0.6745·(x − median) / MAD`` per event type, flagging hours above
    ``z_cut``.  The companion to :func:`hourly_anomaly_zscores`: a mean/
    stddev z-score is dragged toward the outliers it is hunting (one
    flash-crowd hour inflates σ and masks the next one); median and MAD
    have a 50% breakdown point, so the detector stays calibrated on
    spiky traffic.

    Exercises the grouped-agg pandas UDAF surface
    (``functions/udafs.py``) in a composed plan: gapfill → per-type
    UDAF aggregate (|types| rows) → broadcast join back → scan-side
    score.  The whole-group Arrow batch is per TYPE over the dense
    |hours| spine — dimension-sized, never fact-table-sized.  Hours
    with MAD = 0 emit NULL score (degenerate constant series).
    """
    from twitter_followers_patterns_mapreduce_spark.functions.udafs import (
        mad_udaf,
        median_udaf,
    )

    filled = gapfill_hourly(events)
    stats = filled.groupBy("event_type").agg(
        median_udaf("n_events").alias("type_median"),
        mad_udaf("n_events").alias("type_mad"),
    )
    x = F.col("n_events").cast("double")
    z = F.lit(0.6745) * (x - F.col("type_median")) / F.col("type_mad")
    return filled.join(F.broadcast(stats), "event_type").select(
        "hour",
        "event_type",
        "n_events",
        "type_median",
        "type_mad",
        F.when(F.col("type_mad") > 0, F.round(z, 6)).alias("robust_z"),
        F.when(F.col("type_mad") > 0, F.abs(z) > z_cut)
        .otherwise(F.lit(False))
        .alias("is_outlier"),
    )


def hourly_anomaly_robust_oracle(z_cut: float = 3.5) -> str:
    return f"""WITH filled AS ({GAPFILL_HOURLY_ORACLE}),
stats AS (
  SELECT event_type,
         median(n_events) AS type_median,
         mad(n_events) AS type_mad
  FROM filled GROUP BY event_type
)
SELECT f.hour, f.event_type, f.n_events, s.type_median, s.type_mad,
       CASE WHEN s.type_mad > 0
            THEN round(0.6745 * (CAST(f.n_events AS DOUBLE) - s.type_median) / s.type_mad, 6)
       END AS robust_z,
       CASE WHEN s.type_mad > 0
            THEN abs(0.6745 * (CAST(f.n_events AS DOUBLE) - s.type_median) / s.type_mad) > {z_cut}
            ELSE FALSE END AS is_outlier
FROM filled f JOIN stats s USING (event_type)"""


# ---------------------------------------------------------------------------
# Exact heavy hitters (Misra-Gries candidates + exact recount)
# ---------------------------------------------------------------------------

def heavy_hitters(events: DataFrame, phi: float = 0.008) -> DataFrame:
    """EXACT φ-heavy-hitters over ``user_id`` — every user generating
    more than ``φ·N`` events — via the classic two-pass candidate /
    verify pattern (Misra-Gries 1982 per partition, exact recount of
    the candidate union):

      pass 1: each partition runs a Misra-Gries summary with capacity
              k = ⌈1/φ⌉.  Pigeonhole guarantee: any key with GLOBAL
              count > N/k exceeds n_p/k in at least one partition, so
              the union of per-partition survivors is a SUPERSET of
              the true heavy hitters — no shuffle, state k per task.
      pass 2: exact counts for candidates only (broadcast semi-join
              prefilter, one hash agg over candidate rows), then the
              exact HAVING count > φ·N.

    The result is EXACT and partitioning-independent (MG only decides
    who gets recounted; recounts are exact), which is what makes a
    DuckDB oracle possible — the oracle is the plain one-agg HAVING.
    At 100 TB this is the shape that wins: the naive groupBy shuffles
    every distinct key; this shuffles ≤ partitions × k candidate ids
    plus candidate-row partials.  φ·N rides in via the same
    data-derived-zero-key broadcast as the engine's other globals.
    """
    import math as _m

    if not 0 < phi < 1:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    k = _m.ceil(1.0 / phi)

    def mg_partition(batches):
        import pandas as pd

        counters: dict[int, int] = {}
        for pdf in batches:
            for uid in pdf["user_id"]:
                uid = int(uid)
                if uid in counters:
                    counters[uid] += 1
                elif len(counters) < k:
                    counters[uid] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"user_id": list(counters.keys())})

    ids = events.select("user_id")
    candidates = (
        ids.mapInPandas(mg_partition, schema="user_id LONG").distinct()
    )
    total = ids.agg(F.count("*").cast("long").alias("n_total")).selectExpr(
        "n_total", "n_total - n_total AS _k"
    )
    counted = (
        ids.join(F.broadcast(candidates), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .withColumn("_k", F.expr("pmod(n_events, 1)"))
        .join(F.broadcast(total), "_k")
    )
    return (
        counted.where(
            F.col("n_events").cast("double")
            > F.lit(phi) * F.col("n_total").cast("double")
        )
        .selectExpr(
            "user_id", "n_events",
            "floor(CAST(n_events AS DOUBLE) / CAST(n_total AS DOUBLE) * 1e6)"
            " / 1e6 AS share",
        )
    )


def heavy_hitters_oracle(phi: float = 0.008) -> str:
    return f"""WITH total AS (SELECT COUNT(*) AS n_total FROM events)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       floor(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(n_total) AS DOUBLE) * 1e6)
         / 1e6 AS share
FROM events CROSS JOIN total
GROUP BY user_id
HAVING CAST(COUNT(*) AS DOUBLE) > {phi!r} * CAST(MAX(n_total) AS DOUBLE)"""


def temporal_triangle_count(
    events: DataFrame, window_us: int = 24 * 3600 * 1_000_000
) -> DataFrame:
    """Time-ORDERED triangle count (the δ-temporal motif of Paranjape
    et al. WSDM'17, one motif class up from
    :func:`temporal_two_hop_count`): cycles x→z→y→x over the
    first-observation temporal edges with strictly increasing
    timestamps t1 < t2 < t3, all within ``window_us`` of t1 — "A
    engaged B, then B engaged C, then C closed back to A, all inside a
    day": the influence-loop signal, where the reference's static RS
    triangle (``rsjoin/RSJoinTriangleCount.java``) cannot distinguish
    cause from echo.

    Join shape: the static triangle pipeline (J1 wedge + closing
    equi-join) with the two time conjuncts riding the joins exactly
    like the RS job's x≠z filter (SURVEY.md F3) — the ordering
    conjuncts only PRUNE join output.  Integer microsecond arithmetic;
    each directed time-ordered cycle is counted once (the time order
    fixes the rotation, so no ÷3).

    Emits (n_temporal_triangles, n_closing_nodes).  At sf0.001 the
    1k-event derivation is structurally triangle-free (verified
    exhaustively — no directed cycle has increasing first-times at any
    window), so the oracle compares the (0, 0) row there; sf0.01+ is
    non-vacuous (223 / 3602 at the gate scales).
    """
    e = temporal_edges(events).localCheckpoint(eager=False)
    e1 = e.select(F.col("src").alias("x"), F.col("dst").alias("z"), F.col("ts_us").alias("t1"))
    e2 = e.select(F.col("src").alias("z"), F.col("dst").alias("y"), F.col("ts_us").alias("t2"))
    e3 = e.select(F.col("src").alias("y"), F.col("dst").alias("x"), F.col("ts_us").alias("t3"))
    tri = (
        e1.join(e2, "z")
        .where(
            (F.col("y") != F.col("x"))
            & (F.col("t2") > F.col("t1"))
            & (F.col("t2") <= F.col("t1") + F.lit(window_us))
        )
        .join(e3, ["y", "x"])
        .where(
            (F.col("t3") > F.col("t2"))
            & (F.col("t3") <= F.col("t1") + F.lit(window_us))
        )
    )
    return tri.agg(
        F.count("*").cast("long").alias("n_temporal_triangles"),
        F.countDistinct("y").cast("long").alias("n_closing_nodes"),
    )


def temporal_triangle_oracle(window_us: int = 24 * 3600 * 1_000_000) -> str:
    return f"""WITH raw AS (
  SELECT user_id % 997 AS src,
         LEAD(user_id % 997) OVER (PARTITION BY user_id % 16
                                   ORDER BY ts ASC, event_id ASC) AS dst,
         epoch_us(ts) AS ts_us
  FROM events
), e AS (
  SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
         MIN(ts_us) AS ts_us
  FROM raw WHERE dst IS NOT NULL AND src <> dst
  GROUP BY src, dst
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_temporal_triangles,
       CAST(COUNT(DISTINCT e2.dst) AS BIGINT) AS n_closing_nodes
FROM e e1
JOIN e e2 ON e1.dst = e2.src
JOIN e e3 ON e2.dst = e3.src AND e3.dst = e1.src
WHERE e2.dst <> e1.src
  AND e2.ts_us > e1.ts_us AND e2.ts_us <= e1.ts_us + {window_us}
  AND e3.ts_us > e2.ts_us AND e3.ts_us <= e1.ts_us + {window_us}"""


#: time-decay constant for the LTV feature: one week, in seconds
LTV_TAU_SEC = 604800.0


def user_ltv_decay(events: DataFrame, k: int = 100) -> DataFrame:
    """Exponentially time-decayed per-user value sum — the recency-
    weighted LTV / engagement feature every behavioral model consumes:
    ltv(u) = Σ value·exp(−age/τ), τ = 1 week, age measured back from
    the corpus max timestamp (data-derived, so the feature is
    reproducible — wall-clock ``now()`` would not be).

    Determinism: age is EXACT integer seconds (integer micros, integer
    division), each per-event term is one pointwise double
    (value·exp(−age/τ)) floored to a 1e-6-scaled BIGINT, and the
    per-user reduction sums those integers — order-independent like
    every float reduction in this engine.  Top-``k`` users by
    (ltv desc, user_id) keeps the output bounded.  Shape: one 1-row
    global max broadcast onto the scan, one hash agg, TakeOrdered."""
    t_ref = events.agg(F.max(F.unix_micros("ts")).alias("t_ref_us"))
    terms = events.crossJoin(F.broadcast(t_ref)).selectExpr(
        "user_id",
        "CAST(floor(value * exp(-(CAST((t_ref_us - unix_micros(ts)) div 1000000 AS DOUBLE))"
        f" / {LTV_TAU_SEC!r}) * 1000000) AS BIGINT) AS t6",
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.sum("t6").cast("double") / F.lit(1000000.0)).alias("ltv"),
        )
        .orderBy(F.desc("ltv"), F.asc("user_id"))
        .limit(k)
    )


def user_ltv_decay_oracle(k: int = 100) -> str:
    return f"""WITH t AS (SELECT MAX(epoch_us(ts)) AS t_ref_us FROM events),
terms AS (
  SELECT user_id,
    CAST(floor(value * exp(-(CAST((t.t_ref_us - epoch_us(ts)) // 1000000 AS DOUBLE))
      / {LTV_TAU_SEC!r}) * 1000000) AS BIGINT) AS t6
  FROM events CROSS JOIN t)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(t6) AS DOUBLE) / 1000000.0 AS ltv
FROM terms GROUP BY user_id
ORDER BY ltv DESC, user_id
LIMIT {k}"""


def ewma_hourly(events: DataFrame) -> DataFrame:
    """Exponentially-weighted moving average of hourly value volume per
    event_type — the smoothing every ops dashboard / anomaly baseline
    runs; finite-impulse form with an 8-hour kernel, α = 0.3:

        ewma(t) = Σ_{d=0..7}  α(1−α)^d · sum_value(t − d hours)

    TRUE time decay, not row-lag decay: the kernel weight is a function
    of the HOUR DISTANCE via a bounded self-join of the hourly bucket
    table on ``0 ≤ h_t − h_src ≤ 7``, so gaps in the series contribute
    zero (a lag() window over observed rows would silently treat a
    2-day-old bucket as "one step ago").  Truncating the kernel at 8
    taps drops ≤ (0.7)^8 ≈ 5.8% of the mass — documented, determinism
    over tail-chasing.

    Exactness: α = 3/10 makes every weight the exact rational
    3·7^d/10^(d+1); each per-row value floors to a 1e-6-scaled BIGINT
    (exact for the ≤6-decimal synthetic values), bucket sums are exact
    integers, and each kernel term is one DECIMAL(38,0)·BIGINT product
    over the common denominator 10^8 — the whole numerator is an exact
    integer, order-independent, floored to 1e-6 at the very end.

    Scale shape: one hash agg to hourly buckets (map-side combinable),
    then a self-equi-join on event_type with the 8-hour band predicate
    — the bucket table is |types|·|hours| rows, thousands of times
    smaller than the fact table, so the "range join" is a rounding
    error next to the scan; kernel width is the documented knob.
    Output: (event_type, window_start, n_events, sum_value, ewma).
    """
    return ewma_from_buckets(hourly_value_buckets(events))


def hourly_value_buckets(events: DataFrame) -> DataFrame:
    """The bucket grain of :func:`ewma_hourly`: per (event_type, hour)
    exact counts and value sums — (event_type, h, n_events, s, s6) with
    ``s`` the exact DECIMAL(38,6) value sum and ``s6`` its 1e-6-scaled
    BIGINT twin.  Self-maintainable under inserts (merge = same
    groupBy-sum over old state ∪ delta), which is what makes the
    streaming IVM variant (``streaming/ewma.py``) exact."""
    return (
        events.selectExpr(
            "event_type",
            "unix_micros(ts) div 3600000000 AS h",
            "CAST(value AS DECIMAL(18,6)) AS v",
            "CAST(floor(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT) AS v6",
        )
        .groupBy("event_type", "h")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("v").cast("decimal(38,6)").alias("s"),
            F.sum("v6").cast("long").alias("s6"),
        )
    )


def ewma_from_buckets(buckets: DataFrame) -> DataFrame:
    """The kernel stage of :func:`ewma_hourly` over a
    :func:`hourly_value_buckets`-shaped frame (batch-built or read back
    from maintained streaming state — identical output by construction).
    """
    w_expr = "CAST(round(3 * power(7, dd) * power(10, 7 - dd)) AS BIGINT)"
    b = (
        buckets.selectExpr(
            "event_type", "h", "n_events", "CAST(s AS DOUBLE) AS sum_value", "s6"
        )
        # both sides of the kernel self-join — bucket once, not twice
        .localCheckpoint(eager=False)
    )
    lagged = b.select(
        F.col("event_type").alias("et2"), F.col("h").alias("h2"), F.col("s6").alias("s6l")
    )
    j = (
        b.join(
            lagged,
            (F.col("event_type") == F.col("et2"))
            & ((F.col("h") - F.col("h2")).between(0, 7)),
        )
        .selectExpr(
            "event_type",
            "h",
            "n_events",
            "sum_value",
            "CAST(h - h2 AS INT) AS dd",
            "s6l",
        )
        .selectExpr(
            "event_type",
            "h",
            "n_events",
            "sum_value",
            f"CAST(s6l AS DECIMAL(38,0)) * {w_expr} AS term",
        )
    )
    return (
        j.groupBy("event_type", "h", "n_events", "sum_value")
        .agg(F.sum("term").alias("num"))
        .selectExpr(
            "event_type",
            f"date_format(timestamp_seconds(h * 3600), '{TS_FMT_SPARK}') AS window_start",
            "n_events",
            "sum_value",
            "floor(CAST(num AS DOUBLE) / 100000000) / 1000000 AS ewma",
        )
    )


EWMA_HOURLY_ORACLE = f"""WITH b AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
         CAST(SUM(CAST(floor(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT)) AS BIGINT) AS s6
  FROM events GROUP BY 1, 2),
j AS (
  SELECT t.event_type, t.h, t.n_events, t.sum_value,
         CAST(t.h - u.h AS INT) AS dd, u.s6 AS s6l
  FROM b t JOIN b u
    ON t.event_type = u.event_type AND t.h - u.h BETWEEN 0 AND 7)
SELECT event_type,
  strftime(to_timestamp(h * 3600), '{TS_FMT_DUCK}') AS window_start,
  n_events, sum_value,
  floor(CAST(SUM(CAST(s6l AS DECIMAL(38,0))
      * CAST(round(3 * power(7, dd) * power(10, 7 - dd)) AS BIGINT)) AS DOUBLE) / 100000000)
    / 1000000 AS ewma
FROM j GROUP BY event_type, h, n_events, sum_value"""


def ab_test_proportions(events: DataFrame) -> DataFrame:
    """Two-proportion A/B conversion test — the experimentation readout
    every event pipeline serves: users split into deterministic arms
    (user_id parity — the hash-bucket assignment every real platform
    uses, never rand()), "converted" = had ≥1 purchase event; the
    pooled two-proportion z statistic

        z = (p_a − p_b) / sqrt( p·(1−p)·(1/n_a + 1/n_b) ),  p pooled

    All counts are exact BIGINTs from one per-user existence agg + one
    per-arm reduce; z and the rate columns are single closed-form
    doubles over those integers (identical text both engines — sqrt is
    correctly-rounded), floored at 1e-6, degenerate pools (p = 0 or 1,
    or an empty arm) NULL-guarded.  Scale shape: per-user conversion is
    one map-side-combinable hash agg on user_id; everything after is
    2 rows.  Output: 1 row (n_a, n_b, conv_a, conv_b, rate_a, rate_b,
    z_score).
    """
    per_user = events.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv")
    )
    arms = per_user.selectExpr(
        "CAST(user_id % 2 AS INT) AS arm", "conv"
    ).groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conv").cast("long").alias("c"),
    )
    wide = arms.groupBy().agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).cast("long").alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("c"))).cast("long").alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).cast("long").alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("c"))).cast("long").alias("conv_b"),
    )
    pa = "(CAST(conv_a AS DOUBLE) / n_a)"
    pb = "(CAST(conv_b AS DOUBLE) / n_b)"
    pool = "(CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))"
    z = (
        f"(({pa} - {pb}) / sqrt({pool} * (1.0 - {pool})"
        f" * (1.0 / n_a + 1.0 / n_b)))"
    )
    return wide.selectExpr(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        f"floor({pa} * 1000000) / 1000000 AS rate_a",
        f"floor({pb} * 1000000) / 1000000 AS rate_b",
        f"CASE WHEN n_a > 0 AND n_b > 0 AND {pool} > 0.0 AND {pool} < 1.0 THEN"
        f" floor({z} * 1000000) / 1000000 END AS z_score",
    )


AB_TEST_ORACLE_TEMPLATE = """WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id),
arms AS (
  SELECT CAST(user_id % 2 AS INT) AS arm,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(conv) AS BIGINT) AS c
  FROM per_user GROUP BY 1),
wide AS (
  SELECT CAST(MAX(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
         CAST(MAX(CASE WHEN arm = 0 THEN c END) AS BIGINT) AS conv_a,
         CAST(MAX(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
         CAST(MAX(CASE WHEN arm = 1 THEN c END) AS BIGINT) AS conv_b
  FROM arms)
SELECT n_a, n_b, conv_a, conv_b,
  floor({pa} * 1000000) / 1000000 AS rate_a,
  floor({pb} * 1000000) / 1000000 AS rate_b,
  CASE WHEN n_a > 0 AND n_b > 0 AND {pool} > 0.0 AND {pool} < 1.0 THEN
    floor({z} * 1000000) / 1000000 END AS z_score
FROM wide"""


def ab_test_oracle() -> str:
    pa = "(CAST(conv_a AS DOUBLE) / n_a)"
    pb = "(CAST(conv_b AS DOUBLE) / n_b)"
    pool = "(CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))"
    z = (
        f"(({pa} - {pb}) / sqrt({pool} * (1.0 - {pool})"
        f" * (1.0 / n_a + 1.0 / n_b)))"
    )
    return AB_TEST_ORACLE_TEMPLATE.format(pa=pa, pb=pb, pool=pool, z=z)


def user_growth_accounting(events: DataFrame) -> DataFrame:
    """Daily growth accounting — the DAU decomposition every product
    dashboard runs: per day, active users split into NEW (first-ever
    appearance) vs RETURNING, plus the cumulative user count.

    Shape: one distinct over (user, day) — the only fact-table shuffle —
    then a per-user MIN(day) agg joined back, one per-day agg, and the
    cumulative running sum as a window over the DAY table (bounded:
    |days| rows, so the unpartitioned window is spine-sized, the same
    exemption as the gapfill spine).  Exact integers end to end;
    day keys are 'yyyy-MM-dd' strings, whose lexicographic order IS
    chronological order.  Output: (day, active_users, new_users,
    returning_users, cumulative_users)."""
    ud = events.selectExpr(
        "user_id", "date_format(ts, 'yyyy-MM-dd') AS day"
    ).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = (
        ud.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("active_users"),
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).cast("long").alias("returning_users"),
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


USER_GROWTH_ORACLE = """WITH ud AS (
  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
first AS (
  SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id),
daily AS (
  SELECT day,
         CAST(COUNT(*) AS BIGINT) AS active_users,
         CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users
  FROM ud JOIN first USING (user_id) GROUP BY day)
SELECT day, active_users, new_users,
  CAST(active_users - new_users AS BIGINT) AS returning_users,
  CAST(SUM(new_users) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS BIGINT) AS cumulative_users
FROM daily"""


def funnel_step_timing(
    events: DataFrame,
    first_step: str = "click",
    convert_step: str = "purchase",
    window_us: int = 3_600_000_000,
) -> DataFrame:
    """Time-to-convert distribution — the latency companion of
    :func:`funnel_conversion` (which counts WHO converts; this measures
    HOW FAST): per user, seconds from the FIRST ``first_step`` to the
    first ``convert_step`` within ``window_us`` after it, summarized as
    exact type-7 percentiles.

    Shape: two filtered per-user hash aggs + one equi-join on user_id
    (both sides user-grain before joining), deltas in exact integer
    seconds, percentiles over |converted users| values; the funnel-
    entry count rides a 1-row broadcast cross.  Output: (n_first,
    n_converted, p50_sec, p90_sec)."""
    t0 = (
        events.where(F.col("event_type") == first_step)
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t0"))
    )
    conv = events.where(F.col("event_type") == convert_step).select(
        "user_id", F.unix_micros("ts").alias("t1")
    )
    deltas = (
        t0.join(conv, "user_id")
        .where((F.col("t1") >= F.col("t0")) & (F.col("t1") <= F.col("t0") + window_us))
        .groupBy("user_id")
        .agg(F.min("t1").alias("tc"), F.min("t0").alias("t0min"))
        .selectExpr("(tc - t0min) div 1000000 AS sec")
    )
    n_first = t0.agg(F.count("*").cast("long").alias("n_first"))
    return (
        deltas.agg(
            F.count("*").cast("long").alias("n_converted"),
            F.expr("percentile(sec, 0.5)").alias("p50_sec"),
            F.expr("percentile(sec, 0.9)").alias("p90_sec"),
        )
        .crossJoin(F.broadcast(n_first))
        .select("n_first", "n_converted", "p50_sec", "p90_sec")
    )


def funnel_step_timing_oracle(
    first_step: str = "click",
    convert_step: str = "purchase",
    window_us: int = 3_600_000_000,
) -> str:
    return f"""WITH t0 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = '{first_step}' GROUP BY user_id),
conv AS (
  SELECT user_id, epoch_us(ts) AS t1 FROM events
  WHERE event_type = '{convert_step}'),
deltas AS (
  SELECT (MIN(t1) - MIN(t0)) // 1000000 AS sec
  FROM t0 JOIN conv USING (user_id)
  WHERE t1 >= t0 AND t1 <= t0 + {window_us}
  GROUP BY user_id),
nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_first FROM t0),
agg AS (
  -- global aggregate FIRST (always exactly one row, even with zero
  -- conversions — matching Spark's ungrouped agg), then the 1-row cross
  SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
         quantile_cont(sec, 0.5) AS p50_sec,
         quantile_cont(sec, 0.9) AS p90_sec
  FROM deltas)
SELECT n_first, n_converted, p50_sec, p90_sec
FROM agg CROSS JOIN nf"""


def seasonal_baseline(events: DataFrame, z_thresh: float = 3.0) -> DataFrame:
    """Day-of-week × hour-of-day seasonal traffic profile with an
    anomaly count per cell — the seasonal-naive baseline every
    event-volume monitor starts from (events_hourly_anomaly flags
    hours against a GLOBAL mean; this decomposes the weekly
    seasonality first, so a quiet Sunday 3am isn't "anomalous" just
    for being Sunday 3am).

    Scale shape: the fact table collapses to hourly counts in one
    map-side-combinable agg (|hours| rows ≈ 8.8k/year regardless of
    data size); the 168-cell profile and the anomaly re-join both ride
    that bounded hourly spine.  Day-of-week is pure epoch-day
    arithmetic — ``(days_since_epoch + 4) % 7`` (1970-01-01 was a
    Thursday), Monday = 0 … Sunday = 6 after the shift — identical
    integer math in both engines, immune to the Spark-vs-DuckDB
    ``dayofweek`` numbering mismatch.

    Exactness: counts BIGINT; the per-cell mean/std come from exact
    Σn and Σn² (LONG squares — n is an hourly count, wrap is beyond
    any real traffic); anomaly rule |n − mean| > z·std evaluated as
    one closed-form double comparison, identical text both engines.
    Output: (dow, hod, n_hours, total_events, mean_n, std_n,
    n_anomalies) — 168 rows.
    """
    hourly = (
        events.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").cast("long").alias("n"))
        .selectExpr(
            "h",
            "n",
            "CAST((datediff(CAST(h AS DATE), DATE '1970-01-01') + 4) % 7 AS INT) AS dow",
            "CAST(hour(h) AS INT) AS hod",
        )
    )
    prof = hourly.groupBy("dow", "hod").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("n").cast("long").alias("total_events"),
        F.sum(F.expr("n * n")).cast("long").alias("_sq"),
    )
    mean = "(CAST(total_events AS DOUBLE) / n_hours)"
    var = f"(CAST(_sq AS DOUBLE) / n_hours - {mean} * {mean})"
    prof = prof.selectExpr(
        "dow",
        "hod",
        "n_hours",
        "total_events",
        f"floor({mean} * 1000000) / 1000000 AS mean_n",
        f"CASE WHEN {var} > 0 THEN floor(sqrt({var}) * 1000000) / 1000000"
        " ELSE 0.0 END AS std_n",
    )
    flagged = hourly.join(prof, ["dow", "hod"]).where(
        F.expr(f"abs(CAST(n AS DOUBLE) - mean_n) > {z_thresh} * std_n AND std_n > 0")
    )
    anom = flagged.groupBy("dow", "hod").agg(
        F.count("*").cast("long").alias("n_anomalies")
    )
    return (
        prof.join(anom, ["dow", "hod"], "left")
        .withColumn("n_anomalies", F.coalesce("n_anomalies", F.lit(0)).cast("long"))
        .select("dow", "hod", "n_hours", "total_events", "mean_n", "std_n", "n_anomalies")
    )


def seasonal_baseline_oracle(z_thresh: float = 3.0) -> str:
    mean = "(CAST(total_events AS DOUBLE) / n_hours)"
    var = f"(CAST(_sq AS DOUBLE) / n_hours - {mean} * {mean})"
    return f"""WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n,
    CAST((datediff('day', DATE '1970-01-01', CAST(date_trunc('hour', ts) AS DATE)) + 4) % 7 AS INT) AS dow,
    CAST(hour(date_trunc('hour', ts)) AS INT) AS hod
  FROM events GROUP BY 1),
prof0 AS (
  SELECT dow, hod, CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(n) AS BIGINT) AS total_events,
         CAST(SUM(n * n) AS BIGINT) AS _sq
  FROM hourly GROUP BY 1, 2),
prof AS (
  SELECT dow, hod, n_hours, total_events,
    floor({mean} * 1000000) / 1000000 AS mean_n,
    CASE WHEN {var} > 0 THEN floor(sqrt({var}) * 1000000) / 1000000
         ELSE 0.0 END AS std_n
  FROM prof0),
anom AS (
  SELECT hourly.dow, hourly.hod, CAST(COUNT(*) AS BIGINT) AS n_anomalies
  FROM hourly JOIN prof ON hourly.dow = prof.dow AND hourly.hod = prof.hod
  WHERE abs(CAST(n AS DOUBLE) - mean_n) > {z_thresh} * std_n AND std_n > 0
  GROUP BY 1, 2)
SELECT prof.dow, prof.hod, n_hours, total_events, mean_n, std_n,
  CAST(coalesce(n_anomalies, 0) AS BIGINT) AS n_anomalies
FROM prof LEFT JOIN anom ON prof.dow = anom.dow AND prof.hod = anom.hod"""


def concurrency_curve(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning readout
    (how many users are on AT ONCE, not per-hour event counts), via the
    classic sweep line over session boundaries computed as a
    DISTRIBUTED TWO-LEVEL PREFIX SUM: a global running sum over
    boundary events would be the banned single-partition window, so
    the cumsum splits into (a) a within-day window partitioned by day
    and (b) a carry-in per day from the bounded day spine — the
    textbook parallel-scan decomposition, each piece shuffle-partitioned.

    Sessions are :func:`sessionize`'s gap-based intervals (closed:
    a session is active at its last event), so boundary order at equal
    timestamps is start(+1) BEFORE end(−1) — two sessions touching at
    t ARE concurrent at t.  Equal-(t, kind) rows carry identical
    deltas, so the per-day MAX is order-invariant even though row-level
    prefixes are not (documented; only the max is emitted).

    Output: (day, n_starts, max_concurrent) — one row per active day.
    """
    w_user = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    t = F.unix_micros(F.col("ts"))
    flagged = events.select(
        "user_id",
        "event_id",
        t.alias("t_us"),
        F.when(t - F.lag(t).over(w_user) > gap_us, 1).otherwise(0).alias("new_session"),
    ).withColumn(
        # event_id tie-break matches sessionize: duplicate (user_id, ts)
        # rows must prefix-sum in a deterministic order or session
        # bounds become order-dependent
        "session_seq",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy(F.col("t_us").asc(), F.col("event_id").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    bounds = flagged.groupBy("user_id", "session_seq").agg(
        F.min("t_us").alias("s_us"), F.max("t_us").alias("e_us")
    )
    deltas = bounds.selectExpr(
        "s_us AS t_us", "0 AS kind", "CAST(1 AS BIGINT) AS delta"
    ).unionAll(
        bounds.selectExpr("e_us AS t_us", "1 AS kind", "CAST(-1 AS BIGINT) AS delta")
    ).withColumn("day", F.expr("t_us div 86400000000"))
    w_in = (
        Window.partitionBy("day")
        .orderBy(F.col("t_us").asc(), F.col("kind").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = deltas.withColumn("run", F.sum("delta").over(w_in))
    day_tot = deltas.groupBy("day").agg(
        F.sum("delta").cast("long").alias("day_sum"),
        F.sum(F.expr("CAST(kind = 0 AS BIGINT)")).cast("long").alias("n_starts"),
    )
    w_carry = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    carry = day_tot.select(
        "day",
        "n_starts",
        F.coalesce(F.sum("day_sum").over(w_carry), F.lit(0)).cast("long").alias("carry_in"),
    )
    return (
        within.join(carry, "day")
        .groupBy("day", "n_starts", "carry_in")
        .agg(F.max(F.col("carry_in") + F.col("run")).cast("long").alias("max_concurrent"))
        .selectExpr(
            "date_format(timestamp_micros(day * 86400000000), 'yyyy-MM-dd') AS day",
            "n_starts",
            "max_concurrent",
        )
    )


def concurrency_curve_oracle(gap_us: int = SESSION_GAP_US) -> str:
    return f"""WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {gap_us} THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
sessioned AS (
  SELECT user_id, t_us,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged),
bounds AS (
  SELECT user_id, session_seq, MIN(t_us) AS s_us, MAX(t_us) AS e_us
  FROM sessioned GROUP BY 1, 2),
deltas AS (
  SELECT s_us AS t_us, 0 AS kind, CAST(1 AS BIGINT) AS delta, s_us // 86400000000 AS day
  FROM bounds
  UNION ALL
  SELECT e_us, 1, CAST(-1 AS BIGINT), e_us // 86400000000 FROM bounds),
within AS (
  SELECT day, t_us, kind, delta,
    SUM(delta) OVER (PARTITION BY day ORDER BY t_us ASC, kind ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM deltas),
day_tot AS (
  SELECT day, CAST(SUM(delta) AS BIGINT) AS day_sum,
         CAST(SUM(CAST(kind = 0 AS BIGINT)) AS BIGINT) AS n_starts
  FROM deltas GROUP BY 1),
carry AS (
  SELECT day, n_starts,
    CAST(coalesce(SUM(day_sum) OVER (ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS carry_in
  FROM day_tot)
SELECT strftime(make_timestamp(w.day * 86400000000), '%Y-%m-%d') AS day,
  c.n_starts,
  CAST(MAX(c.carry_in + w.run) AS BIGINT) AS max_concurrent
FROM within w JOIN carry c ON w.day = c.day
GROUP BY 1, 2"""


def cusum_changepoints(events: DataFrame, k: int = 5) -> DataFrame:
    """CUSUM level-shift detection over hourly event volume: the
    cumulative sum of deviations from the global mean peaks (in
    absolute value) exactly where the series' level changes — the
    standard nonparametric changepoint locator (the argmax of \\|CUSUM\\|
    is the single-changepoint MLE under a mean-shift model).  Returns
    the top-``k`` candidate hours by \\|CUSUM\\| with their statistics.

    Scale shape: the fact table collapses to the bounded hourly spine
    in one map-side-combinable agg; the mean is a 1-row broadcast
    cross (the woe shape) and the running sum is a window over the
    bounded spine (degree_gini discipline) — nothing downstream of the
    first agg is data-sized.

    Exactness: deviations stay exact by scaling — ``dev_n = n·H − T``
    (count times total-hours minus total-events, all BIGINT) is the
    1e0-exact integer form of ``n − mean`` times H, so the running sum
    is an exact integer and \\|CUSUM\\| ordering has no float ties;
    cusum is reported as the floored double dev-sum / H.
    Output (k rows): (hour, n_events, cusum, abs_rank).
    """
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").cast("long").alias("n")
    )
    tot = hourly.agg(
        F.sum("n").cast("long").alias("t_ev"), F.count("*").cast("long").alias("t_hr")
    )
    w_run = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hourly.crossJoin(F.broadcast(tot))
        .withColumn("dev_h", F.expr("n * t_hr - t_ev"))
        .withColumn("cusum_h", F.sum("dev_h").over(w_run))
    )
    w_rank = Window.orderBy(F.abs(F.col("cusum_h")).desc(), F.col("h").asc())
    return (
        cum.withColumn("abs_rank", F.row_number().over(w_rank).cast("long"))
        .where(F.col("abs_rank") <= k)
        .selectExpr(
            "date_format(h, 'yyyy-MM-dd HH:mm:ss') AS hour",
            "n AS n_events",
            "floor(CAST(cusum_h AS DOUBLE) / t_hr * 1000000) / 1000000 AS cusum",
            "abs_rank",
        )
    )


def cusum_changepoints_oracle(k: int = 5) -> str:
    return f"""WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t_ev, CAST(COUNT(*) AS BIGINT) AS t_hr FROM hourly),
cum AS (
  SELECT h, n, t_hr,
    SUM(n * t_hr - t_ev) OVER (ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_h
  FROM hourly CROSS JOIN tot),
ranked AS (
  SELECT h, n, t_hr, cusum_h,
    CAST(ROW_NUMBER() OVER (ORDER BY abs(cusum_h) DESC, h ASC) AS BIGINT) AS abs_rank
  FROM cum)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
  n AS n_events,
  floor(CAST(cusum_h AS DOUBLE) / t_hr * 1000000) / 1000000 AS cusum,
  abs_rank
FROM ranked WHERE abs_rank <= {k}"""


def markov_prediction_accuracy(events: DataFrame) -> DataFrame:
    """First-order Markov next-event prediction, evaluated in-corpus:
    the modal next event type per current type IS the order-1 Markov
    predictor, and its hit rate per state is the natural baseline every
    sequence model must beat (``events_type_transitions`` counts the
    transition matrix; this turns it into a classifier + its accuracy
    in one plan).

    Scale shape: transitions come from one per-user lag window
    (scan-bound, partitioned by user); the modal pick is a row_number
    over the |types|² count table; the accuracy join sends each
    transition against the broadcast |types|-row predictor.  Ties on
    the modal pick break by event-type string order — deterministic on
    both engines.
    Output: (cur_type, modal_next, n_trans, n_hits, accuracy).
    """
    w_user = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    trans = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("cur_type"),
            F.lead("event_type").over(w_user).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .select("cur_type", "next_type")
    )
    counts = trans.groupBy("cur_type", "next_type").agg(
        F.count("*").cast("long").alias("n")
    )
    w_modal = Window.partitionBy("cur_type").orderBy(
        F.col("n").desc(), F.col("next_type").asc()
    )
    modal = (
        counts.withColumn("rk", F.row_number().over(w_modal))
        .where(F.col("rk") == 1)
        .select("cur_type", F.col("next_type").alias("modal_next"))
    )
    return (
        trans.join(F.broadcast(modal), "cur_type")
        .groupBy("cur_type", "modal_next")
        .agg(
            F.count("*").cast("long").alias("n_trans"),
            F.sum(F.expr("CAST(next_type = modal_next AS BIGINT)"))
            .cast("long")
            .alias("n_hits"),
        )
        .selectExpr(
            "cur_type",
            "modal_next",
            "n_trans",
            "n_hits",
            "floor(CAST(n_hits AS DOUBLE) / n_trans * 1000000) / 1000000 AS accuracy",
        )
    )


MARKOV_ACCURACY_ORACLE = """WITH trans AS (
  SELECT event_type AS cur_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
           AS next_type
  FROM events),
t2 AS (SELECT cur_type, next_type FROM trans WHERE next_type IS NOT NULL),
counts AS (
  SELECT cur_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM t2 GROUP BY 1, 2),
modal AS (
  SELECT cur_type, next_type AS modal_next FROM (
    SELECT cur_type, next_type, n,
      ROW_NUMBER() OVER (PARTITION BY cur_type ORDER BY n DESC, next_type ASC) AS rk
    FROM counts) WHERE rk = 1)
SELECT t2.cur_type, modal_next,
  CAST(COUNT(*) AS BIGINT) AS n_trans,
  CAST(SUM(CAST(next_type = modal_next AS BIGINT)) AS BIGINT) AS n_hits,
  floor(CAST(SUM(CAST(next_type = modal_next AS BIGINT)) AS DOUBLE) / COUNT(*) * 1000000)
    / 1000000 AS accuracy
FROM t2 JOIN modal ON t2.cur_type = modal.cur_type
GROUP BY 1, 2"""


def interarrival_burstiness(events: DataFrame) -> DataFrame:
    """Per-event-type inter-arrival statistics + the Goh-Barabási
    burstiness coefficient B = (σ−μ)/(σ+μ) of the within-user gap
    distribution — the temporal-texture screen (B → −1 periodic/bot
    cadence, B ≈ 0 Poisson/organic, B → 1 bursty sessions) that
    complements the volume-based anomaly ops: a scraper with PERFECTLY
    average volume still shows machine cadence here.

    Scale shape: gaps come from ONE per-(user, type) lag window
    (scan-bound, partitioned); everything after is a |types|-row
    exact-moment reduce — gaps are integer micro-seconds, Σg and Σg²
    are exact DECIMAL(38,0), so μ/σ/B are the house closed-form
    doubles (zero-variance CASE-guarded) floored at 1e-6.
    Output (|types| rows): (event_type, n_gaps, mean_gap_s, std_gap_s,
    burstiness).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    t = F.unix_micros(F.col("ts"))
    gaps = (
        events.select(
            "event_type", (t - F.lag(t).over(w)).alias("g")
        )
        .where(F.col("g").isNotNull())
    )
    agg = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum(F.expr("CAST(g AS DECIMAL(38,0))")).alias("s1"),
        F.sum(F.expr("CAST(g AS DECIMAL(38,0)) * g")).alias("s2"),
    )
    mean = "(CAST(s1 AS DOUBLE) / n_gaps)"
    var = f"(CAST(s2 AS DOUBLE) / n_gaps - {mean} * {mean})"
    sd = f"sqrt({var})"
    return agg.selectExpr(
        "event_type",
        "n_gaps",
        f"floor({mean} / 1000000 * 1000000) / 1000000 AS mean_gap_s",
        f"CASE WHEN {var} > 0 THEN floor({sd} / 1000000 * 1000000) / 1000000"
        " ELSE 0.0 END AS std_gap_s",
        f"CASE WHEN {var} > 0 THEN"
        f" floor(({sd} - {mean}) / ({sd} + {mean}) * 1000000) / 1000000"
        " WHEN n_gaps > 0 THEN -1.0 END AS burstiness",
    )


INTERARRIVAL_BURSTINESS_ORACLE = """WITH gaps AS (
  SELECT event_type,
    epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
      ORDER BY ts ASC, event_id ASC) AS g
  FROM events),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         SUM(CAST(g AS DECIMAL(38,0))) AS s1,
         SUM(CAST(g AS DECIMAL(38,0)) * g) AS s2
  FROM gaps WHERE g IS NOT NULL GROUP BY 1)
SELECT event_type, n_gaps,
  floor((CAST(s1 AS DOUBLE) / n_gaps) / 1000000 * 1000000) / 1000000 AS mean_gap_s,
  CASE WHEN (CAST(s2 AS DOUBLE) / n_gaps - (CAST(s1 AS DOUBLE) / n_gaps) * (CAST(s1 AS DOUBLE) / n_gaps)) > 0
       THEN floor(sqrt(CAST(s2 AS DOUBLE) / n_gaps - (CAST(s1 AS DOUBLE) / n_gaps) * (CAST(s1 AS DOUBLE) / n_gaps)) / 1000000 * 1000000) / 1000000
       ELSE 0.0 END AS std_gap_s,
  CASE WHEN (CAST(s2 AS DOUBLE) / n_gaps - (CAST(s1 AS DOUBLE) / n_gaps) * (CAST(s1 AS DOUBLE) / n_gaps)) > 0
       THEN floor((sqrt(CAST(s2 AS DOUBLE) / n_gaps - (CAST(s1 AS DOUBLE) / n_gaps) * (CAST(s1 AS DOUBLE) / n_gaps)) - (CAST(s1 AS DOUBLE) / n_gaps))
                  / (sqrt(CAST(s2 AS DOUBLE) / n_gaps - (CAST(s1 AS DOUBLE) / n_gaps) * (CAST(s1 AS DOUBLE) / n_gaps)) + (CAST(s1 AS DOUBLE) / n_gaps)) * 1000000) / 1000000
       WHEN n_gaps > 0 THEN -1.0 END AS burstiness
FROM agg"""


def hourly_acf(events: DataFrame, lags: tuple[int, ...] = (1, 2, 24, 168)) -> DataFrame:
    """Autocorrelation function of the hourly event-volume series at
    the named lags — THE seasonality detector (lag-24 ≈ daily cycle,
    lag-168 ≈ weekly) that :func:`seasonal_baseline` assumes and this
    measures: if acf(24) is high the (dow, hod) profile is the right
    baseline, if not the series is trend/burst-driven.

    The series is the DENSE hourly spine (missing hours count 0 — gaps
    ARE signal for autocorrelation); Pearson r at lag L pairs hour t
    with t+L via a spine self-join.  Exactness: counts are BIGINT,
    cross/square products sum as DECIMAL(38,0) (an hour can hold 1e9+
    events at 100 TB before the data does anything wrong), r is one
    double expression over the exact moments — ``sqrt`` is IEEE
    correctly-rounded on both engines (unlike ``ln``) — floored 1e-6,
    zero-variance guarded.

    Scale shape: ONE fact scan collapses to the bounded hourly spine
    (map-side combinable); the dense spine, the per-lag self-joins, and
    the moment reduces are all spine-sized (~years·8766 rows).  Output
    (|lags| rows): (lag, n_pairs, acf).
    """
    hourly = events.selectExpr("unix_micros(ts) div 3600000000 AS h").groupBy(
        "h"
    ).agg(F.count("*").cast("long").alias("c"))
    rng = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    dense = (
        rng.selectExpr("explode(sequence(h0, h1)) AS h")
        .join(hourly, "h", "left")
        .selectExpr("h", "coalesce(c, CAST(0 AS BIGINT)) AS c")
        .localCheckpoint(eager=False)
    )

    def arm(lag: int) -> DataFrame:
        a = dense.selectExpr("h", "c AS xa")
        b = dense.selectExpr(f"h - {lag} AS h", "c AS xb")
        m = a.join(b, "h").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("xa").cast("long").alias("sx"),
            F.sum("xb").cast("long").alias("sy"),
            F.expr("SUM(CAST(xa AS DECIMAL(38,0)) * xb)").alias("sxy"),
            F.expr("SUM(CAST(xa AS DECIMAL(38,0)) * xa)").alias("sxx"),
            F.expr("SUM(CAST(xb AS DECIMAL(38,0)) * xb)").alias("syy"),
        )
        num = "CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
        dx = "CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
        dy = "CAST(n * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)"
        return m.selectExpr(
            f"CAST({lag} AS BIGINT) AS lag",
            "n AS n_pairs",
            f"CASE WHEN {dx} > 0 AND {dy} > 0 THEN"
            f" floor({num} / sqrt({dx} * {dy}) * 1000000) / 1000000 END AS acf",
        )

    out = arm(lags[0])
    for lag in lags[1:]:
        out = out.unionAll(arm(lag))
    return out


def hourly_acf_oracle(lags: tuple[int, ...] = (1, 2, 24, 168)) -> str:
    def arm(lag: int) -> str:
        num = "CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
        dx = "CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
        dy = "CAST(n * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)"
        return f"""SELECT CAST({lag} AS BIGINT) AS lag, n AS n_pairs,
  CASE WHEN {dx} > 0 AND {dy} > 0 THEN
    floor({num} / sqrt({dx} * {dy}) * 1000000) / 1000000 END AS acf
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a.c) AS BIGINT) AS sx, CAST(SUM(b.c) AS BIGINT) AS sy,
         SUM(CAST(a.c AS DECIMAL(38,0)) * b.c) AS sxy,
         SUM(CAST(a.c AS DECIMAL(38,0)) * a.c) AS sxx,
         SUM(CAST(b.c AS DECIMAL(38,0)) * b.c) AS syy
  FROM dense a JOIN dense b ON b.h = a.h + {lag}) m"""

    arms = "\nUNION ALL\n".join(arm(lag) for lag in lags)
    return f"""WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
rng AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
spine AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM rng),
dense AS (
  SELECT s.h, COALESCE(hourly.c, CAST(0 AS BIGINT)) AS c
  FROM spine s LEFT JOIN hourly ON s.h = hourly.h)
{arms}"""


def bottomk_sample(events: DataFrame, k: int = 200) -> DataFrame:
    """Deterministic bottom-k uniform sample — THE distributed sampling
    primitive: the k rows with the smallest h64(event_id) are a uniform
    without-replacement sample of the table (conditioning on a fixed
    hash, any k-subset is equally likely over the key universe), and
    bottom-k state is MERGEABLE — the bottom-k of a union is the
    bottom-k of the partial bottom-ks, which is why every engine's
    reservoir/sample operator is really this under the hood and why
    the streaming twin maintains it per micro-batch.

    Unlike rand()-based sampling the draw replays identically on rerun,
    retry, and in the DuckDB oracle (the h64-mod split discipline
    applied to sampling); TakeOrdered computes it as per-partition
    bottom-k + merge, never a global sort.  Output (k rows):
    (event_id, user_id, event_type, hk).
    """
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(event_id AS STRING)", "spark")
    return (
        events.selectExpr("event_id", "user_id", "event_type", f"{h} AS hk")
        .orderBy(F.col("hk").asc(), F.col("event_id").asc())
        .limit(k)
    )


def bottomk_sample_oracle(k: int = 200) -> str:
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(event_id AS VARCHAR)", "duckdb")
    return f"""SELECT event_id, user_id, event_type, {h} AS hk
FROM events ORDER BY hk ASC, event_id ASC LIMIT {k}"""


def session_trigrams(
    events: DataFrame, gap_us: int = SESSION_GAP_US, k: int = 20
) -> DataFrame:
    """Top-k CONTIGUOUS event-type trigrams within sessions — level-3
    sequential pattern mining (:func:`event_type_transitions` is the
    bigram Markov view; this surfaces the three-step journeys —
    "view → click → purchase" — that a funnel definition is usually
    reverse-engineered from).  Sessions are :func:`sessionize`'s
    gap-based intervals, so a trigram never spans a session boundary.

    Shape: ONE pass builds session ids (the sessionize window pair),
    one more window (same partitioning key, already shuffled) leads the
    next two types, a boundary filter keeps triples whose three events
    share the session, then a |type³|-bounded hash agg and TakeOrdered
    top-k.  Ties break lexicographically — fully deterministic.

    Output (≤ k rows): (t1, t2, t3, n_occurrences).
    """
    w_user = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    t = F.unix_micros(F.col("ts"))
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(t - F.lag(t).over(w_user) > gap_us, 1).otherwise(0).alias("new_session"),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    led = flagged.select(
        "event_type",
        "session_seq",
        F.lead("event_type", 1).over(w_user).alias("t2"),
        F.lead("event_type", 2).over(w_user).alias("t3"),
        F.lead("session_seq", 1).over(w_user).alias("s2"),
        F.lead("session_seq", 2).over(w_user).alias("s3"),
    )
    triples = led.where(
        "t3 IS NOT NULL AND s2 = session_seq AND s3 = session_seq"
    ).selectExpr("event_type AS t1", "t2", "t3")
    counted = triples.groupBy("t1", "t2", "t3").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    from twitter_followers_patterns_mapreduce_spark.operators.topk import ranked_top_k

    order = [
        F.col("n_occurrences").desc(),
        F.col("t1").asc(),
        F.col("t2").asc(),
        F.col("t3").asc(),
    ]
    return ranked_top_k(counted, order, k, anchor="t1").select(
        "t1", "t2", "t3", "n_occurrences"
    )


def session_trigrams_oracle(gap_us: int = SESSION_GAP_US, k: int = 20) -> str:
    return f"""WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {gap_us} THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessioned AS (
  SELECT user_id, ts, event_id, event_type,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
), led AS (
  SELECT event_type AS t1, session_seq,
    LEAD(event_type, 1) OVER w AS t2,
    LEAD(event_type, 2) OVER w AS t3,
    LEAD(session_seq, 1) OVER w AS s2,
    LEAD(session_seq, 2) OVER w AS s3
  FROM sessioned
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), counted AS (
  SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_occurrences
  FROM led
  WHERE t3 IS NOT NULL AND s2 = session_seq AND s3 = session_seq
  GROUP BY 1, 2, 3)
SELECT t1, t2, t3, n_occurrences
FROM counted
ORDER BY n_occurrences DESC, t1 ASC, t2 ASC, t3 ASC
LIMIT {k}"""


def diff_in_diff(events: DataFrame, cutover: str = "1996-01-01") -> DataFrame:
    """Difference-in-differences estimate of a treatment effect on mean
    event value — the quasi-experimental workhorse when assignment
    isn't randomized (:func:`ab_test_proportions` is the randomized
    twin): treatment = odd user_id, period splits at ``cutover``, and
    DiD = (T_post − T_pre) − (C_post − C_pre) nets out both the stable
    group difference and the common time trend.

    Exactness: values scale to cents-BIGINTs, all four cell (n, Σ) pairs
    ride ONE conditional aggregate over ONE scan, the four means and the
    DiD are closed-form doubles over exact integers floored 1e-6.
    Output (1 row): n_t_pre, n_t_post, n_c_pre, n_c_post, mean_t_pre,
    mean_t_post, mean_c_pre, mean_c_post, did.
    """
    cut = f"TIMESTAMP '{cutover} 00:00:00'"
    cells = events.selectExpr(
        "CAST(pmod(user_id, 2) = 1 AS INT) AS treat",
        f"CAST(ts >= {cut} AS INT) AS post",
        "CAST(round(value * 100) AS BIGINT) AS v6",
    ).agg(
        *[
            a
            for t in (1, 0)
            for p in (0, 1)
            for a in (
                F.sum(F.expr(f"CAST(treat = {t} AND post = {p} AS BIGINT)"))
                .cast("long")
                .alias(f"n_{'t' if t else 'c'}_{'post' if p else 'pre'}"),
                F.sum(F.expr(f"CASE WHEN treat = {t} AND post = {p} THEN v6 END"))
                .cast("long")
                .alias(f"s_{'t' if t else 'c'}_{'post' if p else 'pre'}"),
            )
        ]
    )

    def mean(cell: str) -> str:
        return f"(CAST(s_{cell} AS DOUBLE) / n_{cell} / 100)"

    means = {c: mean(c) for c in ("t_pre", "t_post", "c_pre", "c_post")}
    did = (
        f"(({means['t_post']}) - ({means['t_pre']}))"
        f" - (({means['c_post']}) - ({means['c_pre']}))"
    )
    return cells.selectExpr(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        *[
            f"floor({expr} * 1000000) / 1000000 AS mean_{c}"
            for c, expr in means.items()
        ],
        # outer parens are load-bearing: did ends in a '- (...)' term, so
        # an unparenthesized '* 1000000' would bind to that term alone
        f"floor(({did}) * 1000000) / 1000000 AS did",
    )


def diff_in_diff_oracle(cutover: str = "1996-01-01") -> str:
    cells = []
    for t, tn in ((1, "t"), (0, "c")):
        for p, pn in ((0, "pre"), (1, "post")):
            cond = f"(user_id % 2 = {t}) AND (ts >= TIMESTAMP '{cutover} 00:00:00') = ({p} = 1)"
            cells.append(
                f"CAST(SUM(CAST({cond} AS BIGINT)) AS BIGINT) AS n_{tn}_{pn}"
            )
            cells.append(
                f"CAST(SUM(CASE WHEN {cond} THEN CAST(round(value * 100) AS BIGINT) END)"
                f" AS BIGINT) AS s_{tn}_{pn}"
            )
    m = {
        c: f"(CAST(s_{c} AS DOUBLE) / n_{c} / 100)"
        for c in ("t_pre", "t_post", "c_pre", "c_post")
    }
    did = (
        f"(({m['t_post']}) - ({m['t_pre']})) - (({m['c_post']}) - ({m['c_pre']}))"
    )
    mean_cols = ",\n  ".join(
        f"floor({expr} * 1000000) / 1000000 AS mean_{c}" for c, expr in m.items()
    )
    return f"""WITH cells AS (SELECT {", ".join(cells)} FROM events)
SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
  {mean_cols},
  floor(({did}) * 1000000) / 1000000 AS did
FROM cells"""


def sliding_distinct_theta(
    events: DataFrame, window_hours: int = 24, rel_tol: float = 0.08
) -> DataFrame:
    """Sliding-window distinct users (trailing ``window_hours``) per
    hour via THETA SKETCH UNION — the sliding-DAU query that exact
    COUNT(DISTINCT) cannot decompose (distinct is not distributive
    across window panes) but mergeable sketches answer from ONE
    per-hour sketch table: each hour's sketch is built once, every
    trailing window unions its panes (``theta_union_agg``), history is
    never rescanned per window.  Third consumer of the mergeable-sketch
    machinery (KLL quantiles, CMS frequency, theta set algebra).

    The exact companion rides the same fan-out on the DISTINCT
    (hour, user) pair table — ``window_hours``·|pairs| rows into one
    COUNT(DISTINCT) per window, the gate's cost — and each window's
    sketch estimate feeds an asserted ``ok`` boolean (error ≤
    max(rel_tol·exact, 2)).  Sketches use lgK=14 (16384 nominal
    entries): sf1's densest window holds ~13.4k distinct users, so the
    sketch stays EXACT through sf1 and the oracle can pin TRUE; past
    exact mode rsd ≈ 0.8%, so the 8% bound is ~10σ — the TRUE pin
    survives estimation mode too, per window, at any corpus size.
    Windows are reported at OBSERVED hours only (a window anchored on
    a silent hour is the gap-filled variant).

    Output (|observed hours| rows): (win_hour, n_users_win, ok).
    """
    ph = events.selectExpr(
        "unix_micros(ts) div 3600000000 AS h", "user_id"
    )
    pairs = ph.distinct().localCheckpoint(eager=False)
    spine = pairs.select("h").distinct()
    span = window_hours - 1
    exact = (
        pairs.selectExpr("user_id", f"explode(sequence(h, h + {span})) AS win")
        .groupBy("win")
        .agg(F.expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)").alias("n_users_win"))
    )
    sk = ph.groupBy("h").agg(F.expr("theta_sketch_agg(user_id, 14)").alias("sk"))
    est = (
        sk.selectExpr("sk", f"explode(sequence(h, h + {span})) AS win")
        .groupBy("win")
        .agg(F.expr("theta_sketch_estimate(theta_union_agg(sk, 14))").alias("est"))
    )
    return (
        exact.join(est, "win")
        .join(spine, exact["win"] == spine["h"], "left_semi")
        .selectExpr(
            "win AS win_hour",
            "n_users_win",
            f"abs(CAST(est AS DOUBLE) - n_users_win)"
            f" <= greatest({rel_tol!r} * n_users_win, CAST(2 AS DOUBLE)) AS ok",
        )
    )


def sliding_distinct_theta_oracle(window_hours: int = 24) -> str:
    span = window_hours - 1
    return f"""WITH ph AS (
  SELECT DISTINCT epoch_us(ts) // 3600000000 AS h, user_id FROM events),
spine AS (SELECT DISTINCT h FROM ph),
fan AS (
  SELECT user_id, unnest(range(h, h + {span} + 1)) AS win FROM ph),
exact AS (
  SELECT win, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_win
  FROM fan GROUP BY 1)
SELECT e.win AS win_hour, e.n_users_win, TRUE AS ok
FROM exact e SEMI JOIN spine s ON e.win = s.h"""


def topk_churn(
    events: DataFrame, cutover: str = "1996-01-01", k: int = 100
) -> DataFrame:
    """Top-k leaderboard CHURN across a cutover: rank users by event
    count in the early and late periods (ties to lower user_id), keep
    each period's top-k, and summarize how much the leaderboard moved —
    set overlap (jaccard), newcomers/dropouts, and the Spearman
    footrule Σ|rank_early − rank_late| over the common members.  The
    monitoring question every ranked view answers after a data refresh
    ("did the top customers/queries/domains actually change, or just
    reshuffle?"), computed exactly.

    Plan shape: one conditional hash agg to the (user, period) spine,
    per-period rank windows ON that bounded spine (never the fact
    table), a top-k full-outer self-join of two ≤k-row sides, one 1-row
    readout.  Everything downstream of the first agg is |users|-sized.

    Output (1 row): k, n_top_early, n_top_late, n_common, newcomers,
    dropouts, jaccard, rank_footrule.
    """
    per = (
        events.selectExpr(
            "user_id",
            # CASE, not a bare CAST: CAST(NULL >= ts AS INT) is NULL, which
            # would shunt NULL-ts events into a third late=NULL group
            # excluded from both leaderboards — the oracle's ELSE 0 buckets
            # them into the early period, so mirror it exactly
            f"CASE WHEN ts >= TIMESTAMP '{cutover}' THEN 1 ELSE 0 END AS late",
        )
        .groupBy("user_id", "late")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = Window.partitionBy("late").orderBy(F.col("c").desc(), F.col("user_id").asc())
    ranked = per.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    a = ranked.where(F.col("late") == 0).select(
        F.col("user_id").alias("ua"), F.col("rn").alias("ra")
    )
    b = ranked.where(F.col("late") == 1).select(
        F.col("user_id").alias("ub"), F.col("rn").alias("rb")
    )
    j = a.join(b, a["ua"] == b["ub"], "full_outer")
    return j.agg(
        F.count("ua").cast("long").alias("n_top_early"),
        F.count("ub").cast("long").alias("n_top_late"),
        F.sum(
            (F.col("ua").isNotNull() & F.col("ub").isNotNull()).cast("int")
        ).cast("long").alias("n_common"),
        F.sum((F.col("ua").isNull() & F.col("ub").isNotNull()).cast("int"))
        .cast("long")
        .alias("newcomers"),
        F.sum((F.col("ua").isNotNull() & F.col("ub").isNull()).cast("int"))
        .cast("long")
        .alias("dropouts"),
        F.sum(
            F.when(
                F.col("ua").isNotNull() & F.col("ub").isNotNull(),
                F.abs(F.col("ra") - F.col("rb")),
            )
        ).cast("long").alias("rank_footrule"),
    ).selectExpr(
        f"CAST({k} AS BIGINT) AS k",
        "n_top_early",
        "n_top_late",
        "n_common",
        "newcomers",
        "dropouts",
        "floor(CAST(n_common AS DOUBLE)"
        " / (n_top_early + n_top_late - n_common) * 1000000) / 1000000 AS jaccard",
        "coalesce(rank_footrule, 0) AS rank_footrule",
    )


def topk_churn_oracle(cutover: str = "1996-01-01", k: int = 100) -> str:
    return f"""WITH per AS (
  SELECT user_id,
         CASE WHEN ts >= TIMESTAMP '{cutover}' THEN 1 ELSE 0 END AS late,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
r AS (
  SELECT user_id, late,
         ROW_NUMBER() OVER (PARTITION BY late ORDER BY c DESC, user_id ASC) AS rn
  FROM per),
a AS (SELECT user_id AS ua, rn AS ra FROM r WHERE late = 0 AND rn <= {k}),
b AS (SELECT user_id AS ub, rn AS rb FROM r WHERE late = 1 AND rn <= {k}),
j AS (SELECT ua, ub, ra, rb FROM a FULL OUTER JOIN b ON a.ua = b.ub)
SELECT CAST({k} AS BIGINT) AS k,
  CAST(COUNT(ua) AS BIGINT) AS n_top_early,
  CAST(COUNT(ub) AS BIGINT) AS n_top_late,
  CAST(SUM(CASE WHEN ua IS NOT NULL AND ub IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_common,
  CAST(SUM(CASE WHEN ua IS NULL AND ub IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS newcomers,
  CAST(SUM(CASE WHEN ua IS NOT NULL AND ub IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS dropouts,
  floor(CAST(SUM(CASE WHEN ua IS NOT NULL AND ub IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE)
    / (COUNT(ua) + COUNT(ub)
       - SUM(CASE WHEN ua IS NOT NULL AND ub IS NOT NULL THEN 1 ELSE 0 END))
    * 1000000) / 1000000 AS jaccard,
  CAST(coalesce(SUM(CASE WHEN ua IS NOT NULL AND ub IS NOT NULL
                     THEN abs(ra - rb) END), 0) AS BIGINT) AS rank_footrule
FROM j"""


#: Holt smoothing constants — DYADIC rationals (exact binary doubles),
#: so every multiply in the recursion is an exact scaling and the two
#: engines cannot diverge even in the last ulp.
HOLT_ALPHA = 0.5
HOLT_BETA = 0.25


def holt_linear_forecast(events: DataFrame, horizon: int = 3) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend) over
    the per-type hourly demand series — the forecasting step above
    ``ewma_hourly``'s smoothing-only kernel:

        l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},   ŷ_{t+h} = l_t + h·b_t

    The recursion runs over the GAP-FILLED hourly spine (a missing
    hour is a real zero-demand observation — folding observed rows
    only would treat a 2-day gap as one step, the ewma_hourly lesson),
    built per type as one ``map_from_entries`` + ``transform(sequence)``
    lookup against the 1-row global hour range: no |types|·|hours|
    explode ever shuffles.  The fold itself is ``F.aggregate`` in
    ascending hour order — a FIXED sequence of IEEE ops the DuckDB
    oracle replays as a recursive CTE, and with dyadic α=1/2, β=1/4
    every multiply is exact, so the trajectory matches bit-for-bit.
    Outputs floor at 6dp.

    Scale: one map-side-combinable hash agg to (type, hour), then
    everything rides the |types|-row spine with ≤|window hours| array
    elements each — the fold state is 2 doubles per type regardless of
    event volume.  Output: (event_type, n_hours, level, trend,
    fc_1..fc_{horizon}).
    """
    counts = events.selectExpr(
        "event_type", "unix_micros(ts) div 3600000000 AS h"
    ).groupBy("event_type", "h").agg(F.count("*").cast("long").alias("c"))
    return holt_from_counts(counts, horizon)


def holt_from_counts(counts: DataFrame, horizon: int = 3) -> DataFrame:
    """The fold stage of :func:`holt_linear_forecast` over an hourly
    (event_type, h, c) count table — batch-built or read back from the
    maintained streaming bucket state (``streaming/ewma.py``): the same
    grain serves the EWMA kernel AND the Holt forecast, the
    view-on-view payoff of maintaining the grain instead of the
    readout."""
    al, be = HOLT_ALPHA, HOLT_BETA
    oma, omb = 1.0 - al, 1.0 - be
    rng = counts.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    ).selectExpr("h0", "h1", "h0 - h0 AS _k")
    lnew = f"{al!r} * y + {oma!r} * (a.l + a.b)"
    step = (
        f"CASE WHEN a.i = 0 THEN named_struct('l', CAST(y AS DOUBLE), 'b', 0.0D, 'i', 1) "
        f"ELSE named_struct("
        f"'l', {lnew}, "
        f"'b', {be!r} * (({lnew}) - a.l) + {omb!r} * a.b, "
        f"'i', a.i + 1) END"
    )
    folded = (
        counts.groupBy("event_type")
        .agg(
            F.expr("map_from_entries(collect_list(struct(h, c)))").alias("m")
        )
        .selectExpr("event_type", "m", "pmod(size(m), 1) AS _k")
        .join(F.broadcast(rng), "_k")
        .selectExpr(
            "event_type",
            "transform(sequence(h0, h1), hh -> "
            "CAST(coalesce(element_at(m, hh), CAST(0 AS BIGINT)) AS DOUBLE)) AS ys",
        )
        .selectExpr(
            "event_type",
            "size(ys) AS n_hours",
            f"aggregate(ys, named_struct('l', 0.0D, 'b', 0.0D, 'i', 0), "
            f"(a, y) -> {step}) AS st",
        )
    )
    fcs = [
        f"floor((st.l + {h} * st.b) * 1000000) / 1000000 AS fc_{h}"
        for h in range(1, horizon + 1)
    ]
    return folded.selectExpr(
        "event_type",
        "CAST(n_hours AS BIGINT) AS n_hours",
        "floor(st.l * 1000000) / 1000000 AS level",
        "floor(st.b * 1000000) / 1000000 AS trend",
        *fcs,
    )


def holt_linear_forecast_oracle(horizon: int = 3) -> str:
    al, be = HOLT_ALPHA, HOLT_BETA
    oma, omb = 1.0 - al, 1.0 - be
    lnew = f"{al!r} * s.y + {oma!r} * (f.l + f.b)"
    fcs = ",\n  ".join(
        f"floor((l + {h} * b) * 1000000) / 1000000 AS fc_{h}"
        for h in range(1, horizon + 1)
    )
    return f"""WITH RECURSIVE counts AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), rng AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM counts),
hours AS (SELECT unnest(range(h0, h1 + 1)) AS hh FROM rng),
types AS (SELECT DISTINCT event_type FROM counts),
series AS (
  SELECT t.event_type, hh,
         CAST(coalesce(c.c, 0) AS DOUBLE) AS y,
         CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY hh)
              AS BIGINT) AS idx
  FROM types t CROSS JOIN hours
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.h = hh
), fold(event_type, i, l, b) AS (
  -- CAST: a bare 0.0 literal types the recursive column DECIMAL(2,1)
  -- and silently quantizes the whole trend trajectory to 0.1 steps
  SELECT event_type, idx, y, CAST(0.0 AS DOUBLE) FROM series WHERE idx = 1
  UNION ALL
  SELECT f.event_type, f.i + 1,
         {lnew},
         {be!r} * (({lnew}) - f.l) + {omb!r} * f.b
  FROM fold f
  JOIN series s ON s.event_type = f.event_type AND s.idx = f.i + 1
), n AS (SELECT event_type, MAX(idx) AS n_hours FROM series GROUP BY 1)
SELECT f.event_type,
  n.n_hours,
  floor(l * 1000000) / 1000000 AS level,
  floor(b * 1000000) / 1000000 AS trend,
  {fcs}
FROM fold f JOIN n ON n.event_type = f.event_type AND f.i = n.n_hours"""
