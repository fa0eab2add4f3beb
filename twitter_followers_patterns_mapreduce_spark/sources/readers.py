"""Sources: edge-table readers and harness table loaders.

Reference scan surface (SURVEY.md §2.1):
  * S1 — text line scan of ``edges.csv`` (``exact/Exact2HopCount.java:131``,
    ``countedges/CountEdgesAfterMax.java:80``): here a schema'd CSV read;
    Catalyst pushes filters into the scan and prunes columns.
  * S3 — line parse ``StringTokenizer``+``split(",")``+``parseInt``
    (``exact/Exact2HopCount.java:55-59``): subsumed by the CSV reader's
    typed schema; also provided over raw-line DataFrames for parity.
  * S2 — multi-source scan (``rsjoin/RSJoinTriangleCount.java:217-218``)
    needs no special API in Spark: two DataFrames feeding one join.

IDs are ``LongType`` throughout — the reference parses 32-bit
(``countedges/CountEdgesAfterMax.java:52-53``) but accumulates 64-bit;
at 100 TB scale 64-bit ids are mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: Modulus used to derive a dense edge view from ``lineitem`` — dense enough
#: (~997 nodes) to contain 2-hop paths and triangles at sf0.01 (FIXTURES.md §1.5).
EDGE_MODULUS = 997

#: DuckDB-compatible CTE body defining the identical edge view for oracles.
EDGES_ORACLE_CTE = (
    "SELECT DISTINCT CAST(l_orderkey % 997 AS BIGINT) AS src, "
    "CAST(l_partkey % 997 AS BIGINT) AS dst "
    "FROM lineitem WHERE l_orderkey % 997 <> l_partkey % 997"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan of one harness table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` loader, adaptive to the parquet's physical ``ts`` type
    (the generator has shipped both TIMESTAMP(NANOS) and TIMESTAMP(US)):

    * nanos — Spark's vectorized reader rejects it; read nanos as BIGINT
      and convert with INTEGER division (``div`` — a double division
      would lose precision above 2^53 ns ≈ 104 days). DuckDB truncates
      nanos→micros the same way, so oracles align.
    * micros — arrives as TIMESTAMP_NTZ; cast to the session-zone
      timestamp (session tz is pinned UTC in ``session.py``, so the
      instant is unchanged and downstream ``unix_micros``/``window()``
      math matches DuckDB's ``epoch_us`` exactly).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = load_table(spark, sf_dir, "events")
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def edges_from_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a ``src,dst`` edge list exactly like the reference's input
    (``Makefile:10`` ``local.input=input/edges.csv``, no header).

    Explicit schema — no inference pass over 100 TB of text.
    """
    return spark.read.schema(EDGE_SCHEMA).csv(path)


def edges_from_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse raw text lines ``"src,dst"`` into typed edges (S3 parity:
    ``exact/Exact2HopCount.java:55-59``). JVM-side split+cast, no UDF."""
    parts = F.split(F.col(col), ",")
    return lines.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
    )


def derived_edges(spark: SparkSession, sf_dir: str, modulus: int = EDGE_MODULUS) -> DataFrame:
    """Deterministic edge view over ``lineitem`` (FIXTURES.md §1.5),
    expressible identically in DuckDB SQL for the oracle harness.

    Only two columns are read from the parquet scan (Catalyst column
    pruning), and the DISTINCT is a single hash-aggregate shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % modulus).cast("long").alias("src"),
            (F.col("l_partkey") % modulus).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def materialize_edges_csv(sf_dir: str) -> str:
    """Materialize the derived edge view as a headerless ``src,dst``
    CSV — the reference's NATIVE input format (``Makefile:10``
    ``local.input=input/edges.csv``) — so the CSV scan path (S1) can be
    exercised end-to-end under the DuckDB oracle, not only on the
    parquet-derived view.

    Deterministic (ORDER BY src, dst over the same DISTINCT edge
    derivation as :data:`EDGES_ORACLE_CTE`), cached under the repo's
    ``.cache/`` keyed by sf-dir name, regenerated only when the source
    parquet is newer.  Written via tmp+rename so a concurrent reader
    never sees a half-written file."""
    import os

    import duckdb

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(repo_root, ".cache", "edges_csv", name)
    path = os.path.join(out_dir, "edges.csv")
    src = os.path.join(sf_dir, "lineitem.parquet")
    if os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(src):
        return path
    os.makedirs(out_dir, exist_ok=True)
    derivation = EDGES_ORACLE_CTE.replace("FROM lineitem", f"FROM '{src}'")
    tmp = path + ".tmp"
    con = duckdb.connect()
    try:
        con.sql(f"COPY ({derivation} ORDER BY src, dst) TO '{tmp}' (HEADER false)")
    finally:
        con.close()
    os.replace(tmp, path)
    return path


def edges_from_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines edge source (``{"src": 1, "dst": 2}`` per line) with
    the same explicit schema as the CSV path — no inference pass."""
    return spark.read.schema(EDGE_SCHEMA).json(path)


def edges_from_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC edge source — columnar alternative to parquet; schema comes
    from the file footer, projected onto (src, dst)."""
    return spark.read.orc(path).select(F.col("src").cast("long"), F.col("dst").cast("long"))


def _bytes_conf(spark: SparkSession, key: str, default: int) -> int:
    """Read a size conf as bytes; tolerate "128m"-style strings."""
    try:
        v = spark.conf.get(key)
    except Exception:
        return default
    try:
        return int(v)
    except (TypeError, ValueError):
        try:
            jvm = spark.sparkContext._jvm
            return int(jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v))
        except Exception:
            return default


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Cheap lower-bound estimate of the scan parallelism feeding
    ``df`` — from its input FILES, never from planning the query
    (``df.rdd.getNumPartitions()`` pays a full physical-planning pass,
    measured 1-2.3 s on the derived-edge pipeline; ``inputFiles()`` is
    analysis-only).

    Split arithmetic mirrors ``FilePartition.getFilePartitions``: each
    file is charged max(its size, nothing) plus ``openCostInBytes``
    when packed, and a split closes at ``maxPartitionBytes`` — so
    #splits ≥ (Σ size + |files|·openCost) / maxPartitionBytes.  Local
    ``file:`` URIs get exact sizes (one statvfs each); other schemes
    fall back to the open-cost floor alone (|files|·openCost/maxPB),
    which is the guaranteed packing minimum without any remote RPCs.
    Returns None when the frame has no file inputs (in-memory,
    post-shuffle-only lineage) — the caller keeps its old behavior.
    """
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    spark = df.sparkSession
    max_pb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 * 1024 * 1024)
    charged = 0
    for f in files:
        p = urlparse(f)
        charged += open_cost
        if p.scheme in ("file", ""):
            try:
                charged += os.path.getsize(unquote(p.path))
            except OSError:
                pass
    return max(1, -(-charged // max(1, max_pb)))


def fan_out(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition ahead of an expansion-heavy join or a
    per-row-expensive projection stage — SKIPPED when the input scan
    already arrives at least that parallel.

    Scan partitioning is sized by INPUT bytes
    (``spark.sql.files.maxPartitionBytes``); a stage whose cost is
    dominated by output amplification (a 2-hop path join emits ~40×
    its input) or by heavy per-row expressions (128-permutation
    minhash) needs partitioning sized by WORK instead.  Locally the
    single-row-group testdata parquet pins such stages to one task —
    this one small shuffle of the input unlocks all cores.

    On a cluster the 100 TB scan already arrives well-split, and an
    unconditional ``repartition(n)`` would insert a gratuitous full
    round-robin shuffle of the projected columns (round-11 verdict):
    when the file-based estimate of the scan's own parallelism
    (:func:`_estimated_scan_partitions`) is already ≥ the target, the
    frame is returned UNCHANGED.  At bench scale the local single-file
    inputs estimate to 1 split, so the RoundRobin exchange is still
    present in every local plan; frames with no file lineage keep the
    old unconditional behavior.
    """
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    est = _estimated_scan_partitions(df)
    if est is not None and est >= n:
        return df
    return df.repartition(n)
