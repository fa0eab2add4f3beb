"""Retry-determinism probe: a deterministic aggregation must survive a
task retry bit-for-bit.  Runs in its OWN process (spawned by
tests/test_retry_determinism.py) because the retry-enabled master
string ``local[4,2]`` must be set at SparkContext creation and the
test-suite session is a JVM singleton.

Injects a first-attempt failure into one partition via TaskContext
(attemptNumber == 0) inside a mapInPandas pass, then asserts the
grouped aggregate equals the clean run — the local-mode stand-in for
the 1000-executor claim the engine makes everywhere else by
construction (hash-derived sampling, DECIMAL reductions, no rand()):
a recomputed partition replays the identical rows.
"""
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark import TaskContext


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4,2]")
        .appName("retry-probe")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    df = spark.range(0, 10_000, 1, 8).select(
        (F.col("id") % 97).alias("k"), (F.col("id") * 31 % 1009).alias("v")
    )

    def flaky(iterator):
        ctx = TaskContext.get()
        for pdf in iterator:
            if ctx.partitionId() == 3 and ctx.attemptNumber() == 0:
                raise RuntimeError("injected first-attempt failure")
            yield pdf

    flaked = df.mapInPandas(flaky, schema="k long, v long")

    def agg(d):
        return sorted(
            (r["k"], r["s"], r["n"])
            for r in d.groupBy("k")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )

    got, want = agg(flaked), agg(df)
    assert got == want, "retry changed the result"
    print("RETRY_OK", len(got))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
