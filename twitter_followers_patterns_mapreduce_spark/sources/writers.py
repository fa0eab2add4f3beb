"""Sinks (reference S4): every reference job persists output part files
via ``FileOutputFormat.setOutputPath`` (``exact/Exact2HopCount.java:132``,
``approx/Approx2HopCount.java:146``, ``rsjoin/RSJoinTriangleCount.java:204,224``,
``countedges/CountEdgesAfterMax.java:81``).

Spark-first mapping: ``df.write`` with an explicit format.  Parquet is
the default (columnar, statistics, predicate-pushdown on re-read);
``csv`` reproduces the reference's text part-file layout exactly
(one ``part-*`` file per partition).  ``partition_by`` maps to hive-style
directory partitioning — the 100 TB layout knob the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FORMATS = ("parquet", "csv", "json", "orc")


def write_result(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Persist a query result as part files under ``path``.

    Mirrors the reference's job-output contract (a directory of
    part files), with the format made explicit instead of implied.
    """
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if format == "csv":
        # header on so a re-read recovers column names like the typed
        # formats do (the reference's tab-separated parts are headerless
        # and rely on positional convention — an explicit non-goal here)
        w.option("header", "true").csv(path)
    elif format == "json":
        w.json(path)
    elif format == "orc":
        # columnar alternative with the same pushdown/pruning contract;
        # kept in the matrix so a warehouse standardized on ORC can
        # consume the engine's outputs unchanged
        w.orc(path)
    else:
        w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
    sorted_by_key: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-bucketed (and optionally sorted) parquet
    table — the 100 TB co-location knob.

    Two tables bucketed on their join key with the same bucket count
    join WITHOUT any Exchange: the shuffle is paid once at write time
    and amortized over every subsequent join/aggregate on that key
    (classic warehouse layout; the reference re-shuffles per job).
    ``sortBy`` additionally removes the per-task Sort under sort-merge
    joins.  ``path`` makes the table external (files live there, only
    metadata in the catalog).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sorted_by_key:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def zvalue(x, y, bits: int = 16):
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative integer columns (x even positions, y odd) — a pure
    bitwise Column expression, JVM-side inside whole-stage codegen.

    Precondition: inputs should already lie in ``[0, 2^bits)`` (rescale
    or bucketize wider domains first).  Out-of-range values are clamped
    onto the boundary cells — every negative x maps to x=0 and every
    x >= 2^bits to the max cell — which WIDENS those files' min-max
    stats and erodes pruning; clamping only guards against the key
    arithmetic overflowing, it does not make wide domains cluster."""
    from pyspark.sql import functions as F

    cap = (1 << bits) - 1
    xc = F.least(F.greatest(F.col(x) if isinstance(x, str) else x, F.lit(0)), F.lit(cap))
    yc = F.least(F.greatest(F.col(y) if isinstance(y, str) else y, F.lit(0)), F.lit(cap))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(xc.bitwiseAND(F.lit(1 << i)).cast("long"), i))
            .bitwiseOR(F.shiftleft(yc.bitwiseAND(F.lit(1 << i)).cast("long"), i + 1))
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write: range-partition + sort on the
    Morton interleave of two filter columns, so each output file covers
    a small RECTANGLE in (x, y) space instead of a thin stripe.

    Why it matters at 100 TB: parquet readers prune files/row-groups by
    min-max statistics.  A layout sorted on x alone prunes x-filters
    but leaves every file's y-range full-width — 2-D box queries scan
    everything.  Z-order keeps BOTH ranges narrow per file, so a
    selective (x AND y) predicate skips most files entirely (same idea
    as Delta/Iceberg ZORDER BY, built from vanilla repartitionByRange +
    sortWithinPartitions).  Verified by the layout test, which counts
    stats-intersecting files for a box query under both layouts.
    """
    from pyspark.sql import functions as F

    (
        df.withColumn("_z", zvalue(col_x, col_y, bits))
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def compact(spark, path: str, format: str = "parquet", target_files: int = 1) -> int:
    """Small-file compaction: rewrite a directory of part files into
    ``target_files`` files (atomically via a sibling temp dir + rename).

    The 100 TB housekeeping primitive — streaming/incremental writers
    leave thousands of small parts per partition, and scan throughput
    dies on file-open overhead long before bytes do.  ``coalesce`` (no
    shuffle) merges read-side; the rewrite is one pass.

    Returns the number of data files after compaction.
    """
    import os
    import shutil

    if format != "parquet":
        raise ValueError("compaction supports parquet only")
    tmp = path.rstrip("/") + "._compact_tmp"
    spark.read.parquet(path).coalesce(target_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return sum(
        1 for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """OPTIMIZE-style small-file compaction: rewrite the parquet
    directory at ``path`` into ``out_path`` with file sizes near
    ``target_file_bytes``.  Returns the output file count.

    Complements :func:`compact` above: that one rewrites IN PLACE to a
    fixed file COUNT (local-FS atomic rename); this one writes to a new
    location with a byte-size target derived from a filesystem metadata
    listing, and works on any Hadoop-compatible filesystem.

    Why it matters at 100 TB: streaming micro-batches, per-partition
    appends, and over-parallel writes leave thousands of KB-scale files
    per partition; every subsequent scan then pays a task (plus footer
    read and open) PER FILE, and the NameNode/listing layer pays the
    metadata.  Periodic compaction restores scan-sized files — the same
    maintenance every table format schedules (the reference, writing
    one part file per reducer, has exactly this problem at scale).

    Shape: file sizes come from a driver-side filesystem listing (cheap
    metadata, no data read), the target file count from exact integer
    arithmetic, and the rewrite is ``coalesce(n)`` — a shuffle-FREE
    merge of existing partitions into fewer write tasks.  ``coalesce``
    (not ``repartition``): compaction merges, it never needs a
    row-redistributing shuffle.  Two standard no-shuffle tradeoffs:
    output files are uneven when input files are uneven, and
    ``coalesce`` can only DECREASE parallelism — when the target count
    exceeds the read partition count (files already larger than the
    target) the write keeps the smaller count; splitting oversized
    files would need a shuffle and is out of scope.  The return value
    is the ACTUAL output file count from listing ``out_path``.
    """

    def _list_bytes_files(p: str) -> tuple[int, int]:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        it = fs.listFiles(jpath, True)
        total = n = 0
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if name.endswith(".parquet") or name.startswith("part-"):
                total += f.getLen()
                n += 1
        return total, n

    total, _ = _list_bytes_files(path)
    n_files = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    spark.read.parquet(path).coalesce(n_files).write.mode(mode).parquet(out_path)
    _, n_out = _list_bytes_files(out_path)
    return n_out
