"""Dump the formatted physical plan of named registered queries to files.

    PYTHONPATH=/root/repo python tools/explain_query.py OUT_DIR SUFFIX name...

Writes ``OUT_DIR/<name>_<SUFFIX>.txt`` with ``.explain("formatted")``
output at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1 — plans are dumped at
the bench scale so AQE-relevant sizes match what the bench executes).
Used for the per-round optimization evidence (``plans/r11/``).
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    out_dir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.dump_plans import formatted_plan

    from twitter_followers_patterns_mapreduce_spark.plans.registry import all_queries
    from twitter_followers_patterns_mapreduce_spark.session import get_spark

    spark = get_spark(
        app_name="explain_query", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        plan = formatted_plan(qs[name](spark, sf_dir))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
