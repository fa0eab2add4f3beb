"""Data-quality constraint checking — the deequ/dbt-test-style
validation gate a training pipeline runs before a corpus snapshot is
blessed.

Every declared constraint is evaluated in ONE pass over the table as a
conditional aggregate (``SUM(CASE WHEN violated ...)``): N constraints
cost one scan and one 1-row-ish aggregate, never N scans.  Referential
integrity needs the dimension side, but a broadcast LEFT join against
the unique dimension key is row-preserving, so even the RI check folds
into the same single pass as a null-test predicate.

Output contract (one row per constraint — narrow, mergeable,
alert-routable):
  check_name   — stable identifier, e.g. 'o_totalprice_positive'
  n_rows       — rows evaluated
  n_violations — rows failing the predicate
  passed       — n_violations == 0

The reference has no validation surface at all; its single implicit
constraint is the MAX id filter (``countedges/CountEdgesAfterMax.java:56``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def check_constraints(df: DataFrame, checks: list[tuple[str, str]]) -> DataFrame:
    """Evaluate ``checks`` = [(name, violation_predicate_sql)] in one
    conditional-aggregate pass.  A row violates a constraint when its
    predicate evaluates TRUE (nulls count as violations for NOT NULL
    style predicates written accordingly).

    Check names are spliced into generated SQL (as literals and
    identifiers), so they must be plain identifiers — validated here
    rather than trusted."""
    reserved = {"n_rows", "check_name", "n_violations", "passed"}
    bad = [n for n, _ in checks if not _NAME_RE.match(n) or n in reserved]
    if bad:
        raise ValueError(
            f"check names must be identifiers ([A-Za-z0-9_]) and must not "
            f"collide with the output columns {sorted(reserved)}: {bad}"
        )
    aggs = [F.count("*").alias("n_rows")]
    for name, pred in checks:
        aggs.append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("long").alias(name)
        )
    wide = df.agg(*aggs)
    # unpivot the one wide row into (check_name, n_rows, n_violations, passed)
    names = [name for name, _ in checks]
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return wide.selectExpr(
        "n_rows", f"stack({len(names)}, {stack}) AS (check_name, n_violations)"
    ).select(
        "check_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


#: Declared constraints for the ``orders`` snapshot — names are stable
#: identifiers, predicates are VIOLATION conditions in shared SQL.
ORDERS_CHECKS: list[tuple[str, str]] = [
    ("o_orderkey_not_null", "o_orderkey IS NULL"),
    ("o_totalprice_positive", "o_totalprice IS NULL OR o_totalprice <= 0"),
    ("o_orderstatus_in_domain", "o_orderstatus NOT IN ('O', 'F', 'P')"),
    ("o_orderdate_in_range",
     "o_orderdate < TIMESTAMP '1990-01-01 00:00:00' OR o_orderdate > TIMESTAMP '2010-01-01 00:00:00'"),
    ("o_orderpriority_wellformed", "o_orderpriority NOT RLIKE '^[1-5]-'"),
]


def orders_quality_checks(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The declared ``orders`` constraint suite plus referential
    integrity against ``customer`` (every o_custkey resolves).

    The RI probe is a broadcast LEFT join against the dimension key —
    row-preserving, so ALL checks (declared + RI-as-null-test) fold
    into the SAME single conditional-aggregate pass: one scan, one
    broadcast hash join, one 1-row aggregate, no unions or cross joins.
    The dimension side is DISTINCT'd first: if the dimension itself
    carries duplicate keys (exactly the defect class a gate exists to
    catch), a raw left join would duplicate fact rows and corrupt every
    other check's counts.
    """
    joined = orders.join(
        F.broadcast(customer.select("c_custkey").distinct()),
        orders["o_custkey"] == F.col("c_custkey"),
        "left",
    )
    return check_constraints(
        joined, ORDERS_CHECKS + [("o_custkey_references_customer", "c_custkey IS NULL")]
    )


def orders_quality_checks_oracle() -> str:
    rows = []
    for name, pred in ORDERS_CHECKS:
        duck_pred = pred.replace("NOT RLIKE", "!~").replace("RLIKE", "~")
        if "!~" in duck_pred:
            col, pat = duck_pred.split(" !~ ")
            duck_pred = f"NOT regexp_matches({col}, {pat})"
        rows.append(
            f"""SELECT '{name}' AS check_name, COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN {duck_pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders"""
        )
    rows.append(
        """SELECT 'o_custkey_references_customer' AS check_name,
  (SELECT COUNT(*) FROM orders) AS n_rows,
  CAST(COUNT(*) AS BIGINT) AS n_violations
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)"""
    )
    sql = "\nUNION ALL\n".join(rows)
    return f"""SELECT check_name, n_rows, n_violations, n_violations = 0 AS passed
FROM ({sql})"""


# ---------------------------------------------------------------------------
# k-anonymity audit (privacy gate)
# ---------------------------------------------------------------------------

def kanonymity_audit(documents: DataFrame, k: int = 5) -> DataFrame:
    """Re-identification risk audit: group the corpus by its
    quasi-identifier tuple (lang, source, 100-char length bucket) and
    surface every group smaller than ``k`` — rows whose QI combination
    is rare enough to single out an individual document/author.  The
    privacy twin of the constraint gate: release the snapshot only when
    this returns zero rows (or after suppressing/generalizing the
    flagged groups).

    One hash aggregate with map-side partial aggregation; the QI bucket
    is a scan-side floor-div.  At 100 TB the groupBy key count is the
    QI-space size (small), not the row count.
    """
    bucket = (F.col("n_chars") / 100).cast("long").alias("chars_bucket")
    return (
        documents.groupBy("lang", "source", bucket)
        .agg(F.count("*").cast("long").alias("group_size"))
        .where(F.col("group_size") < k)
    )


def kanonymity_audit_oracle(k: int = 5) -> str:
    return f"""SELECT lang, source,
  CAST(n_chars // 100 AS BIGINT) AS chars_bucket,
  CAST(COUNT(*) AS BIGINT) AS group_size
FROM documents
GROUP BY lang, source, n_chars // 100
HAVING COUNT(*) < {k}"""


def ldiversity_audit(documents: DataFrame, l: int = 3) -> DataFrame:
    """l-diversity audit — the attribute-disclosure companion of
    :func:`kanonymity_audit` (k-anonymity stops re-identification;
    l-diversity stops inferring a SENSITIVE attribute once the group
    is found): group by the quasi-identifier tuple (source, 100-char
    length bucket) and flag groups whose sensitive attribute (lang)
    takes fewer than ``l`` distinct values, emitting the homogeneity
    evidence (distinct-value count + majority share).

    Two hash aggregates — (QI, lang) counts, then the per-QI rollup —
    both map-side combinable; key count is QI-space × |langs|, never
    row count.  The majority share is floored at 6 dp from exact
    integer counts.
    """
    bucket = (F.col("n_chars") / 100).cast("long").alias("chars_bucket")
    per_lang = documents.groupBy("source", bucket, F.col("lang")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    return (
        per_lang.groupBy("source", "chars_bucket")
        .agg(
            F.sum("cnt").cast("long").alias("group_size"),
            F.count("*").cast("long").alias("n_langs"),
            F.max("cnt").cast("long").alias("majority_cnt"),
        )
        .where(F.col("n_langs") < l)
        .selectExpr(
            "source", "chars_bucket", "group_size", "n_langs",
            "floor(CAST(majority_cnt AS DOUBLE) / CAST(group_size AS DOUBLE)"
            " * 1e6) / 1e6 AS majority_share",
        )
    )


def ldiversity_audit_oracle(l: int = 3) -> str:
    return f"""WITH per_lang AS (
  SELECT source, CAST(n_chars // 100 AS BIGINT) AS chars_bucket, lang,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY source, n_chars // 100, lang
)
SELECT source, chars_bucket,
       CAST(SUM(cnt) AS BIGINT) AS group_size,
       CAST(COUNT(*) AS BIGINT) AS n_langs,
       floor(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) * 1e6) / 1e6
         AS majority_share
FROM per_lang GROUP BY source, chars_bucket
HAVING COUNT(*) < {l}"""
