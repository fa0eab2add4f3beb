"""Generate a larger synthetic sf directory mirroring the driver's
testdata schema/distributions (TESTDATA.md; profiled from sf0.1), for
scale measurements the shipped fixtures can't support (sf1 = ~6M
lineitem).  Deterministic (DuckDB hash(), no RNG state), written to the
repo's .cache/ — NEVER to the read-only /root/testdata.

    PYTHONPATH=/root/repo python tools/gen_sf.py [sf] [out_dir]

sf scales every table's row count linearly from the sf0.1 profile.
region/nation are copied verbatim (fixed dimensions).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: sf0.1 row counts (profiled); scaled by sf/0.1.
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

SEGMENTS = "['AUTOMOBILE','MACHINERY','HOUSEHOLD','FURNITURE','BUILDING']"
PRIORITIES = "['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']"
PTYPES = "['ECONOMY','LARGE','MEDIUM','PROMO','SMALL','STANDARD']"
PADJ = "['blue','cold','hot','large','small','red','green','shiny']"
PNOUN = "['anvil','bolt','gear','gizmo','plate','ring','rod','widget']"
ETYPES = "['click','view','purchase','signup','error']"
LANGS = "['en','es','de','fr','zh']"
VOCAB = (
    "['a','agg','batch','big','column','customer','data','dup','fast','filter',"
    "'group','hash','join','key','line','merge','order','part','query','row',"
    "'scan','slow','small','sort','spark','stream','table','the','value',"
    "'vector','window']"
)


def _u(expr: str, salt: int) -> str:
    """Deterministic uniform in [0, 1) from an integer expression."""
    return f"((hash(({expr}) * 2654435761 + {salt}) % 1000000) / 1000000.0)"


def generate(sf: float, out_dir: str) -> None:
    n = {t: max(1, int(round(c * sf / 0.1))) for t, c in BASE.items()}
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def copy(table: str, sql: str) -> None:
        con.sql(f"COPY ({sql}) TO '{out_dir}/{table}.parquet' (FORMAT parquet)")
        print(f"  {table}: {con.sql(f'SELECT COUNT(*) FROM {chr(39)}{out_dir}/{table}.parquet{chr(39)}').fetchone()[0]} rows")

    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    copy("customer", f"""
SELECT i AS c_custkey,
       printf('Customer#%09d', i) AS c_name,
       CAST(hash(i * 7 + 1) % 25 AS INTEGER) AS c_nationkey,
       round(-1000 + 11000 * {_u('i', 2)}, 2) AS c_acctbal,
       {SEGMENTS}[1 + CAST(hash(i * 7 + 3) % 5 AS INTEGER)] AS c_mktsegment
FROM range({n['customer']}) t(i)""")

    copy("supplier", f"""
SELECT i AS s_suppkey,
       printf('Supplier#%09d', i) AS s_name,
       CAST(hash(i * 11 + 4) % 25 AS INTEGER) AS s_nationkey,
       round(-1000 + 11000 * {_u('i', 5)}, 2) AS s_acctbal
FROM range({n['supplier']}) t(i)""")

    copy("part", f"""
SELECT i AS p_partkey,
       {PADJ}[1 + CAST(hash(i * 13 + 6) % 8 AS INTEGER)] || ' ' ||
         {PNOUN}[1 + CAST(hash(i * 13 + 7) % 8 AS INTEGER)] AS p_name,
       'Brand#' || CAST(1 + hash(i * 13 + 8) % 25 AS VARCHAR) AS p_brand,
       {PTYPES}[1 + CAST(hash(i * 13 + 9) % 6 AS INTEGER)] AS p_type,
       CAST(1 + hash(i * 13 + 10) % 50 AS INTEGER) AS p_size,
       round(900 + 100 * {_u('i', 11)}, 2) AS p_retailprice
FROM range({n['part']}) t(i)""")

    copy("orders", f"""
SELECT i AS o_orderkey,
       CAST(hash(i * 17 + 12) % {n['customer']} AS BIGINT) AS o_custkey,
       ['O','P','F'][1 + CAST(hash(i * 17 + 13) % 3 AS INTEGER)] AS o_orderstatus,
       round(1000 + 499000 * {_u('i', 14)}, 2) AS o_totalprice,
       TIMESTAMP '1995-01-01' + INTERVAL 1 DAY * CAST(hash(i * 17 + 15) % 2400 AS INTEGER)
         AS o_orderdate,
       {PRIORITIES}[1 + CAST(hash(i * 17 + 16) % 5 AS INTEGER)] AS o_orderpriority
FROM range({n['orders']}) t(i)""")

    # uniform order assignment -> Binomial(~4) lines per order, matching
    # the profiled Poisson-like distribution; linenumber via window
    copy("lineitem", f"""
SELECT l_orderkey,
       l_partkey,
       l_suppkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY rid) AS INTEGER)
         AS l_linenumber,
       l_quantity, l_extendedprice, l_discount, l_tax,
       l_returnflag, l_linestatus, l_shipdate
FROM (
  SELECT i AS rid,
         CAST(hash(i * 19 + 17) % {n['orders']} AS BIGINT) AS l_orderkey,
         CAST(hash(i * 19 + 18) % {n['part']} AS BIGINT) AS l_partkey,
         CAST(hash(i * 19 + 19) % {n['supplier']} AS BIGINT) AS l_suppkey,
         CAST(1 + hash(i * 19 + 20) % 50 AS DOUBLE) AS l_quantity,
         round(900 + 104100 * {_u('i', 21)}, 2) AS l_extendedprice,
         round(0.01 * CAST(hash(i * 19 + 22) % 11 AS INTEGER), 2) AS l_discount,
         round(0.01 * CAST(hash(i * 19 + 23) % 9 AS INTEGER), 2) AS l_tax,
         ['A','N','R'][1 + CAST(hash(i * 19 + 24) % 3 AS INTEGER)] AS l_returnflag,
         ['O','F'][1 + CAST(hash(i * 19 + 25) % 2 AS INTEGER)] AS l_linestatus,
         TIMESTAMP '1995-01-01' + INTERVAL 1 DAY * CAST(1 + hash(i * 19 + 26) % 2499 AS INTEGER)
           AS l_shipdate
  FROM range({n['lineitem']}) t(i))""")

    copy("events", f"""
SELECT i AS event_id,
       TIMESTAMP '2024-01-01'
         + to_microseconds(CAST(hash(i * 23 + 27) % (30::BIGINT * 86400 * 1000000) AS BIGINT))
           AS ts,
       CAST(hash(i * 23 + 28) % {max(1, n['events'] // 67)} AS BIGINT) AS user_id,
       {ETYPES}[1 + CAST(hash(i * 23 + 29) % 5 AS INTEGER)] AS event_type,
       round(560.21 * {_u('i', 30)}, 2) AS value,
       '{{"k": ' || CAST(hash(i * 23 + 31) % 100 AS VARCHAR) || '}}' AS props
FROM range({n['events']}) t(i)""")

    copy("documents", f"""
SELECT i AS doc_id,
       txt AS text,
       {LANGS}[1 + CAST(hash(i * 29 + 33) % 5 AS INTEGER)] AS lang,
       'src' || CAST(hash(i * 29 + 34) % 20 AS VARCHAR) AS source,
       CAST(length(txt) AS BIGINT) AS n_chars
FROM (
  SELECT i,
         array_to_string(
           list_transform(range(1, 11 + CAST(hash(i * 29 + 32) % 91 AS INTEGER)),
                          j -> {VOCAB}[1 + CAST(hash(i * 131 + j * 7 + 35) % 31 AS INTEGER)]),
           ' ') AS txt
  FROM range({n['documents']}) t(i))""")

    # approx N(0, 0.125) per dim via Irwin-Hall sum of 4 uniforms
    copy("embeddings", f"""
SELECT i AS vec_id,
       list_transform(range(0, 64), j -> CAST(
         0.2165 * ({_u('i * 64 + j', 36)} + {_u('i * 64 + j', 37)}
                   + {_u('i * 64 + j', 38)} + {_u('i * 64 + j', 39)} - 2.0)
         AS FLOAT)) AS embedding,
       CAST(hash(i * 31 + 40) % 10 AS INTEGER) AS label
FROM range({n['embeddings']}) t(i)""")


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".cache", f"sf{sf:g}")
    print(f"generating sf={sf} into {out}")
    generate(sf, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
