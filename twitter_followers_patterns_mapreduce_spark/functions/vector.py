"""Vector math over ``ARRAY<FLOAT>`` embedding columns — built-in
higher-order functions only (zip_with/aggregate fold inside codegen);
no Python in the hot path.

Arrays are cast element-wise to DOUBLE before any arithmetic so the
fold is IEEE-double in index order — the DuckDB oracle
(``list_dot_product`` on ``DOUBLE[]``) accumulates in the same order,
and outputs are rounded to 6 dp as a belt-and-braces guard.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    # coalesce(…, []) never fires (embeddings are non-null) but makes the
    # column NON-NULLABLE, so joins/filters on derived similarity values
    # can't infer an isnotnull(transform(…)) constraint that pushdown
    # would re-evaluate per row in a scan-side Filter
    return F.coalesce(
        F.transform(v, lambda x: x.cast("double")), F.array().cast("array<double>")
    )


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine()`` with the per-vector norms hoisted into staged columns:
    identical arithmetic (dot / (na·nb), so bit-identical results), but
    each norm is computed once per VECTOR below the join instead of once
    per candidate PAIR above it — per-pair cost drops from three array
    folds to one."""
    return dot(a, b) / (na * nb)


def cosine_sql_duckdb(a: str, b: str) -> str:
    """DuckDB-side cosine over DOUBLE[] columns."""
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
