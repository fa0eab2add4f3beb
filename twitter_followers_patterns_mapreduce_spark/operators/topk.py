"""Scale-safe global top-k with a rank column.

``orderBy().limit(k)`` plans as TakeOrderedAndProject — per-partition
top-k then a driver merge of k·partitions rows — never a global sort.
The rank column is then assigned by a window over the already-limited k
rows.  The window partitions on ``pmod(anchor, 1)`` (always 0, but
data-derived so Catalyst cannot constant-fold it away): a foldable
partition key like ``lit(0)`` is optimized into an EMPTY partition spec
and WindowExec falls back to the move-everything-to-one-task global
window — exactly the plan this helper exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_top_k(df: DataFrame, order: list[Column], k: int, anchor: str) -> DataFrame:
    """Top-k rows of ``df`` under ``order`` with a 1-based ``rank``
    column.  ``anchor`` names any non-negative numeric column (an id);
    it only feeds the unfoldable constant partition key."""
    top = df.orderBy(*order).limit(k)
    w = Window.partitionBy(F.pmod(F.col(anchor), F.lit(1))).orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w))
