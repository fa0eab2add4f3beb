"""Grouped-aggregate pandas UDAFs — the §2.8 surface Spark exposes as
``pandas_udf`` with a ``Series → scalar`` signature (Arrow-batched,
whole group per call).

The reference's Reducer bodies are UDAF-shaped (arbitrary Java over one
key's values, ``exact/Exact2HopCount.java:83-106``); Spark's built-in
aggregates replace all of them, so the engine reserves this path for
statistics Spark genuinely lacks.  ``median_abs_deviation`` is the
canonical example: a robust dispersion measure (median(|x − median(x)|))
with no Catalyst builtin, but an exact DuckDB twin (``mad(x)``) — so the
custom-UDAF machinery itself sits under the hash-level oracle gate.

Determinism: np.median interpolates the even-n midpoint as (a+b)/2 in
IEEE double exactly as DuckDB's median — both see the identical value
multiset, so results match bit-for-bit with no rounding tolerance.

Scale notes (100 TB): a grouped-agg pandas UDAF is NOT algebraic — the
whole group's values stream to one Arrow batch per group (no map-side
partials, unlike sum/count).  That is inherent to exact medians; the
scale escape is the sketch path (``operators/stats.py`` KLL/approx
quantiles) when groups exceed executor memory.  Groups here are
event types — dozens — each bounded by |events|/|types|.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact interpolated median of one group (UDAF; Arrow-batched)."""
    return float(np.median(v.to_numpy()))


@pandas_udf("double")
def mad_udaf(v: pd.Series) -> float:
    """Median absolute deviation: median(|x − median(x)|), unscaled —
    identical to DuckDB ``mad(x)``."""
    a = v.to_numpy()
    return float(np.median(np.abs(a - np.median(a))))


@pandas_udf("long")
def count_udaf(v: pd.Series) -> int:
    """Group size (including NaN rows — len, not count).  Exists because
    Spark refuses to mix grouped-agg pandas UDAFs with non-pandas
    aggregates in one ``agg`` (INVALID_PANDAS_UDF_PLACEMENT); a count
    alongside the UDAF stats must itself be a UDAF."""
    return len(v)
