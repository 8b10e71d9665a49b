"""Bin-construction operators (W1-W3) and bin-keyed helpers.

Reference builds bin edges eagerly on NumPy arrays
(semiautocuts.py:244-292). Spark-first: edges come from one small
aggregate (min/max or quantiles) collected to the driver — a few
doubles — and the bin *assignment* is a codegen'd column expression
(`width_bucket` semantics), so the fact table is never materialized.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(e):
    return F.expr(e) if isinstance(e, str) else e


def equal_width_edges(df: DataFrame, expression, n_bins: int) -> list[float]:
    """W1 (semiautocuts.py:257-259): np.linspace(min, max, n+1)."""
    col = _col(expression)
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = float(row["lo"]), float(row["hi"])
    step = (hi - lo) / n_bins
    return [lo + i * step for i in range(n_bins)] + [hi]


def equal_frequency_edges(df: DataFrame, expression, n_bins: int,
                          exact: bool = False, accuracy: int = 10000) -> list[float]:
    """W2 (semiautocuts.py:244-255): edges at percentiles i/n.

    The reference uses Vaex percentile_approx; default approx here for
    the same reason (single-pass mergeable sketch at scale).
    """
    col = _col(expression)
    fracs = [i / n_bins for i in range(n_bins + 1)]
    agg = (F.percentile(col, F.lit(fracs)) if exact
           else F.percentile_approx(col, F.lit(fracs), F.lit(accuracy)))
    row = df.agg(agg.alias("p")).collect()[0]
    return [float(v) for v in row["p"]]


def ofamp_edges(df: DataFrame, expression, n_bins: int) -> list[float]:
    """W3 (semiautocuts.py:272-292): first edge at data min, second at
    0.0, remaining evenly spaced up to max; last bin unbounded above in
    apply (handled by the caller)."""
    col = _col(expression)
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = float(row["lo"]), float(row["hi"])
    if n_bins < 2:
        return [lo, hi]
    edges = [lo, 0.0]
    remaining = n_bins - 1
    step = (hi - 0.0) / remaining
    for i in range(1, remaining):
        edges.append(0.0 + i * step)
    edges.append(hi)
    return edges


def assign_bin(col: Column, edges: Sequence[float],
               last_unbounded: bool = False) -> Column:
    """Bin index for explicit (possibly uneven) edges: a CASE chain —
    pure codegen, no UDF. Rows outside all bins get NULL.

    ``last_unbounded``: the last bin has no upper limit
    (semiautocuts.py:862-871 ofamp asymmetry).
    """
    n = len(edges) - 1
    expr = F.lit(None).cast("int")
    # build from last bin backwards so earlier WHENs win on shared edges
    for i in range(n - 1, -1, -1):
        lo, hi = edges[i], edges[i + 1]
        if i == n - 1 and last_unbounded:
            cond = col >= F.lit(lo)
        elif i == n - 1:
            cond = (col >= F.lit(lo)) & (col <= F.lit(hi))
        else:
            cond = (col >= F.lit(lo)) & (col < F.lit(hi))
        expr = F.when(cond, F.lit(i)).otherwise(expr)
    return expr


def ntile_bin(df: DataFrame, expression, n_bins: int,
              out_col: str = "__bin__") -> DataFrame:
    """Exact equal-frequency binning via ntile — the SQL-window idiom
    for W2 when edges themselves aren't needed. NOTE: a single
    un-partitioned window is a total sort; prefer
    ``equal_frequency_edges`` + ``assign_bin`` at scale."""
    from pyspark.sql import Window
    col = _col(expression)
    w = Window.orderBy(col)
    return df.withColumn(out_col, F.ntile(n_bins).over(w) - 1)
