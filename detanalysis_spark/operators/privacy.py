"""Tabular privacy gates: k-anonymity profiling and small-group
suppression.

Before a table (or a metadata side-table of a text corpus) ships, the
standard re-identification check is k-anonymity over the
quasi-identifier columns (Sweeney 2002): every combination of
quasi-identifier values must be shared by at least k rows. Profiling
is ONE map-side-combined groupBy over the quasi-identifier tuple;
suppression is the same aggregate joined back (AQE broadcasts it when
the violating-group list is small, which it is by definition — those
groups have < k rows each).

Scale note: the group-size table is bounded by the number of DISTINCT
quasi-identifier tuples, not by rows; at 100 TB the aggregate is the
only full-data pass and it combines map-side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_profile", "suppress_small_groups"]


def k_anonymity_profile(df: DataFrame,
                        quasi_cols: Sequence[str]) -> DataFrame:
    """One-row profile of the table's k-anonymity under ``quasi_cols``:
    (k_min, n_groups, n_rows, n_unique_groups, n_unique_rows) where
    ``k_min`` is the smallest group size (the table's actual k) and
    the unique columns count groups/rows below the conventional k=2
    threshold (singleton rows — the re-identifiable ones). NULL
    quasi-identifier values form their own group, mirroring groupBy
    semantics."""
    if isinstance(quasi_cols, str):
        quasi_cols = [quasi_cols]
    if not quasi_cols:
        raise ValueError("k_anonymity_profile needs quasi-identifier columns")
    g = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    return g.agg(
        F.min("n").alias("k_min"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").alias("n_rows"),
        F.sum(F.when(F.col("n") < 2, 1).otherwise(0)).cast("long")
        .alias("n_unique_groups"),
        F.sum(F.when(F.col("n") < 2, F.col("n")).otherwise(0))
        .cast("long").alias("n_unique_rows"))


def suppress_small_groups(df: DataFrame, quasi_cols: Sequence[str],
                          k: int) -> DataFrame:
    """Rows whose quasi-identifier group has >= k members — the
    suppression step that makes the survivors k-anonymous. One
    aggregate + one NULL-SAFE semi-join on the quasi tuple (groupBy
    treats NULL as a group, so the join must too — a plain equi-join
    would silently delete every null-keyed row no matter how large
    its group). The aggregate side is distinct-tuple-sized; AQE
    broadcasts it when small."""
    if isinstance(quasi_cols, str):
        quasi_cols = [quasi_cols]
    if k < 1:
        raise ValueError("k must be >= 1")
    big = (df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__n__"))
           .filter(F.col("__n__") >= int(k))
           .drop("__n__"))
    cond = None
    for c in quasi_cols:
        eq = df[c].eqNullSafe(big[c])
        cond = eq if cond is None else cond & eq
    return df.join(big, cond, "left_semi")
