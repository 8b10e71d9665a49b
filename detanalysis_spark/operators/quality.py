"""Declarative data-quality validation — the Deequ-style (Schelter et
al., VLDB'18 "Automating Large-Scale Data Quality Verification")
constraint suite, Spark-first.

A validation run folds every scalar constraint into ONE map-side-
combined aggregate pass over the table (violation counts are plain
conditional sums), plus one bounded job per uniqueness/referential
constraint (a group-size aggregate / an anti-join against the
referenced keys — the dimension side broadcasts when small). Nothing
row-sized ever reaches the driver; at 100 TB a full constraint suite
costs one scan plus one shuffle per key-shaped check.

Checks:
- ``not_null(col)`` — null count.
- ``in_range(col, lo, hi)`` — values outside [lo, hi] (nulls don't
  violate; add not_null separately).
- ``matches(col, regex)`` — non-matching non-null values.
- ``unique(*cols)`` — rows in key groups of size > 1.
- ``foreign_key(cols, ref_df, ref_cols)`` — rows whose (non-null) key
  has no match in the reference table.

Reference parity: generalizes the reference's ad-hoc post-filter
sanity checks (count consistency after ``apply_global_filter``,
reference ``analyzer.py:435-443``) into a reusable declarative gate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["not_null", "in_range", "matches", "unique", "foreign_key",
           "check_table"]


@dataclass(frozen=True, eq=False)
class _ScalarCheck:
    name: str
    violation: Column  # boolean: True = this row violates


@dataclass(frozen=True, eq=False)
class _UniqueCheck:
    name: str
    cols: tuple


@dataclass(frozen=True, eq=False)
class _FkCheck:
    name: str
    cols: tuple
    ref_df: DataFrame
    ref_cols: tuple = ()


def not_null(col: str) -> _ScalarCheck:
    return _ScalarCheck(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> _ScalarCheck:
    c = F.col(col)
    return _ScalarCheck(f"in_range({col},{lo},{hi})",
                        c.isNotNull() & ((c < lo) | (c > hi)))


def matches(col: str, pattern: str) -> _ScalarCheck:
    c = F.col(col)
    return _ScalarCheck(f"matches({col})",
                        c.isNotNull() & ~c.rlike(pattern))


def unique(*cols: str) -> _UniqueCheck:
    return _UniqueCheck(f"unique({','.join(cols)})", tuple(cols))


def foreign_key(cols: "Sequence[str] | str", ref_df: DataFrame,
                ref_cols: "Sequence[str] | str | None" = None) -> _FkCheck:
    cs = (cols,) if isinstance(cols, str) else tuple(cols)
    rs = cs if ref_cols is None else \
        ((ref_cols,) if isinstance(ref_cols, str) else tuple(ref_cols))
    if len(cs) != len(rs):
        raise ValueError("foreign_key cols/ref_cols length mismatch")
    return _FkCheck(f"foreign_key({','.join(cs)})", cs, ref_df, rs)


def check_table(df: DataFrame, checks: Sequence) -> DataFrame:
    """Run a constraint suite: returns (check, n_rows, n_violations,
    passed) — one row per check, deterministic order by check name.

    All scalar checks share a single aggregate job; each unique /
    foreign-key check adds one bounded aggregate or anti-join job.
    """
    spark = df.sparkSession
    scalar = [c for c in checks if isinstance(c, _ScalarCheck)]
    uniq = [c for c in checks if isinstance(c, _UniqueCheck)]
    fks = [c for c in checks if isinstance(c, _FkCheck)]
    if len(scalar) + len(uniq) + len(fks) != len(checks):
        raise TypeError("unknown check type in checks")

    results: list[tuple[str, int, int]] = []
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, c in enumerate(scalar):
        aggs.append(F.sum(c.violation.cast("long")).alias(f"__v{i}__"))
    row = df.agg(*aggs).collect()[0]
    n_rows = int(row["__n__"])
    for i, c in enumerate(scalar):
        results.append((c.name, n_rows, int(row[f"__v{i}__"] or 0)))

    for c in uniq:
        dup_rows = (df.groupBy(*c.cols)
                    .agg(F.count(F.lit(1)).alias("__g__"))
                    .filter(F.col("__g__") > 1)
                    .agg(F.coalesce(F.sum("__g__"), F.lit(0)))
                    .collect()[0][0])
        results.append((c.name, n_rows, int(dup_rows)))

    for c in fks:
        keyed = df.select(*[F.col(x) for x in c.cols])
        non_null = keyed
        for x in c.cols:
            non_null = non_null.filter(F.col(x).isNotNull())
        ref = c.ref_df.select(*[F.col(r).alias(x) for x, r
                                in zip(c.cols, c.ref_cols)]).distinct()
        orphans = non_null.join(ref, list(c.cols), "left_anti").count()
        results.append((c.name, n_rows, int(orphans)))

    results.sort(key=lambda r: r[0])
    from ..util import local_frame
    return local_frame(
        spark, [(n, nr, nv, nv == 0) for n, nr, nv in results],
        "check string, n_rows long, n_violations long, passed boolean")
