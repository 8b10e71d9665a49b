"""Join strategy helpers for the 100 TB regime.

AQE's skew-join splitting (on in session.py) handles most skew
automatically; ``salted_join`` is the explicit fallback for
pathological hot keys (one key holding a double-digit percentage of
the table), where even a split partition won't fit an executor: the
big side scatters each hot key across ``salt`` sub-partitions and the
small side is replicated ``salt``× — turning one giant task into
``salt`` bounded ones at the cost of duplicating the (small) build
side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "asof_join", "range_join_binned",
           "interval_overlap_join", "merge_intervals",
           "fuzzy_join", "delete_neighborhood"]


def salted_join(big: DataFrame, small: DataFrame, on: Sequence[str] | str,
                how: str = "inner", salt: int = 8,
                seed: int | None = 42) -> DataFrame:
    """Equi-join with explicit key salting against skew.

    ``big`` gets a uniform random salt in [0, salt); ``small`` is
    exploded across every salt value, so each (key, salt) pair meets
    exactly the right build rows. Result equals ``big.join(small, on,
    how)`` for 'inner'/'left' joins (the supported modes — salting the
    probe side cannot express right/full semantics).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on)
    rand = F.rand(seed) if seed is not None else F.rand()
    b = big.withColumn("__salt__", (rand * salt).cast("int"))
    s = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return b.join(s, keys + ["__salt__"], how).drop("__salt__")


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: Sequence[str] | str, value_cols: Sequence[str] | None = None,
              tolerance=None, suffix: str = "_right") -> DataFrame:
    """Backward as-of join: for each left row, attach the latest right
    row with ``right.on <= left.on`` within the same ``by`` group
    (DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` semantics; ties at
    equal ``on`` match).

    Spark has no native as-of join; the scale-safe shape is the
    union-window trick: tag sides, union, and take
    ``last(value, ignorenulls=True)`` over a window partitioned by
    ``by`` and ordered by ``(on, side)`` — ONE shuffle keyed by ``by``,
    no range/nested-loop join, no per-row probe. Rows stream through
    the sorted window state once. Skew note: each ``by`` group must fit
    a task's sort spill budget — salt pathological groups first.

    ``tolerance``: maximum allowed ``left.on - right.on`` (same units
    as ``on``); matches older than that become NULL. The matched right
    timestamp is returned as ``{on}{suffix}``.
    """
    keys = [by] if isinstance(by, str) else list(by)
    if not keys:
        raise ValueError("asof_join requires at least one 'by' key "
                         "(a keyless as-of would funnel the union "
                         "through one task)")
    vals = list(value_cols) if value_cols is not None else \
        [c for c in right.columns if c not in keys + [on]]
    rtypes = dict(right.dtypes)
    ltime = dict(left.dtypes)[on]

    l2 = left.select(
        *left.columns, F.lit(1).alias("__side__"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}__") for c in vals],
        F.lit(None).cast(ltime).alias("__r_on__"))
    r2 = right.select(
        *[F.lit(None).cast(t).alias(c) if c not in keys + [on]
          else F.col(c) for c, t in left.dtypes],
        F.lit(0).alias("__side__"),
        *[F.col(c).alias(f"__r_{c}__") for c in vals],
        F.col(on).cast(ltime).alias("__r_on__"))

    from pyspark.sql import Window
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(on).asc(), F.col("__side__").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = l2.unionByName(r2).select(
        "*",
        *[F.last(f"__r_{c}__", ignorenulls=True).over(w)
          .alias(f"__f_{c}__") for c in vals],
        F.last("__r_on__", ignorenulls=True).over(w).alias("__f_on__"))

    out = filled.filter(F.col("__side__") == 1)
    in_tol = F.lit(True) if tolerance is None else \
        (F.col(on) - F.col("__f_on__") <= tolerance)
    sel = [F.col(c) for c in left.columns]
    for c in vals:
        sel.append(F.when(in_tol, F.col(f"__f_{c}__"))
                   .alias(c + suffix if c in left.columns else c))
    sel.append(F.when(in_tol, F.col("__f_on__")).alias(on + suffix))
    return out.select(*sel)


def range_join_binned(points: DataFrame, intervals: DataFrame,
                      point_col: str, lo_col: str, hi_col: str,
                      bin_width: float) -> DataFrame:
    """Point-in-interval join (``lo <= p < hi``) without a nested-loop:
    both sides are keyed into fixed-width bins, intervals exploded
    across every bin they overlap, then an ordinary shuffle equi-join
    on the bin id with an exact containment filter after.

    Spark plans a raw inequality join as BroadcastNestedLoopJoin —
    all-pairs, a 100 TB non-starter. Binned, the join cost is
    |points| + Σ(interval span / bin_width): pick ``bin_width`` near
    the median interval span so each interval lands in O(1) bins.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    p = points.withColumn(
        "__bin__", F.floor(F.col(point_col) / bin_width).cast("long"))
    i = intervals.withColumn(
        "__bin__", F.explode(F.sequence(
            F.floor(F.col(lo_col) / bin_width).cast("long"),
            F.floor(F.col(hi_col) / bin_width).cast("long"))))
    return (p.join(i, "__bin__")
            .filter((F.col(point_col) >= F.col(lo_col))
                    & (F.col(point_col) < F.col(hi_col)))
            .drop("__bin__"))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          left_lo: str, left_hi: str,
                          right_lo: str, right_hi: str,
                          bin_width: float,
                          half_open: bool = True) -> DataFrame:
    """Interval-overlap join (both sides are intervals) without a
    nested loop: each side is exploded across the fixed-width bins its
    interval touches, joined on the bin id, and exact-overlap filtered.
    A pair sharing n bins is emitted ONCE — not via a distinct (an
    extra shuffle that would also collapse genuinely duplicate input
    rows) but by keeping only the pair's CANONICAL bin, the one
    containing ``max(l_lo, r_lo)``: every overlapping pair shares
    exactly that bin, so multiplicity of duplicate inputs survives.

    Overlap is ``l_lo < r_hi AND r_lo < l_hi`` for half-open [lo, hi)
    intervals (the default; set ``half_open=False`` for closed
    intervals, where touching endpoints count). A raw inequality join
    plans as BroadcastNestedLoopJoin — all-pairs, a 100 TB
    non-starter; binned, cost is Σ spans/bin_width per side with the
    shuffle keyed by bin. Pick ``bin_width`` near the median interval
    span so each interval lands in O(1) bins.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    overlap_cols = {left_lo, left_hi} & {right_lo, right_hi}
    if overlap_cols:
        raise ValueError(
            f"interval_overlap_join: rename colliding bound columns "
            f"{sorted(overlap_cols)} on one side first")
    lo_l, hi_l = F.col(left_lo), F.col(left_hi)
    lo_r, hi_r = F.col(right_lo), F.col(right_hi)
    lb = left.withColumn("__bin__", F.explode(F.sequence(
        F.floor(lo_l / bin_width).cast("long"),
        F.floor(hi_l / bin_width).cast("long"))))
    rb = right.withColumn("__bin__", F.explode(F.sequence(
        F.floor(lo_r / bin_width).cast("long"),
        F.floor(hi_r / bin_width).cast("long"))))
    if half_open:
        cond = (lo_l < hi_r) & (lo_r < hi_l)
    else:
        cond = (lo_l <= hi_r) & (lo_r <= hi_l)
    canonical = F.col("__bin__") == F.floor(
        F.greatest(lo_l, lo_r) / bin_width).cast("long")
    return (lb.join(rb, "__bin__")
            .filter(cond & canonical)
            .drop("__bin__"))


def merge_intervals(df: DataFrame, lo_col: str, hi_col: str,
                    key_cols: Sequence[str] = ()) -> DataFrame:
    """Union overlapping/touching [lo, hi] intervals per key — the
    gaps-and-islands primitive: (keys..., lo, hi, n_merged). Two rows
    merge when one starts at or before the running maximum end of all
    earlier-starting rows. Rows with a null bound are dropped — they
    describe no interval.

    The canonical pre-step for interval predicates (reference interval
    cuts are an OR over [start, stop] windows,
    ``semiautocuts.py:875-935``-style): merging first turns O(rows ×
    intervals) predicate evaluation into O(rows × islands) with
    identical semantics.

    Plan: ONE shuffle keyed by ``key_cols`` — running-max + island
    counter + island aggregate all share the same window partitioning,
    so Catalyst plans a single sort+exchange. With no keys the window
    is a documented single-partition fallback: merge per key at scale.
    """
    from pyspark.sql import Window

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if not key_cols:
        import warnings
        warnings.warn("merge_intervals without key_cols runs the "
                      "window on a single partition — fine for a "
                      "bounded interval list, not for corpus-scale "
                      "input", stacklevel=2)
    # rows with a null bound carry no interval information and would
    # otherwise null the island marker (null > x is null; sum skips
    # it), silently gluing the row into the preceding island — drop
    # them up front instead
    df = df.filter(F.col(lo_col).isNotNull()
                   & F.col(hi_col).isNotNull())
    w = (Window.partitionBy(*[F.col(k) for k in key_cols])
         .orderBy(F.col(lo_col).asc(), F.col(hi_col).asc()))
    prev_max_hi = F.max(F.col(hi_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = (prev_max_hi.isNull()
                  | (F.col(lo_col) > prev_max_hi)).cast("long")
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("__island__", island)
            .groupBy(*key_cols, "__island__")
            .agg(F.min(lo_col).alias("lo"),
                 F.max(hi_col).alias("hi"),
                 F.count(F.lit(1)).alias("n_merged"))
            .drop("__island__"))


def delete_neighborhood(col: Column | str, max_distance: int = 1
                        ) -> Column:
    """All DISTINCT variants of a string reachable by deleting up to
    ``max_distance`` characters (the string itself included) — the
    SymSpell blocking key set: two strings within (Damerau-)Levenshtein
    distance d always share a key in their d-deletion neighborhoods,
    so an equi-join on exploded neighborhoods is a LOSSLESS candidate
    generator for edit-distance joins. Pure native expressions
    (transform over char positions + substr splicing), no UDF.

    Neighborhood size is C(len, ≤d)+1 — ~len+1 keys at d=1, ~len²/2 at
    d=2: right for WORDS/names/codes (entity resolution, typo'd vocab,
    query logs), not documents. NULL in → empty neighborhood (joins
    nothing).
    """
    c = F.col(col) if isinstance(col, str) else col

    def one_deletions(s: Column) -> Column:
        # delete char i (1-based): s[1..i-1] ++ s[i+1..]
        return F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(s.substr(F.lit(1), i - 1),
                               s.substr(i + 1, F.length(s))))

    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    out = F.when(c.isNotNull(), F.array(c)) \
           .otherwise(F.array().cast("array<string>"))
    for _ in range(int(max_distance)):
        # bind the CURRENT frontier once (lambda over a 1-element
        # array) so each round's deletions evaluate one splice per
        # (variant, position), not a re-derivation per output char
        def expand(arr: Column) -> Column:
            grow = F.flatten(F.transform(
                arr, lambda s: F.when(F.length(s) > 0, one_deletions(s))
                                .otherwise(F.array().cast(
                                    "array<string>"))))
            return F.array_distinct(F.concat(arr, grow))
        out = F.flatten(F.transform(F.array(out), expand))
    return F.array_distinct(out)


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_col: str, right_col: str,
               max_distance: int = 1) -> DataFrame:
    """Edit-distance string join, LOSSLESS and never all-pairs:
    (left_col, right_col, edit_distance) for every DISTINCT value pair
    with Levenshtein distance ≤ ``max_distance``.

    Plan: both sides project their distinct strings, explode their
    ``max_distance``-deletion neighborhoods (:func:`delete_neighborhood`
    — the SymSpell guarantee makes the key join lossless), equi-join
    on the key, de-dup candidates, then filter by NATIVE
    ``levenshtein`` (whole-stage codegen). Cost tracks Σ_key
    occurrences² over neighborhood keys — strings collide only when
    they're already within a few deletions of each other, never the
    |L|×|R| product.

    Distinct VALUE pairs come back (the operator is a dictionary
    matcher); join the result to the original frames to recover rows —
    keeps the quadratic part keyed by string values, which is also the
    right scale shape when values repeat (entity names do).
    """
    d = int(max_distance)
    lv = left.select(F.col(left_col).alias("__lv__")) \
             .filter(F.col("__lv__").isNotNull()).distinct()
    rv = right.select(F.col(right_col).alias("__rv__")) \
              .filter(F.col("__rv__").isNotNull()).distinct()
    lk = lv.select("__lv__", F.explode(
        delete_neighborhood(F.col("__lv__"), d)).alias("__k__"))
    rk = rv.select("__rv__", F.explode(
        delete_neighborhood(F.col("__rv__"), d)).alias("__k__"))
    cand = (lk.join(rk, "__k__")
            .select("__lv__", "__rv__").distinct())
    out_l = left_col
    out_r = right_col if right_col != left_col else right_col + "_right"
    return (cand
            .withColumn("edit_distance",
                        F.levenshtein(F.col("__lv__"), F.col("__rv__")))
            .filter(F.col("edit_distance") <= d)
            .select(F.col("__lv__").alias(out_l),
                    F.col("__rv__").alias(out_r),
                    "edit_distance"))
