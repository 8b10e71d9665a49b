"""Sampling/downsampling operators (O3, O5-O7) and scalar helpers
(F-poly).

Reference parity:
- O5 random choice from pass/fail sets — scatterplotter.py's
  "plot a few example events passing/failing a cut" workflow.
- O6 every-Nth downsample — vibration_analyzer.py:397-401 (also
  exported from the vibration module).
- O7 log-spaced index downsample — vibration_analyzer.py:1051-1102
  (plot thinning; driver-side on an already-aggregated axis).
- F-poly Horner evaluation — the polynomial chi2-vs-amp cut family
  (semiautocuts demo notebooks) as one native expression.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["random_choice", "every_nth", "log_spaced_indices", "cap_per_key",
           "log_downsample", "polyval", "sessionize",
           "shuffle_key", "deterministic_shuffle", "assign_batches",
           "assign_split", "exact_stratified_sample"]


def random_choice(df: DataFrame, n: int, cut: Column | None = None,
                  seed: int = 42, invert: bool = False) -> DataFrame:
    """O5: exact-n seeded random sample of rows passing (or failing)
    ``cut``. ``orderBy(rand(seed)).limit(n)`` — the sort is a top-n
    (TakeOrdered), not a full sort, so it scales."""
    if cut is not None:
        df = df.filter(~cut if invert else cut)
    return df.orderBy(F.rand(seed)).limit(n)


def every_nth(df: DataFrame, order_col: str, factor: int) -> DataFrame:
    """O6: keep rows whose dense ordinal is ≡ 0 (mod factor) — pure
    filter, no shuffle (vibration_analyzer.py:397-401)."""
    if factor <= 1:
        return df
    return df.filter((F.col(order_col) % factor) == 0)


def log_spaced_indices(n: int, points: int = 20000) -> np.ndarray:
    """O7: deduplicated log-spaced indices into a length-n axis
    (vibration_analyzer.py:1051-1102). Driver-side — this is plot
    thinning of an already-reduced array, not a table operator."""
    if n <= points:
        return np.arange(n)
    idx = np.unique(np.logspace(0, np.log10(n - 1), points).astype(int))
    return np.concatenate(([0], idx[idx > 0]))


def log_downsample(xs: np.ndarray, *ys: np.ndarray,
                   points: int = 20000):
    """Thin (x, y...) arrays on the log-spaced index set."""
    idx = log_spaced_indices(len(xs), points)
    return (xs[idx], *[y[idx] for y in ys])


def polyval(coeffs: Sequence[float], x: Column | str) -> Column:
    """F-poly: Horner evaluation of Σ cᵢ·xⁱ (coeffs low→high order) as
    one native expression — whole-stage codegen, no UDF."""
    xc = F.col(x) if isinstance(x, str) else x
    acc: Column = F.lit(float(coeffs[-1]))
    for c in reversed(coeffs[:-1]):
        acc = acc * xc + float(c)
    return acc


def sessionize(df: DataFrame, key_col: str, ts_col: str, gap) -> DataFrame:
    """Gap-based session assignment: a new session starts whenever the
    time since the key's previous event exceeds ``gap`` (same units as
    ``ts_col``). Adds ``session_id`` = ``(key, session ordinal)`` as a
    dense per-key counter.

    One shuffle keyed by ``key_col`` (lag + running sum over the same
    window partition — Catalyst fuses them into a single sort+window).
    The classic log-analysis / user-session primitive.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (prev.isNull()
                | ((F.col(ts_col) - prev) > gap)).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))


def cap_per_key(df: DataFrame, key_cols: Sequence[str], n: int,
                order_col: str) -> DataFrame:
    """Keep the first ``n`` rows per key in ``order_col`` order — the
    deterministic "domain cap" used to bound over-represented sources
    in a training mix (and the reference's per-class example picks,
    semiautocuts.py:2414-2469, made reproducible).

    One shuffle keyed by ``key_cols``; rank-1..n within each key, no
    join-back. Keys are assumed well-distributed (domains, sources);
    for a pathological hot key, pre-salt or pre-filter.
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError("n must be >= 1")
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return (df.withColumn("__cap_rn__", F.row_number().over(w))
            .filter(F.col("__cap_rn__") <= n)
            .drop("__cap_rn__"))


def shuffle_key(id_col: Column | str, seed: int = 0) -> Column:
    """Deterministic pseudo-random sort key for a row id: md5 of
    ``"<seed>:<id>"``. md5 exists with identical output in every SQL
    engine, so any system can re-derive the exact same ordering — the
    reproducibility property a training-data shuffle needs."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat_ws(":", F.lit(str(int(seed))), c.cast("string")))


def deterministic_shuffle(df: DataFrame, id_col: str,
                          seed: int = 0) -> DataFrame:
    """Seeded, reproducible global shuffle of a corpus: range-partition
    + sort on the md5 shuffle key. One range exchange (sampled
    boundaries, no single-task sort) — the standard scalable total
    order. Re-running with the same seed reproduces the ordering
    bit-for-bit on any cluster size."""
    key = shuffle_key(id_col, seed).alias("__shuffle_key__")
    return (df.withColumn("__shuffle_key__", key)
            .repartitionByRange(F.col("__shuffle_key__"))
            .sortWithinPartitions("__shuffle_key__")
            .drop("__shuffle_key__"))


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    n: int, seed: int = 0) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES, Inf. Proc. Letters 2006): each row gets
    the key ``ln(u) / w`` with ``u`` a seeded uniform in (0, 1] derived
    from the portable md5 of ``(seed, id)``; the ``n`` LARGEST keys are
    the sample — exactly the distribution of sequential
    weighted-without-replacement draws.

    Inclusion is a pure function of ``(seed, ids, weights)`` — stable
    under re-partitioning and cluster size, and re-derivable verbatim
    in any engine with md5 + ln (the oracle does). Rows with
    non-positive or null weight are excluded (zero-weight rows have
    zero selection probability; A-ES keys are undefined for them).

    Scale shape: one projection + TakeOrdered top-n — no global sort,
    no shuffle of the corpus; only n rows reach the driver-side limit.
    The standard mixture-building primitive: sample documents
    proportional to quality score / domain weight.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    w = F.col(weight_col).cast("double")
    v = F.conv(F.substring(shuffle_key(id_col, seed), 1, 15),
               16, 10).cast("double")
    u = (v + F.lit(1.0)) / F.lit(float(16 ** 15))   # uniform in (0, 1]
    key = (F.log(u) / w).alias("__aes_key__")
    # NaN compares GREATER than any number in Spark, so `w > 0` alone
    # would admit NaN weights — whose NaN keys then sort to the top of
    # the descending order and hijack the sample
    return (df.filter((w > 0) & ~F.isnan(w))
            .withColumn("__aes_key__", key)
            .orderBy(F.col("__aes_key__").desc())
            .limit(int(n))
            .drop("__aes_key__"))


def exact_stratified_sample(df: DataFrame, strata_col: str,
                            n_per_stratum: int, id_col: str,
                            seed: int = 0) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer only when a
    stratum is smaller), chosen by the seeded md5 shuffle key — the
    eval-set carve: "500 docs per language, reproducibly, forever".

    Fraction-based sampling (`stratified_sample_mod`,
    `temperature_mixture_sample`) gives EXPECTED counts; benchmark
    and eval sets need exact ones. One shuffle keyed by the stratum
    (rank window over the deterministic key, tie-broken by id); the
    inclusion rule is engine-portable, so a SQL oracle re-derives the
    identical sample.
    """
    key = shuffle_key(F.col(id_col), seed)
    w = Window.partitionBy(strata_col).orderBy(key.asc(),
                                               F.col(id_col).asc())
    return (df.withColumn("__rk__", F.row_number().over(w))
            .filter(F.col("__rk__") <= int(n_per_stratum))
            .drop("__rk__"))


def weighted_sample_per_key(df: DataFrame, key_cols: Sequence[str],
                            id_col: str, weight_col: str, n: int,
                            seed: int = 0) -> DataFrame:
    """Per-group A-ES weighted sampling: the ``n`` largest ``ln(u)/w``
    keys WITHIN each group — e.g. "sample 10k docs per source,
    proportional to quality score" in one pass. Same deterministic,
    engine-portable keys as :func:`weighted_sample`.

    One shuffle keyed by ``key_cols`` (rank window); group counts below
    ``n`` return all their rows.
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError("n must be >= 1")
    w = F.col(weight_col).cast("double")
    v = F.conv(F.substring(shuffle_key(id_col, seed), 1, 15),
               16, 10).cast("double")
    u = (v + F.lit(1.0)) / F.lit(float(16 ** 15))
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    win = Window.partitionBy(*keys).orderBy(
        (F.log(u) / w).desc(), F.col(id_col).asc())
    return (df.filter((w > 0) & ~F.isnan(w))
            .withColumn("__aes_rank__", F.row_number().over(win))
            .filter(F.col("__aes_rank__") <= int(n))
            .drop("__aes_rank__"))


def assign_batches(df: DataFrame, id_col: str, batch_size: int,
                   seed: int = 0) -> DataFrame:
    """Training-batch assignment: shuffle the corpus deterministically
    (seeded md5 key) and stamp each row with its global shuffle rank
    and batch number (``rank // batch_size``).

    The global rank uses the same two-pass partition-offset scheme as
    ``ensure_event_index`` (range partitions ascend with the key, so
    offset + within-partition position IS the total-order rank) — no
    single-partition window anywhere, valid at any scale. Equivalent
    SQL: ``row_number() OVER (ORDER BY md5(seed || ':' || id)) - 1``.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    from ..analyzer import ensure_event_index
    keyed = df.withColumn("__shuffle_key__", shuffle_key(id_col, seed))
    ranked = ensure_event_index(keyed, order_by=["__shuffle_key__"],
                                out_col="shuffle_rank")
    return (ranked.drop("__shuffle_key__")
            .withColumn("batch", (F.col("shuffle_rank") / batch_size)
                        .cast("long")))


def assign_split(df: DataFrame, id_col: str,
                 fractions: dict[str, float] | None = None,
                 seed: int = 0, out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test split assignment: each row's split
    is a pure function of ``(seed, id)`` — stable under re-partitioning,
    appends, and cluster size, so the same row lands in the same split
    on every engine and every run.

    Mechanics: the first 8 hex chars of the seeded md5 key are compared
    against cumulative-fraction thresholds rendered as 8-digit hex
    strings. String comparison on lowercase hex is exactly numeric
    comparison, and md5 is available with identical output in every SQL
    engine, so the rule is portable verbatim (DuckDB/Trino/BigQuery).
    A per-row projection — no shuffle, no sampling pass.
    """
    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-empty and non-negative")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    # zero-fraction splits get no rows by definition — drop them so the
    # unconditional last bucket is never a zero-fraction name (a
    # trailing 0 entry would otherwise absorb every key above the last
    # positive threshold)
    fractions = {k: v for k, v in fractions.items() if v > 0}
    names = list(fractions)
    key8 = F.substring(shuffle_key(id_col, seed), 1, 8)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        # clamp: cum≈1.0 would render 9 hex chars and break the 8-char
        # lexicographic comparison
        thr = format(min(int(cum * (1 << 32)), (1 << 32) - 1), "08x")
        cond = key8 < thr
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    out = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, out)
