"""Bloom-filter membership screen for incremental corpus dedup.

The 100 TB problem this solves: an incremental ingest (re-crawl, daily
batch) must drop rows whose content already exists in a multi-billion-
row corpus. A plain hash anti-join shuffles the ENTIRE new batch keyed
by hash every time (see :func:`detanalysis_spark.llm.dedup.
dedup_incremental`). A Bloom filter built once over the corpus hashes
turns that into:

- a **pure projection** over the new batch (k native hash probes + bit
  tests — no shuffle, no Python in the hot path for the literal-array
  variant), which definitively clears every row the filter rejects
  (Bloom filters have NO false negatives), and
- an exact anti-join over only the rows the filter *accepts* — true
  duplicates plus the false-positive sliver (~fp_rate of the new
  rows). With fp = 1% and a mostly-new batch, ~99% of the anti-join's
  shuffle volume disappears while the final answer stays EXACT.

Build shape: one pass over the corpus computing k bit indices per row
(native ``xxhash64``), partial bitmaps OR-folded per partition in an
Arrow-batched ``mapInPandas`` (numpy ``bitwise_or.at``), an optional
tree-merge stage so no more than ``fanin`` partials ever travel to one
place, and a driver OR of the survivors — the same economics as
Spark's own ``treeAggregate``-based ``stat.bloomFilter`` (Scala-only;
this is the DataFrame-native equivalent). The finished filter is
``m_bits/8`` bytes (128 KiB at the 2^20-bit default) and persists to
parquet for reuse across batches.

Membership tests run JVM-side: the bitmap ships as an ``array<long>``
literal and the k probes fold through ``forall`` + ``getbit`` (whole-
stage codegen) — or, for filters too large to inline in a plan,
through an Arrow-batched pandas UDF reading a broadcast numpy bitmap.

Reference parity: the reference engine has no Bloom path (its
``detanalysis`` scale tops out at vaex on one node); this operator
serves the LLM-pipeline pillar's incremental dedup at cluster scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["optimal_bloom_params", "bloom_indices", "build_bloom",
           "Bloom", "dedup_incremental_bloom"]

# filters at or below this many bits inline as an array<long> literal
# (2^20 bits = 16384 longs — comparable to the decontamination gram
# arrays Catalyst already handles); larger filters use the broadcast
# pandas-UDF membership path
_NATIVE_MAX_BITS = 1 << 20


def optimal_bloom_params(n_items: int, fp_rate: float = 0.01
                         ) -> tuple[int, int]:
    """(m_bits, k) minimizing memory for ``n_items`` at ``fp_rate``.

    Standard sizing: m = -n·ln p / (ln 2)², k = (m/n)·ln 2; m is
    rounded up to a multiple of 64 so the bitmap packs into longs.
    """
    if n_items <= 0:
        raise ValueError("optimal_bloom_params: n_items must be > 0")
    if not 0.0 < fp_rate < 1.0:
        raise ValueError("optimal_bloom_params: fp_rate must be in (0,1)")
    m = -n_items * math.log(fp_rate) / (math.log(2.0) ** 2)
    m_bits = max(64, int(math.ceil(m / 64.0)) * 64)
    k = max(1, round(m_bits / n_items * math.log(2.0)))
    return m_bits, k


def bloom_indices(col: Column | str, m_bits: int, k: int) -> Column:
    """``array<long>`` of the k bit positions for one value (native).

    Position i = pmod(xxhash64(cast(value as string), i), m_bits): the
    per-probe salt rides as a second hashed column, so both the build
    pass and every membership test — native or pandas — share one
    JVM-side hash family (nothing to keep in sync with Python).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.array(*[F.pmod(F.xxhash64(s, F.lit(i)), F.lit(int(m_bits)))
                     for i in range(int(k))])


@dataclass
class Bloom:
    """A finished filter: ``words`` is the bitmap as int64 little-end
    packed (bit j of the filter = bit ``j % 64`` of ``words[j // 64]``).
    """
    m_bits: int
    k: int
    words: np.ndarray  # int64, length m_bits // 64

    def contains(self, col: Column | str) -> Column:
        """Native membership test (boolean Column, codegen-friendly).

        The bitmap inlines as an ``array<long>`` literal — bounded by
        the build-side guard at 2^20 bits / 16k longs; use
        :meth:`contains_udf` for larger filters.
        """
        if self.m_bits > _NATIVE_MAX_BITS:
            raise ValueError(
                f"Bloom.contains: {self.m_bits}-bit filter is too large "
                f"to inline as a plan literal — use contains_udf")
        # a numpy array literal becomes ONE ArrayType literal; a python
        # list would expand to CreateArray with m/64 child literals,
        # which costs seconds of analysis at 4096+ elements
        arr = F.lit(np.asarray(self.words, dtype=np.int64))
        idxs = bloom_indices(col, self.m_bits, self.k)
        # arr is a literal (constant-folded), so referencing it inside
        # the lambda is free — the HOF rebind pitfall applies only to
        # row-dependent expressions
        return F.forall(
            idxs,
            lambda i: F.getbit(
                F.element_at(arr, F.floor(i / 64).cast("int") + F.lit(1)),
                i.bitwiseAND(F.lit(63))) == 1)

    def contains_udf(self, col: Column | str,
                     spark: SparkSession) -> Column:
        """Arrow-batched membership test against a BROADCAST bitmap —
        the path for filters too large to inline as literals (one copy
        per executor, vectorized numpy bit tests per batch)."""
        bc = spark.sparkContext.broadcast(
            np.ascontiguousarray(self.words).view(np.uint64))
        k = self.k

        @F.pandas_udf("boolean")
        def _test(idx_lists: pd.Series) -> pd.Series:
            w = bc.value
            if len(idx_lists) == 0:
                return pd.Series([], dtype=bool)
            ids = np.stack(idx_lists.to_numpy()).astype(np.uint64)
            bits = (w[(ids >> np.uint64(6))]
                    >> (ids & np.uint64(63))) & np.uint64(1)
            return pd.Series(bits.all(axis=1))

        _test.__name__ = "bloom_contains"
        return _test(bloom_indices(col, self.m_bits, self.k))

    def test(self, col: Column | str, spark: SparkSession) -> Column:
        """Membership test choosing the native literal path when the
        filter fits in a plan, the broadcast UDF path otherwise."""
        if self.m_bits <= _NATIVE_MAX_BITS:
            return self.contains(col)
        return self.contains_udf(col, spark)

    def merge(self, other: "Bloom") -> "Bloom":
        """Bitwise-OR union: merge(bloom(A), bloom(B)) == bloom(A ∪ B)
        exactly (same (m, k) family required) — the property that lets
        per-batch filters fold into a corpus filter without a rebuild.
        """
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError("Bloom.merge: mismatched (m_bits, k) families")
        return Bloom(self.m_bits, self.k, self.words | other.words)

    def fill_ratio(self) -> float:
        """Fraction of set bits; theoretical fp_rate ≈ fill**k."""
        u = np.ascontiguousarray(self.words).view(np.uint64)
        if hasattr(np, "bitwise_count"):      # numpy 2: per-word popcount
            set_bits = int(np.bitwise_count(u).sum())
        else:                                 # fallback: 8x uint8 expand
            set_bits = int(np.unpackbits(u.view(np.uint8)).sum())
        return set_bits / float(self.m_bits)

    def fp_rate(self) -> float:
        return self.fill_ratio() ** self.k

    def save(self, spark: SparkSession, path: str) -> None:
        """Persist as a one-row parquet (m_bits, k, bitmap) — the
        artifact an incremental pipeline carries between batches."""
        payload = bytes(self.words.astype("<i8").tobytes())
        from ..util import local_frame
        local_frame(
            spark, [(int(self.m_bits), int(self.k), bytearray(payload))],
            "m_bits long, k int, bitmap binary").write.mode(
                "overwrite").parquet(path)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "Bloom":
        row = spark.read.parquet(path).collect()[0]
        words = np.frombuffer(bytes(row.bitmap), dtype="<i8").copy()
        return Bloom(int(row.m_bits), int(row.k), words)


def build_bloom(df: DataFrame, col: Column | str,
                m_bits: int = 1 << 20, k: int = 5,
                fanin: int = 64) -> Bloom:
    """One-pass distributed Bloom build over ``df[col]``.

    Stage 1 computes the k bit indices natively and OR-folds them into
    one ``m_bits/8``-byte partial bitmap per partition (numpy
    ``bitwise_or.at`` inside ``mapInPandas`` — no Python hashing, so
    build and probe share the JVM hash family by construction). If
    more than ``fanin`` partials exist, a tree stage ORs groups of
    them first so the driver never receives more than ``fanin``
    bitmaps regardless of cluster size. EAGER: runs the build job(s)
    at call time and returns the finished :class:`Bloom`.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("build_bloom: m_bits must be a positive "
                         "multiple of 64")
    m_words = m_bits // 64

    def _or_fold(batches):
        words = np.zeros(m_words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            if "bitmap" in pdf.columns:        # tree stage: OR bitmaps
                for buf in pdf["bitmap"]:
                    words |= np.frombuffer(
                        bytes(buf), dtype="<u8")
            else:                               # leaf stage: set bits
                ids = np.concatenate(
                    pdf["__bi__"].to_numpy()).astype(np.uint64)
                np.bitwise_or.at(words, ids >> np.uint64(6),
                                 np.uint64(1) << (ids & np.uint64(63)))
        if seen:
            yield pd.DataFrame(
                {"bitmap": [words.astype("<u8").tobytes()]})

    parts = (df.select(bloom_indices(col, m_bits, k).alias("__bi__"))
             .mapInPandas(_or_fold, "bitmap binary"))
    if df.rdd.getNumPartitions() > fanin:
        parts = parts.repartition(fanin).mapInPandas(
            _or_fold, "bitmap binary")
    words = np.zeros(m_words, dtype=np.uint64)
    for row in parts.collect():
        words |= np.frombuffer(bytes(row.bitmap), dtype="<u8")
    bl = Bloom(m_bits, k, words.view(np.int64))
    # a correctly-sized filter sits near fill = 1 - e^(-k·n/m) ≈ 0.52
    # at the optimal k (= m/n·ln2), so the undersize alarm needs
    # headroom above that operating point; computed ONCE (popcount
    # over the whole bitmap is not free on multi-GB filters)
    fill = bl.fill_ratio()
    if fill > 0.6:
        import warnings
        warnings.warn(
            f"build_bloom: filter is {fill:.0%} full (fp_rate ≈ "
            f"{fill ** k:.2f}) — undersized for this corpus; size "
            f"with optimal_bloom_params(n_items, fp)",
            stacklevel=2)
    return bl


def dedup_incremental_bloom(new_docs: DataFrame, seen: DataFrame,
                            cols: list[str], id_col: str,
                            bloom: Bloom | None = None,
                            m_bits: int | None = None, k: int = 5,
                            fp_rate: float = 0.01,
                            seen_is_hashes: bool = False) -> DataFrame:
    """Exact incremental dedup with a Bloom prefilter. EAGER when
    ``bloom`` is None (a corpus count + the build job run at call
    time — pass a prebuilt/loaded filter to stay lazy and to amortize
    the build across batches).

    With ``m_bits`` unset the filter is SIZED FROM THE CORPUS
    (``optimal_bloom_params(count(seen), fp_rate)``, one cheap count
    job) — a fixed default would silently saturate on a large corpus,
    making every row pay both the probes and the full anti-join.
    Explicit ``m_bits``/``k`` override the sizing.

    Output is row-for-row EQUAL to :func:`detanalysis_spark.llm.dedup.
    dedup_incremental` (within-batch keep-min-id collapse, then drop
    rows whose content hash exists in ``seen``): rows the filter
    rejects are definitely new (no false negatives) and skip the
    anti-join entirely; only accepted rows — true dups plus the
    ~fp_rate false-positive sliver — pay the exact hash anti-join.
    """
    from .dedup import content_hash, dedup_exact

    batch = dedup_exact(new_docs, cols, id_col) \
        .withColumn("__h__", content_hash(*cols))
    seen_h = (seen.select(F.col("content_hash").alias("__h__"))
              if seen_is_hashes
              else seen.select(content_hash(*cols).alias("__h__")))
    if bloom is None:
        if m_bits is None:
            n = max(1, seen_h.count())
            m_bits, k = optimal_bloom_params(n, fp_rate)
        bloom = build_bloom(seen_h, "__h__", m_bits=m_bits, k=k)
    test = bloom.test(F.col("__h__"), new_docs.sparkSession)
    definite_new = batch.filter(~test)
    survivors = (batch.filter(test)
                 .join(seen_h, "__h__", "left_anti"))
    return definite_new.unionByName(survivors).drop("__h__")
