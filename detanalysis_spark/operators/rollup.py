"""Incremental time-bucket rollups (continuous aggregates) and
gap-filled bucket series — the hypertable operator family.

The public TimescaleDB/Druid "continuous aggregate" pattern: keep a
small aggregate table keyed by (bucket, dims) that absorbs new raw
batches WITHOUT re-scanning history. It works because every stored
value is a MERGEABLE sufficient statistic — count, sum, min, max, sum
of squares — so merging two rollups is a plain re-aggregation of their
union, and finalization (mean/variance) happens only at read time.

Scale design (the whole point at 100 TB):
- ``build_rollup`` is ONE map-side-combined groupBy over the new batch
  only; history is never touched.
- ``merge_rollups`` re-aggregates rollup ROWS (buckets × dims — orders
  of magnitude smaller than raw), so continuous maintenance costs are
  bounded by the aggregate's size, not the corpus's.
- ``update_rollup`` persists the rollup PARTITIONED BY bucket-date
  with dynamic partition overwrite: a new batch only rewrites the
  partitions its buckets touch (partition pruning reads just those
  back), which is exactly how a late-arriving hour merges into a
  year-long rollup without a year-long job.
- Variance uses the (n, Σx, Σx²) representation because plain sums are
  associative — the merge stays a vanilla hash aggregate. The
  cancellation caveat (mean ≫ std by ~1e8 in double) is documented;
  callers in that regime should bucket-center first.

Reference parity: generalizes the reference's per-time-bin counting
(``semiautocuts.py:738-811``) from a one-shot batch computation to a
maintained aggregate; ``gapfill_buckets`` covers the plotting-side
"empty bins still show" behavior of its histogram paths.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["time_bucket", "build_rollup", "merge_rollups",
           "finalize_rollup", "update_rollup", "read_rollup",
           "gapfill_buckets"]


def time_bucket(ts: Column, width_us: int) -> Column:
    """Bucket start (epoch microseconds, long) of a timestamp column —
    exact integer arithmetic (``t - t mod width``), identical in any
    engine (DuckDB: ``epoch_us(ts) - epoch_us(ts) % width``)."""
    t = F.unix_micros(ts)
    return (t - F.pmod(t, F.lit(int(width_us)))).alias("bucket_us")


def build_rollup(df: DataFrame, ts_col: str, value_col: str,
                 keys: Sequence[str] = (),
                 width_us: int = 86_400_000_000,
                 distinct_cols: Sequence[str] = (),
                 quantile_cols: Sequence[str] = (),
                 kll_k: int = 2048) -> DataFrame:
    """Aggregate a raw batch to rollup rows
    (bucket_us, *keys, n, s, s2, mn, mx): one map-side-combined
    groupBy. All five statistics merge by plain sum/min/max.

    ``distinct_cols`` adds a mergeable theta sketch per column
    (``<col>_theta`` binary — distinct counts that merge across
    batches by union, exact below ~4096 distinct per bucket, ~1%
    beyond); ``quantile_cols`` adds a KLL double sketch
    (``<col>_kll``, nominal ``kll_k`` — exact while a bucket holds
    fewer than ~``kll_k`` rows). Sketches are the only way a
    continuous aggregate can answer distinct/quantile questions
    without re-scanning history — plain counts don't merge."""
    if isinstance(keys, str):
        keys = [keys]
    if isinstance(distinct_cols, str):
        distinct_cols = [distinct_cols]
    if isinstance(quantile_cols, str):
        quantile_cols = [quantile_cols]
    v = F.col(value_col).cast("double")
    aggs = [F.count(v).alias("n"),
            F.sum(v).alias("s"),
            F.sum(v * v).alias("s2"),
            F.min(v).alias("mn"),
            F.max(v).alias("mx")]
    aggs += [F.theta_sketch_agg(c).alias(f"{c}_theta")
             for c in distinct_cols]
    aggs += [F.kll_sketch_agg_double(F.col(c).cast("double"),
                                     F.lit(int(kll_k)))
             .alias(f"{c}_kll") for c in quantile_cols]
    return (df.withColumn("bucket_us", time_bucket(F.col(ts_col), width_us))
            .groupBy("bucket_us", *keys)
            .agg(*aggs))


def merge_rollups(*rollups: DataFrame,
                  keys: Sequence[str] = ()) -> DataFrame:
    """Merge rollup tables into one: union + re-aggregate. Input rows
    are (bucket × dims) aggregates, so this shuffles the ROLLUPS, not
    the raw history — the cost of absorbing a batch is bounded by the
    aggregate's own size."""
    if isinstance(keys, str):
        keys = [keys]
    if not rollups:
        raise ValueError("merge_rollups needs at least one rollup")
    u = rollups[0]
    for r in rollups[1:]:
        u = u.unionByName(r)
    # sketch columns are self-describing by suffix (build_rollup's
    # naming contract): theta states union-merge, KLL states
    # merge-agg — so merge/update keep their signatures no matter
    # which sketches a rollup carries
    aggs = [F.sum("n").alias("n"), F.sum("s").alias("s"),
            F.sum("s2").alias("s2"), F.min("mn").alias("mn"),
            F.max("mx").alias("mx")]
    aggs += [F.theta_union_agg(c).alias(c) for c in u.columns
             if c.endswith("_theta")]
    aggs += [F.kll_merge_agg_double(c).alias(c) for c in u.columns
             if c.endswith("_kll")]
    return u.groupBy("bucket_us", *keys).agg(*aggs)


def finalize_rollup(rollup: DataFrame,
                    quantiles: Sequence[float] = (0.5,)) -> DataFrame:
    """Read-time statistics from the sufficient-statistic columns:
    mean = Σx/n, var_pop = max(Σx²/n − mean², 0) (clamped against
    float round-off), std = sqrt. Sketch columns finalize too: each
    ``<c>_theta`` adds ``<c>_n_distinct``; each ``<c>_kll`` adds one
    ``<c>_p<q>`` per requested quantile (the sketch's inclusive-rank
    rule: the stored value at 1-indexed position ceil(q·n)). The
    mergeable state columns pass through so the finalized frame can
    still absorb batches."""
    mean = F.col("s") / F.col("n")
    var = F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
    out = (rollup.withColumn("mean", mean)
           .withColumn("var_pop", var)
           .withColumn("std", F.sqrt(var)))
    for c in rollup.columns:
        if c.endswith("_theta"):
            out = out.withColumn(
                f"{c[:-6]}_n_distinct",
                F.theta_sketch_estimate(F.col(c)))
        elif c.endswith("_kll"):
            for q in quantiles:
                out = out.withColumn(
                    f"{c[:-4]}_p{int(round(q * 100))}",
                    F.kll_sketch_get_quantile_double(
                        F.col(c), F.lit(float(q))))
    return out


def update_rollup(path: str, batch_rollup: DataFrame,
                  keys: Sequence[str] = ()) -> None:
    """Continuous-aggregate maintenance against a parquet rollup
    partitioned by ``bucket_day``: read back ONLY the partitions the
    new batch touches (partition-pruned by the bucket-day list — a
    driver-side list of a few dates), merge, and dynamically overwrite
    just those partitions. History partitions are never read or
    rewritten. First call bootstraps the table."""
    from ..sources.layout import hadoop_exists
    spark = batch_rollup.sparkSession

    def bucket_day(c: Column) -> Column:
        # exact: subtract the remainder, then divide the exact multiple
        day = F.lit(86_400_000_000)
        return ((c - F.pmod(c, day)) / day).cast("long")

    staged = batch_rollup.withColumn(
        "bucket_day", bucket_day(F.col("bucket_us")))
    # existence probed through the Hadoop FileSystem API, not os.path —
    # on HDFS/S3 a local-disk check is always false and would silently
    # skip the merge, overwriting touched partitions with batch-only
    # statistics
    if hadoop_exists(spark, path):
        days = [r["bucket_day"] for r in
                staged.select("bucket_day").distinct().collect()]
        existing = (spark.read.parquet(path)
                    .filter(F.col("bucket_day").isin(days))
                    .drop("bucket_day"))
        merged = merge_rollups(existing, staged.drop("bucket_day"),
                               keys=keys)
        staged = merged.withColumn(
            "bucket_day", bucket_day(F.col("bucket_us")))
    # per-write option, not the session-global conf: concurrent writes
    # in the same session keep their own overwrite semantics (the
    # stream_to_parquet pattern in streaming/continuous.py)
    (staged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("bucket_day").parquet(path))


def read_rollup(spark, path: str) -> DataFrame:
    """Load a persisted rollup (partition column dropped)."""
    return spark.read.parquet(path).drop("bucket_day")


def gapfill_buckets(rollup: DataFrame, width_us: int,
                    keys: Sequence[str] = (),
                    locf_cols: Sequence[str] = ()) -> DataFrame:
    """Dense bucket series per key group — the ``time_bucket_gapfill``
    analog. Missing buckets appear with null statistics (``n`` filled
    as 0); ``locf_cols`` are last-observation-carried-forward via an
    ``ignoreNulls`` last() window.

    Plan: per-key min/max bucket (one aggregate) → JVM-native
    ``sequence`` explode builds the dense spine (rows = buckets per
    key, tiny next to raw data) → one left join keyed by
    (key, bucket) → optional LOCF window partitioned by key. No
    driver-side loops, no Python.
    """
    if isinstance(keys, str):
        keys = [keys]
    if isinstance(locf_cols, str):
        locf_cols = [locf_cols]
    kc = [F.col(k) for k in keys]
    spine = (rollup.groupBy(*kc)
             .agg(F.min("bucket_us").alias("__lo__"),
                  F.max("bucket_us").alias("__hi__"))
             .select(*kc, F.explode(F.sequence(
                 F.col("__lo__"), F.col("__hi__"),
                 F.lit(int(width_us)))).alias("bucket_us")))
    # NULL-SAFE key equality: groupBy built a spine row for the
    # null-key group, so the join back must match it (plain equality
    # would zero out every bucket of that group). The spine derives
    # from the rollup, so both sides need explicit aliases.
    sp, ro = spine.alias("__sp__"), rollup.alias("__ro__")
    cond = F.col("__sp__.bucket_us") == F.col("__ro__.bucket_us")
    for k in keys:
        cond = cond & F.col(f"__sp__.{k}").eqNullSafe(
            F.col(f"__ro__.{k}"))
    out = (sp.join(ro, cond, "left")
           .select(*[F.col(f"__sp__.{k}").alias(k) for k in keys],
                   F.col("__sp__.bucket_us").alias("bucket_us"),
                   *[F.col(f"__ro__.{c}").alias(c)
                     for c in rollup.columns
                     if c not in ("bucket_us", *keys)])
           .withColumn("n", F.coalesce(F.col("n"), F.lit(0))))
    if locf_cols:
        w = (Window.partitionBy(*kc).orderBy("bucket_us")
             .rowsBetween(Window.unboundedPreceding, 0))
        for c in locf_cols:
            out = out.withColumn(
                c, F.last(F.col(c), ignorenulls=True).over(w))
    return out
