"""Parquet source adapter (S1-S3).

One wrinkle vs a plain ``spark.read.parquet``: the synthetic tables
store nanosecond-precision timestamps (parquet TIMESTAMP(NANOS)), which
Spark's vectorized reader rejects. We flip the documented
``spark.sql.legacy.parquet.nanosAsLong`` conf (reads them as long
nanos) and convert to microsecond timestamps with *integer* arithmetic
(``div 1000`` — float division would lose precision on 19-digit epoch
nanos), matching DuckDB's truncate-to-micros behavior so oracle
comparisons agree.

The second wrinkle: tz-naive microsecond timestamps (parquet
TIMESTAMP(MICROS, isAdjustedToUTC=false)) load as Spark
``TIMESTAMP_NTZ``, which rejects ``unix_micros`` / ``cast(double)``.
DuckDB treats the same naive wall-clock as UTC in ``epoch()``, so we
rebase NTZ columns to TIMESTAMP_LTZ whose *internal epoch equals the
wall-clock-as-UTC epoch* — computed with pure NTZ wall-clock
arithmetic (``timestampdiff`` from the NTZ epoch), so the result is
independent of the session time zone (a plain ``cast("timestamp")``
would shift by the session offset).

Column detection is driver-side via the parquet footer (pyarrow), so
the executors still use the native vectorized scan — pushdown and
column pruning intact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

_TS_COLS_CACHE: dict[str, tuple[list[str], list[str]]] = {}


def _timestamp_cols(path: str) -> tuple[list[str], list[str]]:
    """(nano-precision cols, tz-naive micro/milli/sec cols) per footer."""
    if path in _TS_COLS_CACHE:
        return _TS_COLS_CACHE[path]
    nano: list[str] = []
    ntz: list[str] = []
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa
        schema = ds.dataset(path, format="parquet").schema
        for field in schema:
            if pa.types.is_timestamp(field.type):
                if field.type.unit == "ns":
                    nano.append(field.name)
                elif field.type.tz is None:
                    ntz.append(field.name)
    except Exception:
        pass
    _TS_COLS_CACHE[path] = (nano, ntz)
    return nano, ntz


_DF_CACHE: dict[tuple[str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str,
               cache: bool = True) -> DataFrame:
    """Load one synthetic table with timestamp normalization.

    The resolved DataFrame is memoized per (session, path): every
    suite query starts with 1-3 ``load_table`` calls, and re-running
    ``spark.read.parquet`` costs a JVM file listing + footer schema
    read + re-analysis of the rebase projection each time — pure
    driver-side fixed cost at any scale. DataFrames are immutable, so
    sharing one plan object across queries is safe; the parquet file
    listing is captured at first load, which is exactly right for the
    read-only corpus dirs this loader serves (pass ``cache=False`` for
    a directory whose contents mutate within a session).
    """
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, path)
    if cache:
        # evict other-session entries only past a size cap: restarted
        # processes must not pin dead plans forever, but two LIVE
        # sessions alternating in one process (parallel fixtures, A/B
        # harnesses) must not thrash each other's memoization — the
        # cap comfortably holds every table for a handful of sessions
        if len(_DF_CACHE) > 64:
            stale = [k for k in _DF_CACHE if k[0] != key[0]]
            for k in stale:
                del _DF_CACHE[k]
        if key in _DF_CACHE:
            return _DF_CACHE[key]
    nano_cols, ntz_cols = _timestamp_cols(path)
    # nanosAsLong is set once at session build (session.py _DEFAULTS) —
    # never mutated here (racy under concurrent use)
    df = spark.read.parquet(path)
    for c in nano_cols:
        # integer div: 1704067798778549829 ns -> 1704067798778549 us
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c in ntz_cols:
        # NTZ wall-clock -> LTZ with epoch == wall-clock-as-UTC (tz-free)
        df = df.withColumn(c, F.timestamp_micros(F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{c}`)")))
    if cache:
        _DF_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str,
             names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register all tables as temp views for the SQL surface."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# ----------------------------------------------------------------------
# legacy schema adapter (analyzer.py:975-988: `eventnumber` vs
# `event_number` era variants)
# ----------------------------------------------------------------------
LEGACY_COLUMN_MAP = {
    "seriesnumber": "series_number",
    "eventnumber": "event_number",
    "dumpnumber": "dump_number",
    "triggerindex": "trigger_index",
}


def normalize_legacy_columns(df: DataFrame) -> DataFrame:
    """Rename legacy id columns to their canonical names (no-op when the
    canonical name already exists). Pure projection — free at any scale."""
    renames = {legacy: canon for legacy, canon in LEGACY_COLUMN_MAP.items()
               if legacy in df.columns and canon not in df.columns}
    return df.withColumnsRenamed(renames) if renames else df


# ----------------------------------------------------------------------
# bucketed persistence: co-located joins/aggs with zero exchanges
# ----------------------------------------------------------------------
def write_bucketed(df: DataFrame, table_name: str, bucket_cols,
                   num_buckets: int = 32, sort_cols=None,
                   path: str | None = None, mode: str = "overwrite") -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by its join
    / aggregation keys.

    This is the 100 TB co-location strategy: two tables bucketed by the
    same keys into the same bucket count join with NO shuffle on either
    side, and aggregations keyed by the bucket columns skip their
    exchange — the scan itself provides the partitioning. For the event
    engine that means bucketing events and the cut sidecar by
    ``__event_index__``, and traces by ``(series_number,
    event_number)``.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format("parquet").bucketBy(int(num_buckets), *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``spark.read.parquet`` of the files would lose it)."""
    return spark.table(table_name)


def write_partitioned(df: DataFrame, path: str, partition_cols,
                      mode: str = "overwrite") -> None:
    """Hive-style directory partitioning — the 100 TB event-store
    layout (SURVEY §7.1: partition by ``series_number``). Predicates on
    the partition columns become partition PRUNING: the scan never
    opens a file outside matching directories, which is what makes the
    reference's series-scoped loads (S3) cheap at scale. Keep the
    column low-cardinality (series, date) — one directory per value.
    """
    cols = [partition_cols] if isinstance(partition_cols, str) \
        else list(partition_cols)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def table_diff(old: DataFrame, new: DataFrame, id_col: str,
               compare_cols: "Sequence[str] | None" = None) -> DataFrame:
    """Snapshot diff (CDC-style) between two keyed tables:
    (id, status, old_row, new_row) with status in
    added / removed / changed / unchanged. ``compare_cols`` bounds the
    change detection (default: all shared non-id columns); comparison
    is null-safe struct equality, so null→value and value→null both
    read as changed.

    Plan: ONE full-outer join keyed by id — at 100 TB, write both
    snapshots bucketed by id (``write_bucketed``) and the join runs
    with zero exchanges. The classic lakehouse "what changed between
    loads" audit without a transaction log.
    """
    if id_col in ("status", "old_row", "new_row"):
        raise ValueError(
            f"id_col {id_col!r} collides with a table_diff output column")
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c != id_col and c in new.columns]
    elif isinstance(compare_cols, str):
        compare_cols = [compare_cols]
    cols = list(compare_cols)
    o = old.select(F.col(id_col).alias("__id__"),
                   F.struct(*[F.col(c) for c in cols]).alias("old_row"))
    n = new.select(F.col(id_col).alias("__id__"),
                   F.struct(*[F.col(c) for c in cols]).alias("new_row"))
    j = o.join(n, "__id__", "full_outer")
    status = (F.when(F.col("old_row").isNull(), F.lit("added"))
              .when(F.col("new_row").isNull(), F.lit("removed"))
              .when(~F.col("old_row").eqNullSafe(F.col("new_row")),
                    F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return j.select(F.col("__id__").alias(id_col),
                    status.alias("status"), "old_row", "new_row")
