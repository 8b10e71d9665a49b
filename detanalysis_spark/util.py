"""Small shared utilities.

``local_frame`` exists because of a measured pathology: building a
DataFrame from a Python list (``spark.createDataFrame(rows, schema)``)
routes through ``parallelize`` — a Python-worker round trip that
costs ~4.5 s PER CALL in a 32-core local session even for ONE row
(measured round 10; the cost recurs on every call, it is not a
one-off warm-up). The pandas/Arrow path instead embeds the rows as a
plan-local relation: ~0.2 s, no Python workers at execution. Every
small literal frame in the engine's hot paths (PSL rule tables, COW
meta sidecars, driver-computed offsets, oracle-query result frames)
goes through here.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` via the pandas/Arrow
    local-relation path (~20× faster than the list/parallelize path
    for small frames). ``rows`` is a sequence of tuples; ``schema`` a
    DDL string. Falls back to the plain path for empty input (nothing
    to win) or when the Arrow conversion rejects the values (complex
    nested types) — same result either way."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd
        if isinstance(schema, str):
            fields = _split_ddl(schema)
        else:                      # StructType
            fields = [f"{f.name} {f.dataType.simpleString()}"
                      for f in schema.fields]
        names = [f.split()[0].strip("`") for f in fields]
        pdf = pd.DataFrame(rows, columns=names)
        # an integer column containing None coerces to float64 in
        # pandas; magnitudes past 2^53 would then lose precision
        # silently — fall back to the exact (slow) path there
        for f in fields:
            name, typ = f.split()[0].strip("`"), f.split()[-1].lower()
            if typ in ("int", "long", "bigint", "integer", "smallint",
                       "tinyint") and str(pdf[name].dtype) == "float64":
                if pdf[name].abs().max() >= 2 ** 53:
                    return spark.createDataFrame(rows, schema)
        return spark.createDataFrame(pdf, schema)
    except Exception:   # noqa: BLE001 — correctness first, speed second
        return spark.createDataFrame(rows, schema)


def fan_out_small(df: DataFrame, min_partitions: int | None = None
                  ) -> DataFrame:
    """Spread a DataFrame whose physical input arrives in fewer
    partitions than the session has cores (optimization guide §2.5:
    "one huge unsplittable file ... repartition immediately after the
    read").

    The synthetic corpus ships each table as ONE parquet row group, so
    without this every per-row-expensive first stage (shingling,
    MinHash, regex gates, Python codecs) runs on a single core while
    the rest of the machine idles. At production scale inputs arrive
    in thousands of splits, the partition count meets the bar, and
    this is a no-op — the guard is input-shape-adaptive, not tuned to
    any core count.

    Used ONLY inside operators whose downstream is content-keyed
    (hashing, aggregation, equi-joins): a round-robin exchange must
    never be inserted upstream of partition-order-sensitive
    expressions (``rand``, ``monotonically_increasing_id``,
    ``spark_partition_id``). Streaming frames and frames whose
    partition count cannot be inspected pass through untouched.

    Per-call cost: the partition-count probe (``df.rdd``) physically
    plans the subtree — ~100 ms per call on warm sessions (measured
    round 12). The probe result is memoized on
    ``(applicationId, semanticHash)`` (~15 ms on hits): the corpus
    dirs this engine scans are read-only within a session, so the
    same semantic plan always splits the same way. The exchange
    itself costs a shuffle of the input: worth it only when stage-1
    per-row work dominates — callers were chosen by A/B measurement
    (OPTIMIZATION_r12.md), cheap first stages do NOT call this.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = int(min_partitions or sc.defaultParallelism)
    try:
        key = (sc.applicationId, df.semanticHash(), target)
    except Exception:   # noqa: BLE001 — a probe failure must not fail the op
        key = None
    if key is not None and key in _FAN_OUT_CACHE:
        cur = _FAN_OUT_CACHE[key]
    else:
        try:
            cur = df.rdd.getNumPartitions()
        except Exception:   # noqa: BLE001
            return df
        if key is not None:
            if len(_FAN_OUT_CACHE) > 512:
                _FAN_OUT_CACHE.clear()
            _FAN_OUT_CACHE[key] = cur
    if cur >= target:
        return df
    return df.repartition(target)


_FAN_OUT_CACHE: dict = {}


def _split_ddl(schema: str) -> list[str]:
    """Split a DDL column list on top-level commas (array<...> and
    struct<...> commas don't count)."""
    out, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def write_sidecar_parquet(spark: SparkSession, rows, schema: str,
                          path: str) -> None:
    """Write a small (one-to-few-row) parquet sidecar table — meta
    rows pinning index/table parameters (``_lsh_meta``, ``_cow_meta``,
    BPE/LM meta, saved model weights).

    For a plain LOCAL path the file is written driver-side via
    pyarrow: a Spark ``coalesce(1).write`` of one row costs a whole
    job (~0.4 s of stage launch + commit protocol per call, measured
    round 12) for ~100 bytes of payload, and these sidecars are
    written inside hot builder paths (every COW table create, every
    LSH index build, every streaming-upsert micro-batch). The
    directory layout matches a Spark write (a single part file inside
    the directory) so ``spark.read.parquet`` sees the same table
    either way. Paths with a scheme (hdfs://, s3a://, file://) and any
    conversion surprise fall back to the Spark writer — the documented
    "lands on whatever filesystem the session targets" property of the
    persisted-artifact APIs is preserved exactly where it matters.
    """
    rows = list(rows)
    local = "://" not in path and rows
    if local:
        try:
            import shutil

            import pyarrow as pa
            import pyarrow.parquet as pq
            types = {
                "int": pa.int32(), "integer": pa.int32(),
                "smallint": pa.int16(), "tinyint": pa.int8(),
                "long": pa.int64(), "bigint": pa.int64(),
                "float": pa.float32(), "double": pa.float64(),
                "string": pa.string(), "boolean": pa.bool_(),
                "binary": pa.binary(),
            }
            fields = []
            for f in _split_ddl(schema):
                parts = f.split()
                name, typ = parts[0].strip("`"), parts[-1].lower()
                fields.append(pa.field(name, types[typ]))  # KeyError → fallback
            arrays = [pa.array([r[i] for r in rows], type=fld.type)
                      for i, fld in enumerate(fields)]
            table = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
            shutil.rmtree(path, ignore_errors=True)
            import os
            os.makedirs(path, exist_ok=True)
            pq.write_table(table, os.path.join(path, "part-00000.parquet"))
            return
        except Exception:   # noqa: BLE001 — correctness first
            pass
    (local_frame(spark, rows, schema)
     .coalesce(1).write.mode("overwrite").parquet(path))


def write_local_fixture_parquet(df: DataFrame, path: str,
                                n_files: int = 1,
                                max_rows: int = 2_000_000) -> None:
    """Materialize a BOUNDED DataFrame as a local parquet directory
    driver-side (Arrow collect + pyarrow write) — the fixture-staging
    sibling of :func:`write_sidecar_parquet`.

    Streaming suite queries stage their input files per run (a file
    stream source needs a directory); a Spark ``coalesce(n).write`` of
    a few-KB fixture costs a full job (~0.3-0.4 s stage launch +
    commit protocol, measured round 12) per write, inside the timed
    query. ``df.toArrow()`` preserves Spark's physical parquet types
    (timestamps keep their LTZ/NTZ adjustment, arrays stay lists), so
    ``spark.read``/``readStream`` with the original schema sees the
    identical table. ``n_files`` contiguous slices land as separate
    part files — the micro-batch boundaries of a
    ``maxFilesPerTrigger=1`` drain; callers use this ONLY where the
    drained result is batch-composition independent.

    Scheme'd paths (hdfs://, s3a://), results larger than ``max_rows``
    (the collect is bounded by ``limit`` BEFORE it reaches the
    driver), and any conversion surprise fall back to the plain Spark
    writer.
    """
    if "://" not in path:
        try:
            import os
            import shutil

            import pyarrow.parquet as pq
            tbl = df.limit(max_rows + 1).toArrow()
            if tbl.num_rows <= max_rows:
                shutil.rmtree(path, ignore_errors=True)
                os.makedirs(path, exist_ok=True)
                n = max(1, int(n_files))
                step = max(1, -(-tbl.num_rows // n))
                for i in range(n):
                    pq.write_table(
                        tbl.slice(i * step, step),
                        os.path.join(path, f"part-{i:05d}.parquet"))
                return
        except Exception:   # noqa: BLE001 — correctness first
            pass
    df.coalesce(max(1, int(n_files))).write.mode("overwrite").parquet(path)
