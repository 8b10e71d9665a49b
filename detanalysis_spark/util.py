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
