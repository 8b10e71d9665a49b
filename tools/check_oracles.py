"""Local stand-in for the driver's correctness gate.

Runs every declared query at sf0.01 on Spark AND its DuckDB oracle,
compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted, floats compared exactly after
both sides' own rounding). Usage:

    python tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from detanalysis_spark.session import get_spark
from detanalysis_spark import suite
from detanalysis_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def compare(name: str, spark, con) -> tuple[bool, str]:
    q = suite.QUERIES[name]
    t0 = time.time()
    sdf = q(spark, SF_DIR).toPandas()
    t_spark = time.time() - t0
    if name not in suite.ORACLES:
        return True, f"rows-only ({len(sdf)} rows, {t_spark:.2f}s, no oracle)"
    odf = con.execute(suite.ORACLES[name]).df()
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return False, f"row count mismatch: spark={len(sdf)} oracle={len(odf)}"
    a, b = _normalize(sdf), _normalize(odf.astype({c: t for c, t in sdf.dtypes.items() if c in odf}))
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        return False, f"value mismatch: {str(e)[:500]}"
    return True, f"ok ({len(sdf)} rows, {t_spark:.2f}s)"


def _vanilla_spark():
    """A driver-like session: default configs, deliberately non-UTC
    timezone, none of the engine's session.py tuning — queries must
    pass here too, since the correctness harness supplies its own
    SparkSession."""
    from pyspark.sql import SparkSession
    return (SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[8]")
            .config("spark.sql.session.timeZone", "America/New_York")
            # reader capability, not engine tuning: without it Spark
            # cannot load TIMESTAMP(NANOS) parquet at all (load_table's
            # nano branch expects long nanos)
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def main() -> int:
    names = sys.argv[1:] or list(suite.QUERIES)
    spark = (_vanilla_spark() if os.environ.get("SPARK_GRAFT_VANILLA")
             else get_spark("oracle-check"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_fail = 0
    for name in names:
        if name not in suite.QUERIES:
            print(f"FAIL {name}: unknown query")
            n_fail += 1
            continue
        try:
            ok, msg = compare(name, spark, con)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"exception: {type(e).__name__}: {str(e)[:300]}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}")
        n_fail += 0 if ok else 1
    print(f"\n{len(names) - n_fail}/{len(names)} pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
