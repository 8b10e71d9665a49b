"""Capture .explain("formatted") for named suite queries to files.

Usage: python tools/explain_query.py OUTDIR query [query ...]
Writes OUTDIR/<query>.txt. Builders run fully (eager work included).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    from detanalysis_spark.session import get_spark
    from detanalysis_spark import suite

    spark = get_spark("explain")
    for name in names:
        df = suite.QUERIES[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
