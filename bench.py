"""Benchmark harness: runs the declared query suite at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (``collect``) — every suite query
returns a small aggregate, so collect measures the full distributed
plan without driver-transfer noise.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from detanalysis_spark.session import get_spark
    from detanalysis_spark import suite

    spark = get_spark("bench")
    # warm up the JVM + parquet footers once so per-query numbers measure
    # the plans, not session startup
    suite.QUERIES["flagship_event_cut_stats"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in suite.QUERIES.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
        except Exception as e:  # noqa: BLE001
            print(f"# bench error in {name}: {e}", file=sys.stderr)
            dt = float("nan")
        timings[name] = round(dt, 4)
        total += dt if dt == dt else 0.0
        # release localCheckpoint RDDs / broadcasts pinned by dropped
        # DataFrame refs so earlier queries' executor storage doesn't
        # inflate later ones (GC runs outside the timed window)
        gc.collect()

    # Full per-query detail goes to a sidecar file; the stdout line must
    # stay compact (the driver records only a ~2000-char stdout tail, and
    # round-1/2 records were "parsed": null because the full 92-query dict
    # overflowed it).  Print only the headline + the 10 slowest queries.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "suite_wall_clock",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
            },
            f,
            indent=1,
            sort_keys=True,
        )

    top10 = dict(
        sorted(
            ((k, v) for k, v in timings.items() if v == v),
            key=lambda kv: kv[1],
            reverse=True,
        )[:10]
    )
    print(
        json.dumps(
            {
                "metric": "suite_wall_clock",
                "value": round(total, 2),
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in top10.items()},
                "sf": sf,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
