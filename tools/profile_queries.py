"""Per-query cost breakdown for the optimization rounds.

For each query (or a named subset) measures, with a warmed session:

- build_s: wall of ``fn(spark, sf_dir)`` — Python plan construction
  plus any EAGER work the builder does (checkpoints, fixture writes,
  streaming drains, scalar collects).
- first_collect_s: first ``collect()`` of the returned DataFrame —
  Catalyst analysis + optimization + codegen + execution.
- exec_s: second ``collect()`` of the SAME DataFrame — pure
  re-execution (plans are cached on the DataFrame object), the
  steady-state distributed cost.

So ``first_collect_s - exec_s`` approximates the per-run Catalyst
analysis/codegen cost, and ``build_s`` is eager-builder cost + py4j
plan building. Writes JSON to stdout (one object per query).

Usage: python tools/profile_queries.py [query ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from detanalysis_spark.session import get_spark
    from detanalysis_spark import suite

    spark = get_spark("profile")
    names = sys.argv[1:] or list(suite.QUERIES)
    # warm-up
    suite.QUERIES["flagship_event_cut_stats"](spark, sf_dir).collect()

    out = {}
    for name in names:
        fn = suite.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.collect()
            t2 = time.time()
            df.collect()
            t3 = time.time()
            phases = {}
            try:
                tr = df._jdf.queryExecution().tracker()
                it = tr.phases().iterator()
                while it.hasNext():
                    kv = it.next()
                    ph = kv._2()
                    phases[str(kv._1())] = round(
                        (ph.endTimeMs() - ph.startTimeMs()) / 1000.0, 4)
            except Exception:
                pass
            out[name] = {
                "build_s": round(t1 - t0, 4),
                "first_collect_s": round(t2 - t1, 4),
                "exec_s": round(t3 - t2, 4),
                "total_s": round(t2 - t0, 4),
                "phases": phases,
            }
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
        gc.collect()
        print(json.dumps({name: out[name]}), flush=True)

    tot = sum(v.get("total_s", 0.0) for v in out.values())
    bld = sum(v.get("build_s", 0.0) for v in out.values())
    ana = sum(v.get("first_collect_s", 0.0) - v.get("exec_s", 0.0)
              for v in out.values() if "total_s" in v)
    exe = sum(v.get("exec_s", 0.0) for v in out.values())
    print(json.dumps({"_summary": {
        "n": len(out), "total_build_plus_first_collect_s": round(tot, 2),
        "build_s": round(bld, 2), "analysis_codegen_s": round(ana, 2),
        "exec_s": round(exe, 2)}}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
