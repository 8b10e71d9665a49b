"""Spark-vs-DuckDB throughput comparison on the declared query suite.

BASELINE.md publishes no reference benchmark numbers, so the concrete
single-node stand-in is DuckDB running each query's own oracle SQL on
the same Parquet at the same scale factor. This tool times both sides
— Spark runs the engine plan, DuckDB runs the oracle — and prints one
JSON line plus a Markdown table of the heaviest queries (the ones
where throughput, not fixed job-scheduling overhead, dominates).

Interpretation guardrails (documented in STATUS.md):
- Sub-second toy aggregates measure Spark's fixed per-job overhead
  (~0.1-0.5 s scheduling + codegen), not engine throughput; they are
  reported but summarized separately.
- Queries whose ORACLE is deliberately naive O(n²) (all-pairs
  near-dup / ANN checks) are excluded by default — DuckDB would be
  timing a different algorithm, not the same work.

Usage: python tools/duckdb_compare.py [--all] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from detanalysis_spark.session import get_spark
from detanalysis_spark import suite
from detanalysis_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# oracles that are deliberately naive O(n^2) comparisons — excluded
# unless --all is passed (they time a different algorithm)
QUADRATIC_ORACLES = {
    "near_dup_pairs_minhash", "near_dup_cluster_sizes",
    "embedding_near_dup_pairs", "ann_cosine_topk", "ann_ivf_topk",
    "semantic_dedup_stats",     # within-cluster all-pairs NOT EXISTS
    "semantic_curation_stats",  # same NOT EXISTS shape on the gated set
    "streaming_near_dup_screen_stats",  # all-pairs stream×corpus oracle
    "curated_corpus_stats",     # all-pairs near-dedup leg
    "jaccard_pairs_exact",      # all-pairs shingle Jaccard oracle
    "jaccard_pairs_prefix_filtered",
    "containment_superset_pairs",
    "knn_graph_label_blocks",   # label-blocked all-pairs cosine oracle
    "fuzzy_join_typos",         # all-pairs levenshtein oracle
}


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    include_all = "--all" in sys.argv[1:]
    names = args or [n for n in suite.QUERIES if n in suite.ORACLES
                     and (include_all or n not in QUADRATIC_ORACLES)]

    spark = get_spark("duckdb-compare")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # warm both engines (JVM + parquet footers / DuckDB catalog)
    suite.QUERIES["flagship_event_cut_stats"](spark, SF_DIR).collect()
    con.execute(suite.ORACLES["flagship_event_cut_stats"]).fetchall()

    rows = []
    for name in names:
        if name not in suite.ORACLES:
            continue
        t0 = time.time()
        suite.QUERIES[name](spark, SF_DIR).collect()
        t_spark = time.time() - t0
        t0 = time.time()
        con.execute(suite.ORACLES[name]).fetchall()
        t_duck = time.time() - t0
        rows.append({"query": name, "spark_s": round(t_spark, 3),
                     "duckdb_s": round(t_duck, 3),
                     "ratio": round(t_spark / max(t_duck, 1e-9), 2)})

    heavy = [r for r in rows if r["duckdb_s"] >= 0.3 or r["spark_s"] >= 1.5]
    light = [r for r in rows if r not in heavy]
    summary = {
        "sf_dir": SF_DIR,
        "n_queries": len(rows),
        "spark_total_s": round(sum(r["spark_s"] for r in rows), 2),
        "duckdb_total_s": round(sum(r["duckdb_s"] for r in rows), 2),
        "heavy": sorted(heavy, key=lambda r: -r["duckdb_s"]),
        "light_median_ratio": (sorted(r["ratio"] for r in light)
                               [len(light) // 2] if light else None),
    }
    print(json.dumps(summary))
    print("\n| query | spark s | duckdb s | spark/duckdb |",
          file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for r in summary["heavy"]:
        print(f"| {r['query']} | {r['spark_s']} | {r['duckdb_s']} "
              f"| {r['ratio']} |", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
