#!/usr/bin/env python3
"""Measured recall curve for the persisted LSH index's band-subset
probe (round 12) — the deployment knob `n_bands_probe` trades index
I/O + join fan-out against recall, and the theory says recall at k of
b bands is the S-curve 1-(1-j^r)^k. This tool measures it on real
data instead of asserting it:

1. Ground truth: ALL (probe, corpus) pairs with exact word-shingle
   Jaccard >= threshold, via the lossless prefix-filtered exact join
   (`jaccard_index_pairs(prefix_filter=True)` on the union, restricted
   to cross pairs) — no LSH involved, no misses by construction.
2. For each k in the sweep: `lsh_index_probe(n_bands_probe=k)` +
   exact-Jaccard verification, recall = |caught ∩ truth| / |truth|.

Output: one JSON line (committed as LSH_RECALL.json) with per-k
recall, candidate counts (the cost side), and wall clocks.

Usage: python tools/lsh_recall.py [--sf-dir D] [--threshold T]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
THRESHOLD = 0.5
SPLIT = 500           # probe side: doc_id < SPLIT; corpus: the rest
BANDS_SWEEP = (1, 2, 4, 8, 16)


def main() -> int:
    sf_dir = SF_DIR
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    threshold = THRESHOLD
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])

    from pyspark.sql import functions as F

    from detanalysis_spark.llm.dedup import (jaccard_index_pairs,
                                             lsh_index_probe,
                                             verify_candidates,
                                             write_lsh_index)
    from detanalysis_spark.session import get_spark
    from detanalysis_spark.sources import load_table

    spark = get_spark("lsh-recall")
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").localCheckpoint(eager=True)
    probes = docs.filter(F.col("doc_id") < SPLIT)
    corpus = docs.filter(F.col("doc_id") >= SPLIT)

    # ground truth: exact Jaccard >= t cross pairs (lossless prefix
    # filter — no LSH, no misses)
    exact = jaccard_index_pairs(docs, "doc_id", "text",
                                threshold=threshold, prefix_filter=True)
    truth = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
             for r in exact.collect()
             if (r.id_a < SPLIT) != (r.id_b < SPLIT)}

    idx = f"/tmp/detanalysis_lsh_recall_{os.getpid()}"
    shutil.rmtree(idx, ignore_errors=True)
    write_lsh_index(corpus, idx)

    rows = []
    for k in BANDS_SWEEP:
        t0 = time.time()
        cand = (lsh_index_probe(spark, idx, probes, n_bands_probe=k)
                .withColumnRenamed("probe_id", "id_a")
                .withColumnRenamed("corpus_id", "id_b"))
        ver = verify_candidates(docs, cand, "doc_id",
                                threshold=threshold)
        n_cand = cand.count()
        caught = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
                  for r in ver.collect()}
        wall = time.time() - t0
        extras = caught - truth
        assert not extras, f"verified pair outside ground truth: {extras}"
        rec = len(caught & truth) / max(len(truth), 1)
        rows.append({"n_bands_probe": k,
                     "recall": round(rec, 4),
                     "n_candidates": int(n_cand),
                     "wall_s": round(wall, 2)})
        print(f"k={k}: recall {rec:.3f}, {n_cand} candidates, "
              f"{wall:.1f}s", file=sys.stderr)

    shutil.rmtree(idx, ignore_errors=True)
    out = {"sf_dir": sf_dir, "threshold": threshold,
           "n_truth_pairs": len(truth),
           "n_probe_docs": probes.count(),
           "n_corpus_docs": corpus.count(),
           "sweep": rows}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
