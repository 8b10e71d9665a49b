#!/usr/bin/env python3
"""Recall@k vs cost curves for the approximate ANN tiers (VERDICT r9
#6): LSH multi-probe (L17) and IVF n_probe (L18/L21) against
brute-force exact cosine top-k ground truth, on a Zipf-clustered
corpus — the skewed cell-population shape real embedding corpora
have, not a uniform blob.

Corpus: ``--n`` vectors (default 20k), dim 32, drawn from 40 cluster
centers with Zipf(1.2) sizes plus Gaussian noise; 200 probe vectors
sampled across clusters. Everything is seeded/deterministic and
materialized to parquet once, so both tiers and the ground truth read
identical data.

For each setting the tool reports mean recall@10 (|approx ∩ exact|/10
averaged over probes) and min-of-2 wall seconds — the recall/cost
contract that turns "bucketed, never all-pairs" into a number.
Documented operating points (pytest floor recall@10 >= 0.9 in
tests/test_llm.py::test_ann_recall_floor): IVF 64 cells n_probe=4;
LSH bits=10 tables=8 n_flip=2.

Usage: python tools/ann_recall.py [--n 20000] [--runs 2]
Writes ANN_RECALL.json at the repo root; Markdown table on stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DIM = 32
N_CLUSTERS = 40
N_PROBES = 200
K = 10
CORPUS_DIR = "/tmp/detanalysis_ann_recall"


def build_corpus(spark, n: int) -> tuple[str, str]:
    cp = os.path.join(CORPUS_DIR, f"corpus_{n}.parquet")
    pp = os.path.join(CORPUS_DIR, f"probes_{n}.parquet")
    if os.path.exists(cp) and os.path.exists(pp):
        return cp, pp
    os.makedirs(CORPUS_DIR, exist_ok=True)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    # Zipf(1.2) cluster sizes, normalized to n
    w = 1.0 / np.arange(1, N_CLUSTERS + 1) ** 1.2
    sizes = np.maximum((w / w.sum() * n).astype(int), 5)
    rows = []
    vid = 0
    for c, s in enumerate(sizes):
        pts = centers[c] + 0.35 * rng.standard_normal((s, DIM))
        for v in pts:
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    corpus.coalesce(4).write.mode("overwrite").parquet(cp)
    probe_ids = rng.choice(vid, size=N_PROBES, replace=False)
    probes = corpus.filter(
        corpus.vec_id.isin([int(i) for i in probe_ids]))
    probes.coalesce(1).write.mode("overwrite").parquet(pp)
    return cp, pp


def topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx: dict, exact: dict) -> float:
    vals = [len(approx.get(p, set()) & ex) / max(len(ex), 1)
            for p, ex in exact.items()]
    return float(np.mean(vals)) if vals else 0.0


def main() -> int:
    n = 20_000
    runs = 2
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    from detanalysis_spark.session import get_spark
    from detanalysis_spark.llm.similarity import (IVFIndex,
                                                  RandomHyperplaneLSH,
                                                  cosine_topk)
    spark = get_spark("ann-recall")
    cp, pp = build_corpus(spark, n)
    corpus = spark.read.parquet(cp)
    probes = spark.read.parquet(pp)

    exact = topk_sets(cosine_topk(corpus, probes, k=K))

    rows = []
    ivf = IVFIndex(n_centroids=64, n_probe=1)
    ivf.fit(corpus, sample_size=min(n, 20_000))
    for np_ in (1, 2, 4, 8):
        ivf.n_probe = np_
        walls, rec = [], None
        for _ in range(runs):
            t0 = time.time()
            got = topk_sets(ivf.topk(corpus, probes, k=K))
            walls.append(time.time() - t0)
            rec = recall(got, exact)
        rows.append({"tier": "ivf", "setting": f"n_probe={np_}",
                     "recall_at_10": round(rec, 4),
                     "wall_s": round(min(walls), 3)})

    lsh = RandomHyperplaneLSH(dim=DIM, bits=10, tables=8, seed=11)
    for flip in (0, 1, 2):
        walls, rec = [], None
        for _ in range(runs):
            t0 = time.time()
            got = topk_sets(lsh.topk(corpus, probes, k=K,
                                     n_flip=flip))
            walls.append(time.time() - t0)
            rec = recall(got, exact)
        rows.append({"tier": "lsh", "setting": f"n_flip={flip}",
                     "recall_at_10": round(rec, 4),
                     "wall_s": round(min(walls), 3)})

    # brute-force cost anchor
    walls = []
    for _ in range(runs):
        t0 = time.time()
        topk_sets(cosine_topk(corpus, probes, k=K))
        walls.append(time.time() - t0)
    rows.append({"tier": "exact", "setting": "brute-force",
                 "recall_at_10": 1.0, "wall_s": round(min(walls), 3)})

    out = {"n_corpus": n, "dim": DIM, "n_clusters": N_CLUSTERS,
           "n_probes": N_PROBES, "k": K, "runs": runs, "rows": rows}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "ANN_RECALL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print("\n| tier | setting | recall@10 | wall s |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['tier']} | {r['setting']} | {r['recall_at_10']} "
              f"| {r['wall_s']} |", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
