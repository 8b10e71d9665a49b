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

Round 11 (VERDICT r10 #6) adds the one-decade-up ON-DISK section
(``--n-big``, default 200000): the same Zipf-clustered recipe at 200k
vectors, driven through ``write_corpus``/``topk_from_corpus`` — the
cell-partitioned parquet layout whose probe-time partition PRUNING is
the actual 100 TB story — plus the IVF→PQ-ADC compose (cell-pruned
candidate read, ADC rescoring over m-byte codes). Each row records
recall@10, wall, cells read / total cells, and whether the scan plan
carried a ``PartitionFilters`` entry on ``ivf_cell`` (the pruning
evidence). ``--skip-big`` skips it.

Usage: python tools/ann_recall.py [--n 20000] [--n-big 200000]
       [--runs 2] [--skip-big]
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
    pts = np.concatenate([
        centers[c] + 0.35 * rng.standard_normal((s, DIM))
        for c, s in enumerate(sizes)])
    # permute rows: cluster-ordered ids would make every
    # first-k-by-id training sample (IVF fit, PQ fit) cover only the
    # head clusters once n outgrows the sample size
    pts = pts[rng.permutation(len(pts))]
    vid = len(pts)
    import pandas as pd
    pdf = pd.DataFrame({"vec_id": np.arange(vid, dtype=np.int64),
                        "embedding": list(pts)})
    corpus = spark.createDataFrame(pdf)   # Arrow path, not row lists
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


def _partition_filter_evidence(df) -> bool:
    """True when the plan's parquet scan carries a PartitionFilters
    entry on ivf_cell — proof the cell filter prunes directories at
    planning time instead of scanning the whole corpus."""
    spark = df.sparkSession
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    import re
    return bool(re.search(r"PartitionFilters: \[[^\]]*ivf_cell", plan))


def run_big(spark, n_big: int, runs: int) -> list[dict]:
    """The one-decade-up ON-DISK section (VERDICT r10 #6): 200k
    Zipf-clustered vectors through write_corpus/topk_from_corpus
    (partition-pruned reads) and the IVF→PQ-ADC compose."""
    from detanalysis_spark.llm.similarity import (
        IVFIndex, PQCodebook, cosine_topk, ivf_pq_topk_from_corpus,
        write_pq_corpus)
    from pyspark.sql import functions as F

    cp, pp = build_corpus(spark, n_big)
    corpus = spark.read.parquet(cp)
    probes = spark.read.parquet(pp)
    exact = topk_sets(cosine_topk(corpus, probes, k=K))

    ivf = IVFIndex(n_centroids=64, n_probe=1)
    ivf.fit(corpus, sample_size=20_000)
    disk = os.path.join(CORPUS_DIR, f"ivf_disk_{n_big}")
    if not os.path.exists(os.path.join(disk, "_SUCCESS")):
        ivf.write_corpus(corpus, disk, mode="overwrite")
    n_cells_total = 64
    rows = []
    for np_ in (1, 2, 4, 8):
        ivf.n_probe = np_
        # cells the probes will open (the partition-pruning surface)
        pc = ivf._celled_probes(probes, "vec_id", "embedding")
        cells = {int(r["c"]) for r in
                 pc.select(F.explode("cells").alias("c"))
                   .distinct().collect()}
        walls, rec, pruned = [], None, None
        for _ in range(runs):
            t0 = time.time()
            res = ivf.topk_from_corpus(spark, disk, probes, k=K)
            got = topk_sets(res)
            walls.append(time.time() - t0)
            rec = recall(got, exact)
            pruned = _partition_filter_evidence(res)
        rows.append({"tier": "ivf-disk", "setting": f"n_probe={np_}",
                     "recall_at_10": round(rec, 4),
                     "wall_s": round(min(walls), 3),
                     "cells_read": len(cells),
                     "cells_total": n_cells_total,
                     "partition_filter": bool(pruned)})

    # IVF→PQ-ADC compose: the coded corpus persists cell-partitioned;
    # a query reads ONLY the probes' cells (same pruning), ADC builds
    # a SHORTLIST over m-byte codes, and an exact re-rank touches only
    # the shortlist's true vectors — the standard IVFADC+rerank shape
    # and the memory-scale path (raw 200k×32 float64 = 51 MB; codes =
    # 1.6 MB). Pure ADC ranking tops out ~0.55 recall@10 at m=8.
    pq = PQCodebook(m=8, k=256, seed=13)
    pq.fit(corpus, sample_size=20_000)
    coded_disk = os.path.join(CORPUS_DIR, f"ivf_pq_disk_{n_big}")
    if not os.path.exists(os.path.join(coded_disk, "_SUCCESS")):
        write_pq_corpus(corpus, ivf, pq, coded_disk)
    K_SHORT = 500   # ~50x k — ADC is the shortlist builder, not the ranker
    for np_ in (2, 4, 8):
        ivf.n_probe = np_
        walls, rec, pruned = [], None, None
        for _ in range(runs):
            t0 = time.time()
            res = ivf_pq_topk_from_corpus(
                spark, ivf, pq, coded_disk, disk, probes,
                k=K, shortlist=K_SHORT)
            got = topk_sets(res)
            walls.append(time.time() - t0)
            rec = recall(got, exact)
            pruned = _partition_filter_evidence(res)
        pc = ivf._celled_probes(probes, "vec_id", "embedding")
        cells = sorted({int(r["c"]) for r in
                        pc.select(F.explode("cells").alias("c"))
                          .distinct().collect()})
        rows.append({"tier": "ivf-pq-adc-rerank",
                     "setting": f"n_probe={np_}",
                     "recall_at_10": round(rec, 4),
                     "wall_s": round(min(walls), 3),
                     "cells_read": len(cells),
                     "cells_total": n_cells_total,
                     "partition_filter": bool(pruned)})

    # exact anchor at this scale
    walls = []
    for _ in range(runs):
        t0 = time.time()
        topk_sets(cosine_topk(corpus, probes, k=K))
        walls.append(time.time() - t0)
    rows.append({"tier": "exact", "setting": "brute-force",
                 "recall_at_10": 1.0, "wall_s": round(min(walls), 3),
                 "cells_read": n_cells_total,
                 "cells_total": n_cells_total,
                 "partition_filter": False})
    return rows


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

    big_rows = []
    n_big = 200_000
    if "--n-big" in sys.argv:
        n_big = int(sys.argv[sys.argv.index("--n-big") + 1])
    if "--skip-big" not in sys.argv:
        big_rows = run_big(spark, n_big, runs)

    out = {"n_corpus": n, "dim": DIM, "n_clusters": N_CLUSTERS,
           "n_probes": N_PROBES, "k": K, "runs": runs, "rows": rows,
           "big": {"n_corpus": n_big, "rows": big_rows}}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "ANN_RECALL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print("\n| tier | setting | recall@10 | wall s |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['tier']} | {r['setting']} | {r['recall_at_10']} "
              f"| {r['wall_s']} |", file=sys.stderr)
    if big_rows:
        print(f"\n| tier ({n_big:,} vecs, on-disk) | setting | "
              f"recall@10 | wall s | cells | pruned |", file=sys.stderr)
        print("|---|---|---|---|---|---|", file=sys.stderr)
        for r in big_rows:
            print(f"| {r['tier']} | {r['setting']} | "
                  f"{r['recall_at_10']} | {r['wall_s']} | "
                  f"{r['cells_read']}/{r['cells_total']} | "
                  f"{r['partition_filter']} |", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
