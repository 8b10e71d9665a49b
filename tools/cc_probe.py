"""Connected-components algorithm probe: pointer-jumping min-label
propagation (the engine's `near_dup_clusters`) vs the alternating
Large-Star/Small-Star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC 2014) on planted graphs.

Why: near-dup clustering at 100 TB runs CC over the LSH pair graph;
both algorithms converge in O(log n) rounds, but their per-round
shuffle shapes differ — pointer jumping shuffles |V| labels + |E|
edges per round with a fixed two-join plan, star alternation rewrites
the EDGE set each round (shrinking it as stars collapse, but paying
`distinct` dedup per half-round). This probe measures both on
  (a) a power-law (preferential-attachment) graph — the realistic
      near-dup shape: a few huge dup families, a long tail;
  (b) a 1000-link chain — the diameter worst case;
and verifies the two partitions agree exactly.

Usage: python tools/cc_probe.py [n_powerlaw_nodes]
Prints one JSON line for STATUS.md's probe table.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from detanalysis_spark.session import get_spark
from detanalysis_spark.llm.dedup import (near_dup_clusters,
                                          near_dup_clusters_star)


def planted_powerlaw_pairs(spark, n: int, seed: int = 7) -> DataFrame:
    """Preferential-attachment edges (each new node links to an
    existing node chosen ∝ degree) — one giant skewed component plus
    isolated-pair noise."""
    rng = np.random.default_rng(seed)
    targets = np.zeros(n, dtype=np.int64)
    pool = [0]
    for i in range(1, n):
        targets[i] = pool[rng.integers(0, len(pool))]
        pool.append(i)
        pool.append(int(targets[i]))
    rows = [(int(i), int(targets[i])) for i in range(1, n)]
    # noise: disjoint pairs far from the big component
    rows += [(n + 2 * j, n + 2 * j + 1) for j in range(n // 10)]
    return spark.createDataFrame(rows, ["id_a", "id_b"]).repartition(32)


def chain_pairs(spark, length: int) -> DataFrame:
    return spark.createDataFrame(
        [(i, i + 1) for i in range(length)], ["id_a", "id_b"]) \
        .repartition(32)


def canon(labels: DataFrame) -> set[tuple[int, int]]:
    return {(r["id"], r["cluster_id"]) for r in labels.collect()}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("cc-probe")
    out = {}
    for name, pairs in (("powerlaw", planted_powerlaw_pairs(spark, n)),
                        ("chain1000", chain_pairs(spark, 1000))):
        pairs = pairs.localCheckpoint(eager=True)   # exclude gen cost
        t0 = time.time()
        a = canon(near_dup_clusters(pairs, max_iter=40, method="jump"))
        t_pj = round(time.time() - t0, 2)
        t0 = time.time()
        b = canon(near_dup_clusters_star(pairs, max_iter=40))
        t_star = round(time.time() - t0, 2)
        assert a == b, f"{name}: partitions disagree"
        out[name] = {"pointer_jump_s": t_pj, "star_s": t_star,
                     "n_nodes": len(a),
                     "n_components": len({c for _, c in a})}
    print(json.dumps({"probe": "cc_pointer_jump_vs_star", **out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
