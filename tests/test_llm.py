"""LLM-pipeline operators: dedup (exact/MinHash/SimHash), similarity
search, text analysis. Numerics checked against numpy/pure-python
oracles on planted frames."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from detanalysis_spark.llm import dedup as D
from detanalysis_spark.llm import text as T
from detanalysis_spark.llm.similarity import (RandomHyperplaneLSH,
                                              cosine_topk)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (0, base, "a"),
        (1, base, "a"),                       # exact dup of 0
        (2, base + "extra tail words here", "b"),   # near dup of 0
        (3, "completely different content about spark shuffles", "b"),
        (4, "unrelated text on query optimizers and join order", "c"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "grp"])


def test_dedup_exact_keeps_min_id(docs):
    kept = D.dedup_exact(docs, ["text"], "doc_id")
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [0, 2, 3, 4]  # doc 1 (dup of 0) dropped


def test_exact_dup_groups(docs):
    g = {r.keep_id: r.n_copies
         for r in D.exact_dup_groups(docs, ["text"], "doc_id").collect()}
    assert g[0] == 2 and g[2] == g[3] == g[4] == 1


def test_word_shingles_match_python(spark):
    text = "a b c d e"
    got = (spark.range(1).select(
        D.word_shingles(F.lit(text), 3).alias("sh")).first().sh)
    assert sorted(got) == ["a b c", "b c d", "c d e"]
    # short text → empty shingle set, not junk
    short = (spark.range(1).select(
        D.word_shingles(F.lit("a b"), 3).alias("sh")).first().sh)
    assert short == []


def test_minhash_identical_and_near(docs):
    sigs = {r.doc_id: r.minhash
            for r in D.minhash_signatures(docs, "text").collect()}
    assert sigs[0] == sigs[1]                      # identical text
    agree = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    assert agree >= 40                             # near dup: most mins shared
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[3]))
    assert agree_far <= 5


def test_lsh_candidates_no_all_pairs(docs):
    sigs = D.minhash_signatures(docs, "text")
    cand = {(r.id_a, r.id_b)
            for r in D.lsh_candidate_pairs(sigs, "doc_id").collect()}
    assert (0, 1) in cand and (0, 2) in cand
    assert len(cand) < 5 * 4 / 2                   # ≪ all pairs


def test_near_dup_pairs_and_jaccard(docs):
    nd = {(r.id_a, r.id_b): r.jaccard
          for r in D.near_dup_pairs(docs, "doc_id", "text",
                                    threshold=0.5).collect()}
    assert nd[(0, 1)] == 1.0
    assert 0.5 <= nd[(0, 2)] < 1.0
    assert all(a < b for a, b in nd)


def test_near_dup_clusters_transitive(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    cl = {r.id: r.cluster_id
          for r in D.near_dup_clusters(pairs).collect()}
    assert cl[1] == cl[2] == cl[3] == 1
    assert cl[10] == cl[11] == 10


def test_near_dup_clusters_chain_pointer_jumping(spark):
    """A 1000-link chain needs O(diameter) rounds under plain
    propagation but O(log n) with pointer jumping: the accelerated
    path must converge within ~11 rounds while the plain path
    exhausts the same budget (VERDICT r2 item 7)."""
    edges = [(i, i + 1) for i in range(1000)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    cl = D.near_dup_clusters(pairs, max_iter=14, method="jump")
    assert cl.filter(F.col("cluster_id") != 0).count() == 0
    assert cl.count() == 1001
    with pytest.raises(RuntimeError, match="no convergence"):
        D.near_dup_clusters(pairs, max_iter=14, accelerate=False)


def test_near_dup_clusters_plain_mode_small(spark):
    pairs = spark.createDataFrame(
        [(5, 6), (6, 7), (30, 31)], ["id_a", "id_b"])
    cl = {r.id: r.cluster_id
          for r in D.near_dup_clusters(pairs, accelerate=False).collect()}
    assert cl[5] == cl[6] == cl[7] == 5
    assert cl[30] == cl[31] == 30


def test_near_dup_clusters_star_agrees_with_pointer_jumping(spark):
    """Alternating large/small-star CC (the skewed-graph alternative)
    must produce the identical partition on a chain (diameter worst
    case) and on a hub-heavy graph (the power-law shape it wins on)."""
    chain = spark.createDataFrame([(i, i + 1) for i in range(200)],
                                  ["id_a", "id_b"])
    hub = spark.createDataFrame(
        [(0, i) for i in range(1, 50)] + [(100, 101), (101, 102)],
        ["id_a", "id_b"])
    for pairs in (chain, hub):
        a = {(r.id, r.cluster_id)
             for r in D.near_dup_clusters(pairs, method="jump").collect()}
        b = {(r.id, r.cluster_id)
             for r in D.near_dup_clusters(
                 pairs, method="star").collect()}
        # default = bounded driver union-find fast path (small graph)
        c = {(r.id, r.cluster_id)
             for r in D.near_dup_clusters(pairs).collect()}
        # forcing the bound to 0 re-enters the distributed star path
        d = {(r.id, r.cluster_id)
             for r in D.near_dup_clusters(
                 pairs, driver_max_edges=0).collect()}
        assert a == b == c == d


def test_near_dup_clusters_driver_fastpath_bound(spark):
    # a pair table larger than driver_max_edges must fall through to
    # the distributed path and still produce the identical partition
    edges = [(i, i + 1) for i in range(300)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    small = {(r.id, r.cluster_id)
             for r in D.near_dup_clusters(
                 pairs, driver_max_edges=100).collect()}   # 300 > 100
    fast = {(r.id, r.cluster_id)
            for r in D.near_dup_clusters(pairs).collect()}
    assert small == fast
    assert {c for _, c in fast} == {0}


def test_simhash_and_hamming(docs):
    sh = {r.doc_id: r.sh for r in docs.select(
        "doc_id", D.simhash(F.col("text")).alias("sh")).collect()}
    assert sh[0] == sh[1]
    hd = (docs.sparkSession.createDataFrame(
        [(sh[0], sh[2]), (sh[0], sh[3])], ["a", "b"])
        .select(D.hamming_distance(F.col("a"), F.col("b")).alias("h"))
        .collect())
    near, far = hd[0].h, hd[1].h
    assert near < far


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("one two  three",),
         ("don't stop, it's 42%!",)], ["t"])
    got = df.select(T.token_count(F.col("t")).alias("n"),
                    T.bpe_ish_token_count(F.col("t")).alias("b")).collect()
    assert [r.n for r in got] == [0, 0, 1, 3, 4]
    # don ' t stop , it ' s 42 % !  → 11 BPE-ish pieces
    assert got[4].b == 11


def test_quality_scores(spark):
    df = spark.createDataFrame([("The cat sat on 3 mats!",)], ["t"])
    q = T.quality_scores(F.col("t"))
    r = df.select(*[v.alias(k) for k, v in q.items()]).first()
    assert r.n_tokens == 6
    assert r.digit_ratio == pytest.approx(1 / 22)
    assert r.upper_ratio == pytest.approx(1 / 22)
    assert r.punct_ratio == pytest.approx(1 / 22)
    assert r.stopword_ratio == pytest.approx(1 / 6)   # "the"
    assert r.mean_token_len == pytest.approx((3 + 3 + 3 + 2 + 1 + 5) / 6)


def test_language_id(spark):
    rows = [("the cat is on the mat",), ("der hund ist nicht da",),
            ("le chat est une idee",), ("el gato es una idea",),
            ("zzz qqq xxx",)]
    got = [r.l for r in spark.createDataFrame(rows, ["t"]).select(
        T.language_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "es", "und"]


def test_doc_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("other",)], ["t"])
    fps = [r.f for r in df.select(
        T.doc_fingerprint(F.col("t")).alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_winnow_fingerprints_overlap(spark):
    a = "the quick brown fox jumps over the lazy dog"
    b = "PREFIX " + a                               # shared suffix content
    df = spark.createDataFrame([(0, a), (1, b), (2, "zzzz qqqq xxxx")],
                               ["i", "t"])
    fp = {r.i: set(r.f) for r in df.select(
        "i", T.winnow_fingerprints(F.col("t")).alias("f")).collect()}
    shared_ab = len(fp[0] & fp[1]) / len(fp[0])
    assert shared_ab > 0.5
    assert len(fp[0] & fp[2]) == 0


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 16)).astype(np.float64)
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16)  # planted neighbor
    return (spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"]), vecs)


def test_cosine_topk_vs_numpy(vectors):
    df, vecs = vectors
    got = cosine_topk(df, df.filter("vec_id = 0"), k=3).collect()
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs[0]) / (norms * norms[0])
    sims[0] = -np.inf                               # exclude self
    want = np.argsort(-sims)[:3]
    assert [r.neighbor_id for r in sorted(got, key=lambda r: r.rank)] \
        == list(want)
    assert got[0].sim == pytest.approx(sims[want[0]], abs=1e-9)


def test_lsh_topk_finds_planted_neighbor(vectors):
    df, _ = vectors
    lsh = RandomHyperplaneLSH(dim=16, bits=8, tables=6)
    got = lsh.topk(df, df.filter("vec_id = 0"), k=3).collect()
    assert any(r.neighbor_id == 1 and r.rank == 1 for r in got)


def test_cosine_near_dup_exact_and_lsh(spark):
    from detanalysis_spark.llm.similarity import (RandomHyperplaneLSH,
                                                  cosine_near_dup_pairs)
    rng = np.random.default_rng(19)
    vecs = rng.standard_normal((60, 16))
    vecs[10] = vecs[3] + 1e-3 * rng.standard_normal(16)   # planted dups
    vecs[41] = vecs[7] + 1e-3 * rng.standard_normal(16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"])

    exact = {(r.id_a, r.id_b)
             for r in cosine_near_dup_pairs(df, 0.95).collect()}
    assert exact == {(3, 10), (7, 41)}

    lsh = RandomHyperplaneLSH(dim=16, bits=8, tables=8)
    approx = {(r.id_a, r.id_b)
              for r in cosine_near_dup_pairs(df, 0.95, lsh=lsh).collect()}
    assert approx == exact           # near-identical vectors always collide


def test_cosine_near_dup_unbounded_refuses_large_corpus(spark):
    # without lsh/probes the all-pairs path is an oracle baseline only;
    # >100k rows must raise instead of broadcasting the corpus at itself
    from detanalysis_spark.llm.similarity import cosine_near_dup_pairs
    big = spark.range(100_001).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    with pytest.raises(ValueError, match="all-pairs over >100000 rows"):
        cosine_near_dup_pairs(big, 0.9)
    # a bounded probe side keeps working at any corpus size
    assert cosine_near_dup_pairs(
        big, 0.9, probes=big.filter("vec_id < 3")).count() > 0


def test_cosine_near_dup_null_and_ragged_rows(spark):
    # null / length-mismatched embeddings score null (excluded by the
    # threshold), matching the zip_with fold's null padding — they must
    # not crash the np.stack fast path (exact scorer OR dot_rows)
    from detanalysis_spark.llm.similarity import (cosine_near_dup_pairs,
                                                  dot_rows)
    rows = [(0, [1.0, 0.0, 0.0]), (1, [1.0, 1e-4, 0.0]),
            (2, None), (3, [1.0, 0.0]), (4, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b)
           for r in cosine_near_dup_pairs(df, 0.95).collect()}
    assert got == {(0, 1)}
    # dot_rows: per-row fallback nulls exactly the invalid rows
    pairs = df.alias("a").crossJoin(df.alias("b")) \
        .select(F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"),
                dot_rows(F.col("a.embedding"), F.col("b.embedding"))
                .alias("dot"))
    out = {(r.ia, r.ib): r.dot for r in pairs.collect()}
    assert out[(0, 1)] == pytest.approx(1.0)
    assert out[(0, 2)] is None and out[(2, 2)] is None   # null vec
    assert out[(0, 3)] is None and out[(3, 0)] is None   # ragged pair
    assert out[(3, 3)] == pytest.approx(1.0)             # equal-len odd dim


def test_cosine_near_dup_mixed_dimension_groups(spark):
    # same-length MINORITY-dimension pairs must be scored — the
    # zip_with fold nulls only length-MISMATCHED pairs, so the exact
    # path runs one matmul per dimension group instead of keeping only
    # the majority dimension
    from detanalysis_spark.llm.similarity import cosine_near_dup_pairs
    rows = [(0, [1.0, 0.0, 0.0]), (1, [1.0, 1e-4, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (10, [1.0, 1e-4]), (11, [1.0, 0.0]), (12, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b)
           for r in cosine_near_dup_pairs(df, 0.95).collect()}
    assert got == {(0, 1), (10, 11)}   # cross-dimension pairs stay null
    # an explicit probe slice spanning both dimensions scores both
    got2 = {(r.id_a, r.id_b)
            for r in cosine_near_dup_pairs(
                df, 0.95, probes=df.filter("vec_id in (0, 10)")).collect()}
    assert got2 == {(0, 1), (10, 11)}


def test_cosine_near_dup_probe_matrix_guard(spark):
    # the per-executor probe-matrix bound counts TOTAL elements across
    # dimension groups and fires before any matrix is materialized
    from detanalysis_spark.llm.similarity import cosine_near_dup_pairs
    corpus = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    fat = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array_repeat(F.lit(1.0), 100_000).alias("embedding"))
    with pytest.raises(ValueError, match="probe matrix too large"):
        cosine_near_dup_pairs(corpus, 0.9, probes=fat)


# ----------------------------------------------------------------------
# IVF index
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """4 well-separated clusters of 25 vectors each (planted structure
    an IVF quantizer must recover)."""
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 16)) * 10.0
    vecs = np.vstack([c + 0.1 * rng.standard_normal((25, 16))
                      for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"])
    return df, vecs


def test_ivf_full_probe_matches_brute_force(clustered_vectors):
    from detanalysis_spark.llm.similarity import IVFIndex
    df, _ = clustered_vectors
    probes = df.filter("vec_id IN (0, 30, 60)")
    ivf = IVFIndex(n_centroids=4, n_probe=4, seed=1).fit(df)
    got = ivf.topk(df, probes, k=5).collect()
    want = cosine_topk(df, probes, k=5).collect()
    key = lambda r: (r.probe_id, r.rank)
    assert sorted([(r.probe_id, r.rank, r.neighbor_id) for r in got]) \
        == sorted([(r.probe_id, r.rank, r.neighbor_id) for r in want])
    gs = {key(r): r.sim for r in got}
    for r in want:
        assert gs[key(r)] == pytest.approx(r.sim, abs=1e-9)


def test_ivf_single_probe_recalls_within_cluster(clustered_vectors):
    from detanalysis_spark.llm.similarity import IVFIndex
    df, vecs = clustered_vectors
    ivf = IVFIndex(n_centroids=4, n_probe=1, seed=1).fit(df)
    # every vector's true top-5 lives in its own cluster, so probing a
    # single cell must still achieve perfect recall
    probes = df.filter("vec_id IN (2, 27, 52, 77)")
    got = ivf.topk(df, probes, k=5).collect()
    want = cosine_topk(df, probes, k=5).collect()
    assert sorted([(r.probe_id, r.rank, r.neighbor_id) for r in got]) \
        == sorted([(r.probe_id, r.rank, r.neighbor_id) for r in want])
    # and the candidate set it scored was ~1/4 of the corpus, not all of
    # it: each home cell holds exactly one planted cluster
    cells = ivf.with_cell(df).groupBy("ivf_cell").count().collect()
    assert sorted(r["count"] for r in cells) == [25, 25, 25, 25]


def test_ivf_validates():
    from detanalysis_spark.llm.similarity import IVFIndex
    with pytest.raises(ValueError, match="n_probe"):
        IVFIndex(n_centroids=4, n_probe=8)
    with pytest.raises(RuntimeError, match="fit"):
        IVFIndex().cell_udf()


def test_cell_balance_audit_and_autosplit(spark):
    """Planted skew: one fat cluster (200 of 230 points, with internal
    substructure) + 3 small ones. The profile must expose the skew;
    balance_cells must split the fat cell so the pairwise bound of a
    cluster-keyed join drops from fat^2 toward cap^2."""
    from detanalysis_spark.llm.similarity import (IVFIndex,
                                                  balance_cells,
                                                  cell_size_profile,
                                                  semantic_dedup)
    rng = np.random.default_rng(21)
    small = [c + 0.1 * rng.standard_normal((10, 16))
             for c in rng.standard_normal((3, 16)) * 10.0]
    # fat cluster: 4 sub-lobes around one far-away center (structure
    # the auto-splitter's inner k-means can find)
    fc = np.array([40.0] * 16)
    fat = np.vstack([fc + lobe + 0.1 * rng.standard_normal((50, 16))
                     for lobe in rng.standard_normal((4, 16)) * 3.0])
    vecs = np.vstack(small + [fat])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"])
    ivf = IVFIndex(n_centroids=4, n_probe=1, seed=3).fit(df)

    prof = cell_size_profile(df, ivf=ivf).collect()
    assert prof[0]["n"] >= 200              # fat cell surfaces first
    assert prof[0]["skew"] > 3.0            # ~200 / (230/4) ≈ 3.5

    balanced = balance_cells(df, ivf, max_cell_size=80)
    sizes = sorted(r["n"] for r in
                   balanced.groupBy("ivf_cell").count()
                   .withColumnRenamed("count", "n").collect())
    assert balanced.count() == 230          # no rows lost
    assert max(sizes) <= 80                 # cap enforced on this data
    assert len(sizes) >= 6                  # fat cell actually split

    # balanced assignment slots straight into semantic_dedup
    kept = semantic_dedup(balanced, threshold=0.999999,
                          cluster_col="ivf_cell")
    assert kept.count() <= 230


# ----------------------------------------------------------------------
# SemDeDup semantic dedup: keep-lowest-index within cluster among
# points with cosine >= threshold, vs a numpy replay of the paper rule
# ----------------------------------------------------------------------
def _semdedup_numpy(vecs, clusters, threshold):
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    kept = []
    for i in range(len(vecs)):
        drop = any(j < i and clusters[j] == clusters[i]
                   and unit[j] @ unit[i] >= threshold for j in range(i))
        if not drop:
            kept.append(i)
    return kept


def test_semantic_dedup_matches_numpy_rule(clustered_vectors):
    from detanalysis_spark.llm.similarity import IVFIndex, semantic_dedup
    df, vecs = clustered_vectors
    ivf = IVFIndex(n_centroids=4, n_probe=1, seed=1).fit(df)
    with_cell = ivf.with_cell(df)
    clusters = {r.vec_id: r.ivf_cell for r in with_cell.collect()}
    cl = np.array([clusters[i] for i in range(len(vecs))])
    # threshold inside the within-cluster cosine range so some drop
    want = _semdedup_numpy(vecs, cl, 0.999)
    got = sorted(r.vec_id
                 for r in semantic_dedup(df, 0.999, ivf=ivf).collect())
    assert got == want
    assert 0 < len(got) < df.count()  # some dropped, some kept
    # precomputed-cluster path agrees with the ivf= path
    got2 = sorted(r.vec_id for r in semantic_dedup(
        with_cell, 0.999, cluster_col="ivf_cell").collect())
    assert got2 == want


def test_semantic_dedup_requires_clustering(clustered_vectors):
    from detanalysis_spark.llm.similarity import semantic_dedup
    df, _ = clustered_vectors
    with pytest.raises(ValueError, match="cluster_col or ivf"):
        semantic_dedup(df, 0.9)


# ----------------------------------------------------------------------
# text normalization + deterministic mixture sampling
# ----------------------------------------------------------------------
def test_normalize_text_unifies_variants(spark):
    from detanalysis_spark.llm.text import normalize_text
    df = spark.createDataFrame(
        [(0, "Hello,  World!"), (1, "hello world"), (2, "HELLO   WORLD.")],
        ["i", "t"])
    got = [r.n for r in df.select(
        normalize_text(F.col("t")).alias("n")).collect()]
    assert got == ["hello world"] * 3
    # punctuation preserved when disabled
    keep = df.filter("i = 0").select(
        normalize_text(F.col("t"), strip_punct=False).alias("n")
    ).collect()[0].n
    assert keep == "hello, world!"


def test_stratified_sample_mod(spark):
    from detanalysis_spark.llm.dedup import stratified_sample_mod
    rows = [(i, "web" if i % 2 == 0 else "wiki") for i in range(10000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = stratified_sample_mod(df, "source", {"web": 0.1}, "doc_id",
                                modulus=100)
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["wiki"] == 5000                  # untouched stratum
    # kept web rows are exactly those with doc_id % 100 < 10
    want_web = sum(1 for i in range(0, 10000, 2) if i % 100 < 10)
    assert counts["web"] == want_web
    # deterministic: re-running yields the identical id set
    a = sorted(r.doc_id for r in out.filter("source='web'").collect())
    b = sorted(r.doc_id for r in
               stratified_sample_mod(df, "source", {"web": 0.1}, "doc_id",
                                     modulus=100)
               .filter("source='web'").collect())
    assert a == b


def test_chunk_text_windows(spark):
    from detanalysis_spark.llm.text import chunk_documents, chunk_text
    df = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "x"), (2, "")], ["doc_id", "text"])
    got = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
           for r in chunk_documents(df, window_tokens=3,
                                    stride_tokens=2).collect()}
    # doc 0: 7 tokens, stride 2 -> starts at 1,3,5,7
    assert got[(0, 0)] == ("a b c", 3)
    assert got[(0, 1)] == ("c d e", 3)
    assert got[(0, 2)] == ("e f g", 3)
    assert got[(0, 3)] == ("g", 1)          # remainder tail
    assert got[(1, 0)] == ("x", 1)
    assert (2, 0) in got                     # empty doc -> one empty chunk
    with pytest.raises(ValueError, match="window"):
        df.select(chunk_text(F.col("text"), 0))


def test_ivf_fit_distributed_recovers_clusters(clustered_vectors):
    from detanalysis_spark.llm.similarity import IVFIndex
    df, _ = clustered_vectors
    ivf = IVFIndex(n_centroids=4, n_probe=1, seed=3) \
        .fit_distributed(df, n_iter=3, init_sample=100)
    # distributed refinement must still separate the 4 planted clusters
    cells = ivf.with_cell(df).groupBy("ivf_cell").count().collect()
    assert sorted(r["count"] for r in cells) == [25, 25, 25, 25]
    probes = df.filter("vec_id IN (2, 52)")
    got = ivf.topk(df, probes, k=5).collect()
    want = cosine_topk(df, probes, k=5).collect()
    assert sorted([(r.probe_id, r.rank, r.neighbor_id) for r in got]) \
        == sorted([(r.probe_id, r.rank, r.neighbor_id) for r in want])


def test_embedding_centroids_normalized(spark):
    from detanalysis_spark.llm.similarity import embedding_centroids
    df = spark.createDataFrame(
        [(0, [3.0, 0.0]), (0, [0.0, 4.0]), (1, [2.0, 0.0])],
        ["label", "embedding"])
    got = {(r.group, r.pos): r.mean
           for r in embedding_centroids(df, "label").collect()}
    assert got[(0, 0)] == pytest.approx(1.5)
    assert got[(0, 1)] == pytest.approx(2.0)
    norm = {(r.group, r.pos): r.mean
            for r in embedding_centroids(df, "label",
                                         normalize=True).collect()}
    n0 = np.hypot(1.5, 2.0)
    assert norm[(0, 0)] == pytest.approx(1.5 / n0)
    assert norm[(1, 0)] == pytest.approx(1.0)


# ----------------------------------------------------------------------
# cleaning: PII, repetition, decontamination
# ----------------------------------------------------------------------
def test_pii_counts_and_redaction(spark):
    from detanalysis_spark.llm import cleaning as C

    rows = [
        (1, "mail me at bob.smith+x@corp.example.com today"),
        (2, "server 192.168.001.42 and 10.0.0.1 are up"),
        (3, "call 555-123-4567 or ssn 123-45-6789"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in df.select(
        "id",
        *[c.alias(k) for k, c in C.pii_counts(F.col("text")).items()],
        C.redact_pii(F.col("text")).alias("red")).collect()}

    assert got[1]["email"] == 1 and got[1]["ipv4"] == 0
    assert got[2]["ipv4"] == 2
    assert got[3]["phone"] == 1 and got[3]["ssn"] == 1
    assert got[4]["email"] == got[4]["ipv4"] == got[4]["phone"] == 0
    assert got[1]["red"] == "mail me at [PII] today"
    assert got[2]["red"] == "server [PII] and [PII] are up"
    # ssn pattern wins before the phone pattern; both redact
    assert got[3]["red"] == "call [PII] or ssn [PII]"
    assert got[4]["red"] == rows[3][1]


def test_repetition_scores_match_python(spark):
    from detanalysis_spark.llm import cleaning as C

    texts = ["a a a a", "one two three four", "x y x y x y", "solo", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    s = C.repetition_scores(F.col("text"), n=2)
    got = {r["id"]: r for r in df.select(
        "id", *[c.alias(k) for k, c in s.items()]).collect()}

    for i, t in enumerate(texts):
        toks = t.split()
        grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        want_tok = 1 - len(set(toks)) / len(toks) if toks else 0.0
        want_gram = 1 - len(set(grams)) / len(grams) if grams else 0.0
        want_max = (max(toks.count(x) for x in set(toks)) / len(toks)
                    if toks else 0.0)
        assert got[i]["dup_token_ratio"] == pytest.approx(want_tok)
        assert got[i]["dup_ngram_ratio"] == pytest.approx(want_gram)
        assert got[i]["max_token_ratio"] == pytest.approx(want_max)


def test_contamination_overlap_broadcast(spark):
    from detanalysis_spark.llm import cleaning as C

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    docs = spark.createDataFrame([
        (1, "we saw the quick brown fox jumps high"),   # shares 3-grams
        (2, "completely unrelated words in this text"),
        (3, "too short"),                               # < n tokens
    ], "doc_id long, text string")

    grams = C.benchmark_ngrams(bench, n=3)
    out = C.contamination_overlap(docs, grams, n=3)
    got = {r["doc_id"]: r for r in out.collect()}
    # doc1 grams: "we saw the","saw the quick","the quick brown",
    # "quick brown fox","brown fox jumps","fox jumps high" → 3 hits
    assert got[1]["n_hits"] == 3 and got[1]["n_grams"] == 6
    assert got[2]["n_hits"] == 0
    assert got[3]["n_grams"] == 0 and got[3]["n_hits"] == 0

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pack_documents_window_math(spark):
    from detanalysis_spark.llm.text import pack_documents

    rows = [(i, "s", n) for i, n in enumerate([40, 40, 40, 100, 10, 90])]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    got = {r["doc_id"]: (r["pack_id"], r["pack_offset"])
           for r in pack_documents(df, "n_tok", budget=100,
                                   partition_cols=["source"]).collect()}
    # cumulative starts: 0, 40, 80, 120, 220, 230
    assert got[0] == (0, 0)
    assert got[1] == (0, 40)
    assert got[2] == (0, 80)    # straddles into window 1
    assert got[3] == (1, 20)
    assert got[4] == (2, 20)
    assert got[5] == (2, 30)


def test_embedding_covariance_and_pca_match_numpy(spark):
    from detanalysis_spark.llm.similarity import (embedding_covariance,
                                                  pca_fit, pca_project)

    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, (200, 6))
    base[:, 3] = 3.0 * base[:, 0] + 0.1 * base[:, 3]   # correlated dims
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(base)],
        "vec_id long, embedding array<double>").repartition(7)

    cov = embedding_covariance(df)
    want = np.cov(base.T, bias=True)
    np.testing.assert_allclose(cov, want, rtol=1e-9, atol=1e-9)

    w, ev, mu = pca_fit(df, n_components=3)
    evals, evecs = np.linalg.eigh(want)
    np.testing.assert_allclose(sorted(ev, reverse=True),
                               sorted(evals, reverse=True)[:3], rtol=1e-9)
    # projection matches numpy (components sign-canonicalized)
    got = (pca_project(df, w, mu).orderBy("vec_id")
           .select("pca").toPandas()["pca"])
    want_proj = (base - base.mean(axis=0)) @ w
    np.testing.assert_allclose(np.asarray(got.tolist()), want_proj,
                               rtol=1e-8, atol=1e-8)
    # variance along first component equals the top eigenvalue
    assert np.var(want_proj[:, 0]) == pytest.approx(ev[0], rel=1e-9)


def test_span_dup_stats_planted(spark):
    from detanalysis_spark.llm.dedup import (duplicated_spans,
                                             positional_ngrams, span_dup_stats)
    import pyspark.sql.functions as F

    shared = "the quick brown fox jumps"          # 5-token span in two docs
    rows = [(1, f"{shared} over the lazy dog"),   # spans: 5 total
            (2, f"something completely different here then {shared}"),
            (3, "tiny doc"),                      # < 5 tokens → 0 spans
            (4, "unique words only appear once in this document")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # positional grams keep duplicates (unlike word_shingles)
    g = docs.filter("doc_id = 1").select(
        positional_ngrams(F.col("text"), 5).alias("g")).collect()[0]["g"]
    assert g[0] == shared and len(g) == 9 - 5 + 1

    dup = {r.gram: (r.n_docs, r.n_occurrences)
           for r in duplicated_spans(docs, span_tokens=5).collect()}
    assert dup[shared] == (2, 2)

    st = {r.doc_id: (r.n_spans, r.n_dup_spans)
          for r in span_dup_stats(docs, span_tokens=5).collect()}
    assert st[3] == (0, 0)                 # short doc kept with zero spans
    assert st[4][1] == 0                   # no cross-doc dup spans
    assert st[1][0] == 5 and st[1][1] >= 1
    assert st[2][1] >= 1


def test_tfidf_topk_matches_python(spark):
    import math

    from detanalysis_spark.llm.text import tfidf_topk

    rows = [(1, "apple apple banana common"),
            (2, "banana cherry common common"),
            (3, "cherry date common apple")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_topk(docs, k=2).collect()
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df, r.score) for r in out}
    # doc 1: apple tf=2 wins; then (tf=1) banana df=2 < common df=3
    assert got[(1, 1)][0] == "apple" and got[(1, 2)][0] == "banana"
    # doc 2: common tf=2; then banana (df=2) before cherry? cherry df=2,
    # banana df=2 → term asc → banana
    assert got[(2, 1)][0] == "common" and got[(2, 2)][0] == "banana"
    n = 3
    want = 2 * (math.log((1 + n) / (1 + 2)) + 1)   # apple: tf=2, df=2
    assert abs(got[(1, 1)][3] - want) < 1e-12
    assert len(out) == 6


def test_unigram_logprob_scores_match_python(spark):
    import math

    from detanalysis_spark.llm.text import unigram_logprob_scores

    rows = [(1, "a a b"), (2, "b c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.nll)
           for r in unigram_logprob_scores(docs).collect()}
    # corpus counts: a=2, b=2, c=1, T=5
    p = {"a": 2 / 5, "b": 2 / 5, "c": 1 / 5}
    want1 = -(2 * math.log(p["a"]) + math.log(p["b"])) / 3
    want2 = -(math.log(p["b"]) + math.log(p["c"])) / 2
    assert got[1][0] == 3 and abs(got[1][1] - want1) < 1e-12
    assert got[2][0] == 2 and abs(got[2][1] - want2) < 1e-12


def test_quantization_roundtrip_matches_numpy(spark):
    import numpy as np

    from detanalysis_spark.llm.similarity import quantization_error

    vecs = [(1, [0.5, -1.0, 0.25, 0.125]), (2, [0.0, 0.0, 0.0, 0.0]),
            (3, [127.0, -64.0, 1.0, 0.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in quantization_error(df).collect()}

    for vid, v in [(1, vecs[0][1]), (3, vecs[2][1])]:
        a = np.asarray(v)
        scale = np.abs(a).max() / 127.0
        q = np.round(a / scale).astype(int)
        assert list(out[vid]["q"]) == q.tolist()
        assert out[vid]["scale"] == pytest.approx(scale, rel=1e-12)
        deq = q * scale
        assert out[vid]["max_abs_err"] == pytest.approx(
            np.abs(a - deq).max(), abs=1e-12)
        cos = float(a @ deq / (np.linalg.norm(a) * np.linalg.norm(deq)))
        assert out[vid]["cos_sim"] == pytest.approx(cos, rel=1e-9)
    # all-zero vector: zero scale, zero codes, undefined cosine → NULL
    assert out[2]["scale"] == 0.0 and list(out[2]["q"]) == [0, 0, 0, 0]
    assert out[2]["cos_sim"] is None and out[2]["max_abs_err"] == 0.0


def test_dedup_incremental_and_cross_corpus_lsh(spark):
    from detanalysis_spark.llm.dedup import (dedup_incremental,
                                             lsh_candidate_pairs_between,
                                             minhash_signatures)

    seen = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "alpha beta gamma"),       # exact dup of corpus doc 1
         (11, "completely fresh text"),
         (12, "completely fresh text"),  # within-batch dup of 11
         (13, "another new document")],
        "doc_id long, text string")

    kept = sorted(r.doc_id for r in
                  dedup_incremental(new, seen, ["text"], "doc_id").collect())
    assert kept == [11, 13]

    # hash-only corpus side (what a pipeline persists between batches)
    from detanalysis_spark.llm.dedup import content_hash
    seen_h = seen.select(content_hash("text").alias("content_hash"))
    kept2 = sorted(r.doc_id for r in
                   dedup_incremental(new, seen_h, ["text"], "doc_id",
                                     seen_is_hashes=True).collect())
    assert kept2 == kept

    # cross-corpus LSH: the exact dup must collide; candidates are
    # directional (new x corpus), never corpus x corpus
    a = minhash_signatures(new, shingle_n=2)
    b = minhash_signatures(seen, shingle_n=2)
    cand = lsh_candidate_pairs_between(a, b, "doc_id")
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    assert (10, 1) in pairs
    assert all(ia >= 10 and ib < 10 for ia, ib in pairs)


def test_ivf_save_load_roundtrip(spark, tmp_path, clustered_vectors):
    from detanalysis_spark.llm.similarity import IVFIndex

    df, _ = clustered_vectors
    idx = IVFIndex(n_centroids=4, n_probe=2).fit(df)
    path = str(tmp_path / "ivf_index")
    idx.save(spark, path)

    back = IVFIndex.load(spark, path)
    assert back.n_centroids == 4 and back.n_probe == 2
    np.testing.assert_allclose(back.centroids, idx.centroids, atol=1e-12)

    probes = df.filter("vec_id < 3")
    a = [(r.probe_id, r.rank, r.neighbor_id)
         for r in idx.topk(df, probes, k=3).collect()]
    b = [(r.probe_id, r.rank, r.neighbor_id)
         for r in back.topk(df, probes, k=3).collect()]
    assert sorted(a) == sorted(b)
    # n_probe override at load time, no retraining
    assert IVFIndex.load(spark, path, n_probe=4).n_probe == 4


def test_apply_near_dedup_keeps_canonical(docs):
    kept = sorted(r.doc_id for r in
                  D.apply_near_dedup(docs, threshold=0.5).collect())
    # docs 0/1/2 form one near-dup cluster (keep 0); 3 and 4 unique
    assert kept == [0, 3, 4]


def test_build_vocab_ranking(spark):
    from detanalysis_spark.llm.text import build_vocab

    rows = [(1, "b b b a a c"), (2, "a b d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    v = [(r.rank, r.term, r.ctf, r.df)
         for r in build_vocab(df, size=3).orderBy("rank").collect()]
    # b: ctf 4 df 2; a: ctf 3 df 2; c/d ctf 1 → tie broken by term asc
    assert v == [(1, "b", 4, 2), (2, "a", 3, 2), (3, "c", 1, 1)]
    assert build_vocab(df, size=10, min_df=2).count() == 2


def test_boilerplate_line_removal(spark):
    from detanalysis_spark.llm import (line_frequencies,
                                       remove_boilerplate_lines)
    rows = [(i, "COOKIE BANNER\nbody text %d\nunique line %d\nFOOTER"
             % (i, i * 7)) for i in range(10)]
    rows.append((10, "COOKIE BANNER\nFOOTER"))   # all-boilerplate doc
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    freq = {r["line"]: r["n_docs"]
            for r in line_frequencies(df).collect()}
    assert freq["COOKIE BANNER"] == 11 and freq["FOOTER"] == 11
    assert freq["body text 3"] == 1

    out = remove_boilerplate_lines(df, min_docs=5).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 11
    # order of surviving lines preserved, boilerplate gone
    assert by_id[3]["clean_text"] == "body text 3\nunique line 21"
    assert by_id[3]["n_lines_kept"] == 2
    # fully-boilerplate doc survives with empty text, not a dropped row
    assert by_id[10]["clean_text"] == "" and by_id[10]["n_lines_kept"] == 0
    # duplicated *within* one doc counts once toward the doc frequency
    one = spark.createDataFrame(
        [(1, "x\nx\nx"), (2, "y")], ["doc_id", "text"])
    f2 = {r["line"]: r["n_docs"] for r in line_frequencies(one).collect()}
    assert f2["x"] == 1


def test_decontaminate_filters_hit_docs(spark):
    from detanalysis_spark.llm import decontaminate
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over it"),   # contaminated
         (2, "completely unrelated text body here"),
         (3, "short")], ["doc_id", "text"])
    kept = decontaminate(docs, bench, n=3)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]


def test_apply_near_dedup_keep_by_score(spark):
    from detanalysis_spark.llm import apply_near_dedup
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, base, 0.2), (2, base + " x", 0.9), (3, base + " y", 0.9),
            (4, "totally different words entirely unrelated", 0.1)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "score"])
    # default: min id survives the cluster
    kept = sorted(r["doc_id"] for r in
                  apply_near_dedup(docs, threshold=0.5).collect())
    assert kept == [1, 4]
    # keep_by score: the best-scored member survives, min-id tiebreak
    kept = sorted(r["doc_id"] for r in
                  apply_near_dedup(docs, threshold=0.5, keep_by="score",
                                   keep="max").collect())
    assert kept == [2, 4]
    kept = sorted(r["doc_id"] for r in
                  apply_near_dedup(docs, threshold=0.5, keep_by="score",
                                   keep="min").collect())
    assert kept == [1, 4]


def test_take_token_budget_prefix_rule(spark):
    from detanalysis_spark.llm.text import take_token_budget
    rows = [(i, "s", 10) for i in range(10)] + [(i, "t", 40)
                                               for i in range(10, 14)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    out = take_token_budget(df, "n_tok", budget=35,
                            partition_cols=["source"]).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # s: 10+10+10 = 30 < 35 → doc 3 still starts (before=30), doc 4 not
    assert sorted(by_src["s"]) == [0, 1, 2, 3]
    # t: first doc always kept; second has before=40 >= 35
    assert sorted(by_src["t"]) == [10]
    # overshoot is at most one document
    assert sum(r["n_tok"] for r in out if r["source"] == "s") == 40


def test_curate_corpus_end_to_end(spark):
    from detanalysis_spark.llm.pipeline import CurationConfig, curate_corpus
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),                               # survivor
        (1, base.upper()),                       # exact dup after normalize
        (2, base + " extra"),                    # near dup of 0
        (3, "tiny"),                             # min_tokens gate
        (4, "dup dup dup dup dup dup dup dup"),  # repetition gate
        (5, "mail x@y.io " + " ".join(f"w{i}" for i in range(12))),  # PII
        (6, "the quick brown fox jumps over the lazy dog today"),
        (7, "el rapido zorro marron salta sobre el perro foo bar"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(99, "quick brown fox jumps over the lazy")], ["doc_id", "text"])

    cfg = CurationConfig(min_tokens=5, near_dup_threshold=0.5,
                         bench=bench, decontaminate_ngram=4,
                         split_fractions={"train": 0.5, "val": 0.5},
                         split_seed=3)
    out, counts = curate_corpus(docs, cfg, with_counts=True)
    got = {r["doc_id"]: r for r in out.collect()}

    # 3 (too short), 4 (repetition), 6 (contaminated) gated;
    # 1 exact-dup of 0 after casefold; 2 near-dup of 0 → keep 0, 5, 7
    assert sorted(got) == [0, 5, 7]
    assert "[PII]" in got[5]["text"]
    assert all(r["split"] in ("train", "val") for r in got.values())
    assert counts["input"] == 8
    assert counts["quality"] == 6          # drops 3 and 4
    assert counts["decontaminated"] == 5   # drops 6
    assert counts["exact_dedup"] == 4      # collapses 1 into 0
    assert counts["near_dedup"] == 3       # collapses 2 into 0


def test_curate_corpus_with_line_dedup_stage(spark):
    """dedup_lines=True strips corpus-repeated lines (keeping the first
    occurrence) before the quality gates see the text."""
    from detanalysis_spark.llm.pipeline import CurationConfig, curate_corpus
    boiler = "subscribe to our newsletter today please thanks"
    rows = [
        (0, boiler + "\nalpha beta gamma delta epsilon zeta"),
        (1, boiler + "\nomega psi chi phi upsilon tau"),
        (2, boiler),                      # only the repeated line -> dies
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = CurationConfig(min_tokens=5, dedup_lines=True,
                         near_dup_threshold=None)
    out, counts = curate_corpus(docs, cfg, with_counts=True)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    # doc 0 keeps its unique line AND the first copy of the boiler line;
    # doc 1 keeps only its unique line; doc 2 is emptied then gated
    assert got[0] == boiler + "\nalpha beta gamma delta epsilon zeta"
    assert got[1] == "omega psi chi phi upsilon tau"
    assert 2 not in got
    assert counts["line_dedup"] == 3 and counts["quality"] == 2


def test_apply_near_dedup_keep_by_null_score_loses(spark):
    """Regression: a cluster member with a NULL score must not win the
    cluster (null struct fields sort first under min())."""
    from detanalysis_spark.llm import apply_near_dedup
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, base, 0.9), (2, base + " x", None), (3, base + " y", 0.5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "score"])
    kept = [r["doc_id"] for r in
            apply_near_dedup(docs, threshold=0.5, keep_by="score",
                             keep="max").collect()]
    assert kept == [1]
    kept = [r["doc_id"] for r in
            apply_near_dedup(docs, threshold=0.5, keep_by="score",
                             keep="min").collect()]
    assert kept == [3]


def test_lsh_hot_bucket_cap(spark):
    """A template farm (identical docs) creates one huge bucket per
    band; the cap drops those buckets, while genuinely distinct pairs
    in small buckets survive."""
    docs = [(i, "the exact same boilerplate template text repeated")
            for i in range(50)]
    docs += [(100, "a unique document about distributed quicksort"),
             (101, "a unique document about distributed quicksort plus")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    uncapped = D.near_dup_pairs(df, "doc_id", threshold=0.3)
    capped = D.near_dup_pairs(df, "doc_id", threshold=0.3,
                              max_bucket_size=10)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= 50 * 49 / 2           # the template farm all pairs
    # the farm's buckets (size 50) are dropped; the distinct near-dup
    # pair (bucket size 2) survives
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got
    assert n_cap < n_un
    assert all(a >= 100 for a, _ in got)


# ----------------------------------------------------------------------
# distributed BPE training vs a pure-python replay of Sennrich et al.
# (same tie-break: count desc, then pair lexicographic)
# ----------------------------------------------------------------------
def _bpe_python(word_freqs, num_merges, min_freq=2, eow="</w>"):
    import collections
    syms = {tuple(list(w) + [eow]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for toks, f in syms.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        out = {}
        for toks, f in syms.items():
            new, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + f
        syms = out
    return merges, syms


def test_train_bpe_matches_python_reference(spark):
    from detanalysis_spark.llm.text import train_bpe, word_frequencies
    corpus = ["low low low low low",
              "lower lower widest widest widest",
              "newest newest newest newest newest newest"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)],
                               ["doc_id", "text"])
    wf = {r.word: r.freq for r in word_frequencies(df).collect()}
    want_merges, want_syms = _bpe_python(wf, 10)
    got_merges, vocab = train_bpe(df, 10)
    assert got_merges == want_merges
    want_vocab = {}
    for toks, f in want_syms.items():
        for t in toks:
            want_vocab[t] = want_vocab.get(t, 0) + f
    got_vocab = {r.symbol: r.freq for r in vocab.collect()}
    assert got_vocab == want_vocab


def test_bpe_segment_applies_learned_merges(spark):
    from detanalysis_spark.llm.text import train_bpe, bpe_segment_udf
    df = spark.createDataFrame(
        [(0, "low low low lower lowest"), (1, "new newer newest")],
        ["doc_id", "text"])
    merges, _ = train_bpe(df, 8, min_freq=1)
    seg = bpe_segment_udf(merges)
    out = {r.doc_id: r.toks for r in
           df.select("doc_id", seg(F.col("text")).alias("toks")).collect()}
    # round-trip: concatenating subwords (dropping EOW) rebuilds the text
    for i, text in [(0, "low low low lower lowest"),
                    (1, "new newer newest")]:
        rebuilt = "".join(t.replace("</w>", " ") for t in out[i]).strip()
        assert rebuilt == text
    # the most frequent whole word became a single token
    assert "low</w>" in out[0]


def test_remove_duplicate_lines_first_occurrence_wins(spark):
    """C4/RefinedWeb exact line dedup: only the corpus-first occurrence
    of each line survives (ordered by doc_id then position); document
    line order is preserved; fully-deduped docs come back empty."""
    from detanalysis_spark.llm.cleaning import remove_duplicate_lines
    docs = [
        (0, "alpha\nbeta\nalpha"),        # in-doc repeat: keep first only
        (1, "beta\ngamma"),               # beta already seen in doc 0
        (2, "alpha\nbeta"),               # nothing new -> empty
        (3, "delta"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: (r.clean_text, r.n_lines_kept)
           for r in remove_duplicate_lines(df).collect()}
    assert out[0] == ("alpha\nbeta", 2)
    assert out[1] == ("gamma", 1)
    assert out[2] == ("", 0)
    assert out[3] == ("delta", 1)
    # result is partition-invariant
    out2 = {r.doc_id: (r.clean_text, r.n_lines_kept)
            for r in remove_duplicate_lines(df.repartition(5)).collect()}
    assert out2 == out

    # empty lines are paragraph STRUCTURE, not content: they pass
    # through untouched in every doc (no corpus-wide reflow)
    paras = spark.createDataFrame(
        [(0, "one\n\ntwo"), (1, "three\n\nfour")], ["doc_id", "text"])
    got = {r.doc_id: r.clean_text
           for r in remove_duplicate_lines(paras).collect()}
    assert got == {0: "one\n\ntwo", 1: "three\n\nfour"}


def test_ivf_persisted_corpus_prunes_and_appends(clustered_vectors, tmp_path):
    """Cell-partitioned corpus persistence: probes against the on-disk
    layout read ONLY their cells (partition pruning in the plan),
    results equal the in-memory topk, and incremental append grows the
    index without rebuilding."""
    from detanalysis_spark.llm.similarity import IVFIndex
    df, _ = clustered_vectors
    spark = df.sparkSession
    ivf = IVFIndex(n_centroids=4, n_probe=1, seed=1).fit(df)
    path = str(tmp_path / "ivf_corpus")

    first = df.filter("vec_id < 90")
    late = df.filter("vec_id >= 90")
    ivf.write_corpus(first, path, mode="overwrite")
    ivf.write_corpus(late, path)         # incremental append
    assert IVFIndex.read_corpus(spark, path).count() == df.count()

    probes = df.filter("vec_id IN (2, 27)")
    got = ivf.topk_from_corpus(spark, path, probes, k=5)
    want = sorted((r.probe_id, r.rank, r.neighbor_id)
                  for r in ivf.topk(df, probes, k=5).collect())
    assert sorted((r.probe_id, r.rank, r.neighbor_id)
                  for r in got.collect()) == want
    # the scan is partition-pruned to the probes' cells
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split(
        "PartitionFilters", 1)[1][:300]


def test_embedding_outliers_match_numpy(clustered_vectors):
    """dist/z/is_outlier equal a numpy replay; planting a far vector
    makes exactly that vector the group's outlier."""
    from detanalysis_spark.llm.similarity import embedding_outliers
    df, vecs = clustered_vectors
    spark = df.sparkSession
    lab = np.repeat(np.arange(4), 25)
    far = vecs.copy()
    far[7] = far[7] + 40.0                   # plant an outlier in group 0
    d2 = spark.createDataFrame(
        [(i, int(lab[i]), [float(x) for x in far[i]])
         for i in range(len(far))],
        "vec_id long, grp long, embedding array<double>")
    got = {r.vec_id: r for r in
           embedding_outliers(d2, "grp", z_threshold=2.0).collect()}

    for g in range(4):
        idx = np.where(lab == g)[0]
        cent = far[idx].mean(axis=0)
        dist = np.linalg.norm(far[idx] - cent, axis=1)
        mu, sd = dist.mean(), dist.std(ddof=1)
        for j, i in enumerate(idx):
            assert got[i].dist == pytest.approx(dist[j], rel=1e-9)
            assert got[i].z == pytest.approx((dist[j] - mu) / sd,
                                             rel=1e-9)
            assert got[i].is_outlier == ((dist[j] - mu) / sd > 2.0)
    outliers = [i for i, r in got.items() if r.is_outlier]
    assert 7 in outliers


def test_adaptive_quality_filter_per_group_threshold(spark):
    """Each group keeps exactly its rows clearing the group's own
    quantile; a global threshold would have deleted group 'b'
    entirely."""
    from detanalysis_spark.llm.cleaning import adaptive_quality_filter
    rows = [(i, "a", 100 + i) for i in range(10)]          # scores 100-109
    rows += [(100 + i, "b", 10 + i) for i in range(10)]    # scores 10-19
    df = spark.createDataFrame(rows, ["doc_id", "grp", "score"])
    kept = {r.doc_id for r in adaptive_quality_filter(
        df, "score", "grp", quantile=0.5).collect()}
    # median of 100..109 = 104.5 -> keep 105..109 (ids 5..9); same for b
    assert kept == set(range(5, 10)) | set(range(105, 110))
    below = {r.doc_id for r in adaptive_quality_filter(
        df, "score", "grp", quantile=0.5, keep="below").collect()}
    assert below == set(range(0, 5)) | set(range(100, 105))
    with pytest.raises(ValueError, match="above"):
        adaptive_quality_filter(df, "score", "grp", keep="sideways")
    with pytest.raises(ValueError, match="quantile"):
        adaptive_quality_filter(df, "score", "grp", quantile=1.5)


def test_multiprobe_lsh_improves_recall(spark):
    """Multi-probe (flip the least-confident bits) finds strictly more
    true near-neighbors than single-probe with the same tables, and
    every single-probe candidate is also a multi-probe candidate."""
    rng = np.random.default_rng(13)
    n, d = 120, 24
    base = rng.standard_normal((n, d))
    # planted neighbors: moderate cosine (~0.85) so single-probe with
    # few tables misses a chunk of them
    neigh = base + 0.6 * rng.standard_normal((n, d))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    rows += [(1000 + i, [float(x) for x in neigh[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    corpus = df.filter("vec_id >= 1000")
    probes = df.filter("vec_id < 1000")

    lsh = RandomHyperplaneLSH(dim=d, bits=14, tables=2, seed=4)

    def recall(n_flip):
        cand = {(r.probe_id, r.neighbor_id) for r in
                lsh.candidates(corpus, probes, n_flip=n_flip).collect()}
        hits = sum((i, 1000 + i) in cand for i in range(n))
        return hits, cand

    h0, c0 = recall(0)
    h3, c3 = recall(3)
    assert c0 <= c3            # multi-probe is a superset
    assert h3 > h0             # and recovers strictly more planted pairs


# ----------------------------------------------------------------------
# bigram LM with stupid backoff
# ----------------------------------------------------------------------
def test_bigram_lm_matches_hand_computation(spark):
    import math
    from detanalysis_spark.llm.text import (train_bigram_lm,
                                            bigram_logprob_scores)
    train = spark.createDataFrame(
        [(0, "the cat sat"), (2, "the cat ran the dog sat")],
        ["doc_id", "text"])
    # corpus counts: the=3 cat=2 sat=2 ran=1 dog=1  T=9
    # bigrams: (the,cat)=2 (cat,sat)=1 (cat,ran)=1 (ran,the)=1
    #          (the,dog)=1 (dog,sat)=1
    lm = train_bigram_lm(train)
    assert lm.total == 9

    score = spark.createDataFrame(
        [(1, "the cat sat"),        # all bigrams seen
         (3, "cat the"),            # unseen bigram, both words known
         (5, "zap zap"),            # unseen bigram, OOV backoff word
         (7, "one")],               # <2 tokens: no rows
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           bigram_logprob_scores(score, lm).collect()}

    p_the_cat = 2 / 3
    p_cat_sat = 1 / 2
    exp1 = -(math.log(p_the_cat) + math.log(p_cat_sat)) / 2
    assert abs(out[1]["nll"] - exp1) < 1e-12 and out[1]["n_bigrams"] == 2

    exp3 = -math.log(0.4 * 3 / 9)       # backoff to c1(the)=3
    assert abs(out[3]["nll"] - exp3) < 1e-12

    exp5 = -math.log(0.4 * 1 / 9)       # OOV floor: coalesce(c1, 1)
    assert abs(out[5]["nll"] - exp5) < 1e-12

    assert 7 not in out                  # sub-bigram docs emit nothing


def test_bigram_lm_empty_token_hygiene(spark):
    """Runs of whitespace must not create empty-string bigram members;
    adjacency is computed AFTER empty removal."""
    from detanalysis_spark.llm.text import train_bigram_lm
    df = spark.createDataFrame([(0, "  a   b  ")], ["doc_id", "text"])
    lm = train_bigram_lm(df)
    rows = lm.bigrams.collect()
    assert [(r["w1"], r["w2"], r["c12"]) for r in rows] == [("a", "b", 1)]


# ----------------------------------------------------------------------
# hashed linear classifier (fasttext-style quality probe)
# ----------------------------------------------------------------------
def test_portable_bucket_matches_duckdb(spark):
    import duckdb
    from detanalysis_spark.llm.classifier import portable_bucket
    import pyspark.sql.functions as F
    terms = ["the", "cat", "zap", "Ünïcode", "x" * 50]
    df = spark.createDataFrame([(t,) for t in terms], ["t"])
    got = {r["t"]: r["b"] for r in
           df.select("t", portable_bucket(F.col("t"), 256).alias("b"))
             .collect()}
    con = duckdb.connect()
    for t in terms:
        want = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::UBIGINT % 256",
            [t]).fetchone()[0]
        assert got[t] == want, t


def test_score_hashed_linear_formula_weights(spark):
    import math
    from detanalysis_spark.llm.classifier import (score_hashed_linear,
                                                  portable_bucket,
                                                  DEFAULT_WEIGHT_MOD)
    import pyspark.sql.functions as F
    df = spark.createDataFrame([(0, "aa bb aa")], ["doc_id", "text"])
    buckets = {r["t"]: r["b"] for r in spark.createDataFrame(
        [("aa",), ("bb",)], ["t"])
        .select("t", portable_bucket(F.col("t"), 256).alias("b"))
        .collect()}
    w = {t: (b % DEFAULT_WEIGHT_MOD) / (DEFAULT_WEIGHT_MOD - 1) - 0.5
         for t, b in buckets.items()}
    want = (2 * w["aa"] + 1 * w["bb"]) / 3
    out = score_hashed_linear(df, dim=256).collect()[0]
    assert out["n_tokens"] == 3
    assert abs(out["score"] - want) < 1e-12


def test_score_hashed_linear_explicit_weights(spark):
    import numpy as np
    from detanalysis_spark.llm.classifier import (score_hashed_linear,
                                                  hashed_token_features)
    df = spark.createDataFrame(
        [(0, "good good text"), (1, "bad stuff")], ["doc_id", "text"])
    w = np.zeros(64)
    feats = {(r["doc_id"], r["bucket"]): r["x"]
             for r in hashed_token_features(df, dim=64).collect()}
    for (_, b), _x in feats.items():
        w[b] = 1.0  # weight 1 on every observed bucket
    out = {r["doc_id"]: r for r in
           score_hashed_linear(df, dim=64, weights=w, bias=2.0).collect()}
    # score = bias + sum(tf * 1)/n = bias + 1 for every doc
    assert abs(out[0]["score"] - 3.0) < 1e-12
    assert abs(out[1]["score"] - 3.0) < 1e-12


def test_train_linear_probe_matches_numpy(spark):
    import numpy as np
    from detanalysis_spark.llm.classifier import (train_linear_probe,
                                                  hashed_token_features,
                                                  score_hashed_linear)
    import random
    rng = random.Random(3)
    good_vocab = ["clear", "prose", "reads", "well", "insight"]
    bad_vocab = ["zzz", "spam", "click", "winner", "casino"]
    rows = []
    for i in range(60):
        label = i % 2
        vocab = good_vocab if label else bad_vocab
        text = " ".join(rng.choice(vocab) for _ in range(12))
        rows.append((i, text, float(label)))
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    dim, reg = 32, 1e-3

    w = train_linear_probe(df, "y", dim=dim, reg=reg)

    # dense numpy reference: identical features, identical ridge
    feats = hashed_token_features(df, dim=dim).collect()
    totals = {}
    for r in feats:
        totals[r["doc_id"]] = totals.get(r["doc_id"], 0.0) + r["x"]
    X = np.zeros((60, dim + 1))
    X[:, dim] = 1.0
    y = np.array([float(i % 2) for i in range(60)])
    for r in feats:
        X[r["doc_id"], r["bucket"]] = r["x"] / totals[r["doc_id"]]
    ref = np.linalg.solve(X.T @ X + reg * np.eye(dim + 1), X.T @ y)
    assert np.allclose(w, ref, atol=1e-8)

    # and the trained probe separates the classes
    scored = {r["doc_id"]: r["score"] for r in
              score_hashed_linear(df, dim=dim, weights=w[:-1],
                                  bias=float(w[-1])).collect()}
    good = [scored[i] for i in range(60) if i % 2 == 1]
    bad = [scored[i] for i in range(60) if i % 2 == 0]
    assert min(good) > max(bad)


# ----------------------------------------------------------------------
# Gopher / MassiveText quality rules
# ----------------------------------------------------------------------
def test_gopher_quality_flags(spark):
    from detanalysis_spark.llm.cleaning import gopher_quality_flags
    import pyspark.sql.functions as F
    rows = [
        # mean word len (46 chars / 10 words = 4.6), 60 words: passes
        (0, "the quick brown foxes jump over those lazy hounds of today " * 6),
        (1, "word " * 10),                    # too few words
        (2, "# " * 12 + "the a of word " * 20,),  # 12/92 '#' per word > 0.1
        (3, "- one\n- two\n- three",),        # all bullet lines
        (4, ("the a is " + "9 8 7 6 5 4 3 2 1 0 " * 9)),  # digits: alpha low
        (5, "a" * 20 + " " + "the of is to " * 15),  # long word ok; passes?
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    flags = gopher_quality_flags(F.col("text"), min_words=12)
    out = {r["doc_id"]: r for r in
           df.select("doc_id", *[v.alias(k) for k, v in flags.items()])
             .collect()}
    assert out[0]["gopher_pass"]
    assert not out[1]["word_count_ok"] and not out[1]["gopher_pass"]
    assert not out[2]["symbol_ratio_ok"]
    assert not out[3]["bullet_ratio_ok"] and not out[3]["word_count_ok"]
    assert not out[4]["alpha_ratio_ok"]
    # doc 5: mean word len = (20 + 60*2.?) check just that flags exist
    assert set(out[5].asDict()) >= {"mean_word_len_ok", "stopword_ok"}


def test_gopher_filter_counts(spark):
    from detanalysis_spark.llm.cleaning import gopher_quality_filter
    df = spark.createDataFrame(
        [(0, "the quick brown foxes jump over those lazy hounds of today " * 5),
         (1, "tiny")], ["doc_id", "text"])
    kept = gopher_quality_filter(df, min_words=10)
    assert [r["doc_id"] for r in kept.collect()] == [0]


def test_hashed_embedding_matches_python(spark):
    import hashlib
    import math
    from detanalysis_spark.llm.classifier import hashed_embedding
    import pyspark.sql.functions as F
    dim = 16
    text = "the cat the dog"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    got = df.select(hashed_embedding(F.col("text"), dim=dim)
                    .alias("e")).first()["e"]

    counts = [0.0] * dim
    for t in text.split():
        b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim
        counts[b] += 1.0
    norm = math.sqrt(sum(c * c for c in counts))
    want = [c / norm for c in counts]
    assert all(abs(a - b) < 1e-12 for a, b in zip(got, want))
    assert abs(sum(x * x for x in got) - 1.0) < 1e-12   # unit norm

    # empty text -> zero vector, no NaN from the norm guard
    z = spark.createDataFrame([(1, " ")], ["doc_id", "text"]) \
        .select(hashed_embedding(F.col("text"), dim=dim).alias("e")) \
        .first()["e"]
    assert z == [0.0] * dim


def test_hashed_embedding_drives_semantic_dedup(spark):
    """The model-free bridge: near-identical texts land within the
    SemDeDup threshold over their hashed embeddings; unrelated text
    survives."""
    from detanalysis_spark.llm.classifier import hashed_embedding
    from detanalysis_spark.llm.similarity import semantic_dedup
    import pyspark.sql.functions as F
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(0, base, 0), (1, base + "tail", 0),
            (2, "completely different words about spark plans", 0)]
    df = spark.createDataFrame(rows, ["vec_id", "text", "label"]) \
        .withColumn("embedding", hashed_embedding(F.col("text"), dim=64))
    kept = sorted(r["vec_id"] for r in
                  semantic_dedup(df, 0.9, cluster_col="label")
                  .select("vec_id").collect())
    assert kept == [0, 2]      # 1 is a hashed-cosine near-dup of 0


def test_token_cosine_pairs_vs_numpy(spark):
    import math
    from collections import Counter
    from detanalysis_spark.llm.dedup import token_cosine_pairs
    rows = [(0, "the cat sat on the mat"),
            (1, "the cat sat on the hat"),
            (2, "spark plans shuffle data"),
            (3, "the cat sat on the mat")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def cos(x, y):
        a, b = Counter(x.split()), Counter(y.split())
        dot = sum(a[t] * b[t] for t in a)
        na = math.sqrt(sum(v * v for v in a.values()))
        nb = math.sqrt(sum(v * v for v in b.values()))
        return dot / (na * nb)

    got = {(r["id_a"], r["id_b"]): r["sim"] for r in
           token_cosine_pairs(df, threshold=0.5).collect()}
    assert abs(got[(0, 3)] - 1.0) < 1e-12           # identical
    assert abs(got[(0, 1)] - cos(rows[0][1], rows[1][1])) < 1e-12
    assert (0, 2) not in got and (1, 2) not in got  # unrelated filtered
    assert all(a < b for a, b in got)


def test_token_cosine_pairs_max_df_prunes_common_terms(spark):
    """Pairs sharing ONLY ultra-common terms disappear under max_df;
    surviving scores still use full norms (lower-bound semantics)."""
    from detanalysis_spark.llm.dedup import token_cosine_pairs
    rows = [(0, "common alpha beta"), (1, "common gamma delta"),
            (2, "common alpha beta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = {(r["id_a"], r["id_b"]) for r in
            token_cosine_pairs(df, threshold=0.3).collect()}
    assert (0, 1) in full                   # linked by "common" alone
    pruned = {(r["id_a"], r["id_b"]): r["sim"] for r in
              token_cosine_pairs(df, threshold=0.3, max_df=2).collect()}
    assert (0, 1) not in pruned             # only-common link pruned
    # identical docs share 2 of their 3 unit-tf terms after pruning,
    # but norms keep all three: sim = 2/(sqrt(3)*sqrt(3)) = 2/3
    assert abs(pruned[(0, 2)] - 2 / 3) < 1e-12


def test_jaccard_index_pairs_matches_brute_force(spark):
    """Inverted-index exact Jaccard join == brute-force set Jaccard on
    every qualifying pair (and ONLY those) — the no-miss contract the
    MinHash path can't make."""
    from detanalysis_spark.llm.dedup import (jaccard_index_pairs,
                                             word_shingles)
    base = "the quick brown fox jumps over the lazy dog sits"
    rows = [(0, base), (1, base), (2, base + " with an extra tail"),
            (3, "completely different words about spark and shuffles"),
            (4, "short text"), (5, "short text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def sh(t, n=3):
        tk = t.split()
        return {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}

    want = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            a, b = sh(ta), sh(tb)
            u = len(a | b)
            j = len(a & b) / u if u else 0.0
            if j >= 0.4:
                want[(ia, ib)] = j
    got = {(r.id_a, r.id_b): r.jaccard for r in
           jaccard_index_pairs(df, threshold=0.4).collect()}
    # docs 4/5 have EMPTY trigram sets (2 tokens): no posting, no pair
    want.pop((4, 5), None)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_jaccard_index_pairs_size_bound_is_lossless(spark):
    """The pre-shuffle size-ratio prune never drops a qualifying pair:
    threshold=0 (bound off) and threshold filter applied after must
    agree with the bounded plan at the same threshold."""
    from detanalysis_spark.llm.dedup import jaccard_index_pairs
    rows = [(i, f"w{i} common one two three four five six seven")
            for i in range(6)] + [(10, "one two three"), (11, "one two")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    unbounded = {(r.id_a, r.id_b): r.jaccard for r in
                 jaccard_index_pairs(df, threshold=0.0).collect()
                 if r.jaccard >= 0.5}
    bounded = {(r.id_a, r.id_b): r.jaccard for r in
               jaccard_index_pairs(df, threshold=0.5).collect()}
    assert bounded == unbounded


def test_jaccard_index_pairs_max_df_prunes(spark):
    from detanalysis_spark.llm.dedup import jaccard_index_pairs
    # every doc shares the same boilerplate trigram; only 0/1 really dup
    rows = [(0, "alpha beta gamma x0 y0"), (1, "alpha beta gamma x0 y0"),
            (2, "alpha beta gamma p q"), (3, "alpha beta gamma r s")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = {(r.id_a, r.id_b) for r in
            jaccard_index_pairs(df, threshold=0.15).collect()}
    assert (0, 1) in full and (2, 3) in full
    pruned = {(r.id_a, r.id_b) for r in
              jaccard_index_pairs(df, threshold=0.15, max_df=2).collect()}
    assert (0, 1) in pruned            # true dup survives (rare grams)
    assert (2, 3) not in pruned        # boilerplate-only link pruned


def test_containment_pairs_catches_quote_inclusion(spark):
    """A doc wholly quoted inside a 5x larger one: containment 1.0,
    Jaccard far below any useful threshold — the asymmetric measure is
    the point."""
    from detanalysis_spark.llm.dedup import (containment_pairs,
                                             jaccard_index_pairs)
    quoted = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"filler{i}" for i in range(24))
    rows = [(0, quoted), (1, filler + " " + quoted),
            (2, "nothing in common with the others at all here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cont = {(r.id_a, r.id_b): r.containment for r in
            containment_pairs(df, threshold=0.9).collect()}
    assert abs(cont[(0, 1)] - 1.0) < 1e-12
    assert (0, 2) not in cont and (1, 2) not in cont
    jac = {(r.id_a, r.id_b) for r in
           jaccard_index_pairs(df, threshold=0.4).collect()}
    assert (0, 1) not in jac           # Jaccard blind to the inclusion


def test_containment_pairs_min_shingles_guard(spark):
    from detanalysis_spark.llm.dedup import containment_pairs
    rows = [(0, "one two three"),                  # 1 trigram
            (1, "one two three and much more text here okay")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b) for r in
           containment_pairs(df, threshold=0.9).collect()}
    assert (0, 1) in got               # default keeps it (documented)
    guarded = {(r.id_a, r.id_b) for r in
               containment_pairs(df, threshold=0.9,
                                 min_shingles=2).collect()}
    assert (0, 1) not in guarded


def test_repetition_char_fractions_hand_computed(spark):
    from detanalysis_spark.llm.cleaning import repetition_char_fractions
    import pyspark.sql.functions as F
    rows = [(0, "a b a b a b"),        # "a b" x3 of 5 bigrams
            (1, "x\nx\nyy"),           # dup line "x"; 1 of 5 line chars?
            (2, "unique words only here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m = repetition_char_fractions(F.col("text"), ns=(2,), top_ns=(2,))
    out = {r["doc_id"]: r for r in
           df.select("doc_id", *[v.alias(k) for k, v in m.items()])
             .collect()}
    # doc 0: 6 tokens (6 chars). bigrams: "a b","b a","a b","b a","a b"
    # top gram "a b": 3 occurrences x 2 token chars = 6 -> 6/6 = 1.0
    assert abs(out[0]["top_2gram_char_frac"] - 1.0) < 1e-12
    # dup occurrences: 5 grams, 2 distinct firsts (2+2 chars);
    # total gram chars 10 -> dup 6 -> 6/6 = 1.0
    assert abs(out[0]["dup_2gram_char_frac"] - 1.0) < 1e-12
    assert out[0]["dup_line_frac"] == 0.0       # single line

    # doc 1: lines x, x, yy -> 1 of 3 repeated; line chars 4, dup 1
    assert abs(out[1]["dup_line_frac"] - 1 / 3) < 1e-12
    assert abs(out[1]["dup_line_char_frac"] - 1 / 4) < 1e-12

    # doc 2: no repetition anywhere
    assert out[2]["dup_2gram_char_frac"] == 0.0
    assert out[2]["top_2gram_char_frac"] > 0.0   # top gram exists once
    assert out[2]["dup_line_frac"] == 0.0


def test_repetition_top_gram_key_clamp(spark):
    # a >=1e6-char gram must not collide into the count field of the
    # combined (cnt, chars) sort key and displace a more frequent short
    # gram: unclamped, the giant 1-gram's key 1*1e6 + 1_200_000 beats
    # "x"'s 2*1e6 + 1 only if chars overflows — clamping at 999_999
    # keeps frequency strictly dominant
    from detanalysis_spark.llm.cleaning import (
        repetition_char_fractions, repetition_char_fractions_grouped)
    import pyspark.sql.functions as F
    giant = "a" * 1_200_000
    text = f"x x {giant}"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    m = repetition_char_fractions(F.col("text"), ns=(1,), top_ns=(1,))
    row = df.select(*[v.alias(k) for k, v in m.items()]).collect()[0]
    tok_chars = 2 * 1 + 1_200_000
    # top 1-gram is "x" (cnt 2, 1 char each): coverage 2/tok_chars —
    # NOT the giant token (cnt 1, 1.2e6 chars -> ~1.0 if mispromoted)
    assert abs(row["top_1gram_char_frac"] - 2 / tok_chars) < 1e-12
    grp = repetition_char_fractions_grouped(df, n=1).collect()[0]
    assert abs(grp["top_1gram_char_frac"] - 2 / tok_chars) < 1e-12


def test_bigram_lm_save_load_roundtrip(spark, tmp_path):
    from detanalysis_spark.llm.text import (train_bigram_lm,
                                            bigram_logprob_scores,
                                            save_bigram_lm,
                                            load_bigram_lm)
    df = spark.createDataFrame(
        [(0, "the cat sat"), (2, "the cat ran the dog sat")],
        ["doc_id", "text"])
    lm = train_bigram_lm(df)
    path = str(tmp_path / "lm")
    save_bigram_lm(lm, path)
    lm2 = load_bigram_lm(spark, path)
    assert lm2.total == lm.total and lm2.alpha == lm.alpha

    score_df = spark.createDataFrame([(1, "the cat sat")],
                                     ["doc_id", "text"])
    a = bigram_logprob_scores(score_df, lm).collect()[0]
    b = bigram_logprob_scores(score_df, lm2).collect()[0]
    assert a["nll"] == b["nll"] and a["n_bigrams"] == b["n_bigrams"]


def test_probe_save_load_roundtrip(spark, tmp_path):
    import numpy as np
    from detanalysis_spark.llm.classifier import save_probe, load_probe
    w = np.linspace(-1, 1, 33)
    path = str(tmp_path / "probe")
    save_probe(w, path, spark=spark)
    w2 = load_probe(spark, path)
    assert np.allclose(w, w2)


def test_char_fractions_grouped_equals_column_form(spark):
    """The relational and per-row forms of the n-gram char-coverage
    metrics must agree exactly (the suite query uses the relational
    one; this equality is its link to the hand-computed fixtures)."""
    from detanalysis_spark.llm.cleaning import (
        repetition_char_fractions, repetition_char_fractions_grouped)
    import pyspark.sql.functions as F
    rows = [(0, "a b a b a b"), (1, "unique words only here"),
            (2, "x"), (3, "  "), (4, "q r q r s t q r")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m = repetition_char_fractions(F.col("text"), ns=(2,), top_ns=(2,))
    col_form = {r["doc_id"]: (r["top"], r["dup"]) for r in
                df.select("doc_id",
                          m["top_2gram_char_frac"].alias("top"),
                          m["dup_2gram_char_frac"].alias("dup"))
                .collect()}
    grp_form = {r["doc_id"]: (r["top_2gram_char_frac"],
                              r["dup_2gram_char_frac"]) for r in
                repetition_char_fractions_grouped(df, n=2).collect()}
    assert set(col_form) == set(grp_form) == {0, 1, 2, 3, 4}
    for k in col_form:
        assert abs(col_form[k][0] - grp_form[k][0]) < 1e-12, k
        assert abs(col_form[k][1] - grp_form[k][1]) < 1e-12, k


def test_top_gram_picks_most_frequent_not_max_coverage(spark):
    """The Gopher rule selects by FREQUENCY: a short gram occurring 3x
    must beat a much longer gram occurring 2x, even though the longer
    one covers more characters."""
    from detanalysis_spark.llm.cleaning import (
        repetition_char_fractions, repetition_char_fractions_grouped)
    import pyspark.sql.functions as F
    # "a b" occurs 3x (coverage 6); "longword otherlong" occurs 2x
    # (coverage 2*17=34) — most frequent is "a b"
    text = ("a b a b a b longword otherlong x longword otherlong")
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    m = repetition_char_fractions(F.col("text"), ns=(2,), top_ns=(2,))
    got_col = df.select(
        m["top_2gram_char_frac"].alias("t")).first()["t"]
    got_grp = repetition_char_fractions_grouped(df, n=2) \
        .first()["top_2gram_char_frac"]
    tok_chars = sum(len(w) for w in text.split())
    # "a b": 3 occurrences x 2 token chars = 6
    assert abs(got_col - 6 / tok_chars) < 1e-12
    assert abs(got_grp - 6 / tok_chars) < 1e-12


def test_char_fractions_can_exceed_one_documented(spark):
    """Per-occurrence counting on pathologically repetitive text
    exceeds 1 — the documented behavior, pinned so a future 'fix'
    doesn't silently change the oracle."""
    from detanalysis_spark.llm.cleaning import repetition_char_fractions
    import pyspark.sql.functions as F
    df = spark.createDataFrame([(0, "a a a")], ["doc_id", "text"])
    m = repetition_char_fractions(F.col("text"), ns=(2,), top_ns=(2,))
    r = df.select(m["top_2gram_char_frac"].alias("t"),
                  m["dup_2gram_char_frac"].alias("d")).first()
    assert abs(r["t"] - 4 / 3) < 1e-12   # 2 occ x 2 chars over 3
    assert abs(r["d"] - 2 / 3) < 1e-12


def test_char_fractions_grouped_keeps_blank_docs(spark):
    from detanalysis_spark.llm.cleaning import \
        repetition_char_fractions_grouped
    df = spark.createDataFrame([(0, "a b a b"), (1, "   "), (2, "x")],
                               ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           repetition_char_fractions_grouped(df, n=2).collect()}
    assert set(out) == {0, 1, 2}
    assert out[1]["tok_chars"] == 0
    assert out[1]["top_2gram_char_frac"] == 0.0
    assert out[2]["dup_2gram_char_frac"] == 0.0


def test_merge_intervals_drops_null_bounds(spark):
    from detanalysis_spark.operators.joins import merge_intervals
    import pandas as pd
    pdf = pd.DataFrame({"k": ["a"] * 3,
                        "lo": [0.0, None, 20.0],
                        "hi": [5.0, 100.0, 25.0]})
    df = spark.createDataFrame(pdf)
    out = sorted((r["lo"], r["hi"]) for r in
                 merge_intervals(df, "lo", "hi", ["k"]).collect())
    assert out == [(0.0, 5.0), (20.0, 25.0)]


def test_compression_ratio_matches_zlib(spark):
    import zlib
    from detanalysis_spark.llm.text import compression_ratio_udf
    import pyspark.sql.functions as F
    texts = ["spam spam spam spam spam spam spam spam",
             "the quick brown fox jumps over the lazy dog", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    r = compression_ratio_udf()
    got = {x["doc_id"]: x["c"] for x in
           df.select("doc_id", r(F.col("text")).alias("c")).collect()}
    for i, t in enumerate(texts):
        raw = t.encode()
        want = len(zlib.compress(raw, 6)) / len(raw) if raw else 1.0
        assert abs(got[i] - want) < 1e-12
    assert got[0] < got[1]      # repetitive text compresses harder


def test_sentence_split_udtf_lateral_join(spark):
    from detanalysis_spark.llm.text import sentence_split_udtf
    spark.udtf.register("split_sentences_t", sentence_split_udtf())
    df = spark.createDataFrame(
        [(0, "One two. Three! Four?"), (1, "   "), (2, None)],
        ["doc_id", "text"])
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_chars "
        "FROM udtf_docs d, LATERAL split_sentences_t(d.text) s "
        "ORDER BY d.doc_id, s.sentence_idx").collect()
    got = [(r["doc_id"], r["sentence_idx"], r["sentence"]) for r in rows]
    assert got == [(0, 0, "One two."), (0, 1, "Three!"), (0, 2, "Four?")]
    assert all(r["n_chars"] == len(r["sentence"]) for r in rows)


def test_near_dup_clusters_star_nonconvergence_raises(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(64)],
                                  ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="no convergence"):
        D.near_dup_clusters_star(pairs, max_iter=1)


# ----------------------------------------------------------------------
# URL / domain provenance curation (llm/cleaning.py)
# ----------------------------------------------------------------------
def test_url_host_and_registered_domain(spark):
    from detanalysis_spark.llm.cleaning import registered_domain, url_host
    rows = [(1, "https://www.example.com/a?q=1"),
            (2, "http://news.bbc.co.uk/path"),
            (3, "https://sub.deep.blog.org.uk/x"),   # suffix mid-host: last3
            (4, "https://plain.org/"),
            (5, "not a url at all"),                 # unparseable -> NULL
            (6, None),
            (7, "https://EXAMPLE.com/upper"),        # lower-cased
            (8, "ftp://files.example.com/f"),
            (9, "https://localhost/x")]              # single label passes
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r.id: (r.h, r.d) for r in df.select(
        "id", url_host("url").alias("h"),
        registered_domain(url_host("url")).alias("d")).collect()}
    assert got[1] == ("www.example.com", "example.com")
    assert got[2] == ("news.bbc.co.uk", "bbc.co.uk")
    assert got[3] == ("sub.deep.blog.org.uk", "blog.org.uk")
    assert got[4] == ("plain.org", "plain.org")
    assert got[5] == (None, None)
    assert got[6] == (None, None)
    assert got[7] == ("example.com", "example.com")
    assert got[8] == ("files.example.com", "example.com")
    assert got[9] == ("localhost", "localhost")


def test_domain_blocklist_filter_list_and_frame(spark):
    from detanalysis_spark.llm.cleaning import domain_blocklist_filter
    rows = [(1, "https://a.example.com/x"), (2, "https://b.kept.org/y"),
            (3, "https://Example.COM/z"),            # case-insensitive
            (4, "garbage"), (5, None)]               # unparseable kept
    df = spark.createDataFrame(rows, "id long, url string")
    kept = domain_blocklist_filter(df, "url", ["EXAMPLE.com"])
    assert sorted(r.id for r in kept.collect()) == [2, 4, 5]
    bl = spark.createDataFrame([("example.com",)], "d string")
    kept2 = domain_blocklist_filter(df, "url", bl)
    assert sorted(r.id for r in kept2.collect()) == [2, 4, 5]


def test_domain_profile_counts_hosts_share(spark):
    from detanalysis_spark.llm.cleaning import domain_profile
    rows = [(1, "https://a.x.com/"), (2, "https://b.x.com/"),
            (3, "https://a.x.com/2"), (4, "https://y.org/"),
            (5, "nope")]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r.domain: (r.n_docs, r.n_hosts, r.share)
           for r in domain_profile(df, "url").collect()}
    assert got["x.com"][:2] == (3, 2)
    assert got["y.org"][:2] == (1, 1)
    assert got[None][:2] == (1, 0)                   # quarantine bucket
    assert abs(sum(v[2] for v in got.values()) - 1.0) < 1e-12


def test_strip_html_extraction(spark):
    from detanalysis_spark.llm.cleaning import strip_html
    cases = [
        # script/style/comment contents vanish; tags become spaces
        ('<html><head><script>var x = "<p>hidden</p>";</script>'
         '<style>p { color: red; }</style></head>'
         '<body><h1>Title</h1><!-- note --><p>Hello <b>world</b></p>'
         '</body></html>',
         "Title Hello world"),
        # entities, incl. one-level double-escape (&amp;lt; -> &lt;)
        ("A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end "
         "&amp;lt;keep&amp;gt;",
         "A & B <tag> \"q\" 's' end &lt;keep&gt;"),
        # multi-line script (DOTALL) + whitespace collapse
        ("<script>\nline1\nline2\n</script>  text\n\n  more\t here",
         "text more here"),
        # tag case-insensitivity
        ("<SCRIPT>x</SCRIPT><P>ok</P>", "ok"),
        # no markup: trimmed/collapsed passthrough
        ("  plain   text  ", "plain text"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "id long, html string")
    got = {r.id: r.t for r in
           df.select("id", strip_html("html").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_bm25_matches_python_reference(spark):
    from collections import Counter
    import math
    from detanalysis_spark.llm.text import bm25_scores
    docs = [(0, "the cat sat on the mat"),
            (1, "the dog chased the cat"),
            (2, "dogs and cats living together"),
            (3, "a completely unrelated sentence about spark"),
            (4, "")]                                   # empty: no terms
    queries = [(10, "the cat"), (11, "spark dog"), (12, "zzz-nohit")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    got = {(r.query_id, r.doc_id): r.score
           for r in bm25_scores(ddf, qdf).collect()}

    k1, b = 1.2, 0.75
    toks = {i: [w.lower() for w in t.split() if w] for i, t in docs}
    tf = {i: Counter(ts) for i, ts in toks.items() if ts}
    N = len(tf)                                        # docs WITH terms
    avgdl = sum(len(toks[i]) for i in tf) / N
    dfreq = Counter(t for c in tf.values() for t in c)
    want = {}
    for qid, qt in queries:
        for t in set(w.lower() for w in qt.split()):
            for d, c in tf.items():
                if t not in c:
                    continue
                idf = math.log(1 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                dl = len(toks[d])
                s = idf * c[t] * (k1 + 1) / (
                    c[t] + k1 * (1 - b + b * dl / avgdl))
                want[(qid, d)] = want.get((qid, d), 0.0) + s
    assert set(got) == set(want)                       # no-hit query absent
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    assert not any(q == 12 for q, _ in got)

    # topk keeps the best k per query with deterministic tie-break
    top = bm25_scores(ddf, qdf, topk=1).collect()
    by_q = {r.query_id: r.doc_id for r in top}
    assert by_q[10] == max(
        (q for q in want if q[0] == 10),
        key=lambda k: (want[k], -k[1]))[1]
    # max_df prunes ultra-common terms ("the" has df 2 here)
    pruned = {(r.query_id, r.doc_id): r.score
              for r in bm25_scores(ddf, qdf, max_df=1).collect()}
    assert all(s <= got[k] + 1e-12 for k, s in pruned.items())
    assert (11, 3) in pruned                           # "spark": df == 1


def test_temperature_mixture_sampling(spark):
    import math
    from detanalysis_spark.llm.dedup import (temperature_fractions,
                                             temperature_mixture_sample)
    # fractions: smallest stratum exactly 1.0; alpha=1 keeps all
    fr = temperature_fractions({"en": 800, "fr": 100, "de": 200}, 0.5)
    assert fr["fr"] == 1.0
    assert fr["en"] == pytest.approx(math.sqrt(100 / 800))
    assert temperature_fractions({"a": 5, "b": 9}, 1.0) \
        == {"a": 1.0, "b": 1.0}
    with pytest.raises(ValueError, match="alpha"):
        temperature_fractions({"a": 1}, 0.0)

    # sampled shares approach the n^alpha target on a skewed corpus
    rows = [(i, "big" if i % 10 < 9 else "small") for i in range(20000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_mixture_sample(df, "lang", "doc_id", alpha=0.5)
    got = {r.lang: r.n for r in
           kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["small"] == 2000                      # min stratum intact
    want_big = math.floor(math.pow(2000 / 18000, 0.5) * 10000)  # per 10k
    # pmod tickets 0..9999 appear ~equally among big ids; keep rule is
    # exact per ticket so expected kept = want_big * (18000/10000)
    assert abs(got["big"] - want_big * 1.8) <= 18    # ticket granularity
    # deterministic: re-running yields the identical sample
    kept2 = temperature_mixture_sample(df, "lang", "doc_id", alpha=0.5)
    assert sorted(r.doc_id for r in kept.collect()) \
        == sorted(r.doc_id for r in kept2.collect())


def test_temperature_mixture_null_stratum_kept(spark):
    # regression (round-6 review): ONE NULL-stratum row must neither
    # set n_min (shedding ~all real rows) nor vanish itself
    from detanalysis_spark.llm.dedup import temperature_mixture_sample
    rows = [(i, "en") for i in range(10_000)] + [(10_000, None)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_mixture_sample(df, "lang", "doc_id", alpha=0.7)
    got = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    by = {r.lang: r.n for r in got}
    assert by["en"] == 10_000               # single stratum: kept whole
    assert by[None] == 1                    # NULL rows pass through


def test_url_host_trailing_dot_cannot_bypass_blocklist(spark):
    # regression (round-6 review): 'example.com.' is the same host —
    # un-normalized it made registered_domain return 'com.' and walked
    # through the blocklist
    from detanalysis_spark.llm.cleaning import (domain_blocklist_filter,
                                                registered_domain,
                                                url_host)
    rows = [(1, "https://example.com./x"), (2, "https://example.com/x"),
            (3, "https://ok.org/y")]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r.id: r.d for r in df.select("id", registered_domain(
        url_host("url")).alias("d")).collect()}
    assert got[1] == got[2] == "example.com"
    kept = domain_blocklist_filter(df, "url", ["example.com"])
    assert sorted(r.id for r in kept.collect()) == [3]


def test_simhash_near_dup_pairs_banded(spark):
    from detanalysis_spark.llm.dedup import (hamming_distance, simhash,
                                             simhash_near_dup_pairs)
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the quiet green forest before nightfall")
    near = base.replace("quiet", "silent")          # one-token edit
    rng_words = ["alpha bravo charlie delta echo foxtrot golf hotel",
                 "one two three four five six seven eight nine ten",
                 "spark join order window agg scan filter merge sort",
                 "lorem ipsum dolor sit amet consectetur adipiscing"]
    rows = [(0, base), (1, near)] + [(10 + i, w * 3)
                                     for i, w in enumerate(rng_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in simhash_near_dup_pairs(df, max_hamming=7).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 7
    # pigeonhole exactness below the band count: banded result equals
    # the brute-force hamming filter on this corpus
    sh = df.select("doc_id", simhash(F.col("text")).alias("sh"))
    brute = {(r.a, r.b): r.h for r in
             sh.alias("x").crossJoin(sh.alias("y"))
             .filter(F.col("x.doc_id") < F.col("y.doc_id"))
             .select(F.col("x.doc_id").alias("a"),
                     F.col("y.doc_id").alias("b"),
                     hamming_distance(F.col("x.sh"),
                                      F.col("y.sh")).alias("h"))
             .filter(F.col("h") <= 7).collect()}
    assert pairs == brute
    with pytest.raises(ValueError, match="divide 64"):
        simhash_near_dup_pairs(df, bands=5)


def test_doc_term_pmi_matches_python_reference(spark):
    import math
    from collections import Counter
    from detanalysis_spark.llm.text import doc_term_pmi
    docs = [(0, "cat dog"), (1, "cat dog bird"), (2, "cat fish"),
            (3, "dog"), (4, "bird fish cat cat"), (5, "nothing here")]
    vocab_words = ["cat", "dog", "bird", "fish"]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    vdf = spark.createDataFrame([(w,) for w in vocab_words], "term string")
    got = {(r.term_a, r.term_b): (r.n_ab, r.n_a, r.n_b, r.pmi)
           for r in doc_term_pmi(ddf, vdf).collect()}
    N = len(docs)
    present = {i: set(t.split()) & set(vocab_words) for i, t in docs}
    n_t = Counter(t for s in present.values() for t in s)
    want = Counter()
    for s in present.values():
        for a in s:
            for b in s:
                if a < b:
                    want[(a, b)] += 1
    assert set(got) == set(want)
    for k, n_ab in want.items():
        a, b = k
        assert got[k][0] == n_ab
        assert got[k][1] == n_t[a] and got[k][2] == n_t[b]
        assert got[k][3] == pytest.approx(
            math.log(n_ab * N / (n_t[a] * n_t[b])), rel=1e-12)
    # min_docs prunes; empty corpus keeps the schema
    assert doc_term_pmi(ddf, vdf, min_docs=3).count() == 0
    empty = doc_term_pmi(ddf.filter("doc_id < 0"), vdf)
    assert empty.columns == ["term_a", "term_b", "n_ab",
                             "n_a", "n_b", "pmi"]
    assert empty.count() == 0


def test_normalize_url_canonicalization(spark):
    """Scheme/host case, default ports, dup slashes, trailing slash,
    tracking params, query sort, fragments — plus quarantine-to-NULL
    for unparseable values."""
    from detanalysis_spark.llm.cleaning import normalize_url
    cases = {
        "HTTP://WWW.Example.COM:80//a//b/?utm_source=x&b=2&a=1#frag":
            "http://www.example.com/a/b?a=1&b=2",
        "https://example.com:443/": "https://example.com/",
        "https://example.com": "https://example.com/",
        "http://example.com:8080/p/": "http://example.com:8080/p",
        "https://example.com./x?gclid=9": "https://example.com/x",
        "not a url": None,
        "https://example.com/p?a=1&a=0":
            "https://example.com/p?a=0&a=1",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {r.u: r.n for r in
           df.select("u", normalize_url("u").alias("n")).collect()}
    for u, want in cases.items():
        assert got[u] == want, u
    # param stripping is configurable; sort can be disabled
    df2 = spark.createDataFrame(
        [("https://e.com/p?b=2&a=1&sid=9",)], "u string")
    keep = df2.select(normalize_url(
        "u", strip_params=("sid",), sort_query=False).alias("n")).first().n
    assert keep == "https://e.com/p?b=2&a=1"


def test_lsh_plan_s_curve():
    """Planner picks (bands, rows) whose S-curve midpoint tracks the
    threshold; the known (1/b)^(1/r) ≈ t rule of thumb holds."""
    from detanalysis_spark.llm.dedup import (lsh_collision_probability,
                                             lsh_plan)
    import pytest as _pt
    for t in (0.3, 0.5, 0.7, 0.9):
        b, r = lsh_plan(t, num_hashes=64)
        assert b * r == 64
        mid = (1.0 / b) ** (1.0 / r)     # j where P ≈ 0.63
        assert abs(mid - t) < 0.25
        # the curve discriminates: well above t nearly always
        # collides, well below nearly never
        assert lsh_collision_probability(min(t + 0.25, 0.99), b, r) \
            > lsh_collision_probability(max(t - 0.25, 0.01), b, r) + 0.3
    # recall-heavy weighting shifts toward MORE bands (catches lower j)
    b_rec, r_rec = lsh_plan(0.7, 64, fn_weight=10.0)
    b_bal, _ = lsh_plan(0.7, 64)
    assert b_rec >= b_bal
    with _pt.raises(ValueError):
        lsh_plan(1.5)


# ----------------------------------------------------------------------
# Unicode hygiene: NFC normalization + invisible-char strip (round 9)
# ----------------------------------------------------------------------
def test_nfc_and_strip_invisible(spark):
    import re
    import unicodedata
    from pyspark.sql import functions as F
    from detanalysis_spark.llm.cleaning import (nfc_normalize,
                                                strip_invisible)

    rows = [
        "cafe\u0301 composed",          # e + combining acute -> \u00e9
        "A\u030a ring",                 # A + combining ring -> \u00c5
        "caf\u00e9 already nfc",
        "zero\u200bwidth\u200cjoin\u200d",
        "soft\u00adhyphen and bom \ufeff here",
        "ctrl\x07bell\x1besc",
        "tab\tand\nnewline survive",
        "a\u0300\u0316 multi marks",
        "\ufb01 ligature stays (NFC, not NFKC)",
        "",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)],
                               "i long, t string")
    got = {r.i: (r.s, r.c) for r in df.select(
        "i", strip_invisible(F.col("t")).alias("s"),
        nfc_normalize(strip_invisible(F.col("t"))).alias("c")).collect()}

    # the python twin of INVISIBLE_CLASS (python re has no \x{...},
    # so the class is rebuilt with \uXXXX escapes)
    pat = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f"
                     "\u0080-\u009f\u00ad\u200b-\u200d"
                     "\u2060\ufeff]")
    for i, s in enumerate(rows):
        stripped = pat.sub("", s)
        assert got[i][0] == stripped, (i, ascii(s), ascii(got[i][0]))
        assert got[i][1] == unicodedata.normalize("NFC", stripped), \
            (i, ascii(got[i][1]))
    # tab/newline survive the strip
    assert got[6][0] == rows[6]
    # NFC is idempotent
    twice = df.select(nfc_normalize(nfc_normalize(F.col("t"))).alias("c"),
                      nfc_normalize(F.col("t")).alias("c1"))
    assert all(r.c == r.c1 for r in twice.collect())
    # NULL passes through
    nul = spark.createDataFrame([(None,)], "t string").select(
        nfc_normalize(F.col("t")).alias("c"),
        strip_invisible(F.col("t")).alias("s")).collect()[0]
    assert nul.c is None and nul.s is None


def test_fix_mojibake(spark):
    from pyspark.sql import functions as F
    from detanalysis_spark.llm.cleaning import fix_mojibake

    good = ["caf\u00e9 and na\u00efve", "\U0001f600 emoji ok",
            "plain ascii", "r\u00e9sum\u00e9"]
    rows = []
    for i, g in enumerate(good[:2]):
        rows.append((i, g.encode("utf-8").decode("latin-1"), g))
    # clean ASCII must pass through untouched
    rows.append((2, "plain ascii", "plain ascii"))
    # genuine Latin-1 text (not mojibake) must NOT be "repaired"
    rows.append((3, "r\u00e9sum\u00e9", "r\u00e9sum\u00e9"))
    # cp1252 flavor (curly quote in the corrupted bytes)
    q = "it\u2019s fine"
    rows.append((4, q.encode("utf-8").decode("cp1252"), q))
    df = spark.createDataFrame([(i, r) for i, r, _ in rows],
                               "i long, t string")
    got = {r.i: r.f for r in df.select(
        "i", fix_mojibake(F.col("t")).alias("f")).collect()}
    for i, _, want in rows:
        assert got[i] == want, (i, ascii(got[i]), ascii(want))
    nul = spark.createDataFrame([(None,)], "t string").select(
        fix_mojibake(F.col("t")).alias("f")).collect()[0]
    assert nul.f is None


def _np_knn(vecs, ids, k):
    import numpy as np
    M = np.asarray(vecs, dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    want = {}
    for i, pid in enumerate(ids):
        cand = [(-S[i, j], ids[j]) for j in range(len(ids)) if j != i]
        cand.sort()
        want[pid] = [(r + 1, nid, -negs)
                     for r, (negs, nid) in enumerate(cand[:k])]
    return want


def test_knn_graph_unblocked_matches_numpy(spark):
    from detanalysis_spark.llm.similarity import knn_graph
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(12, 8)).tolist()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>").repartition(4)
    got = {}
    for r in knn_graph(df, k=3).collect():
        got.setdefault(r.id, []).append((r["rank"], r.neighbor_id,
                                         r.cosine))
    want = _np_knn(vecs, list(range(12)), 3)
    assert set(got) == set(want)
    for pid in want:
        got[pid].sort()
        for (gr, gn, gc), (wr, wn, wc) in zip(got[pid], want[pid]):
            assert (gr, gn) == (wr, wn)
            assert abs(gc - wc) < 1e-9


def test_knn_graph_blocked_matches_per_block_numpy(spark):
    from detanalysis_spark.llm.similarity import knn_graph
    rng = np.random.default_rng(11)
    rows, want = [], {}
    for blk in range(3):
        vecs = rng.normal(size=(6, 5)).tolist()
        ids = [blk * 100 + i for i in range(6)]
        rows += [(i, v, blk) for i, v in zip(ids, vecs)]
        want.update(_np_knn(vecs, ids, 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cell int") \
        .repartition(5)
    got = {}
    for r in knn_graph(df, k=2, block_col="cell").collect():
        got.setdefault(r.id, []).append((r["rank"], r.neighbor_id))
    assert set(got) == set(want)
    for pid in want:
        assert sorted(got[pid]) == [(r, n) for r, n, _ in want[pid]]
    # no edge crosses a block
    for pid, nbrs in got.items():
        assert all(pid // 100 == n // 100 for _, n in nbrs)


def test_knn_graph_k_exceeds_block_and_singleton(spark):
    from detanalysis_spark.llm.similarity import knn_graph
    rows = [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0),
            (2, [0.0, 1.0], 1)]                     # block 1 singleton
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cell int")
    got = {(r.id, r["rank"], r.neighbor_id)
           for r in knn_graph(df, k=5, block_col="cell").collect()}
    assert got == {(0, 1, 1), (1, 1, 0)}   # singleton emits nothing


def test_knn_graph_null_vectors_dropped_and_guards(spark):
    from detanalysis_spark.llm.similarity import knn_graph
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [0.5, 0.5])],
        "vec_id long, embedding array<double>")
    got = {r.id for r in knn_graph(df, k=1).collect()}
    assert got == {0, 2}
    with pytest.raises(ValueError):
        knn_graph(df, k=0)


def test_jaccard_prefix_filter_equals_full_index(spark):
    """PPJoin prefix filtering is LOSSLESS: identical pairs and scores
    vs the full-index path at several thresholds, on a corpus with
    dups, near-dups, shared boilerplate, and disjoint docs."""
    from detanalysis_spark.llm.dedup import jaccard_index_pairs
    base = "the quick brown fox jumps over the lazy dog sits today"
    boiler = "subscribe to our newsletter for updates and news"
    rows = [(0, base), (1, base),
            (2, base + " with a small extra tail"),
            (3, boiler + " plus article one content here"),
            (4, boiler + " plus article two content there"),
            (5, "completely different words about spark and shuffles"),
            (6, "the quick brown fox jumps over the lazy dog naps")]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(3)
    for t in (0.3, 0.5, 0.8):
        full = {(r.id_a, r.id_b): r.jaccard for r in
                jaccard_index_pairs(df, threshold=t).collect()}
        pre = {(r.id_a, r.id_b): r.jaccard for r in
               jaccard_index_pairs(df, threshold=t,
                                   prefix_filter=True).collect()}
        assert set(pre) == set(full), f"t={t}"
        for k in full:
            assert abs(pre[k] - full[k]) < 1e-12


def test_jaccard_prefix_filter_indexes_fewer_postings(spark):
    """The prefix plan really does index less: count candidate-join
    input rows via the prefix rule replayed in python."""
    from detanalysis_spark.llm.dedup import jaccard_index_pairs
    import math
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(20)) +
             " shared tail words here") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # 23 tokens -> 21 trigrams; at t=0.8 prefix is 21-17+1 = 5 grams
    out = jaccard_index_pairs(df, threshold=0.8,
                              prefix_filter=True).collect()
    assert out == []               # no pair reaches 0.8
    sz = 21
    assert sz - math.ceil(0.8 * sz) + 1 == 5
    with pytest.raises(ValueError):
        jaccard_index_pairs(df, threshold=0.0, prefix_filter=True)


def test_script_counts_match_python(spark):
    import re
    from detanalysis_spark.llm.text import SCRIPT_CLASSES, script_counts
    rows = [(0, "Hello world"),                       # latin
            (1, "Привет мир hello"),                  # cyrillic + latin
            (2, "你好世界 こんにちは 안녕"),              # han+kana+hangul
            (3, "Γειά σου Κόσμε"),                    # greek
            (4, "مرحبا بالعالم"),                     # arabic
            (5, "שלום עולם"),                         # hebrew
            (6, "1234 5678"), (7, "")]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {r.i: r.sc.asDict() for r in
           df.select("i", script_counts(F.col("t")).alias("sc"))
             .collect()}
    # python replay with the re module's \u ranges
    py_cls = {k: v.replace("\\x{", "\\u{").replace("}", "}")
              for k, v in SCRIPT_CLASSES.items()}

    def py_count(t, cls):
        # convert \x{ABCD} to python \uABCD
        pat = re.sub(r"\\x\{([0-9A-Fa-f]+)\}",
                     lambda m: chr(int(m.group(1), 16)), cls)
        return len(re.findall(pat, t))

    for i, t in rows:
        for name, cls in SCRIPT_CLASSES.items():
            assert got[i][name] == py_count(t, cls), (i, name)
        assert got[i]["total"] == len(t)


def test_dominant_script_and_unknown(spark):
    from detanalysis_spark.llm.text import dominant_script
    rows = [(0, "Hello big world of text"),
            (1, "Привет мир и еще текст здесь"),
            (2, "你好世界你好世界你好"),
            (3, "1234 5678 ---"),                # no letters: unknown
            (4, "Прив hello"),                   # 4 cyr vs 5 latin
            (5, "")]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {r.i: r.s for r in
           df.select("i", dominant_script(F.col("t")).alias("s"))
             .collect()}
    assert got[0] == "latin"
    assert got[1] == "cyrillic"
    assert got[2] == "cjk"
    assert got[3] == "unknown"
    assert got[4] == "latin"
    assert got[5] == "unknown"


def test_luhn_valid_known_vectors(spark):
    from detanalysis_spark.llm.cleaning import luhn_valid
    rows = [("4111111111111111", True),     # classic valid test PAN
            ("4111111111111112", False),    # checksum off by one
            ("5500005555555559", True),
            ("378282246310005", True),      # 15-digit amex shape
            ("1234567890123", False),
            ("79927398713", False)]         # valid Luhn but < 13 digits
    df = spark.createDataFrame(rows, ["d", "want"])
    got = df.select("d", "want",
                    luhn_valid(F.col("d")).alias("ok")).collect()
    for r in got:
        assert r.ok == r.want, r.d


def test_credit_card_count_formats_and_false_positives(spark):
    from detanalysis_spark.llm.cleaning import credit_card_count
    rows = [
        (0, "pay with 4111111111111111 now", 1),
        (1, "pay with 4111-1111-1111-1111 now", 1),
        (2, "pay with 4111 1111 1111 1111 now", 1),
        (3, "fake 4111111111111112 number", 0),     # fails Luhn
        (4, "ts 20260816013000123 id 99999", 0),    # digit noise
        (5, "two: 4111111111111111 and 5500005555555559", 2),
        (6, "", 0)]
    df = spark.createDataFrame(rows, ["i", "t", "want"])
    got = df.select("i", "want",
                    credit_card_count(F.col("t")).alias("n")).collect()
    for r in got:
        assert r.n == r.want, r.i


def test_sorted_neighborhood_pairs_matches_window_replay(spark):
    from detanalysis_spark.llm.dedup import sorted_neighborhood_pairs
    rows = [(i, k) for i, k in
            [(0, "alpha"), (1, "alpah"), (2, "beta"), (3, "betta"),
             (4, "gamma"), (5, "alpha"), (6, "zeta"), (7, None)]]
    df = spark.createDataFrame(rows, ["rid", "key"]).repartition(4)
    for w in (2, 3, 4):
        got = {(r.id_a, r.id_b, r.rank_gap) for r in
               sorted_neighborhood_pairs(df, "rid", "key",
                                         window=w).collect()}
        # python replay: sort by (key, id), pairs within w-1 positions
        order = sorted((k, i) for i, k in rows if k is not None)
        want = {(order[a][1], order[b][1], b - a)
                for a in range(len(order))
                for b in range(a + 1, min(a + w, len(order)))}
        assert got == want, f"w={w}"


def test_sorted_neighborhood_catches_cross_bucket_typos(spark):
    """The pair (alpah, alpha) sorts adjacent though equality/hash
    blocking would separate them — the method's point."""
    from detanalysis_spark.llm.dedup import sorted_neighborhood_pairs
    df = spark.createDataFrame(
        [(0, "alpha"), (1, "alpah"), (2, "omega")], ["rid", "key"])
    got = {(r.key_a, r.key_b) for r in
           sorted_neighborhood_pairs(df, "rid", "key",
                                     window=2).collect()}
    assert ("alpah", "alpha") in got
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "rid", "key", window=1)


def test_zipf_fit_on_planted_power_law(spark):
    """A corpus constructed with freq(rank) = round(C/rank) must fit
    slope ≈ -1 with high R²; numpy replays the regression exactly."""
    import math
    from detanalysis_spark.llm.text import zipf_fit
    C = 600
    words = []
    for r in range(1, 41):
        words += [f"w{r:02d}"] * max(1, round(C / r))
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], ["text"])
    row = zipf_fit(df, max_rank=30).first()
    # python replay: same ranking (freq desc, word asc), same head
    from collections import Counter
    wf = sorted(Counter(words).items(), key=lambda kv: (-kv[1], kv[0]))
    head = wf[:30]
    xs = [math.log(i + 1) for i in range(len(head))]
    ys = [math.log(c) for _, c in head]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    slope = sxy / sxx
    assert row.n_types == 30
    assert abs(row.zipf_slope - slope) < 1e-6
    assert -1.1 < row.zipf_slope < -0.9
    assert row.zipf_r2 > 0.99


def test_zipf_fit_min_count_prunes_tail(spark):
    from detanalysis_spark.llm.text import zipf_fit
    text = "a a a a b b c"     # c is a singleton
    df = spark.createDataFrame([(text,)], ["text"])
    full = zipf_fit(df).first()
    pruned = zipf_fit(df, min_count=2).first()
    assert full.n_types == 3 and pruned.n_types == 2
    assert pruned.n_tokens == 6


def test_ann_recall_floor(spark):
    """Recall/cost contract for the approximate ANN tiers at their
    documented operating points (VERDICT r9 #6): on a Zipf-clustered
    corpus, IVF (64 cells, n_probe=4) and multi-probe LSH (bits=10,
    tables=8, n_flip=2) both hold recall@10 >= 0.9 against brute-force
    exact cosine ground truth. tools/ann_recall.py publishes the full
    recall-vs-cost curve on the 20k corpus."""
    import numpy as np
    from detanalysis_spark.llm.similarity import (IVFIndex,
                                                  RandomHyperplaneLSH,
                                                  cosine_topk)
    rng = np.random.default_rng(7)
    n_clusters, dim, n = 25, 32, 2500
    centers = rng.standard_normal((n_clusters, dim))
    w = 1.0 / np.arange(1, n_clusters + 1) ** 1.2
    sizes = np.maximum((w / w.sum() * n).astype(int), 5)
    rows, vid = [], 0
    for c, s in enumerate(sizes):
        for v in centers[c] + 0.35 * rng.standard_normal((s, dim)):
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()
    probe_ids = [int(i) for i in rng.choice(vid, 60, replace=False)]
    probes = corpus.filter(F.col("vec_id").isin(probe_ids)).cache()

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
        return out

    exact = sets(cosine_topk(corpus, probes, k=10))

    ivf = IVFIndex(n_centroids=64, n_probe=4)
    ivf.fit(corpus, sample_size=n)
    got_ivf = sets(ivf.topk(corpus, probes, k=10))
    rec_ivf = float(np.mean([len(got_ivf.get(p, set()) & e) / len(e)
                             for p, e in exact.items()]))

    lsh = RandomHyperplaneLSH(dim=dim, bits=10, tables=8, seed=11)
    got_lsh = sets(lsh.topk(corpus, probes, k=10, n_flip=2))
    rec_lsh = float(np.mean([len(got_lsh.get(p, set()) & e) / len(e)
                             for p, e in exact.items()]))
    assert rec_ivf >= 0.9, f"IVF recall@10 {rec_ivf} < 0.9"
    assert rec_lsh >= 0.9, f"LSH recall@10 {rec_lsh} < 0.9"


def test_ann_on_disk_and_pq_compose_floor(spark, tmp_path):
    """VERDICT r10 #6 (pytest leg): the ON-DISK IVF path
    (write_corpus -> topk_from_corpus) holds the same recall floor as
    the in-memory tier at the documented operating point AND its scan
    carries a PartitionFilters entry on ivf_cell (pruning evidence);
    the IVF->PQ-ADC compose (cell-pruned coded read, asymmetric
    distance) holds a lossy-tier floor. The one-decade-up recall/wall
    curve lives in ANN_RECALL.json (tools/ann_recall.py --n-big)."""
    import re

    import numpy as np
    from detanalysis_spark.llm.similarity import (IVFIndex, PQCodebook,
                                                  cosine_topk)
    rng = np.random.default_rng(7)
    n_clusters, dim, n = 25, 32, 2500
    centers = rng.standard_normal((n_clusters, dim))
    w = 1.0 / np.arange(1, n_clusters + 1) ** 1.2
    sizes = np.maximum((w / w.sum() * n).astype(int), 5)
    pts = np.concatenate([
        centers[c] + 0.35 * rng.standard_normal((s, dim))
        for c, s in enumerate(sizes)])
    import pandas as pd
    corpus = spark.createDataFrame(pd.DataFrame(
        {"vec_id": np.arange(len(pts), dtype=np.int64),
         "embedding": list(pts)})).cache()
    probe_ids = [int(i) for i in rng.choice(len(pts), 60, replace=False)]
    probes = corpus.filter(F.col("vec_id").isin(probe_ids)).cache()

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
        return out

    exact = sets(cosine_topk(corpus, probes, k=10))

    ivf = IVFIndex(n_centroids=64, n_probe=4)
    ivf.fit(corpus, sample_size=n)
    disk = str(tmp_path / "ivf_disk")
    ivf.write_corpus(corpus, disk, mode="overwrite")
    res = ivf.topk_from_corpus(spark, disk, probes, k=10)
    got = sets(res)
    rec = float(np.mean([len(got.get(p, set()) & e) / len(e)
                         for p, e in exact.items()]))
    assert rec >= 0.9, f"on-disk IVF recall@10 {rec} < 0.9"
    plan = res._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert re.search(r"PartitionFilters: \[[^\]]*ivf_cell", plan), \
        "on-disk IVF scan lost its ivf_cell partition filter"

    # IVF->PQ-ADC+rerank compose, end to end through the library
    # operator: coded corpus persists cell-partitioned, candidates
    # read through the same pruned scan, ADC builds a shortlist over
    # m-byte codes, exact cosine re-ranks the shortlist's true vectors
    # via a distributed id-keyed join (pure ADC ranking tops out ~0.55
    # recall@10 at m=8 on a dense corpus)
    from detanalysis_spark.llm.similarity import (ivf_pq_topk_from_corpus,
                                                  write_pq_corpus)
    pq = PQCodebook(m=8, k=256, seed=13).fit(corpus, sample_size=n)
    coded_disk = str(tmp_path / "ivf_pq_disk")
    write_pq_corpus(corpus, ivf, pq, coded_disk)
    res_pq = ivf_pq_topk_from_corpus(
        spark, ivf, pq, coded_disk, disk, probes, k=10, shortlist=50)
    got_pq = sets(res_pq)
    rec_pq = float(np.mean([len(got_pq.get(p, set()) & e) / len(e)
                            for p, e in exact.items()]))
    assert rec_pq >= 0.9, \
        f"IVF->PQ-ADC+rerank recall@10 {rec_pq} < 0.9"
    # same output contract as cosine_topk: ranks are 1..k, sims sorted
    one = res_pq.filter(F.col("probe_id") == probe_ids[0]) \
        .orderBy("rank").collect()
    assert [r["rank"] for r in one] == list(range(1, len(one) + 1))
    sims = [r["sim"] for r in one]
    assert sims == sorted(sims, reverse=True)


def test_lsh_index_persist_append_probe(spark, tmp_path):
    """Persisted on-disk LSH index (round 12): write + incremental
    append, probe equals the in-memory cross-corpus screen on the same
    pinned family, exact duplicates are always caught, and a
    band-subset probe is partition-pruned and a candidate subset."""
    from detanalysis_spark.llm.dedup import (
        append_lsh_index, lsh_candidate_pairs_between, lsh_index_probe,
        minhash_signatures, read_lsh_meta, write_lsh_index)

    base = ("the quick brown fox jumps over the lazy dog token%d "
            "filler words keep shingles overlapping")
    corpus = spark.createDataFrame(
        [(i, base % i) for i in range(100, 140)],
        "doc_id long, text string")
    # probe i is an EXACT copy of corpus doc i+100's text
    probes = spark.createDataFrame(
        [(i, base % (i + 100)) for i in range(10)],
        "doc_id long, text string")

    path = str(tmp_path / "lshidx")
    write_lsh_index(corpus.filter("doc_id < 120"), path,
                    num_hashes=32, bands=8)
    append_lsh_index(spark, path, corpus.filter("doc_id >= 120"))
    meta = read_lsh_meta(spark, path)
    assert (meta.num_hashes, meta.bands,
            meta.rows_per_band, meta.shingle_n) == (32, 8, 4, 3)

    got = lsh_index_probe(spark, path, probes)
    pairs = {(r.probe_id, r.corpus_id) for r in got.collect()}
    # equality vs the in-memory cross screen on identical signatures
    a = minhash_signatures(probes, "text", 32, 3)
    b = minhash_signatures(corpus, "text", 32, 3)
    want = {(r.id_a, r.id_b) for r in lsh_candidate_pairs_between(
        a, b, "doc_id", bands=8, rows_per_band=4).collect()}
    assert pairs == want
    for i in range(10):              # exact dups collide in every band
        assert (i, i + 100) in pairs

    # band-subset probe: partition-pruned scan, candidate subset, and
    # exact dups still caught (they collide in EVERY band)
    sub = lsh_index_probe(spark, path, probes, n_bands_probe=2)
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "band" in plan.split(
        "PartitionFilters", 1)[1][:300]
    sub_pairs = {(r.probe_id, r.corpus_id) for r in sub.collect()}
    assert sub_pairs <= pairs
    for i in range(10):
        assert (i, i + 100) in sub_pairs

    with pytest.raises(ValueError, match="n_bands_probe"):
        lsh_index_probe(spark, path, probes, n_bands_probe=0)
    with pytest.raises(ValueError, match="exceeds"):
        write_lsh_index(corpus, str(tmp_path / "bad"),
                        num_hashes=8, bands=8, rows_per_band=4)


def test_bpe_save_load_roundtrip(spark, tmp_path):
    """BPE model persistence (round 12): merges round-trip in order,
    the reloaded model tokenizes identically, and the optional vocab
    table survives (or is None when not saved)."""
    from detanalysis_spark.llm.text import (bpe_segment_udf, load_bpe,
                                            save_bpe, train_bpe)

    docs = spark.createDataFrame(
        [(i, "low lower lowest newer newest wider widest low low")
         for i in range(6)], ["doc_id", "text"])
    merges, vocab = train_bpe(docs, num_merges=12, min_freq=2)
    assert merges

    path = str(tmp_path / "bpe_model")
    save_bpe(spark, merges, path, vocab=vocab)
    got_merges, got_vocab = load_bpe(spark, path)
    assert got_merges == merges
    assert got_vocab is not None
    assert (sorted((r.symbol, r.freq) for r in got_vocab.collect())
            == sorted((r.symbol, r.freq) for r in vocab.collect()))

    seg_a = bpe_segment_udf(merges)
    seg_b = bpe_segment_udf(got_merges)
    out = docs.select(seg_a(F.col("text")).alias("a"),
                      seg_b(F.col("text")).alias("b")).collect()
    for r in out:
        assert r.a == r.b

    # vocab-less artifact loads with vocab=None
    path2 = str(tmp_path / "bpe_model2")
    save_bpe(spark, merges, path2)
    m2, v2 = load_bpe(spark, path2)
    assert m2 == merges and v2 is None


def test_update_near_dup_clusters_equals_full_cc(spark):
    """Incremental CC maintenance (round 12): folding a batch's pairs
    into an existing clustering via the super-node reduction must land
    exactly where a from-scratch CC over the union lands — including
    cluster MERGES bridged by a new doc, label changes from a
    smaller-id newcomer, previously-unassigned old docs, and
    singletons."""
    from detanalysis_spark.llm.dedup import (near_dup_clusters,
                                             update_near_dup_clusters)

    # old graph: {1,2,3} (min 1), {10,11} (min 10); 20 is an old
    # singleton with no edges (absent from assignments)
    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    base = near_dup_clusters(old_pairs)

    # new batch: 30 bridges the two old clusters; 31-32 form their own
    # cluster; 0 (smaller than every old id) joins {10,11} and must
    # relabel it; 33 attaches to the unassigned old doc 20
    new_pairs = spark.createDataFrame(
        [(30, 3), (30, 10), (31, 32), (0, 11), (33, 20)],
        "id_a long, id_b long")
    new_ids = spark.createDataFrame(
        [(0,), (30,), (31,), (32,), (33,), (40,)], "id long")

    got = {(r.id, r.cluster_id) for r in
           update_near_dup_clusters(base, new_pairs,
                                    new_ids=new_ids).collect()}
    want = {(r.id, r.cluster_id) for r in
            near_dup_clusters(old_pairs.unionByName(new_pairs))
            .collect()}
    want.add((40, 40))                      # pairless singleton
    assert got == want
    # spot-check semantics: everything connected collapses to min 0
    by_id = dict(got)
    for i in (0, 1, 2, 3, 10, 11, 30):
        assert by_id[i] == 0
    assert by_id[31] == 31 and by_id[32] == 31
    assert by_id[33] == 20 and by_id[20] == 20
    assert by_id[40] == 40

    # no-op batches: pairs entirely inside one existing cluster (the
    # reduced graph is empty) and a fully empty batch both leave the
    # clustering unchanged
    base2 = {(r.id, r.cluster_id) for r in base.collect()}
    within = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    assert {(r.id, r.cluster_id) for r in
            update_near_dup_clusters(base, within).collect()} == base2
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert {(r.id, r.cluster_id) for r in
            update_near_dup_clusters(base, empty).collect()} == base2


def test_semantic_contamination_hits_and_decontaminate(spark):
    """Cross-frame semantic contamination screen (round 12): hits are
    exactly the numpy cross-cosine pairs >= t with NO id-ordering mask
    (unrelated id spaces), NULL embeddings never match, an empty
    benchmark flags nothing, and decontaminate drops exactly the
    flagged rows."""
    from detanalysis_spark.llm.similarity import (
        semantic_contamination_hits, semantic_decontaminate)

    rng = np.random.default_rng(3)
    bvecs = rng.standard_normal((4, 8))
    cvecs = np.vstack([bvecs[0] * 2.0,           # cos 1.0 with bench 0
                       -bvecs[1],                # cos -1 with bench 1
                       rng.standard_normal((3, 8))])
    # corpus ids DELIBERATELY smaller than bench ids: an id_a < id_b
    # mask would wrongly drop every hit
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(cvecs)]
        + [(99, None)],
        "vec_id long, embedding array<double>")
    bench = spark.createDataFrame(
        [(100 + i, [float(x) for x in v]) for i, v in enumerate(bvecs)],
        "vec_id long, embedding array<double>")

    hits = semantic_contamination_hits(corpus, bench, 0.9)
    got = {(r.corpus_id, r.bench_id): r.cosine for r in hits.collect()}

    def unit(v):
        return v / np.linalg.norm(v)
    want = {}
    for ci, cv in enumerate(cvecs):
        for bi, bv in enumerate(bvecs):
            cos = float(unit(cv) @ unit(bv))
            if cos >= 0.9:
                want[(ci, 100 + bi)] = cos
    assert set(got) == set(want) and (0, 100) in got
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)

    surv = semantic_decontaminate(corpus, hits, id_col="vec_id")
    kept = sorted(r.vec_id for r in surv.collect())
    flagged = {c for c, _ in got}
    assert kept == [i for i in list(range(5)) + [99] if i not in flagged]

    # empty benchmark: no hits, corpus unchanged
    none = semantic_contamination_hits(
        corpus, bench.filter("vec_id < 0"), 0.1)
    assert none.count() == 0
    assert semantic_decontaminate(corpus, none,
                                  id_col="vec_id").count() == 6
