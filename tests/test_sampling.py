"""Sampling/downsampling operators and the Horner polynomial helper."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from detanalysis_spark.operators import (every_nth, log_downsample,
                                         log_spaced_indices, polyval,
                                         random_choice)


def test_random_choice_exact_n_and_seeded(spark):
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    cut = F.col("id") % 2 == 0
    a = sorted(r.id for r in random_choice(df, 10, cut, seed=7).collect())
    b = sorted(r.id for r in random_choice(df, 10, cut, seed=7).collect())
    assert a == b and len(a) == 10
    assert all(i % 2 == 0 for i in a)
    fails = random_choice(df, 5, cut, invert=True).collect()
    assert all(r.id % 2 == 1 for r in fails)


def test_every_nth(spark):
    df = spark.range(50).withColumnRenamed("id", "event_id")
    assert sorted(r.event_id for r in
                  every_nth(df, "event_id", 20).collect()) == [0, 20, 40]


def test_log_spaced_indices():
    idx = log_spaced_indices(100, points=200)          # n <= points → all
    np.testing.assert_array_equal(idx, np.arange(100))
    idx = log_spaced_indices(1_000_000, points=100)
    assert idx[0] == 0 and idx[-1] == 999_999
    assert len(idx) <= 101
    assert np.all(np.diff(idx) > 0)                    # strictly increasing
    xs = np.arange(1_000_000.0)
    x2, y2 = log_downsample(xs, xs * 2, points=100)
    np.testing.assert_array_equal(y2, x2 * 2)


def test_polyval_matches_numpy(spark):
    coeffs = [1.5, -2.0, 0.5, 0.25]                    # low → high order
    df = spark.range(50).select((F.col("id") / 10.0 - 2.0).alias("x"))
    got = [r.y for r in df.select(
        polyval(coeffs, "x").alias("y")).collect()]
    xs = np.array([r.x for r in df.collect()])
    want = np.polyval(coeffs[::-1], xs)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_sessionize_gap_rule(spark):
    from detanalysis_spark.operators.sampling import sessionize
    rows = [("u1", 0), ("u1", 100), ("u1", 2000), ("u1", 2050),
            ("u2", 10), ("u2", 5000)]
    df = spark.createDataFrame(rows, ["k", "t"])
    got = {(r.k, r.t): r.session_id
           for r in sessionize(df, "k", "t", gap=500).collect()}
    assert got[("u1", 0)] == 1 and got[("u1", 100)] == 1
    assert got[("u1", 2000)] == 2 and got[("u1", 2050)] == 2
    assert got[("u2", 10)] == 1 and got[("u2", 5000)] == 2


def test_cap_per_key_deterministic(spark):
    from detanalysis_spark.operators.sampling import cap_per_key

    df = spark.createDataFrame(
        [(k, i) for k in ("a", "b") for i in range(10)] + [("c", 0)],
        "key string, v long")
    out = cap_per_key(df, ["key"], 3, "v")
    got = sorted((r["key"], r["v"]) for r in out.collect())
    assert got == [("a", 0), ("a", 1), ("a", 2),
                   ("b", 0), ("b", 1), ("b", 2), ("c", 0)]
    with pytest.raises(ValueError):
        cap_per_key(df, ["key"], 0, "v")


def test_assign_batches_matches_python_oracle(spark):
    import hashlib

    from detanalysis_spark.operators.sampling import (assign_batches,
                                                      deterministic_shuffle)

    n, seed, bs = 103, 11, 16
    df = spark.createDataFrame([(i, i * 2) for i in range(n)],
                               "doc_id long, v long").repartition(7)
    got = {r.doc_id: (r.shuffle_rank, r.batch)
           for r in assign_batches(df, "doc_id", bs, seed=seed).collect()}
    order = sorted(range(n), key=lambda i: hashlib.md5(
        f"{seed}:{i}".encode()).hexdigest())
    for rk, i in enumerate(order):
        assert got[i] == (rk, rk // bs), (i, rk, got[i])
    # seeded shuffle is reproducible and a permutation
    a = [r.doc_id for r in deterministic_shuffle(df, "doc_id", seed=3)
         .toLocalIterator()]
    b = [r.doc_id for r in deterministic_shuffle(df, "doc_id", seed=3)
         .toLocalIterator()]
    assert a == b and sorted(a) == list(range(n))
    with pytest.raises(ValueError):
        assign_batches(df, "doc_id", 0)


def test_assign_split_deterministic_partition(spark):
    from detanalysis_spark.operators.sampling import assign_split
    df = spark.createDataFrame([(i,) for i in range(3000)], ["id"])
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["id"]: r["split"] for r in assign_split(df, "id", fr, seed=1).collect()}
    # stable under repartitioning and re-runs
    b = {r["id"]: r["split"]
         for r in assign_split(df.repartition(13), "id", fr, seed=1).collect()}
    assert a == b
    # partition: every row gets exactly one split, fractions ~honored
    from collections import Counter
    c = Counter(a.values())
    assert sum(c.values()) == 3000 and set(c) == set(fr)
    assert abs(c["train"] / 3000 - 0.8) < 0.03
    assert abs(c["val"] / 3000 - 0.1) < 0.02
    # different seed reshuffles membership
    d = {r["id"]: r["split"] for r in assign_split(df, "id", fr, seed=2).collect()}
    assert d != a

    import pytest as _pt
    with _pt.raises(ValueError):
        assign_split(df, "id", {"a": 0.5, "b": 0.6})


def test_assign_split_zero_and_full_fractions(spark):
    from detanalysis_spark.operators.sampling import assign_split
    from collections import Counter
    df = spark.createDataFrame([(i,) for i in range(1000)], ["id"])
    # trailing zero fraction must receive NO rows (regression: the
    # cum=1.0 threshold used to render 9 hex chars and send ~15/16 of
    # keys to the zero bucket)
    c = Counter(r["split"] for r in
                assign_split(df, "id", {"train": 1.0, "holdout": 0.0},
                             seed=1).collect())
    assert c == {"train": 1000}
    c = Counter(r["split"] for r in
                assign_split(df, "id", {"a": 0.5, "b": 0.5, "z": 0.0},
                             seed=2).collect())
    assert c["z"] == 0 and c["a"] + c["b"] == 1000


def test_weighted_sample_matches_aes_replay(spark):
    """A-ES weighted sampling: inclusion equals a python replay of the
    key formula (seeded md5 uniform, ln(u)/w, top-n); non-positive and
    null weights are excluded; result is partition-invariant."""
    import hashlib
    import math
    from detanalysis_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(200)]
    rows += [(200, 0.0), (201, -3.0), (202, None)]   # excluded
    df = spark.createDataFrame(rows, "id long, w double")

    def key(i, w, seed=11):
        v = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16)
        u = (v + 1) / 16 ** 15
        return math.log(u) / w

    want = sorted((i for i, w in rows if w and w > 0),
                  key=lambda i: -key(i, dict(rows)[i]))[:25]
    got = sorted(r.id for r in
                 weighted_sample(df, "id", "w", 25, seed=11).collect())
    assert got == sorted(want)
    got2 = sorted(r.id for r in weighted_sample(
        df.repartition(7), "id", "w", 25, seed=11).collect())
    assert got2 == got

    # heavier rows are sampled more often: compare inclusion counts of
    # the heaviest vs lightest weight class over several seeds
    heavy = {i for i, w in rows[:200] if w >= 40}
    light = {i for i, w in rows[:200] if w <= 10}
    h = l = 0
    for s in range(6):
        picked = {r.id for r in
                  weighted_sample(df, "id", "w", 40, seed=s).collect()}
        h += len(picked & heavy)
        l += len(picked & light)
    assert h > l

    with pytest.raises(ValueError, match="n must be"):
        weighted_sample(df, "id", "w", 0)


def test_weighted_sample_per_key_matches_global_rule(spark):
    """Per-group sampling keeps each group's top-n A-ES keys — the
    union of per-group replays of the global formula."""
    import hashlib
    import math
    from detanalysis_spark.operators.sampling import weighted_sample_per_key

    rows = [(i, "g%d" % (i % 3), float(1 + (i * 11) % 40))
            for i in range(90)]
    df = spark.createDataFrame(rows, "id long, src string, w double")

    def key(i, w, seed=5):
        v = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16)
        return math.log((v + 1) / 16 ** 15) / w

    want = set()
    for g in ("g0", "g1", "g2"):
        members = [(i, w) for i, s, w in rows if s == g]
        want |= {i for i, _ in sorted(
            members, key=lambda t: (-key(t[0], t[1]), t[0]))[:7]}
    got = {r.id for r in weighted_sample_per_key(
        df, "src", "id", "w", 7, seed=5).collect()}
    assert got == want
    # groups smaller than n return everything
    small = spark.createDataFrame([(1, "x", 2.0)], "id long, src string, w double")
    assert weighted_sample_per_key(small, "src", "id", "w", 5).count() == 1


def test_exact_stratified_sample(spark):
    import hashlib
    from detanalysis_spark.operators.sampling import exact_stratified_sample
    rows = [(i, "big" if i % 5 else "small") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = exact_stratified_sample(df, "lang", 10, "doc_id", seed=3)
    by = {}
    for r in got.collect():
        by.setdefault(r.lang, []).append(r.doc_id)
    assert len(by["big"]) == 10 and len(by["small"]) == 10   # EXACT n
    # python replay of the inclusion rule: first 10 by md5('3:<id>')
    def key(i):
        return hashlib.md5(f"3:{i}".encode()).hexdigest()
    for lang in ("big", "small"):
        ids = [i for i, l in rows if l == lang]
        want = sorted(sorted(ids, key=lambda i: (key(i), i))[:10])
        assert sorted(by[lang]) == want
    # small strata return whole; determinism across calls
    tiny = df.filter("doc_id < 7")
    assert exact_stratified_sample(tiny, "lang", 10, "doc_id").count() == 7
    again = {r.doc_id for r in exact_stratified_sample(
        df, "lang", 10, "doc_id", seed=3).collect()}
    assert again == set(by["big"]) | set(by["small"])
