"""Mergeable sketch layer: theta/HLL distinct, KLL quantiles, the
split-overlap audit, and sketch columns through the rollup
build/merge/update/finalize lifecycle."""

import math

import pytest
from pyspark.sql import functions as F

from detanalysis_spark.operators import (
    build_rollup, merge_rollups, finalize_rollup, update_rollup,
    read_rollup, sketch_distinct, split_overlap_audit,
)


@pytest.fixture(scope="module")
def frame(spark):
    # 30 daily buckets, 137 users cycling, overlapping splits
    return (spark.range(2000).selectExpr(
        "timestamp_micros(CAST(id*43200000000 % (30*86400000000) AS LONG)) AS ts",
        "id % 137 AS user_id",
        "CAST(id % 9 AS DOUBLE) AS value",
        "CAST(id % 3 AS INT) AS split",
        "id"))


def test_sketch_distinct_exact_below_nominal(spark, frame):
    got = {r["split"]: r["n_distinct_est"]
           for r in sketch_distinct(frame, "user_id", by="split").collect()}
    want = {r["split"]: r["n"]
            for r in frame.groupBy("split")
            .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got == want


def test_sketch_distinct_hll_kind(spark, frame):
    got = sketch_distinct(frame, "user_id", kind="hll").collect()[0]
    assert got["n_distinct_est"] == 137
    with pytest.raises(ValueError):
        sketch_distinct(frame, "user_id", kind="bogus")


def test_split_overlap_audit_matches_exact_sets(spark, frame):
    rows = frame.select("split", "user_id").collect()
    sets = {}
    for r in rows:
        sets.setdefault(r["split"], set()).add(r["user_id"])
    for r in split_overlap_audit(frame, "split", "user_id").collect():
        a, b = sets[r["split_a"]], sets[r["split_b"]]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["n_intersection"] == len(a & b)
        assert r["n_union"] == len(a | b)
        assert r["n_only_a"] == len(a - b)
        assert r["n_only_b"] == len(b - a)
        assert r["jaccard"] == pytest.approx(len(a & b) / len(a | b))


def test_theta_estimate_tolerance_past_exact_range(spark):
    # 50k distinct > nominal 4096: sampling regime, ~1/sqrt(4096) rse
    df = spark.range(50_000)
    est = df.agg(F.theta_sketch_estimate(
        F.theta_sketch_agg("id")).alias("e")).collect()[0]["e"]
    assert est == pytest.approx(50_000, rel=0.05)


def test_kll_quantile_inclusive_rank_rule(spark):
    # 1..10: value at 1-indexed position ceil(q*n)
    df = spark.range(1, 11).selectExpr("CAST(id AS DOUBLE) v")
    for q, want in ((0.25, 3.0), (0.5, 5.0), (0.75, 8.0), (1.0, 10.0)):
        got = df.agg(F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("v", F.lit(2048)),
            F.lit(q)).alias("q")).collect()[0]["q"]
        assert got == want, q
        assert want == float(math.ceil(q * 10))


def test_rollup_sketch_merge_of_halves_equals_whole(spark, frame):
    kw = dict(distinct_cols=["user_id"], quantile_cols=["value"])
    halves = [build_rollup(frame.filter(f"id % 2 = {i}"), "ts", "value",
                           **kw) for i in (0, 1)]
    merged = finalize_rollup(merge_rollups(*halves),
                             quantiles=(0.25, 0.5))
    whole = finalize_rollup(build_rollup(frame, "ts", "value", **kw),
                            quantiles=(0.25, 0.5))
    cols = ("n", "user_id_n_distinct", "value_p25", "value_p50")
    a = {r["bucket_us"]: tuple(r[c] for c in cols)
         for r in merged.collect()}
    b = {r["bucket_us"]: tuple(r[c] for c in cols)
         for r in whole.collect()}
    assert a == b and len(a) == 30


def test_rollup_sketch_estimates_match_exact_groupby(spark, frame):
    fin = finalize_rollup(
        build_rollup(frame, "ts", "value", distinct_cols=["user_id"]))
    got = {r["bucket_us"]: r["user_id_n_distinct"]
           for r in fin.collect()}
    day = F.unix_micros(F.col("ts")) - F.pmod(
        F.unix_micros(F.col("ts")), F.lit(86_400_000_000))
    want = {r["bucket_us"]: r["nd"] for r in
            frame.groupBy(day.alias("bucket_us"))
            .agg(F.countDistinct("user_id").alias("nd")).collect()}
    assert got == want


def test_update_rollup_persists_and_merges_sketches(spark, frame,
                                                    tmp_path):
    path = str(tmp_path / "roll")
    kw = dict(distinct_cols=["user_id"])
    update_rollup(path, build_rollup(
        frame.filter("id % 2 = 0"), "ts", "value", **kw))
    update_rollup(path, build_rollup(
        frame.filter("id % 2 = 1"), "ts", "value", **kw))
    got = {r["bucket_us"]: (r["n"], r["user_id_n_distinct"])
           for r in finalize_rollup(read_rollup(spark, path)).collect()}
    want = {r["bucket_us"]: (r["n"], r["user_id_n_distinct"])
            for r in finalize_rollup(build_rollup(
                frame, "ts", "value", **kw)).collect()}
    assert got == want


def test_heavy_hitters_exact_vs_full_groupby(spark):
    """Two-pass MG + recount == exact groupBy-count filter, on a
    skewed planted stream split across many partitions."""
    from detanalysis_spark.operators.sketches import heavy_hitters
    rows = (["hot"] * 400 + ["warm"] * 120 +
            [f"tail{i}" for i in range(480)])
    df = spark.createDataFrame([(v,) for v in rows], ["tok"]) \
              .repartition(16)
    phi = 0.05                      # threshold: > 50 of 1000
    got = {r.tok: (r["count"], r.freq)
           for r in heavy_hitters(df, "tok", phi).collect()}
    assert set(got) == {"hot", "warm"}
    assert got["hot"][0] == 400 and got["warm"][0] == 120
    assert abs(got["hot"][1] - 0.4) < 1e-12


def test_heavy_hitters_threshold_is_strict(spark):
    from detanalysis_spark.operators.sketches import heavy_hitters
    # "edge" hits exactly phi*N: strictly-greater must exclude it
    rows = ["edge"] * 10 + [f"t{i}" for i in range(90)]
    df = spark.createDataFrame([(v,) for v in rows], ["tok"])
    got = {r.tok for r in heavy_hitters(df, "tok", 0.10).collect()}
    assert got == set()
    got2 = {r.tok for r in heavy_hitters(df, "tok", 0.099).collect()}
    assert got2 == {"edge"}


def test_heavy_hitters_no_false_negatives_tiny_capacity(spark):
    """Adversarial: capacity far below the distinct count and the
    heavy item scattered across partitions — MG union must still
    surface it (the N/(k+1) undercount bound)."""
    from detanalysis_spark.operators.sketches import heavy_hitters
    rows = ["needle"] * 300 + [f"noise{i % 700}" for i in range(700)]
    df = spark.createDataFrame([(v,) for v in rows], ["tok"]) \
              .repartition(32)
    got = {r.tok: r["count"] for r in
           heavy_hitters(df, "tok", 0.25, capacity=4,
                         strategy="mg").collect()}
    assert got == {"needle": 300}


def test_heavy_hitters_strategies_agree(spark):
    """naive / mg / auto are three physical plans for the same exact
    result; auto picks naive below the distinct threshold and mg
    above it."""
    from detanalysis_spark.operators.sketches import heavy_hitters
    rows = (["hot"] * 300 + ["warm"] * 90 +
            [f"tail{i % 400}" for i in range(610)])
    df = spark.createDataFrame([(v,) for v in rows], ["tok"]) \
              .repartition(8)
    outs = []
    for strat in ("naive", "mg", "auto"):
        outs.append(sorted(
            (r.tok, r["count"], round(r.freq, 12)) for r in
            heavy_hitters(df, "tok", 0.05, strategy=strat).collect()))
    assert outs[0] == outs[1] == outs[2]
    assert {t for t, _, _ in outs[0]} == {"hot", "warm"}
    # auto with a threshold of 0 distinct must route to mg and still
    # produce the identical result
    forced_mg = sorted(
        (r.tok, r["count"], round(r.freq, 12)) for r in
        heavy_hitters(df, "tok", 0.05, strategy="auto",
                      naive_distinct_threshold=0).collect())
    assert forced_mg == outs[0]
    import pytest as _pt
    with _pt.raises(ValueError, match="strategy"):
        heavy_hitters(df, "tok", 0.05, strategy="bogus")


def test_heavy_hitters_nulls_and_numeric_column(spark):
    from detanalysis_spark.operators.sketches import heavy_hitters
    rows = [(7,)] * 60 + [(None,)] * 50 + [(i,) for i in range(40)]
    df = spark.createDataFrame(rows, "k: int")
    got = {r.k: r["count"] for r in
           heavy_hitters(df, "k", 0.3).collect()}
    # N = 100 non-null (nulls excluded); 7 appears 60 + 1 (in range(40))
    assert got == {7: 61}


def test_heavy_hitters_rejects_bad_phi(spark):
    from detanalysis_spark.operators.sketches import heavy_hitters
    df = spark.createDataFrame([("a",)], ["tok"])
    with pytest.raises(ValueError):
        heavy_hitters(df, "tok", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "tok", 1.5)


def test_cm_sketch_exact_below_width_and_never_underestimates(spark):
    from detanalysis_spark.operators.sketches import cm_lookup, cm_sketch
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 7 + [(None,)] * 5
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    sk = cm_sketch(df, "k", width=256, depth=4)
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)],
                                   ["k"])
    got = {r.k: r.est_count for r in
           cm_lookup(sk, probes, "k", width=256, depth=4).collect()}
    assert got == {"a": 50, "b": 30, "c": 7, "zzz": 0}
    # forced collisions (width=2): still never underestimates
    sk2 = cm_sketch(df, "k", width=2, depth=2)
    got2 = {r.k: r.est_count for r in
            cm_lookup(sk2, probes, "k", width=2, depth=2).collect()}
    assert got2["a"] >= 50 and got2["b"] >= 30 and got2["c"] >= 7


def test_cm_merge_is_exactly_additive(spark):
    from detanalysis_spark.operators.sketches import (cm_lookup,
                                                      cm_merge,
                                                      cm_sketch)
    rows = [(i, f"v{i % 20}") for i in range(200)]
    df = spark.createDataFrame(rows, ["i", "k"])
    half1 = df.filter("i < 100")
    half2 = df.filter("i >= 100")
    merged = cm_merge(cm_sketch(half1, "k", 64, 3),
                      cm_sketch(half2, "k", 64, 3))
    whole = cm_sketch(df, "k", 64, 3)
    m = {(r.depth, r.bucket): r["count"] for r in merged.collect()}
    w = {(r.depth, r.bucket): r["count"] for r in whole.collect()}
    assert m == w
    probes = df.select("k").distinct()
    gm = {r.k: r.est_count for r in
          cm_lookup(merged, probes, "k", 64, 3).collect()}
    gw = {r.k: r.est_count for r in
          cm_lookup(whole, probes, "k", 64, 3).collect()}
    assert gm == gw


def test_cm_sketch_bounded_rows_and_validation(spark):
    from detanalysis_spark.operators.sketches import cm_sketch
    df = spark.createDataFrame([(str(i),) for i in range(5000)], ["k"])
    sk = cm_sketch(df, "k", width=32, depth=3)
    assert sk.count() <= 32 * 3
    with pytest.raises(ValueError):
        cm_sketch(df, "k", width=0)


def test_cm_sketch_geometry_embedded_and_validated(spark, tmp_path):
    """ADVICE r9: the sketch carries (width, depths) — as schema
    metadata (plan-time validation, zero runtime cost, parquet
    round-trip) and as columns (external readers / runtime fallback).
    cm_lookup derives the geometry when omitted and REJECTS a
    mismatched explicit geometry instead of silently rehashing probes
    into wrong buckets."""
    from detanalysis_spark.operators.sketches import (_cm_geometry,
                                                      cm_lookup,
                                                      cm_merge,
                                                      cm_sketch)
    rows = [("a",)] * 50 + [("b",)] * 30
    df = spark.createDataFrame(rows, ["k"])
    sk = cm_sketch(df, "k", width=128, depth=3)
    assert {"width", "depths"} <= set(sk.columns)
    assert _cm_geometry(sk) == (128, 3)
    probes = spark.createDataFrame([("a",), ("b",)], ["k"])
    # geometry derived from the sketch — no explicit params needed
    got = {r.k: r.est_count for r in
           cm_lookup(sk, probes, "k").collect()}
    assert got == {"a": 50, "b": 30}
    # mismatched explicit geometry raises at PLAN time
    with pytest.raises(ValueError, match="do not match"):
        cm_lookup(sk, probes, "k", width=64, depth=3)
    # merging mixed geometries raises at PLAN time
    with pytest.raises(ValueError, match="disagree"):
        cm_merge(sk, cm_sketch(df, "k", width=64, depth=3))
    # metadata survives a parquet round trip AND a merge
    p = str(tmp_path / "sk.parquet")
    sk.write.parquet(p)
    rt = spark.read.parquet(p)
    assert _cm_geometry(rt) == (128, 3)
    assert _cm_geometry(cm_merge(sk, rt)) == (128, 3)
    got_rt = {r.k: r.est_count for r in
              cm_lookup(rt, probes, "k").collect()}
    assert got_rt == {"a": 50, "b": 30}

    # external-writer shape: columns present, metadata stripped →
    # runtime validation paths
    ext = sk.select("depth", "bucket", "count",
                    (F.col("width") + 0).alias("width"),
                    (F.col("depths") + 0).alias("depths"))
    assert _cm_geometry(ext) is None
    got3 = {r.k: r.est_count for r in
            cm_lookup(ext, probes, "k").collect()}     # derive lazily
    assert got3 == {"a": 50, "b": 30}
    with pytest.raises(Exception, match="embedded geometry"):
        cm_lookup(ext, probes, "k", width=64, depth=3).collect()
    with pytest.raises(Exception, match="disagree"):
        cm_merge(ext, ext.withColumn("width",
                                     F.lit(64))).collect()

    # legacy sketch (no geometry columns): explicit params required
    legacy = sk.select("depth", "bucket", "count")
    got2 = {r.k: r.est_count for r in
            cm_lookup(legacy, probes, "k", width=128, depth=3).collect()}
    assert got2 == {"a": 50, "b": 30}
    with pytest.raises(ValueError, match="no \\(width, depths\\)"):
        cm_lookup(legacy, probes, "k")


def test_heavy_hitters_rejects_guarantee_voiding_capacity(spark):
    """capacity < ceil(1/phi) would allow silent false negatives —
    rejected up front instead."""
    from detanalysis_spark.operators.sketches import heavy_hitters
    df = spark.createDataFrame([("a",)], ["tok"])
    with pytest.raises(ValueError, match="false negatives"):
        heavy_hitters(df, "tok", 0.01, capacity=4)
    # n_total passthrough skips the count scan and stays exact
    rows = ["hot"] * 6 + ["a", "b", "c", "d"]
    df2 = spark.createDataFrame([(v,) for v in rows], ["tok"])
    got = {r.tok: r["count"] for r in
           heavy_hitters(df2, "tok", 0.5, n_total=10).collect()}
    assert got == {"hot": 6}


def test_cm_lookup_partial_geometry_and_empty_sketch(spark):
    """ADVICE r10: with geometry COLUMNS but no metadata, a
    partially-supplied geometry is validated against the derived one
    (not silently ignored), and an EMPTY sketch gets a clear error
    instead of the misleading 'mixes geometries'."""
    from detanalysis_spark.operators.sketches import cm_lookup, cm_sketch

    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3, ["k"])
    ext = cm_sketch(df, "k", width=128, depth=3).select(
        "depth", "bucket", "count",
        (F.col("width") + 0).alias("width"),
        (F.col("depths") + 0).alias("depths"))
    probes = spark.createDataFrame([("a",), ("b",)], ["k"])

    # partial spec that MATCHES the derived value works
    got = {r.k: r.est_count for r in
           cm_lookup(ext, probes, "k", width=128).collect()}
    assert got == {"a": 5, "b": 3}
    got = {r.k: r.est_count for r in
           cm_lookup(ext, probes, "k", depth=3).collect()}
    assert got == {"a": 5, "b": 3}
    # partial spec that CONTRADICTS the sketch raises, not ignored
    with pytest.raises(Exception, match="does not match"):
        cm_lookup(ext, probes, "k", width=64).collect()
    with pytest.raises(Exception, match="does not match"):
        cm_lookup(ext, probes, "k", depth=5).collect()
    # empty sketch: clear message, not 'mixes geometries'
    empty = ext.filter(F.lit(False))
    with pytest.raises(Exception, match="empty sketch"):
        cm_lookup(empty, probes, "k").collect()


def test_trim_outliers_rejects_unknown_exact_string(spark):
    """ADVICE r10: exact='Auto'/'sketch' must raise, not silently run
    the exact path."""
    from detanalysis_spark.operators.stats import trim_outliers
    df = spark.createDataFrame([(float(i),) for i in range(10)], ["x"])
    with pytest.raises(ValueError, match="must be True, False"):
        trim_outliers(df, "x", exact="Auto")
    with pytest.raises(ValueError, match="must be True, False"):
        trim_outliers(df, "x", exact="sketch")
    assert trim_outliers(df, "x", 10.0, 90.0, exact="auto").count() > 0
