"""Scale-safety of the ingest/row-id/mask-cut spine.

These assert plan *shape*, not just results: no single-partition
exchange in the row-id path, and no driver collect / size cap in the
large-id-set cut path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from detanalysis_spark import Analyzer, EVENT_INDEX
from detanalysis_spark.analyzer import ensure_event_index
from tests.conftest import load


def test_event_index_dense_multi_partition(spark):
    df = spark.range(0, 5000).repartition(16).drop("id") \
        .withColumn("x", F.rand(7))
    out = ensure_event_index(df)
    idx = np.sort(np.array([r[0] for r in out.select(EVENT_INDEX).collect()]))
    np.testing.assert_array_equal(idx, np.arange(5000))


def test_event_index_no_single_partition_exchange(spark):
    df = spark.range(0, 1000).repartition(8).withColumn("x", F.rand(7))
    out = ensure_event_index(df.drop("id"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan


def test_event_index_respects_order_by(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") * 37 % 3000).alias("key"), F.col("id").alias("payload"))
    df = df.repartition(12)
    out = ensure_event_index(df, order_by=["key"])
    rows = out.select("key", EVENT_INDEX).collect()
    by_idx = sorted(rows, key=lambda r: r[EVENT_INDEX])
    keys = [r["key"] for r in by_idx]
    assert keys == sorted(keys)
    idx = sorted(r[EVENT_INDEX] for r in rows)
    assert idx == list(range(3000))


def test_large_id_set_cut_no_cap(spark, sf_dir):
    """>100k ids (the old IN-list cap) must work via the subquery path."""
    ana = Analyzer(ensure_event_index(
        spark.range(0, 200_000).withColumn("v", F.rand(11)).drop("id")))
    ids = ana.df.filter("v < 0.7").select(EVENT_INDEX)
    n_ids = ids.count()
    assert n_ids > 100_000
    ana.cut_from_event_ids(ids, "c_big")
    assert ana.count("c_big") == n_ids
    # composes through boolean algebra (existence-join path)
    ana.register_cut("v > 0.35", "c_half")
    ana.combine_cuts(["c_big", "c_half"], "c_both", mode="and")
    expect = ana.df.filter((F.col("v") < 0.7) & (F.col("v") > 0.35)).count()
    assert ana.count("c_both") == expect


def test_id_cut_plan_is_join_not_inlist(spark):
    ana = Analyzer(ensure_event_index(
        spark.range(0, 10_000).withColumn("v", F.rand(3)).drop("id")))
    ids = ana.df.filter("v < 0.5").select(EVENT_INDEX)
    ana.cut_from_event_ids(ids, "c_ids")
    plan = ana._subset_df(ana.df, "c_ids")._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "Join" in plan  # semi/existence join, not a giant literal IN


def test_add_files_ids_stay_unique(spark, sf_dir, tmp_path):
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    spark.range(0, 100).withColumn("v", F.rand(1)).drop("id").write.parquet(p1)
    spark.range(0, 57).withColumn("v", F.rand(2)).drop("id").write.parquet(p2)
    ana = Analyzer.from_parquet(spark, p1)
    ana.add_files(p2)
    idx = [r[0] for r in ana.df.select(EVENT_INDEX).collect()]
    assert len(idx) == 157
    assert len(set(idx)) == 157, "duplicate __event_index__ after append"


def test_combine_cuts_empty_raises(spark):
    ana = Analyzer(ensure_event_index(spark.range(5).withColumn("v", F.lit(1.0))))
    with pytest.raises(ValueError, match="at least one"):
        ana.combine_cuts([], "c_none")


def test_combine_cuts_overwrite_guard(spark):
    ana = Analyzer(ensure_event_index(spark.range(5).withColumn("v", F.lit(1.0))))
    ana.register_cut("v > 0", "c_a")
    ana.combine_cuts(["c_a"], "c_dup")
    with pytest.raises(ValueError, match="already registered"):
        ana.combine_cuts(["c_a"], "c_dup")
    ana.combine_cuts(["c_a"], "c_dup", overwrite=True)
