"""Core Analyzer semantics: cuts, features, global filter, views.

Oracles are NumPy/pandas on the same rows (SURVEY §5 implication (1)).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from detanalysis_spark import Analyzer, EVENT_INDEX
from tests.conftest import load


@pytest.fixture(scope="module")
def ana(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    a = Analyzer.from_parquet(spark, f"{sf_dir}/events.parquet", order_by=["event_id"])
    return a


@pytest.fixture(scope="module")
def pdf(spark, sf_dir):
    return load(spark, sf_dir, "events").orderBy("event_id").toPandas()


def test_event_index_assigned(ana):
    idx = ana.get_values(EVENT_INDEX)
    assert idx.min() == 0
    assert len(np.unique(idx)) == len(idx)


def test_register_cut_sql_string(ana, pdf):
    ana.register_cut("value > 5.0", "c_hi", overwrite=True)
    n = ana.count("c_hi")
    assert n == int((pdf["value"] > 5.0).sum())


def test_register_cut_box(ana, pdf):
    ana.register_cut_box(["value"], [[2.0, 8.0]], "c_box", overwrite=True)
    n = ana.count("c_box")
    assert n == int(pdf["value"].between(2.0, 8.0).sum())


def test_combine_cuts_modes(ana, pdf):
    a = pdf["value"] > 5.0
    b = pdf["value"].between(2.0, 8.0)
    for mode, expect in [("and", a & b), ("or", a | b),
                         ("xor", a ^ b), ("subtract", a & ~b)]:
        ana.combine_cuts(["c_hi", "c_box"], f"c_{mode}", mode=mode)
        assert ana.count(f"c_{mode}") == int(expect.sum()), mode


def test_global_filter_modes(ana, pdf):
    total = len(pdf)
    ana.apply_global_filter("value > 5.0")
    assert ana.count() == int((pdf["value"] > 5.0).sum())
    ana.apply_global_filter("event_type = 'click'", mode="and")
    expect = (pdf["value"] > 5.0) & (pdf["event_type"] == "click")
    assert ana.count() == int(expect.sum())
    ana.apply_global_filter("event_type = 'error'", mode="or")
    expect = expect | (pdf["event_type"] == "error")
    assert ana.count() == int(expect.sum())
    ana.apply_global_filter("value > 9.0", mode="subtract")
    expect = expect & ~(pdf["value"] > 9.0)
    assert ana.count() == int(expect.sum())
    ana.drop_global_filter()
    assert ana.count() == total


def test_feature_virtual_column(ana, pdf):
    ana.register_feature("value * 2.0 + 1.0", "v2", overwrite=True)
    got = np.sort(ana.get_values("v2"))
    want = np.sort((pdf["value"] * 2.0 + 1.0).to_numpy())
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_cut_on_feature(ana, pdf):
    ana.register_feature("value - 5.0", "centered", overwrite=True)
    ana.register_cut("centered > 0", "c_feat", overwrite=True)
    assert ana.count("c_feat") == int((pdf["value"] > 5.0).sum())


def test_mask_cut_from_ids(ana, pdf):
    ids = pdf.loc[pdf["event_type"] == "purchase"].index[:50]
    # __event_index__ ordering == event_id ordering here
    id_vals = sorted(pdf.loc[pdf["event_type"] == "purchase", "event_id"].iloc[:50])
    sel = ana.df.filter(F.col("event_id").isin([int(v) for v in id_vals])) \
                .select(EVENT_INDEX)
    ana.cut_from_event_ids(sel, "c_ids")
    assert ana.count("c_ids") == len(id_vals)


def test_mask_cut_views_stay_bounded(spark, sf_dir):
    # fresh Analyzer: clean() below must not disturb the shared fixture
    ana = Analyzer.from_parquet(spark, f"{sf_dir}/events.parquet",
                                order_by=["event_id"])
    # overwriting the same mask cut many times (and clean()) must not
    # accumulate __cut_ids_*__ temp views in the catalog — a long-lived
    # session doing thousands of mask cuts would otherwise leak catalog
    # entries and pin every historical id frame's lineage
    def n_loop_views():
        return sum(1 for v in spark.catalog.listTables()
                   if v.name.startswith("__cut_ids_c_loop_"))

    sel = ana.df.filter("event_type = 'view'").select(EVENT_INDEX)
    for _ in range(25):
        ana.cut_from_event_ids(sel, "c_loop")
    assert n_loop_views() == 1             # only the live one remains
    assert ana.count("c_loop") > 0         # the surviving view works
    ana.clean()
    assert n_loop_views() == 0             # clean() drops them all


def test_subset_with_dataframe_semi_join(ana):
    sel = ana.df.filter("event_type = 'view'").select(EVENT_INDEX)
    n = ana._subset_df(ana.df, sel).count()
    assert n == ana.count("event_type = 'view'")


def test_passage_fraction(ana, pdf):
    frac = ana.passage_fraction("value > 5.0")
    want = (pdf["value"] > 5.0).mean()
    assert abs(frac - want) < 1e-12


def test_describe(ana, pdf):
    d = ana.describe(columns=["value"])
    assert abs(d["value"]["mean"] - pdf["value"].mean()) < 1e-9
    assert d["value"]["count"] == len(pdf)


def test_get_event_list_limit(spark, sf_dir):
    df = load(spark, sf_dir, "events").withColumnRenamed("event_id", "event_number") \
        .withColumn("series_number", F.lit(1).cast("long"))
    a = Analyzer(df)
    out = a.get_event_list(nb_events_limit=10)
    assert len(out) == 10
    assert set(out[0]) == {"series_number", "event_number"}


def test_analyzer_sql_surface(ana):
    """Analyzer.sql: the working view (global filter applied) and named
    cuts (as cut_<name> booleans) are queryable in ANSI SQL."""
    ana.register_cut("value > 400", "sql_hot", overwrite=True)
    got = ana.sql(
        "SELECT count(*) AS n, count_if(cut_sql_hot) AS n_hot FROM events"
    ).first()
    assert got.n == ana.count()
    assert got.n_hot == ana.count("sql_hot")
