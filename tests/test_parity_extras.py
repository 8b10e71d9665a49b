"""Round-2 parity surface: passage fractions with trigger selection,
MasterSemiautocuts batch/passfrac/example-events, Analyzer
introspection + selection persistence + analysis-repo loading +
headless hist/heatmap.

Oracles are plain NumPy re-implementations of the reference math
(semiautocuts.py:1846-1896, 2191-2239, 2471-2531; analyzer.py:82-133,
359-377, 482-525, 579-716).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from detanalysis_spark import Analyzer, EVENT_INDEX, Semiautocut, MasterSemiautocuts
from detanalysis_spark.semiautocut import TRIGGER_RANDOM, TRIGGER_TRIGGER

N = 3000


@pytest.fixture(scope="module")
def arrays():
    rng = np.random.default_rng(7)
    return {
        "event_time": np.sort(rng.uniform(0.0, 3600.0, N)),
        "amp_of1x1_nodelay": rng.exponential(2e-8, N),
        "lowchi2_of1x1_nodelay": rng.normal(100.0, 10.0, N),
        "baseline": rng.normal(0.02, 0.005, N),
        "trigger_type": rng.choice([3.0, 4.0], N, p=[0.3, 0.7]),
    }


@pytest.fixture(scope="module")
def ana(spark, arrays):
    pdf = pd.DataFrame(arrays)
    pdf[EVENT_INDEX] = np.arange(N, dtype=np.int64)
    return Analyzer(spark.createDataFrame(pdf).repartition(6))


def np_sigma_bounds(values, k):
    med = np.percentile(values, 50)
    sig = abs(np.mean([np.percentile(values, 50 - 68.27 / 2.0) - med,
                       med - np.percentile(values, 50 + 68.27 / 2.0)]))
    return med - sig * k, med + sig * k


# ----------------------------------------------------------------------
# Semiautocut.get_passage_fraction (semiautocuts.py:1846-1896)
# ----------------------------------------------------------------------
def test_sac_passage_fraction_trigger_splits(ana, arrays):
    sac = Semiautocut(ana, "baseline", cut_pars={"sigma": 2.0},
                      cut_rq_name_override=True)
    with pytest.raises(RuntimeError, match="do_cut"):
        sac.get_passage_fraction()
    sac.do_cut()

    lo, hi = np_sigma_bounds(arrays["baseline"], 2.0)
    mask = (arrays["baseline"] > lo) & (arrays["baseline"] < hi)
    trig = arrays["trigger_type"]

    both = (trig == 3.0) | (trig == 4.0)
    assert sac.get_passage_fraction() == pytest.approx(
        mask[both].sum() / both.sum())
    rand = trig == 3.0
    assert sac.get_passage_fraction(lgc_triggers=False) == pytest.approx(
        mask[rand].sum() / rand.sum())
    trg = trig == 4.0
    assert sac.get_passage_fraction(lgc_randoms=False) == pytest.approx(
        mask[trg].sum() / trg.sum())

    # one-pass splits agree with the three per-selection jobs
    splits = sac.get_passage_fraction_splits()
    assert splits["randoms"] == (
        int(rand.sum()), int(mask[rand].sum()),
        pytest.approx(mask[rand].sum() / rand.sum()))
    assert splits["triggers"] == (
        int(trg.sum()), int(mask[trg].sum()),
        pytest.approx(mask[trg].sum() / trg.sum()))
    assert splits["both"] == (
        int(both.sum()), int(mask[both].sum()),
        pytest.approx(mask[both].sum() / both.sum()))


# ----------------------------------------------------------------------
# MasterSemiautocuts passfrac + randoms table + batch
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def msac(ana, arrays):
    Semiautocut(ana, "baseline", cut_pars={"sigma": 2.0},
                cut_rq_name_override=True, cut_name="cut_base").do_cut()
    Semiautocut(ana, "lowchi2_of1x1_nodelay", cut_pars={"percent_upper": 0.9},
                cut_rq_name_override=True, cut_name="cut_chi2").do_cut()
    m = MasterSemiautocuts(ana, ["cut_base", "cut_chi2"])
    m.get_combined_cuts()
    return m


def _np_masks(arrays):
    lo, hi = np_sigma_bounds(arrays["baseline"], 2.0)
    m1 = (arrays["baseline"] > lo) & (arrays["baseline"] < hi)
    chi = arrays["lowchi2_of1x1_nodelay"]
    m2 = chi < np.quantile(chi, 0.9, method="linear")
    return m1, m2


def test_msac_passage_fraction(msac, arrays):
    m1, m2 = _np_masks(arrays)
    combined = m1 & m2
    rand = arrays["trigger_type"] == 3.0
    assert msac.get_passage_fraction() == pytest.approx(combined.mean())
    assert msac.get_passage_fraction(lgc_randoms_return=True) == pytest.approx(
        combined[rand].sum() / rand.sum())


def test_msac_randoms_passfrac_table(msac, arrays):
    m1, m2 = _np_masks(arrays)
    rand = arrays["trigger_type"] == 3.0
    mat, names = msac.get_randoms_passfrac_table()
    assert names == ["cut_base", "cut_chi2"]
    nr = rand.sum()
    # reference semantics: cell (i, j<=i) = count(cut_i & cuts_0..j & rand)/nr
    assert mat[0, 0] == pytest.approx((m1 & rand).sum() / nr)
    assert mat[1, 0] == pytest.approx((m2 & m1 & rand).sum() / nr)
    assert mat[1, 1] == pytest.approx((m2 & m1 & rand).sum() / nr)
    assert np.isnan(mat[0, 1])


def test_msac_batch_and_example_events(ana, arrays, spark):
    master = {
        "creation": [],
        "cuts": [{"cut_name": "cut_amp_batch", "cut_rq": "amp_of1x1_nodelay",
                  "time_bins": None, "time_bins_arr": None,
                  "ofamp_bins": None, "ofamp_bins_arr": None,
                  "ofamp_rq": "amp_of1x1_nodelay",
                  "chi2_rq": "lowchi2_of1x1_nodelay",
                  "cut_pars": {"percent_upper": 0.5}, "exceptions_dict": {}}],
        "combo": {"cuts_to_combine": ["cut_amp_batch"],
                  "cut_name": "cut_all_batch"},
    }
    m = MasterSemiautocuts(ana, [])
    cols = m.batch_create_load_combine_cuts([master])
    assert len(cols) == 1 and m.cut_name == "cut_all_batch"

    picked = m.get_example_events(5, seed=1)
    assert picked.count() == 5
    amp_cap = np.quantile(arrays["amp_of1x1_nodelay"], 0.5, method="linear")
    assert all(r["amp_of1x1_nodelay"] < amp_cap for r in picked.collect())

    # with a trace table: broadcast key join brings back <= n traces
    ev = pd.DataFrame({"series_number": np.int64(1),
                       "event_number": np.arange(N, dtype=np.int64)})
    full = ana.df_full.withColumns(
        {"series_number": F.lit(1).cast("long"),
         "event_number": F.col(EVENT_INDEX)})
    m2 = MasterSemiautocuts(Analyzer(full), ["cut_amp_batch"])
    m2.ana.register_cut(F.col("amp_of1x1_nodelay") < float(amp_cap),
                        "cut_amp_batch")
    m2.get_combined_cuts()
    traces = spark.createDataFrame(pd.DataFrame({
        "series_number": ev.series_number, "event_number": ev.event_number,
        "trace": [[0.0, 1.0]] * N}))
    got = m2.get_example_events(4, traces=traces, seed=2)
    assert got.count() == 4
    assert "trace" in got.columns


# ----------------------------------------------------------------------
# Analyzer introspection + selection persistence
# ----------------------------------------------------------------------
def test_analyzer_properties(ana):
    assert ana.nfiles == 0            # in-memory frame: no backing files
    assert ana.file_names == []
    assert EVENT_INDEX in ana.feature_names
    assert ana.nfeatures == len(ana.feature_names)
    assert not ana.is_df_filtered
    assert "cut_base" in ana.list_cuts()


def test_save_current_selection(spark):
    pdf = pd.DataFrame({"x": np.arange(100.0),
                        EVENT_INDEX: np.arange(100, dtype=np.int64)})
    a = Analyzer(spark.createDataFrame(pdf))
    with pytest.raises(ValueError, match="global filter"):
        a.save_current_selection("sel")
    a.apply_global_filter("x < 10")
    assert a.is_df_filtered and a.nevents == 10
    a.save_current_selection("sel")
    a.drop_global_filter()
    assert a.count("sel") == 10
    assert a.get_cuts()["sel"].metadata["source"] == "global_filter"
    a.apply_global_filter("x < 5")
    with pytest.raises(ValueError, match="already registered"):
        a.save_current_selection("sel")
    a.save_current_selection("sel", overwrite=True)
    a.drop_global_filter()
    assert a.count("sel") == 5


def test_get_unit(spark):
    pdf = pd.DataFrame({"x": [1.0], EVENT_INDEX: np.int64([0])})
    a = Analyzer(spark.createDataFrame(pdf))
    a.register_feature("x * 2", "x2", metadata={"unit": "eV"})
    assert a.get_unit("x2") == "eV"
    assert a.get_unit("x") is None


def test_set_analysis_repo_loads_scripts(spark, tmp_path):
    cuts = tmp_path / "cuts"
    feats = tmp_path / "features"
    cuts.mkdir()
    feats.mkdir()
    (cuts / "cut_pos.py").write_text(
        "from pyspark.sql import functions as F\n"
        "from detanalysis_spark.registry import version\n"
        "@version(1.0)\n"
        "def cut_positive(df):\n"
        "    return F.col('x') > 0\n")
    (feats / "feat_double.py").write_text(
        "from pyspark.sql import functions as F\n"
        "def x_doubled(df):\n"
        "    return F.col('x') * 2\n")
    pdf = pd.DataFrame({"x": np.arange(-5.0, 5.0),
                        EVENT_INDEX: np.arange(10, dtype=np.int64)})
    a = Analyzer(spark.createDataFrame(pdf))
    a.set_analysis_repo(str(tmp_path))
    assert a.count("cut_positive") == 4
    assert "x_doubled" in a.feature_names
    # default path discovery walks subdirs too
    b = Analyzer(spark.createDataFrame(pdf))
    assert b.load_cuts(str(cuts)) == ["cut_positive"]


def test_headless_hist_heatmap(spark):
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame({"x": rng.uniform(0, 10, 1000),
                        "y": rng.uniform(0, 4, 1000),
                        EVENT_INDEX: np.arange(1000, dtype=np.int64)})
    a = Analyzer(spark.createDataFrame(pdf))
    counts, edges = a.hist("x", shape=10, limits=(0.0, 10.0))
    want, _ = np.histogram(pdf.x, bins=10, range=(0, 10))
    np.testing.assert_array_equal(counts, want)

    grid, xe, ye = a.heatmap("x", "y", shape=(5, 4),
                             limits_x=(0.0, 10.0), limits_y=(0.0, 4.0))
    want2, _, _ = np.histogram2d(pdf.x, pdf.y, bins=(5, 4),
                                 range=((0, 10), (0, 4)))
    np.testing.assert_array_equal(grid, want2.astype(np.int64))
    assert grid.sum() == 1000

    counts_cut, _ = a.hist("x", cut="y < 2", shape=10, limits=(0.0, 10.0))
    assert counts_cut.sum() == (pdf.y < 2).sum()
