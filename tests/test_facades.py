"""VibrationAnalyzer / PhotonCalibration facade behavior (the
reference's class-level entry points over the functional engine)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from detanalysis_spark.photon import PhotonCalibration
from detanalysis_spark.vibration import VibrationAnalyzer

CHANNELS = ["AccelGround", "AccelStage1"]


@pytest.fixture(scope="module")
def sweep_df(spark):
    rng = np.random.default_rng(11)
    freqs = np.logspace(0, 2, 5)
    tf = 1.0 / (1.0 + 1j * freqs / 30.0)
    rows = []
    for fi, f in enumerate(freqs):
        drive = np.exp(1j * rng.uniform(0, 0.2, 30))
        g = drive + 0.02 * (rng.standard_normal(30)
                            + 1j * rng.standard_normal(30))
        s1 = tf[fi] * drive + 0.02 * (rng.standard_normal(30)
                                      + 1j * rng.standard_normal(30))
        for t in range(30):
            rows.append((float(f), 1000.0,
                         float(g[t].real), float(g[t].imag),
                         float(s1[t].real), float(s1[t].imag)))
    pdf = pd.DataFrame(rows, columns=[
        "frequency_hz", "trace_length_msec",
        "amp_real_AccelGround", "amp_imag_AccelGround",
        "amp_real_AccelStage1", "amp_imag_AccelStage1"])
    return spark.createDataFrame(pdf), tf, freqs


def test_vibration_facade_psd_and_tf(sweep_df):
    df, tf, freqs = sweep_df
    va = VibrationAnalyzer(df, data_type="sweep")
    psd = va.calc_psd(CHANNELS).toPandas()
    assert set(psd.channel) == set(CHANNELS)
    assert len(psd) == 2 * len(freqs)

    got = (va.calc_transfer_function([("AccelStage1", "AccelGround")])
           .toPandas())
    assert set(got.method) == {"rms-ratio", "cross-correlation",
                               "phase-locked"}
    pl = got[got.method == "phase-locked"].sort_values("frequency_hz")
    np.testing.assert_allclose(pl.tf_re + 1j * pl.tf_im, tf,
                               rtol=0.05, atol=0.02)


def test_vibration_facade_memoizes(sweep_df):
    df, _, _ = sweep_df
    va = VibrationAnalyzer(df, data_type="sweep")
    a = va.calc_psd(CHANNELS)
    assert va.calc_psd(CHANNELS) is a                  # result memo
    vb = VibrationAnalyzer(df, data_type="sweep")
    m = vb.moments(["AccelGround"])
    assert vb.moments(["AccelGround"]) is m            # cache hit
    assert vb.moments(CHANNELS) is not m               # widen rebuilds
    assert vb.moments(["AccelGround"]) is not m        # superset reused


def test_vibration_facade_continuous_rejects_phase_locked(spark):
    rng = np.random.default_rng(4)
    rows = [("chA", i, [float(x) for x in rng.standard_normal(32)])
            for i in range(8)]
    df = spark.createDataFrame(rows, ["channel", "event_id", "trace"])
    va = VibrationAnalyzer(df, data_type="continuous", sample_rate=100.0)
    got = va.calc_transfer_function([("chA", "chA")]).toPandas()
    # default methods exclude phase-locked on continuous data
    assert set(got.method) == {"rms-ratio", "cross-correlation"}
    with pytest.raises(ValueError, match="phase-locked"):
        va.calc_transfer_function([("chA", "chA")],
                                  methods=["phase-locked"])


def test_vibration_facade_validates():
    with pytest.raises(ValueError, match="data_type"):
        VibrationAnalyzer(None, data_type="nope")
    with pytest.raises(ValueError, match="sample_rate"):
        VibrationAnalyzer(None, data_type="continuous")


# ----------------------------------------------------------------------
SPACING = 4.0
STDS = [0.30, 0.32, 0.35]


@pytest.fixture(scope="module")
def photon_data(spark):
    rng = np.random.default_rng(3)
    n = 6000
    peaks = rng.choice(3, size=n, p=[0.5, 0.3, 0.2])
    amps = peaks * SPACING + rng.standard_normal(n) * np.array(STDS)[peaks]
    ev = spark.createDataFrame(
        pd.DataFrame({"series_number": np.full(n, 7, dtype=np.int64),
                      "event_number": np.arange(n),
                      "amp": amps}))
    t = np.arange(64)
    tr_rows = []
    for eid in range(300):
        pk = int(peaks[eid])
        pulse = pk * np.exp(-((t - 20.0) ** 2) / 50.0)
        tr = pulse + 0.01 * rng.standard_normal(64)
        tr_rows.append((7, int(eid), [float(x) for x in tr]))
    traces = spark.createDataFrame(
        tr_rows, ["series_number", "event_number", "trace"])
    return ev, traces, peaks


def test_photon_facade_workflow(photon_data):
    ev, traces, peaks = photon_data
    pc = PhotonCalibration(ev, "amp", traces=traces, fs=1000.0)
    with pytest.raises(RuntimeError, match="fit_spectrum"):
        _ = pc.spacing
    pc.fit_spectrum(npeaks=3,
                    guess=[3.5, 0.35, 0.35, 0.35, 200.0, 120.0, 80.0])
    assert pc.spacing == pytest.approx(SPACING, rel=0.05)
    assert len(pc.peak_stds) == 3

    tagged = pc.tagged_traces()
    got = {r.event_number: r.peak for r in tagged.collect()}
    agree = np.mean([got[e] == peaks[e] for e in got])
    assert agree > 0.95

    avg = pc.average_pulses(baseline_samples=10).toPandas() \
        .pivot(index="pos", columns="peak", values="value")
    assert avg.loc[20, 2] == pytest.approx(2.0, abs=0.1)

    stats = pc.fft_stats()
    assert stats.filter("peak = 1").count() == 33  # 64//2 + 1 bins

    obj = pc.get_save_obj()
    assert obj["npeaks"] == 3
    assert obj["popt"][0] == pytest.approx(SPACING, rel=0.05)


def test_photon_facade_energy_res_and_pce(photon_data, spark):
    from detanalysis_spark import photon as P

    ev, _, _ = photon_data
    pc = PhotonCalibration(ev, "amp", fs=10000.0)
    with pytest.raises(RuntimeError, match="fit_spectrum"):
        pc.spectrum_energy_res(1.0)
    pc.fit_spectrum(npeaks=3,
                    guess=[3.5, 0.35, 0.35, 0.35, 200.0, 120.0, 80.0])

    e_photon = 1.9  # eV-like unit; only ratios matter
    res, err = pc.spectrum_energy_res(e_photon, peak=0)
    assert res == pytest.approx(e_photon * pc.popt[1] / pc.popt[0])
    assert err > 0

    # plant a clean two-pole ensemble for peak 1, fit it through the
    # facade, then check energy ± uncertainty and PCE
    rng = np.random.default_rng(8)
    n, fs = 256, 10000.0
    t = np.arange(n) / fs
    amp_true, tau_f, tau_r, t0 = 2.0, 2e-3, 2e-4, 5e-3
    template = P.template_twopole_t(t, amp_true, tau_f, tau_r, t0)
    rows = [(i, 1, [float(x) for x in
                    template + 0.02 * rng.standard_normal(n)])
            for i in range(80)]
    df = spark.createDataFrame(rows, ["event_id", "peak", "trace"])
    stats = P.fft_ensemble_stats(df, fs)

    with pytest.raises(RuntimeError, match="fit_peak_template"):
        pc.template_energy_uncertainty(1)
    pc.fit_peak_template(stats, 1, t, t0,
                         guess=[1.0, 1.5e-3, 3e-4],
                         bounds=([0.1, 1e-4, 1e-5], [10.0, 1e-2, 1e-3]))
    energy, std = pc.template_energy_uncertainty(1)
    e_true = P.template_energy(template, fs)
    assert energy == pytest.approx(e_true, rel=0.05)
    assert 0 < std < abs(energy)

    pce, pce_std = pc.phonon_collection_efficiency(1, e_true)
    assert pce == pytest.approx(1.0, rel=0.05)
    assert pce_std == pytest.approx(std / e_true)
    with pytest.raises(ValueError, match="peak 0"):
        pc.phonon_collection_efficiency(0, e_true)


def test_vibration_accel_gain_and_describe(spark, sweep_df):
    rng = np.random.default_rng(14)
    rows = [("chA", i, [float(x) for x in rng.standard_normal(32)])
            for i in range(8)]
    df = spark.createDataFrame(rows, ["channel", "event_id", "trace"])
    va1 = VibrationAnalyzer(df, data_type="continuous", sample_rate=100.0)
    va2 = VibrationAnalyzer(df, data_type="continuous", sample_rate=100.0,
                            accel_gain=10.0)
    p1 = {r.frequency_hz: r["S_re__chA__chA"]
          for r in va1.moments(["chA"]).collect()}
    p2 = {r.frequency_hz: r["S_re__chA__chA"]
          for r in va2.moments(["chA"]).collect()}
    for f in p1:
        assert p2[f] == pytest.approx(p1[f] / 100.0)  # 1/gain² in power
    assert va1.describe() is None                      # continuous path

    sdf, _, _ = sweep_df
    desc = VibrationAnalyzer(sdf, data_type="sweep").describe()
    assert "frequency_hz" in desc.columns


def test_photon_fits_comparison_table(photon_data, spark):
    from detanalysis_spark import photon as P

    ev, _, _ = photon_data
    pc = PhotonCalibration(ev, "amp", fs=10000.0)
    assert pc.fits_comparison_table().empty

    rng = np.random.default_rng(9)
    n, fs = 128, 10000.0
    t = np.arange(n) / fs
    template = P.template_twopole_t(t, 2.0, 2e-3, 2e-4, 5e-3)
    df = spark.createDataFrame(
        [(i, 1, [float(x) for x in template + 0.02 * rng.standard_normal(n)])
         for i in range(40)], ["event_id", "peak", "trace"])
    stats = P.fft_ensemble_stats(df, fs)
    pc._fs = fs
    pc.fit_peak_template(stats, 1, t, 5e-3, guess=[1.0, 1.5e-3, 3e-4],
                         bounds=([0.1, 1e-4, 1e-5], [10.0, 1e-2, 1e-3]))
    tab = pc.fits_comparison_table()
    assert list(tab.peak) == [1]
    assert tab.loc[0, "p0"] == pytest.approx(2.0, rel=0.1)
    assert tab.loc[0, "p0_err"] > 0


def test_reference_public_api_names_present():
    """Every public method of the reference's six classes has a
    same-named counterpart on our facades (headless plot providers
    return the plot-ready data instead of rendering)."""
    from detanalysis_spark.analyzer import Analyzer
    from detanalysis_spark.photon import PhotonCalibration
    from detanalysis_spark.picker import TracePicker
    from detanalysis_spark.semiautocut import MasterSemiautocuts, Semiautocut
    from detanalysis_spark.vibration import VibrationAnalyzer

    surface = {
        Analyzer: [
            "add_files", "clean", "describe", "register_cut", "combine_cuts",
            "register_cut_box", "apply_global_filter", "drop_global_filter",
            "get_values", "register_feature", "add_feature", "hist",
            "heatmap", "get_event_list", "get_traces", "get_trace",
            "load_cuts", "load_derived_features", "set_analysis_repo",
            "scatter", "plot_traces", "interactive_selection"],
        Semiautocut: [
            "do_cut", "get_passage_fraction", "get_cut_dict",
            "load_cut_dict", "plot_vs_time", "plot_vs_ofamp",
            "plot_chi2_vs_ofamp", "plot_histograms", "plot_example_events"],
        MasterSemiautocuts: [
            "create_cut_rqs", "load_cut_dicts", "combine_cuts",
            "get_combined_cuts", "create_load_combine_cuts",
            "batch_create_load_combine_cuts", "get_passage_fraction",
            "get_randoms_passfrac_table", "get_example_events",
            "plot_example_events", "plot_chi2_vs_ofamp",
            "plot_ofamp_vs_time"],
        PhotonCalibration: [
            "fit_spectrum", "define_photon_cut", "load_events",
            "calculate_average_pulses", "get_crosstalk_template",
            "subtract_crosstalk_template", "subtract_zero_photon_template",
            "calculate_dPdI", "calculate_frequency_domain_templates",
            "fit_templates", "get_current_template",
            "get_spectrum_energy_res", "get_template_energy_uncertainty",
            "get_template_phonon_collection_effiency",
            "print_fits_comparison_table", "get_nice_photon_spectrum_plot",
            "get_correlation_matrix_visualization", "get_save_obj"],
        VibrationAnalyzer: [
            "describe", "calc_psd", "calc_transfer_function", "plot_psd",
            "plot_transfer_function", "plot_transfer_function_phase"],
        TracePicker: [
            "nearest_events", "events_in_box", "pick_traces",
            "plot_picking_scatter", "plot_picked_events"],
    }
    missing = [f"{cls.__name__}.{name}"
               for cls, names in surface.items()
               for name in names if not hasattr(cls, name)]
    assert not missing, missing


def test_reference_package_exports():
    """The reference's __init__ exports exactly Analyzer,
    Vibration_Analyzer, Semiautocut, MasterSemiautocuts, ScatterPlotter,
    PhotonCalibration and the func decorators — a migrating user's
    imports must work verbatim against our package."""
    import detanalysis_spark as pkg

    for name in ("Analyzer", "Vibration_Analyzer", "Semiautocut",
                 "MasterSemiautocuts", "ScatterPlotter",
                 "PhotonCalibration", "func"):
        assert hasattr(pkg, name), name
    for deco in ("version", "authors", "date", "description", "contact"):
        assert hasattr(pkg.func, deco), deco
    assert pkg.Vibration_Analyzer is pkg.VibrationAnalyzer
    assert pkg.ScatterPlotter is pkg.TracePicker
