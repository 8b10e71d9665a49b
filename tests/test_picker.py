"""TracePicker (headless ScatterPlotter analog) behavior."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from detanalysis_spark.picker import TracePicker


@pytest.fixture(scope="module")
def events(spark):
    rows = [(i, float(i % 10), float(i // 10)) for i in range(100)]
    return spark.createDataFrame(rows, ["event_id", "fx", "fy"])


def test_nearest_event_normalized(events):
    # fx spans 0-9, fy spans 0-9: normalized distance is symmetric here,
    # so the planted exact-hit point must win
    p = TracePicker(events, "fx", "fy", tiebreak=["event_id"])
    got = p.nearest_events(3.0, 7.0, n=1).first()
    assert (got.fx, got.fy) == (3.0, 7.0)
    assert got.pick_dist == 0.0
    # ties broken by event_id: (3.0, 7.0) is event 73 only
    assert got.event_id == 73


def test_nearest_event_respects_axis_scaling(spark):
    # y spans 0-1000, x spans 0-1: a click at (0.5, 500) is nearest to
    # a point 0.4 away in x (0.4 normalized) vs 100 away in y (0.1
    # normalized) — the y-neighbor must win under display normalization
    df = spark.createDataFrame(
        [(1, 0.9, 500.0), (2, 0.5, 400.0), (3, 0.0, 0.0), (4, 1.0, 1000.0)],
        ["event_id", "fx", "fy"])
    p = TracePicker(df, "fx", "fy")
    assert p.nearest_events(0.5, 500.0, n=1).first().event_id == 2


def test_nearest_events_topk_plan(events):
    p = TracePicker(events, "fx", "fy", tiebreak=["event_id"])
    df = p.nearest_events(5.0, 5.0, n=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    assert df.count() == 3


def test_events_in_box_and_cut(events):
    p = TracePicker(events, "fx", "fy")
    sel = p.events_in_box((2.0, 4.0), (1.0, 2.0))
    assert sel.count() == 3 * 2
    sel_cut = p.events_in_box((2.0, 4.0), (1.0, 2.0), cut="fx <> 3.0")
    assert sel_cut.count() == 2 * 2


def test_pick_traces_with_lowpass(spark):
    rng = np.random.default_rng(7)
    fs, n_samp = 100.0, 64
    ev = spark.createDataFrame(
        [(1, 10, 0.0, 0.0), (2, 10, 5.0, 5.0)],
        ["event_number", "series_number", "fx", "fy"])
    traces = spark.createDataFrame(
        [(e, 10, [float(v) for v in rng.standard_normal(n_samp)])
         for e in (1, 2)],
        ["event_number", "series_number", "trace"])
    p = TracePicker(ev, "fx", "fy", traces=traces, tiebreak=["event_number"])
    raw = p.pick_traces(0.1, 0.1, n=1).collect()
    assert [r.event_number for r in raw] == [1]

    filt = p.pick_traces(0.1, 0.1, n=1, lowpass_cutoff=10.0, fs=fs).first()
    # low-pass output: same length, reduced high-frequency power
    assert len(filt.trace) == n_samp
    orig = np.asarray(raw[0].trace)
    out = np.asarray(filt.trace)
    hf = lambda a: np.abs(np.fft.rfft(a))[20:].sum()  # noqa: E731
    assert hf(out) < 0.5 * hf(orig)


def test_picker_without_traces_raises(events):
    p = TracePicker(events, "fx", "fy")
    with pytest.raises(ValueError, match="without a trace table"):
        p.pick_traces(0.0, 0.0)
