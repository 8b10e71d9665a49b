"""Vibration/spectral engine vs independent numpy oracles.

Synthetic sweep data per FIXTURES.md §3 (known transfer function +
complex noise) and continuous data per §4 (colored noise + injected
sinusoid, chunk lengths not a multiple of the rechunk target)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from detanalysis_spark import vibration as V

CHANNELS = ["AccelGround", "AccelStage1"]
T_MSEC = 1000.0
N_FREQS = 6
N_TRACES = 25


@pytest.fixture(scope="module")
def sweep(spark):
    rng = np.random.default_rng(11)
    freqs = np.logspace(0, 2, N_FREQS)
    tf = 1.0 / (1.0 + 1j * freqs / 30.0)        # known 1-pole response
    rows = []
    for fi, f in enumerate(freqs):
        # phase-locked drive with small jitter (a sweep DAQ locks to the
        # drive phase; fully random phase would null the mean phasor)
        drive = np.exp(1j * rng.uniform(0, 0.2, N_TRACES))
        g = drive + 0.05 * (rng.standard_normal(N_TRACES)
                            + 1j * rng.standard_normal(N_TRACES))
        s1 = tf[fi] * drive + 0.05 * (rng.standard_normal(N_TRACES)
                                      + 1j * rng.standard_normal(N_TRACES))
        for t in range(N_TRACES):
            rows.append((float(f), T_MSEC,
                         float(g[t].real), float(g[t].imag),
                         float(s1[t].real), float(s1[t].imag)))
    pdf = pd.DataFrame(rows, columns=[
        "frequency_hz", "trace_length_msec",
        "amp_real_AccelGround", "amp_imag_AccelGround",
        "amp_real_AccelStage1", "amp_imag_AccelStage1"])
    return spark.createDataFrame(pdf), pdf, tf, freqs


def _numpy_moments(pdf, channels):
    """Independent oracle implementing vibration_analyzer.py:462-530."""
    inv_sqrt_df = np.sqrt(T_MSEC * 1e-3)
    out = {}
    for f, rows in pdf.groupby("frequency_hz"):
        a = np.stack([
            (rows[f"amp_real_{c}"].to_numpy()
             + 1j * rows[f"amp_imag_{c}"].to_numpy()) * inv_sqrt_df
            for c in channels])
        n = a.shape[1]
        S = a @ np.conj(a).T / n
        power = np.abs(a) ** 2
        R = power @ power.T / n
        out[f] = {"n": n, "S": S, "R": R, "m": a.mean(axis=1)}
    return out

def test_sweep_moments_match_numpy(sweep):
    df, pdf, _, _ = sweep
    got = {r.frequency_hz: r
           for r in V.sweep_moments(df, CHANNELS).collect()}
    want = _numpy_moments(pdf, CHANNELS)
    assert set(got) == set(want)
    for f, w in want.items():
        g = got[f]
        assert g.n == w["n"]
        for i, ci in enumerate(CHANNELS):
            assert g[f"m_re__{ci}"] == pytest.approx(w["m"][i].real, rel=1e-9)
            assert g[f"m_im__{ci}"] == pytest.approx(w["m"][i].imag, rel=1e-9)
            for j, cj in enumerate(CHANNELS):
                p = f"{ci}__{cj}"
                assert g[f"S_re__{p}"] == pytest.approx(w["S"][i, j].real,
                                                        rel=1e-9)
                assert g[f"S_im__{p}"] == pytest.approx(w["S"][i, j].imag,
                                                        rel=1e-9)
                assert g[f"R__{p}"] == pytest.approx(w["R"][i, j], rel=1e-9)


def test_psd_and_variance(sweep):
    df, pdf, _, _ = sweep
    mom = V.sweep_moments(df, CHANNELS)
    psd = {(r.frequency_hz, r.channel): r
           for r in V.psd_from_moments(mom, CHANNELS).collect()}
    want = _numpy_moments(pdf, CHANNELS)
    for f, w in want.items():
        for i, c in enumerate(CHANNELS):
            p = psd[(f, c)]
            psd_i = w["S"][i, i].real
            assert p.psd == pytest.approx(psd_i, rel=1e-9)
            var_psd = max(w["R"][i, i] - psd_i ** 2, 0.0) / (w["n"] - 1)
            assert p.asd_variance == pytest.approx(var_psd / (4 * psd_i),
                                                   rel=1e-9)


def test_transfer_function_recovers_pole(sweep):
    df, _, tf, freqs = sweep
    mom = V.sweep_moments(df, CHANNELS)
    got = V.transfer_functions(mom, [("AccelStage1", "AccelGround")])
    rows = {(r.method, r.frequency_hz): r for r in got.collect()}
    for fi, f in enumerate(freqs):
        pl = rows[("phase-locked", f)]
        est = complex(pl.tf_re, pl.tf_im)
        # phase-locked: best estimator, ~|noise|/√N accuracy
        assert abs(est - tf[fi]) < 0.05
        cc = rows[("cross-correlation", f)]
        assert abs(complex(cc.tf_re, cc.tf_im) - tf[fi]) < 0.1
        rr = rows[("rms-ratio", f)]
        assert rr.tf_im == 0.0
        assert rr.tf_re == pytest.approx(abs(tf[fi]), abs=0.1)
        assert 0 < pl.tf_sigma < 0.1


def test_tf_method_validation(sweep):
    df, _, _, _ = sweep
    mom = V.sweep_moments(df, CHANNELS)
    with pytest.raises(ValueError, match="unknown TF methods"):
        V.transfer_functions(mom, [("a", "b")], methods=["bogus"])
    with pytest.raises(ValueError, match="phase-locked"):
        V.transfer_functions(mom, [("a", "b")], methods=["phase-locked"],
                             phasors_available=False)


# ----------------------------------------------------------------------
# continuous path
# ----------------------------------------------------------------------
FS = 1000.0
CHUNK = 128


@pytest.fixture(scope="module")
def continuous(spark):
    rng = np.random.default_rng(5)
    # per-event chunks whose lengths are NOT a multiple of CHUNK
    lengths = [100, 90, 110, 95, 105, 100, 97, 103] * 4
    t0 = 0
    rows = []
    streams = {c: [] for c in ["g", "s1"]}
    for eid, ln in enumerate(lengths):
        t = (t0 + np.arange(ln)) / FS
        base = np.sin(2 * np.pi * 125.0 * t)     # bin 16 of 128 @ 1 kHz
        g = base + 0.1 * rng.standard_normal(ln)
        s1 = 0.5 * base + 0.1 * rng.standard_normal(ln)
        streams["g"].append(g)
        streams["s1"].append(s1)
        rows += [(eid, "g", [float(x) for x in g]),
                 (eid, "s1", [float(x) for x in s1])]
        t0 += ln
    df = spark.createDataFrame(rows, ["event_id", "channel", "trace"])
    return df, {k: np.concatenate(v) for k, v in streams.items()}


def test_rechunk_discards_remainder(continuous):
    df, streams = continuous
    chunks = V.rechunk_traces(df, CHUNK).collect()
    n_want = streams["g"].size // CHUNK
    per_ch = {}
    for r in chunks:
        per_ch.setdefault(r.channel, {})[r.chunk_id] = np.array(r.trace)
    assert {len(v) for v in per_ch.values()} == {n_want}
    for ch, stream in streams.items():
        for cid, tr in per_ch[ch].items():
            np.testing.assert_allclose(
                tr, stream[cid * CHUNK:(cid + 1) * CHUNK])


def test_continuous_moments_match_numpy(continuous):
    df, streams = continuous
    mom = V.continuous_moments(df, ["g", "s1"], FS, chunk_samples=CHUNK)
    got = {round(r.frequency_hz, 6): r for r in mom.collect()}

    # independent accumulator oracle (vibration_analyzer.py:313-460)
    n_chunks = streams["g"].size // CHUNK
    scale = np.full(CHUNK // 2 + 1, 2.0 / (FS * CHUNK))
    scale[0] = scale[-1] = 1.0 / (FS * CHUNK)
    ssq = np.sqrt(scale)
    sum_S = np.zeros((2, 2, CHUNK // 2 + 1), dtype=complex)
    sum_R = np.zeros((2, 2, CHUNK // 2 + 1))
    for k in range(n_chunks):
        a = np.stack([
            np.fft.rfft(streams[c][k * CHUNK:(k + 1) * CHUNK]) * ssq
            for c in ["g", "s1"]])
        sum_S += a[:, None, :] * np.conj(a)[None, :, :]
        p = np.abs(a) ** 2
        sum_R += p[:, None, :] * p[None, :, :]
    S, R = sum_S / n_chunks, sum_R / n_chunks
    freqs = np.fft.rfftfreq(CHUNK, 1 / FS)

    assert len(got) == CHUNK // 2 + 1
    for b, f in enumerate(freqs):
        g = got[round(float(f), 6)]
        assert g.n == n_chunks
        assert g.S_re__g__g == pytest.approx(S[0, 0, b].real, rel=1e-9)
        assert g.S_re__g__s1 == pytest.approx(S[0, 1, b].real, rel=1e-9)
        assert g.S_im__g__s1 == pytest.approx(S[0, 1, b].imag, rel=1e-9)
        assert g.R__s1__s1 == pytest.approx(R[1, 1, b], rel=1e-9)

    # PSD peak lands on the injected 125 Hz line (bin 16)
    psd = V.psd_from_moments(mom, ["g"]).collect()
    peak = max(psd, key=lambda r: r.psd)
    assert peak.frequency_hz == pytest.approx(125.0)


def test_every_nth(spark):
    df = spark.range(100).withColumnRenamed("id", "event_id")
    assert V.every_nth(df, "event_id", 10).count() == 10
    assert V.every_nth(df, "event_id", 1).count() == 100
    kept = sorted(r.event_id for r in
                  V.every_nth(df, "event_id", 33).collect())
    assert kept == [0, 33, 66, 99]


def test_moment_cache_superset_reuse(sweep):
    df, _, _, _ = sweep
    calls = []

    def build(channels):
        calls.append(tuple(channels))
        return V.sweep_moments(df, list(channels))

    cache = V.MomentCache(build)
    cache.get(["AccelGround"])
    cache.get(["AccelGround"])                      # covered → reuse
    assert calls == [("AccelGround",)]
    cache.get(CHANNELS)                             # wider → rebuild union
    assert calls[-1] == tuple(sorted(CHANNELS))
    cache.get(["AccelStage1"])                      # subset → reuse
    assert len(calls) == 2
