"""Matplotlib presentation adapter over the engine's headless outputs.

The engine computes plot-ready DATA distributed-side (histogram grids,
sampled scatter frames, PSD/TF caches, picked traces) and never needs
matplotlib; this module is the thin render layer a migrating reference
user expects — the draw half of the reference's ``hist`` / ``heatmap``
/ ``scatter`` (``/root/reference/detanalysis/analyzer.py:579-810``),
``ScatterPlotter`` (``scatterplotter.py:203-323``) and the vibration
figures (``vibration_analyzer.py:1051-1169, 1256-1640``).

matplotlib is OPTIONAL: every entry point goes through
:func:`_require_mpl`, which raises a clear ImportError when the
library is absent — nothing else in the package imports this module's
dependency. Rendering happens driver-side over already-reduced data
(≤ shape bins, ≤ max_points samples, per-frequency-bin frames), so
nothing here touches the distributed path or changes at 100 TB.
"""
from __future__ import annotations

from typing import Any, Sequence

__all__ = [
    "hist", "heatmap", "scatter", "traces", "psd",
    "transfer_function", "transfer_function_phase", "HAVE_MPL",
]

try:                                    # pragma: no cover - env dependent
    import matplotlib
    HAVE_MPL = True
except Exception:                       # pragma: no cover
    matplotlib = None
    HAVE_MPL = False

# the reference's default cut-overlay palette (analyzer.py:617-623)
_DEFAULT_COLORS = ["blue", "red", "green", "cyan", "magenta", "yellow"]


def _require_mpl():
    if not HAVE_MPL:
        raise ImportError(
            "matplotlib is required for detanalysis_spark.plotting — "
            "install it, or use the headless data providers "
            "(Analyzer.hist/heatmap/scatter, TracePicker.plot_*, "
            "SweepAnalyzer.plot_psd/plot_transfer_function) directly")
    import matplotlib.pyplot as plt
    return plt


def _colors(n: int, colors=None, colormap: str | None = None):
    import numpy as np
    if colors is not None:
        colors = colors if isinstance(colors, list) else [colors]
        if len(colors) != n:
            raise ValueError(f'"colors" should have length {n}')
        return colors
    if n > len(_DEFAULT_COLORS) or colormap is not None:
        plt = _require_mpl()
        cmap = plt.get_cmap(colormap or "viridis")
        return [cmap(x) for x in np.linspace(0.1, 0.9, n)]
    return _DEFAULT_COLORS[:n]


def _ax(ax, figsize):
    plt = _require_mpl()
    if ax is None:
        fig, ax = plt.subplots(figsize=figsize)
        return fig, ax
    return ax.figure, ax


def _xy_frame(frame) -> tuple:
    """(x, y) arrays from a Spark/pandas frame or an (x, y) pair."""
    import numpy as np
    if isinstance(frame, tuple):
        return np.asarray(frame[0]), np.asarray(frame[1])
    if hasattr(frame, "toPandas"):
        frame = frame.toPandas()
    return frame["x"].to_numpy(), frame["y"].to_numpy()


def hist(hists, labels: Sequence[str] | None = None,
         colors=None, colormap: str | None = None, logx: bool = False,
         logy: bool = True, normalize: bool = False, figsize=(9, 6),
         title: str | None = None, xlabel: str | None = None,
         ylabel: str | None = None, ax=None, **kwargs):
    """Overlayed step histograms — the draw half of the reference's
    ``Analyzer.hist`` (analyzer.py:579-662).

    ``hists``: one ``(values, edges)`` pair (the return of
    ``Analyzer.hist`` / ``operators.histogram.hist1d``) or a list of
    them (one per cut, like the reference's ``cuts=[...]`` overlay —
    run ``Analyzer.hist`` once per cut; each is one distributed pass).
    Returns ``(fig, ax)``.
    """
    import numpy as np
    if not isinstance(hists, list):
        hists = [hists]
    if labels is not None and len(labels) != len(hists):
        raise ValueError(f'"labels" should have length {len(hists)}')
    cols = _colors(len(hists), colors, colormap)
    fig, axis = _ax(ax, figsize)
    kwargs.setdefault("linewidth", 2)
    for i, (values, edges) in enumerate(hists):
        values = np.asarray(values, dtype=float)
        if normalize:
            widths = np.diff(edges)
            total = float(values.sum())
            if total > 0:
                values = values / (total * widths)
        axis.stairs(values, edges, color=cols[i],
                    label=labels[i] if labels else None, **kwargs)
    if logx:
        axis.set_xscale("log")
    if logy:
        axis.set_yscale("log")
    if title:
        axis.set_title(title)
    if xlabel:
        axis.set_xlabel(xlabel)
    if ylabel:
        axis.set_ylabel(ylabel)
    if labels:
        axis.legend()
    return fig, axis


def heatmap(grid, x_edges, y_edges, logscale: bool = False,
            colormap: str = "viridis", colorbar: bool = True,
            figsize=(9, 6), title: str | None = None,
            xlabel: str | None = None, ylabel: str | None = None,
            ax=None, **kwargs):
    """2-D histogram heatmap — the draw half of ``Analyzer.heatmap``
    (analyzer.py:664-716). ``grid, x_edges, y_edges`` is the return of
    the headless ``heatmap``/``hist2d``. Returns ``(fig, ax)``."""
    import numpy as np
    plt = _require_mpl()
    from matplotlib.colors import LogNorm
    fig, axis = _ax(ax, figsize)
    grid = np.asarray(grid, dtype=float)
    norm = None
    if logscale:
        norm = LogNorm(vmin=max(grid[grid > 0].min(), 1e-12)
                       if (grid > 0).any() else 1e-12,
                       vmax=max(grid.max(), 1e-12))
        grid = np.where(grid > 0, grid, np.nan)
    mesh = axis.pcolormesh(np.asarray(x_edges), np.asarray(y_edges),
                           grid.T, cmap=colormap, norm=norm, **kwargs)
    if colorbar:
        fig.colorbar(mesh, ax=axis)
    if title:
        axis.set_title(title)
    if xlabel:
        axis.set_xlabel(xlabel)
    if ylabel:
        axis.set_ylabel(ylabel)
    return fig, axis


def scatter(frames, labels: Sequence[str] | None = None, colors=None,
            colormap: str | None = None, s: float = 4.0,
            alpha: float = 0.8, logx: bool = False, logy: bool = False,
            figsize=(9, 6), title: str | None = None,
            xlabel: str | None = None, ylabel: str | None = None,
            ax=None, **kwargs):
    """Cut-overlay scatter — the draw half of ``Analyzer.scatter`` /
    ``TracePicker.plot_picking_scatter`` (analyzer.py:717-810,
    scatterplotter.py:203-250).

    ``frames``: one frame or a list (one per cut) of (a) Spark
    DataFrames with ``x``/``y`` columns — ALREADY sampled to
    ``max_points`` by the headless providers, the collect here is
    bounded — (b) pandas frames, or (c) ``(x, y)`` array pairs.
    Returns ``(fig, ax)``."""
    if not isinstance(frames, list):
        frames = [frames]
    if labels is not None and len(labels) != len(frames):
        raise ValueError(f'"labels" should have length {len(frames)}')
    cols = _colors(len(frames), colors, colormap)
    fig, axis = _ax(ax, figsize)
    for i, frame in enumerate(frames):
        x, y = _xy_frame(frame)
        axis.scatter(x, y, s=s, alpha=alpha, color=cols[i],
                     label=labels[i] if labels else None, **kwargs)
    if logx:
        axis.set_xscale("log")
    if logy:
        axis.set_yscale("log")
    if title:
        axis.set_title(title)
    if xlabel:
        axis.set_xlabel(xlabel)
    if ylabel:
        axis.set_ylabel(ylabel)
    if labels:
        axis.legend()
    return fig, axis


def traces(trace_df, fs: float = 1.25e6, trace_col: str = "trace",
           channel_col: str = "channel", max_traces: int = 16,
           figsize=(10, 6), title: str | None = None, ax=None,
           **kwargs):
    """Picked raw traces vs time — the draw half of the reference's
    picked-event figure (scatterplotter.py:255-323). ``trace_df`` is
    the ``pick_traces`` / ``get_traces`` frame; the collect is bounded
    by ``max_traces``. Returns ``(fig, ax)``."""
    import numpy as np
    fig, axis = _ax(ax, figsize)
    if hasattr(trace_df, "limit"):
        rows = trace_df.limit(int(max_traces)).collect()
        rows = [r.asDict() for r in rows]
    else:
        rows = list(trace_df)[: int(max_traces)]
    for r in rows:
        y = np.asarray(r[trace_col], dtype=float)
        t = np.arange(y.size) / float(fs)
        label = str(r.get(channel_col)) if channel_col in r else None
        axis.plot(t, y, label=label, **kwargs)
    axis.set_xlabel("time [s]")
    axis.set_ylabel("amplitude")
    if title:
        axis.set_title(title)
    if rows and channel_col in rows[0]:
        axis.legend(fontsize=8)
    return fig, axis


def _pandas(df):
    return df.toPandas() if hasattr(df, "toPandas") else df


def psd(psd_df, asd: bool = True, sigma_band: bool = True,
        figsize=(14, 6), title: str | None = None, ax=None, **kwargs):
    """Per-channel PSD/ASD spectra with the 1σ band — the draw half of
    ``SweepAnalyzer.plot_psd`` (vibration_analyzer.py:1598-1640).
    ``psd_df``: the cached frame ``(frequency_hz, channel, psd,
    asd_variance)``; the collect is bounded (one row per frequency bin
    per channel). Returns ``(fig, ax)``."""
    import numpy as np
    fig, axis = _ax(ax, figsize)
    pdf = _pandas(psd_df).sort_values("frequency_hz")
    for ch, grp in pdf.groupby("channel"):
        f = grp["frequency_hz"].to_numpy()
        y = np.sqrt(np.maximum(grp["psd"].to_numpy(), 0.0)) if asd \
            else grp["psd"].to_numpy()
        line, = axis.plot(f, y, label=str(ch), **kwargs)
        if sigma_band and "asd_variance" in grp:
            s = np.sqrt(np.maximum(grp["asd_variance"].to_numpy(), 0.0))
            if not asd:
                s = 2.0 * y * s    # d(PSD) = 2·ASD·d(ASD)
            axis.fill_between(f, y - s, y + s, alpha=0.25,
                              color=line.get_color())
    axis.set_xscale("log")
    axis.set_yscale("log")
    axis.set_xlabel("frequency [Hz]")
    axis.set_ylabel("ASD" if asd else "PSD")
    axis.legend()
    if title:
        axis.set_title(title)
    return fig, axis


def transfer_function(tf_df, methods: Sequence[str] | None = None,
                      sigma_band: bool = True, figsize=(14, 6),
                      title: str | None = None, ax=None, **kwargs):
    """TF magnitude per (method, output/input pair) with the 1σ band —
    the draw half of ``plot_transfer_function``
    (vibration_analyzer.py:1256-1432). ``tf_df``: the cached frame
    ``(frequency_hz, channel_output, channel_input, method, tf_re,
    tf_im, tf_sigma)``. Returns ``(fig, ax)``."""
    import numpy as np
    fig, axis = _ax(ax, figsize)
    pdf = _pandas(tf_df).sort_values("frequency_hz")
    if methods is not None:
        pdf = pdf[pdf["method"].isin(list(methods))]
    for (out, inp, method), grp in pdf.groupby(
            ["channel_output", "channel_input", "method"]):
        f = grp["frequency_hz"].to_numpy()
        mag = np.hypot(grp["tf_re"].to_numpy(), grp["tf_im"].to_numpy())
        line, = axis.plot(f, mag, label=f"{out}/{inp} [{method}]",
                          **kwargs)
        if sigma_band and "tf_sigma" in grp:
            s = np.maximum(grp["tf_sigma"].to_numpy(), 0.0)
            axis.fill_between(f, mag - s, mag + s, alpha=0.25,
                              color=line.get_color())
    axis.set_xscale("log")
    axis.set_yscale("log")
    axis.set_xlabel("frequency [Hz]")
    axis.set_ylabel("|TF|")
    axis.legend(fontsize=8)
    if title:
        axis.set_title(title)
    return fig, axis


def transfer_function_phase(tf_df, methods: Sequence[str] | None = None,
                            degrees: bool = True, figsize=(14, 6),
                            title: str | None = None, ax=None, **kwargs):
    """TF phase per (method, pair) — the draw half of
    ``plot_transfer_function_phase`` (vibration_analyzer.py:1433-1560).
    Accepts the cached TF frame (phase from atan2(tf_im, tf_re)).
    Returns ``(fig, ax)``."""
    import numpy as np
    fig, axis = _ax(ax, figsize)
    pdf = _pandas(tf_df).sort_values("frequency_hz")
    if methods is not None:
        pdf = pdf[pdf["method"].isin(list(methods))]
    for (out, inp, method), grp in pdf.groupby(
            ["channel_output", "channel_input", "method"]):
        f = grp["frequency_hz"].to_numpy()
        ph = np.arctan2(grp["tf_im"].to_numpy(), grp["tf_re"].to_numpy())
        if degrees:
            ph = np.degrees(ph)
        axis.plot(f, ph, label=f"{out}/{inp} [{method}]", **kwargs)
    axis.set_xscale("log")
    axis.set_xlabel("frequency [Hz]")
    axis.set_ylabel("phase [deg]" if degrees else "phase [rad]")
    axis.legend(fontsize=8)
    if title:
        axis.set_title(title)
    return fig, axis
