"""Presentation adapter: the matplotlib-optional contract (a clear
ImportError, headless providers untouched) runs everywhere; actual Agg
render smoke tests run only where matplotlib is installed (same
environment-gate pattern as the PIL/h5py tests)."""
import numpy as np
import pytest

from detanalysis_spark import plotting

HAVE_MPL = plotting.HAVE_MPL
if HAVE_MPL:                    # force the headless backend for tests
    import matplotlib
    matplotlib.use("Agg")


def test_import_guard_message():
    if HAVE_MPL:
        pytest.skip("matplotlib installed — guard path not reachable")
    with pytest.raises(ImportError, match="matplotlib is required"):
        plotting.hist((np.ones(4), np.arange(5.0)))
    with pytest.raises(ImportError, match="matplotlib is required"):
        plotting.heatmap(np.ones((2, 2)), [0, 1, 2], [0, 1, 2])


def test_headless_providers_unaffected(spark, sf_dir):
    """plot=False (default) keeps the data contract: hist returns
    (values, edges); scatter returns a bounded DataFrame."""
    from detanalysis_spark import Analyzer
    az = Analyzer.from_parquet(spark, f"{sf_dir}/events.parquet")
    values, edges = az.hist("value", shape=8)
    assert len(values) == 8 and len(edges) == 9
    pts = az.scatter("value", "ts", max_points=50)
    assert pts.columns == ["x", "y"] and pts.count() <= 50


@pytest.mark.skipif(not HAVE_MPL, reason="matplotlib not installed")
class TestRender:
    def test_hist_render(self):
        fig, ax = plotting.hist(
            [(np.array([1.0, 4, 2]), np.array([0.0, 1, 2, 3])),
             (np.array([2.0, 1, 5]), np.array([0.0, 1, 2, 3]))],
            labels=["all", "cut"], logy=False, title="t")
        assert len(ax.collections) + len(ax.patches) + \
            len(ax.get_children()) > 0
        assert ax.get_title() == "t"
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_hist_normalize_density(self):
        values = np.array([2.0, 2.0])
        edges = np.array([0.0, 1.0, 2.0])
        fig, ax = plotting.hist((values, edges), normalize=True,
                                logy=False)
        stairs = ax.collections[-1] if ax.collections else None
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_heatmap_render(self):
        grid = np.arange(12.0).reshape(3, 4)
        fig, ax = plotting.heatmap(grid, np.arange(4.0), np.arange(5.0),
                                   logscale=True)
        assert ax.collections          # the pcolormesh
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_scatter_render_arrays_and_spark(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(i * i)) for i in range(10)], ["x", "y"])
        fig, ax = plotting.scatter([df, (np.arange(3.0), np.ones(3))],
                                   labels=["a", "b"])
        assert len(ax.collections) == 2
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_psd_and_tf_render(self, spark):
        psd = spark.createDataFrame(
            [(float(f), ch, 1.0 + f, 0.01) for f in range(1, 5)
             for ch in ("chA", "chB")],
            "frequency_hz double, channel string, psd double, "
            "asd_variance double")
        fig, ax = plotting.psd(psd)
        assert len(ax.lines) == 2
        import matplotlib.pyplot as plt
        plt.close(fig)

        tf = spark.createDataFrame(
            [(float(f), "chA", "chB", "cross", 1.0, 0.5, 0.05)
             for f in range(1, 5)],
            "frequency_hz double, channel_output string, "
            "channel_input string, method string, tf_re double, "
            "tf_im double, tf_sigma double")
        fig, ax = plotting.transfer_function(tf)
        assert len(ax.lines) == 1
        plt.close(fig)
        fig, ax = plotting.transfer_function_phase(tf)
        assert len(ax.lines) == 1
        plt.close(fig)

    def test_analyzer_plot_hook(self, spark, sf_dir):
        from detanalysis_spark import Analyzer
        az = Analyzer.from_parquet(spark, f"{sf_dir}/events.parquet")
        fig, ax = az.hist("value", shape=8, plot=True, logy=False)
        assert ax.get_xlabel() == "value"
        import matplotlib.pyplot as plt
        plt.close(fig)
        fig, ax = az.heatmap("value", "ts", shape=8, plot=True)
        plt.close(fig)

    def test_colors_validation(self):
        with pytest.raises(ValueError, match="length 2"):
            plotting.hist(
                [(np.ones(2), np.arange(3.0))] * 2, colors=["red"])
        cols = plotting._colors(8)       # > default palette → colormap
        assert len(cols) == 8
