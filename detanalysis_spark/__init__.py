"""detanalysis_spark — PySpark-native detector-event analytics engine.

Brand-new engine with the query/data-processing capabilities of
spice-herald/detanalysis (see SURVEY.md), re-expressed as idiomatic
Spark DataFrame/SQL plans, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal).
"""

from .session import get_spark
from .analyzer import Analyzer, CutInfo, FeatureInfo, ensure_event_index, EVENT_INDEX
from .semiautocut import Semiautocut, MasterSemiautocuts
from .registry import (load_plugins, version, authors, date,
                       description, contact)
from .vibration import (sweep_moments, continuous_moments,
                        psd_from_moments, transfer_functions, MomentCache,
                        VibrationAnalyzer)
from .photon import (fit_spectrum, fit_spectrum_grouped,
                     photon_peak_expr, average_pulses,
                     fft_ensemble_stats, apply_dpdi, fit_template,
                     subtract_zero_photon_means, crosstalk_template,
                     subtract_template_expr, subtract_template_means,
                     PhotonCalibration)
from .picker import TracePicker
from . import registry as func  # reference exposes decorators via `func`

# reference-name aliases (detanalysis/__init__.py:1-6 exports exactly:
# Analyzer, Vibration_Analyzer, Semiautocut, MasterSemiautocuts,
# ScatterPlotter, PhotonCalibration) — a migrating user's imports work
# verbatim
Vibration_Analyzer = VibrationAnalyzer
ScatterPlotter = TracePicker

__version__ = "0.4.0"

__all__ = [
    "get_spark", "Analyzer", "CutInfo", "FeatureInfo",
    "ensure_event_index", "EVENT_INDEX", "Semiautocut",
    "MasterSemiautocuts", "load_plugins",
    "version", "authors", "date", "description", "contact",
    "sweep_moments", "continuous_moments", "psd_from_moments",
    "transfer_functions", "MomentCache",
    "fit_spectrum", "fit_spectrum_grouped", "photon_peak_expr", "average_pulses",
    "fft_ensemble_stats", "apply_dpdi", "fit_template",
    "TracePicker", "VibrationAnalyzer", "PhotonCalibration",
    "Vibration_Analyzer", "ScatterPlotter", "func",
    "__version__",
]
