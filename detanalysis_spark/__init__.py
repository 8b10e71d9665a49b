"""detanalysis_spark — PySpark-native detector-event analytics engine.

Brand-new engine with the query/data-processing capabilities of
spice-herald/detanalysis (see SURVEY.md), re-expressed as idiomatic
Spark DataFrame/SQL plans, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal).
"""

from .session import get_spark
from .analyzer import Analyzer, CutInfo, FeatureInfo, ensure_event_index, EVENT_INDEX
from .semiautocut import Semiautocut, MasterSemiautocuts

__version__ = "0.2.0"

__all__ = [
    "get_spark", "Analyzer", "CutInfo", "FeatureInfo",
    "ensure_event_index", "EVENT_INDEX", "Semiautocut",
    "MasterSemiautocuts", "__version__",
]
