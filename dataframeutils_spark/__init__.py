"""dataframeutils_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query/data-processing
capabilities of wilko2587/DataFrameUtils (grouped time-series analytics
over timestamped panel data: the chronological weighted-bin calculator
and the full TimeSeriesStudy surface), extended with the operators a
large-scale LLM-training-data pipeline needs (dedup, similarity search,
text analysis, multimodal column plumbing).

Design principles
-----------------
* DataFrame/SQL first: every closed-form statistic is expressed with
  native ``pyspark.sql.functions`` + ``Window`` so Catalyst/Tungsten
  handle pushdown, pruning, whole-stage codegen and AQE.
* ``applyInPandas`` only for genuinely iterative fits (ADF autolag,
  GARCH MLE, Markov-switching EM, isolation forest ...), always behind a
  min-length pre-filter so tiny groups never reach the Python stage.
* NaN is normalized to SQL NULL at operator boundaries.
* Deterministic output contracts: group keys are ``"v1:v2"`` strings
  (``"__ALL__"`` when ungrouped), stable orderings, aliased columns.
"""

from dataframeutils_spark.session import get_spark
from dataframeutils_spark.schema import PanelSchema, melt_panel, group_key_col
from dataframeutils_spark.api import CorpusStudy, EventStudy, TimeSeriesStudy

__all__ = [
    "get_spark",
    "PanelSchema",
    "melt_panel",
    "group_key_col",
    "TimeSeriesStudy",
    "CorpusStudy",
    "EventStudy",
]

__version__ = "0.1.0"
