"""spark_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference toolkit ``dllllb/spark-pipeline`` (PyPI ``spark-pipeline``,
package ``sparktools``), plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design stance (see SURVEY.md §7):

- one ``SparkSession``; every operator is a pure ``DataFrame -> DataFrame``
  function; no ``.rdd`` anywhere (the reference's RDD paths —
  ``sparktools/core.py:24,115`` — are replaced by Catalyst-visible plans);
- explicit schemas; Arrow enabled; AQE enabled;
- Catalyst does all optimization — predicate pushdown, column pruning,
  broadcast-join selection; library code only declares the plan.
"""

from spark_pipeline_spark.session import get_session, session_builder

__version__ = "0.2.0"

__all__ = ["get_session", "session_builder", "__version__"]
