"""userbehavioranalysis_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference project ``IronmanJay/UserBehaviorAnalysis``
(Scala/Flink 1.7.2 DataStream jobs; see SURVEY.md).  Every analytic is a
pure ``DataFrame -> DataFrame`` function built on the declarative
DataFrame/SQL API so Catalyst supplies predicate pushdown, column
pruning, partial aggregation and join selection; Structured Streaming
supplies the event-time/watermark/state layer for the streaming forms.

Subpackages
-----------
- ``sources``    readers for the driver testdata and the reference's CSV /
                 apache-log formats (SURVEY §2.1 S1-S4)
- ``operators``  the analytic operator library (SURVEY §2.2-§2.8)
- ``functions``  shared column-expression helpers (time, text, vectors)
- ``plans``      multi-operator relational plans (bench headliners)
- ``streaming``  Structured Streaming variants (watermarks, stateful ops)
"""

from userbehavioranalysis_spark.session import get_spark

__all__ = ["get_spark"]
