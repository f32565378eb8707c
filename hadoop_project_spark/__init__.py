"""hadoop_project_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference repo ``sjchin88/hadoop-project`` (a corpus of
Hadoop MapReduce workloads: word count, flight self-join, airline delay
aggregation, iterative K-Means — see SURVEY.md), re-expressed as
DataFrame / Spark SQL logical plans that Catalyst + Tungsten optimize,
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference never had.

Design rules (enforced throughout):
  * DataFrame/SQL first — no RDDs in the hot path.
  * Declarative plans so Catalyst does pushdown / pruning / join choice.
  * Broadcast small dimensions; shuffle only on real keys; AQE on.
  * Python UDFs only where built-ins can't express the semantics, and
    then only Arrow-batched (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"

from hadoop_project_spark.session import get_spark  # noqa: F401
from hadoop_project_spark.catalog import load_table, register_views  # noqa: F401
