"""Query-plan registry — the engine's public query surface.

Every operator class from SURVEY.md §2 (plus the training-data-pipeline
extensions) is exposed as a named query over the driver's test tables,
each paired with an ANSI-SQL oracle that DuckDB runs on the same parquet
for the correctness gate.
"""

from hadoop_project_spark.plans.registry import QuerySpec, all_queries, register  # noqa: F401

# Import for side effect: each module registers its queries.
from hadoop_project_spark.plans import relational  # noqa: F401,E402
from hadoop_project_spark.plans import relational2  # noqa: F401,E402
from hadoop_project_spark.plans import relational3  # noqa: F401,E402
from hadoop_project_spark.plans import correlated  # noqa: F401,E402
from hadoop_project_spark.plans import reference_workloads  # noqa: F401,E402
from hadoop_project_spark.plans import text_pipeline  # noqa: F401,E402
from hadoop_project_spark.plans import bpe_queries  # noqa: F401,E402
from hadoop_project_spark.plans import dedup_queries  # noqa: F401,E402
from hadoop_project_spark.plans import corpus_queries  # noqa: F401,E402
from hadoop_project_spark.plans import similarity_queries  # noqa: F401,E402
from hadoop_project_spark.plans import ml_queries  # noqa: F401,E402
from hadoop_project_spark.plans import multimodal_queries  # noqa: F401,E402
from hadoop_project_spark.plans import roundtrip_queries  # noqa: F401,E402
from hadoop_project_spark.plans import packing_queries  # noqa: F401,E402
from hadoop_project_spark.plans import sql_api  # noqa: F401,E402
from hadoop_project_spark.plans import diagnostics_queries  # noqa: F401,E402
from hadoop_project_spark.plans import pii_queries  # noqa: F401,E402
from hadoop_project_spark.plans import matching_queries  # noqa: F401,E402
from hadoop_project_spark.plans import governance_queries  # noqa: F401,E402
from hadoop_project_spark.plans import tpch_extra  # noqa: F401,E402
from hadoop_project_spark.plans import validation_queries  # noqa: F401,E402
from hadoop_project_spark.plans import ssjoin_queries  # noqa: F401,E402
from hadoop_project_spark.plans import sketch_queries  # noqa: F401,E402
from hadoop_project_spark.plans import sampling_queries  # noqa: F401,E402
from hadoop_project_spark.plans import behavior_queries  # noqa: F401,E402
from hadoop_project_spark.plans import invindex_queries  # noqa: F401,E402
from hadoop_project_spark.plans import quality_lr_queries  # noqa: F401,E402
from hadoop_project_spark.plans import retrieval_queries  # noqa: F401,E402
