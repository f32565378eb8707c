"""The reference repo's four workloads, re-expressed Spark-first with
their exact semantics (including documented bug-compat decisions,
SURVEY.md §7.3). Pure functions: DataFrames in → DataFrame out."""

from hadoop_project_spark.workloads.wordcount import word_count, word_count_filtered  # noqa: F401
from hadoop_project_spark.workloads.flight_join import two_leg_delay_stats  # noqa: F401
from hadoop_project_spark.workloads.airline_delay import (  # noqa: F401
    airline_month_avg_delay,
    format_delay_matrix,
)
from hadoop_project_spark.workloads.kmeans_pipeline import run_kmeans_pipeline  # noqa: F401
