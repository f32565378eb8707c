"""Correctness harness: DuckDB-as-oracle comparison utilities
(SURVEY.md §5 — the test strategy the reference never had)."""

from hadoop_project_spark.quality.oracle import compare_to_oracle, OracleMismatch  # noqa: F401
