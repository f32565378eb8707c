"""Mirror of the driver's correctness gate: every registered query with
an oracle must hash-match DuckDB on the same parquet tables."""

from __future__ import annotations

import pytest

from hadoop_project_spark.plans import all_queries
from hadoop_project_spark.quality import compare_to_oracle

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.build(spark, sf_dir)
    if spec.oracle is None:
        # rows-only check (non-SQL-expressible op): must run and be stable
        assert df.count() >= 0
        return
    res = compare_to_oracle(spark, df, spec.oracle, sf_dir, name=name)
    assert res.ok
