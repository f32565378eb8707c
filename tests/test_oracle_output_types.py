"""Every oracle's OUTPUT column types must stay inside the set the
driver's value-hash has actually certified green.

Round-13 postmortem (quality_lr_train / quality_lr_corpus_filter,
hash-red in the driver for two consecutive rounds while green under the
local comparator): DuckDB's SUM(BIGINT) returns HUGEINT, and the LR
oracle's weight-update chain let that int128 type ride into the final
output columns (train's wq, corpus_filter's score_q). The VALUES were
identical on both engines — exhaustive BMP fuzzing of the feature SQL
and the full fit chain found no engine divergence on any text — but
HUGEINT is canonicalized differently from int64 by the driver's hasher
(the local comparator's plain fetchall() masks this: Python ints
compare equal regardless of width). The one trio member whose oracle
CASTs every output column (quality_lr_eval) was green throughout; of
all 204 oracles, exactly the two with a HUGEINT output column were the
two red rows.

This test pins the class: run every oracle against the small-sf DuckDB
and assert no output column has a type outside the certified set.
INTEGER is allowed (dozens of driver-green queries emit int32 rank
columns); HUGEINT/UBIGINT/DECIMAL/FLOAT are not — cast to
BIGINT/DOUBLE at the oracle's output projection instead.
"""

from __future__ import annotations

import duckdb
import pytest

from hadoop_project_spark.plans import all_queries

# Types that have appeared in driver-hash-green queries. Anything else
# (HUGEINT, UBIGINT, DECIMAL(x,y), FLOAT, TINYINT, ...) must be cast at
# the oracle's output projection.
CERTIFIED = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP_NS",
}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


SPECS = {n: s for n, s in all_queries().items() if s.oracle is not None}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_output_types_certified(duck, name):
    rel = duck.sql(SPECS[name].oracle)
    weird = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in CERTIFIED
    ]
    assert not weird, (
        f"{name}: oracle output columns {weird} use types the driver's "
        f"value-hash has never certified — add an explicit CAST at the "
        f"output projection (see module docstring)"
    )
