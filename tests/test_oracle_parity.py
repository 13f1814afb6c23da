"""Per-query Spark-vs-DuckDB parity — the local mirror of the driver's
t2 correctness gate, run at sf0.01 (same scale the driver uses).

Every registered query with an oracle must match exactly; oracle-less
queries (approximate ops) must at least run and return a stable schema.
"""

from __future__ import annotations

import os

import pytest

from cascading_hbase_spark.queries import ORACLES, QUERIES
from tests.parity import compare, duck_connection

SF_DIR = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    ddf = duck.execute(ORACLES[name]).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


# NOTE: since r09 the registry is fully oracled, so this parameter set
# is EMPTY and pytest reports one structural skip ("got empty parameter
# set") — that skip is the 270/270-oracled milestone, not a gap.  The
# test stays as the guard that would catch a future oracle-less
# registration.
@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
