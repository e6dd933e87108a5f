"""Every catalog query must match its DuckDB oracle (the driver's gate,
replicated locally). Runs at sf0.001 by default for speed; set
SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01 for the driver-scale check.
"""

from __future__ import annotations

import pytest

from real_big_data_project_spark.plans import queries_map
from real_big_data_project_spark.plans.oracle_check import check_query

ALL_QUERIES = sorted(queries_map().keys())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir)
    assert res.ok, f"{name}: {res.detail}"
    assert res.values_bit_equal, (
        f"{name}: values close but not bit-equal — driver hash at risk:"
        f" {res.detail}"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"user_id", "trade_date", "open", "close", "boll_mean"} <= set(df.columns)


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
