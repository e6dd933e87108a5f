"""Opt-in robustness sweep (slow; not part of the default gate):

    SPARK_GRAFT_STRESS=1 python -m pytest tests/test_stress.py -q

Re-runs every oracled catalog query under an ADVERSARIAL session — prime
shuffle-partition count (different float summation order / window
partition boundaries than the dev default) and a UTC+14 session timezone
— and requires the same bit-exact oracle match. This is the flake hunt
for rounding-boundary and timezone bugs; the full catalog passed it at
round-3 close (see PERF_NOTES.md).
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_STRESS"),
    reason="set SPARK_GRAFT_STRESS=1 to run the adversarial sweep",
)


@pytest.fixture(scope="module")
def adversarial_spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.sql.session.timeZone", "Pacific/Kiritimati")
        .config("spark.ui.enabled", "false")
        .appName("rbds-stress")
        .getOrCreate()
    )
    yield s


def _names():
    from real_big_data_project_spark.plans import queries_map

    return sorted(queries_map())


@pytest.mark.parametrize("name", _names())
def test_query_stable_under_adversarial_session(adversarial_spark, name):
    from real_big_data_project_spark.plans.oracle_check import check_query

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    res = check_query(adversarial_spark, name, sf)
    assert res.ok and res.values_bit_equal, f"{name}: {res.detail}"
