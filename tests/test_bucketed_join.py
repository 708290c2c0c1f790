"""Co-located bucketed join: two tables bucketed on the same key with the
same bucket count must join with no Exchange (shuffle) on either side, and
produce the same rows as the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_team5_spark.plans.catalog import table
from data_pipeline_team5_spark.sources.writers import write_bucketed
from tests.conftest import SF_SMALL


@pytest.fixture()
def bucketed_pair(spark):
    names = ("t_bkt_orders", "t_bkt_lineitem")
    orders = table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    li = table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, names[0], "o_orderkey", buckets=8)
    write_bucketed(li, names[1], "l_orderkey", buckets=8)
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    o_name, l_name = bucketed_pair
    o = spark.table(o_name)
    li = spark.table(l_name)
    # Force the sort-merge path: a broadcast would trivially avoid the
    # shuffle and prove nothing about bucket co-location.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, o.o_orderkey == li.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        n_bucketed = joined.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    plain_o = table(spark, SF_SMALL, "orders")
    plain_l = table(spark, SF_SMALL, "lineitem")
    n_plain = plain_o.join(
        plain_l, plain_o.o_orderkey == plain_l.l_orderkey
    ).count()
    assert n_bucketed == n_plain and n_bucketed > 0
