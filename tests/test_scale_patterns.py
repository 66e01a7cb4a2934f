"""Scale-pattern tests: salting equivalence, bucketed co-located joins.

These verify the 100 TB toolkit produces *identical results* to the
naive plans (salting) and *removes shuffles* (bucketing)."""

import pytest
from pyspark.sql import functions as F

from event_streamer_spark.plans import explain_str
from event_streamer_spark.skew import salted_count, salted_join
from event_streamer_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    li = load(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    orders = load(spark, SF, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    plain = li.join(orders, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    salted = salted_join(li, orders, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    assert (plain["n"], plain["q"]) == (salted["n"], salted["q"])


def test_salted_count_matches_plain_count(spark):
    ev = load(spark, SF, "events")
    plain = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        r["event_type"]: r["cnt"] for r in salted_count(ev, "event_type").collect()
    }
    assert plain == salted


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates matching rows:
    the join plan must contain no Exchange (the 100 TB repeated-join
    pattern — pay the shuffle once at write time)."""
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    # force the sort-merge path: broadcast would hide the bucketing
    # (and at real scale neither side fits in a broadcast anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    orders = load(spark, SF, "orders")
    customer = load(spark, SF, "customer")
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        orders.write.bucketBy(4, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        customer.write.bucketBy(4, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("b_customer")
    )
    try:
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = explain_str(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it still returns the right rows
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
