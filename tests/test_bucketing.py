"""Bucketed joins must be exchange-free on the join key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.plans.bucketing import read_table, write_bucketed
from pinecone_datasets_spark.plans.explain import formatted_plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # managed-table locations outlive catalog metadata across sessions;
    # clear both so reruns don't hit LOCATION_ALREADY_EXISTS
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "li_b", ["l_orderkey"], num_buckets=8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_b", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"])
    a = read_table(spark, "li_b")
    b = read_table(spark, "ord_b")
    joined = a.join(
        b, a.l_orderkey == b.o_orderkey
    ).groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("q"))
    # disable broadcast so the join planner must choose SMJ, then verify
    # bucketing removed the exchanges under it
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_section = plan.split("SortMergeJoin")[0]
    assert "SortMergeJoin" in plan
    # no shuffle below the join: the only allowed Exchange is the one for
    # the final groupBy aggregation
    pre_join = plan[: plan.index("SortMergeJoin")]
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # correctness unchanged vs plain join
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("q"))
    )
    got = {(r["o_orderpriority"], round(r["q"], 4)) for r in joined.collect()}
    want = {(r["o_orderpriority"], round(r["q"], 4)) for r in plain.collect()}
    assert got == want
