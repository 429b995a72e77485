"""Scale utilities: salted join produces exactly the plain join's result;
bucketed tables join with zero exchanges in the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from pincspark.operators.scale import bucketed_join, salted_join, write_bucketed
from pincspark.sources.tables import table
from tests.conftest import SF_DIR


def test_salted_join_equals_plain_join(spark):
    ev = table(spark, SF_DIR, "events").select("event_id", "user_id")
    cust = table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    plain = ev.join(cust, "user_id").select("event_id", "c_name")
    salted = salted_join(ev, cust, "user_id", salt=8).select("event_id", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_is_exchange_free(spark):
    # managed tables land in ./spark-warehouse (gitignored); dropped below
    orders = table(spark, SF_DIR, "orders")
    lineitem = table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", buckets=8)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ivf_kmeans_recall(spark):
    """Trained IVF (spherical k-means centroids, deterministic smallest-id
    init) must reach recall@5 >= 0.9 vs the exact brute-force top-k at
    sf0.01 probing 8 of 16 cells. (The synthetic embeddings are near-
    uniform random, the worst case for clustering — real corpora cluster
    and need a smaller probe fraction; the test pins the index returns
    near-exact results at half the scan cost, not just plumbing.)"""
    from pyspark.sql import functions as F

    from pincspark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from tests.conftest import SF_DIR_T2

    emb = table(spark, SF_DIR_T2, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, queries, k=5)
    cents = kmeans_centroids(emb, num_cells=16, iters=5)
    approx = ivf_topk(emb, queries, k=5, num_cells=16, nprobe=8, centroids=cents)
    hits = exact.select("query_id", "neighbor_id").intersect(
        approx.select("query_id", "neighbor_id")
    )
    recall = hits.count() / exact.count()
    assert recall >= 0.9, recall
