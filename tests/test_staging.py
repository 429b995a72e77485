"""pincspark.staging.stage: the cluster-readiness knob. Every staged
operator must produce IDENTICAL results whether lineage is cut with
localCheckpoint (default) or reliable checkpoint() (the executor-loss-
safe mode a real cluster uses) — pinned here on the iterative operators
that stage most aggressively."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture
def reliable_mode(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set("spark.pincspark.staging", "reliable")
    try:
        yield str(tmp_path / "ckpt")
    finally:
        spark.conf.unset("spark.pincspark.staging")


def test_pagerank_identical_under_reliable_checkpoint(spark, reliable_mode):
    from pincspark.operators.graph import pagerank_int

    edges = [(i, i // 2) for i in range(2, 40)] + [(1, 0), (0, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got_reliable = {r["node"]: r["rank"] for r in pagerank_int(df).collect()}
    # checkpoint files actually landed on "reliable storage"
    ckpt_files = [
        os.path.join(d, f)
        for d, _, fs in os.walk(reliable_mode)
        for f in fs
    ]
    assert ckpt_files, "reliable mode produced no checkpoint files"
    spark.conf.unset("spark.pincspark.staging")
    got_local = {r["node"]: r["rank"] for r in pagerank_int(df).collect()}
    assert got_reliable == got_local  # integer ranks: bit-identical


def test_dedup_clusters_identical_under_reliable_checkpoint(spark, reliable_mode):
    from pincspark.operators.dedup import dedup_clusters

    # force the distributed propagation path (not the driver union-find)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 60, 2)] + [(1, 2), (3, 4)],
        ["id_a", "id_b"],
    )
    got_reliable = {
        (r["node"], r["cluster_id"])
        for r in dedup_clusters(pairs, "id_a", "id_b", driver_threshold=0).collect()
    }
    spark.conf.unset("spark.pincspark.staging")
    got_local = {
        (r["node"], r["cluster_id"])
        for r in dedup_clusters(pairs, "id_a", "id_b", driver_threshold=0).collect()
    }
    assert got_reliable == got_local and got_reliable


def test_bpe_merges_identical_under_reliable_checkpoint(spark, reliable_mode):
    from pincspark.operators.vocab import bpe_train

    docs = spark.createDataFrame(
        [(i, "the quick brown fox the quick") for i in range(6)],
        ["doc_id", "text"],
    )
    got_reliable = bpe_train(docs, n_merges=4)
    spark.conf.unset("spark.pincspark.staging")
    got_local = bpe_train(docs, n_merges=4)
    assert got_reliable == got_local and len(got_reliable) == 4


def test_unknown_staging_mode_rejected(spark):
    from pincspark.staging import stage

    spark.conf.set("spark.pincspark.staging", "bogus")
    try:
        with pytest.raises(ValueError, match="bogus"):
            stage(spark.range(3), "t")
    finally:
        spark.conf.unset("spark.pincspark.staging")
