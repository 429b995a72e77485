"""Persistent IVF index (operators/ann_index.py): build/load round-trip,
query identity with the transient `ivf_topk` path, and PROOF that the
cell-partitioned layout actually prunes — the serving read touches only
the probed partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from pincspark.operators.ann_index import (
    build_ivf_index,
    ivf_index_topk,
    load_ivf_index,
)
from pincspark.operators.similarity import ivf_topk
from pincspark.sources.tables import table
from tests.conftest import SF_DIR


def _queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_persisted_index_matches_transient_ivf(spark, tmp_path):
    emb = table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, num_cells=16)

    served = ivf_index_topk(
        spark, path, _queries(emb), k=5, nprobe=4
    ).collect()
    transient = ivf_topk(emb, _queries(emb), k=5, num_cells=16, nprobe=4).collect()
    assert sorted(map(tuple, served)) == sorted(map(tuple, transient))
    assert len(served) == 50  # 10 queries x k=5


def test_postings_scan_is_partition_pruned(spark, tmp_path):
    """The whole point of the cell-partitioned layout: a probe of a few
    cells must reach the parquet source as a PartitionFilter, reading
    only those cell directories."""
    emb = table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, num_cells=16)
    _, postings = load_ivf_index(spark, path)

    pruned = postings.filter(F.col("cell").isin([3, 7]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]
    # and the pruned read really returns only those cells
    cells = {r["cell"] for r in pruned.select("cell").distinct().collect()}
    assert cells <= {3, 7}


def test_trained_index_round_trips(spark, tmp_path):
    """kmeans-trained centroids persist and load bit-identically."""
    emb = table(spark, SF_DIR, "embeddings").limit(200)
    path = str(tmp_path / "ivf_trained")
    build_ivf_index(emb, path, num_cells=8, kmeans_iters=2)
    centroids, postings = load_ivf_index(spark, path)
    assert centroids.count() == 8
    # every corpus vector landed in exactly one cell
    assert postings.count() == 200
    assert postings.select("vec_id").distinct().count() == 200


def test_update_equals_frozen_rebuild_and_touches_only_batch_files(
    spark, tmp_path
):
    """update_ivf_index (VERDICT r13 #4): folding a new batch with FROZEN
    centroids must serve row-identically to a one-shot assignment of
    old ∪ batch against the same centroids, and the fold must not
    rewrite a single historical postings file (O(batch) proof: path +
    mtime of every pre-update parquet file survives)."""
    import glob
    import os

    from pincspark.operators.ann_index import update_ivf_index
    from pincspark.operators.similarity import ivf_assign

    emb = table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)

    inc = str(tmp_path / "ivf_inc")
    build_ivf_index(old, inc, num_cells=16)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{inc}/postings/**/*.parquet", recursive=True)
    }
    update_ivf_index(spark, batch, inc)
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{inc}/postings/**/*.parquet", recursive=True)
    }
    assert set(before) < set(after)  # strictly appended
    assert all(after[p] == before[p] for p in before)  # history untouched

    # rebuilt twin: ONE assignment of the full corpus against the same
    # frozen (half-corpus) centroids
    full = str(tmp_path / "ivf_full")
    frozen = spark.read.parquet(f"{inc}/centroids")
    _, assigned = ivf_assign(emb, centroids=frozen)
    frozen.write.parquet(f"{full}/centroids")
    assigned.write.partitionBy("cell").parquet(f"{full}/postings")

    served_inc = ivf_index_topk(spark, inc, _queries(emb), k=5, nprobe=4).collect()
    served_full = ivf_index_topk(spark, full, _queries(emb), k=5, nprobe=4).collect()
    assert sorted(map(tuple, served_inc)) == sorted(map(tuple, served_full))
    assert len(served_inc) == 50

    # the postings themselves are a multiset match (no lost/dup rows)
    inc_rows = sorted(
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(f"{inc}/postings").collect()
    )
    full_rows = sorted(
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(f"{full}/postings").collect()
    )
    assert inc_rows == full_rows


def test_q112_cache_key_isolates_sessions_and_input_changes(tmp_path):
    """VERDICT r14 #7 + ADVICE r14 #3: q112's built-once index cache is a
    module global that outlives Spark sessions and input files — its key
    must change when either the session or the embeddings parquet does, so
    a second session in one process (or a fixture that regenerates the
    data in place) rebuilds instead of serving the first session's
    tempdir."""
    import os
    import time
    from types import SimpleNamespace

    from pincspark.plans.queries import _ann_update_cache_key

    emb = tmp_path / "embeddings.parquet"
    emb.write_bytes(b"v1-bytes")

    def fake_spark(app_id):
        return SimpleNamespace(
            sparkContext=SimpleNamespace(applicationId=app_id)
        )

    k1 = _ann_update_cache_key(fake_spark("app-1"), str(tmp_path))
    assert k1 == _ann_update_cache_key(fake_spark("app-1"), str(tmp_path))
    # a different session never reuses the first session's entry
    assert k1 != _ann_update_cache_key(fake_spark("app-2"), str(tmp_path))
    # regenerating the parquet in place invalidates too
    emb.write_bytes(b"v2-bytes-longer")
    os.utime(emb, ns=(time.time_ns(), time.time_ns() + 1))
    assert k1 != _ann_update_cache_key(fake_spark("app-1"), str(tmp_path))
    # directory-style parquet (multi-part) fingerprints its members
    d = tmp_path / "dirsf"
    (d / "embeddings.parquet").mkdir(parents=True)
    (d / "embeddings.parquet" / "part-0.parquet").write_bytes(b"p0")
    ka = _ann_update_cache_key(fake_spark("app-1"), str(d))
    (d / "embeddings.parquet" / "part-1.parquet").write_bytes(b"p1")
    assert ka != _ann_update_cache_key(fake_spark("app-1"), str(d))
