"""Persistent dedup-cluster store (`operators/cluster_store.py`): the
incremental keep-list fold. The invariants: fold == from-scratch
recompute over all pairs ever seen (including cross-cluster MERGES a
batch bridge causes); history label files append-only; redirect sidecar
stays depth-1 across successive folds; partner lookups partition-pruned.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import functions as F

from pincspark.operators.commits import read_sidecar
from pincspark.operators.cluster_store import (
    build_cluster_store,
    read_cluster_store,
    update_cluster_store,
)
from pincspark.operators.dedup import dedup_clusters


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "id_a LONG, id_b LONG")


def _nodes(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node LONG")


def _labels(spark, path):
    return {
        r["node"]: r["cluster_id"]
        for r in read_cluster_store(spark, path).collect()
    }


def _recompute(spark, all_pairs, all_nodes):
    comp = dedup_clusters(_pairs(spark, all_pairs))
    got = {r["node"]: r["cluster_id"] for r in comp.collect()}
    return {n: got.get(n, n) for n in all_nodes}


def _seed(spark, path):
    """History: clusters {2,4,6} (root 2), {10,12} (root 10), singletons
    8, 14."""
    hist_pairs = [(2, 4), (4, 6), (10, 12)]
    hist_nodes = [2, 4, 6, 8, 10, 12, 14]
    labels = dedup_clusters(_pairs(spark, hist_pairs))
    singles = _nodes(spark, [8, 14]).withColumn("cluster_id", F.col("node"))
    build_cluster_store(labels.unionByName(singles), path)
    return hist_pairs, hist_nodes


def test_fold_matches_full_recompute_including_merge(spark, tmp_path):
    path = str(tmp_path / "cs")
    hist_pairs, hist_nodes = _seed(spark, path)
    # batch: 21 bridges the TWO history clusters (the merge case);
    # 23 joins singleton 8; 25/27 pair each other; 29 is a singleton
    batch_pairs = [(2, 21), (10, 21), (8, 23), (25, 27)]
    batch_nodes = [21, 23, 25, 27, 29]
    update_cluster_store(
        spark, _pairs(spark, batch_pairs), _nodes(spark, batch_nodes), path
    )
    want = _recompute(
        spark, hist_pairs + batch_pairs, hist_nodes + batch_nodes
    )
    assert _labels(spark, path) == want
    # the merge really happened: 2,4,6,10,12,21 share root 2
    assert {want[n] for n in (2, 4, 6, 10, 12, 21)} == {2}


def test_history_label_files_are_append_only(spark, tmp_path):
    path = str(tmp_path / "cs")
    _seed(spark, path)
    before = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/labels/**/*.parquet", recursive=True)
    }
    update_cluster_store(
        spark, _pairs(spark, [(2, 21), (10, 21)]), _nodes(spark, [21]), path
    )
    after = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/labels/**/*.parquet", recursive=True)
    }
    for f, m in before.items():
        assert f in after and after[f] == m, f"history file rewritten: {f}"
    assert len(after) > len(before)


def test_redirects_stay_depth_one_across_folds(spark, tmp_path):
    """Fold 1 merges {10,12} into root 2 (redirect 10 -> 2); fold 2
    merges root 2's cluster into a SMALLER batch id 1. The old 10 -> 2
    redirect must re-map to 10 -> 1 (depth 1), not chain 10 -> 2 -> 1."""
    path = str(tmp_path / "cs")
    hist_pairs, hist_nodes = _seed(spark, path)
    update_cluster_store(
        spark, _pairs(spark, [(2, 21), (10, 21)]), _nodes(spark, [21]), path
    )
    update_cluster_store(
        spark, _pairs(spark, [(1, 4)]), _nodes(spark, [1]), path
    )
    red = {
        (r["old_root"], r["new_root"])
        for r in read_sidecar(spark, f"{path}/redirects").collect()
    }
    targets = {t for _, t in red}
    olds = {o for o, _ in red}
    assert not (targets & olds), f"redirect chain deeper than 1: {red}"
    want = _recompute(
        spark,
        hist_pairs + [(2, 21), (10, 21), (1, 4)],
        hist_nodes + [21, 1],
    )
    assert _labels(spark, path) == want
    assert want[12] == 1  # transitively re-rooted through both folds


def test_partner_lookup_is_partition_pruned(spark, tmp_path):
    """A fold with one history partner must read only that partner's
    node bucket, not the corpus-wide label table — captured through the
    staged-plan hook the operator records for exactly this audit."""
    from pincspark.planhooks import capture_staged_plans

    path = str(tmp_path / "cs")
    many = _nodes(spark, list(range(0, 400, 2))).withColumn(
        "cluster_id", F.col("node")
    )
    build_cluster_store(many, path)
    all_nb = {d for d in os.listdir(f"{path}/labels") if d.startswith("nb=")}
    assert len(all_nb) > 8
    with capture_staged_plans() as sink:
        update_cluster_store(
            spark, _pairs(spark, [(2, 901)]), _nodes(spark, [901]), path
        )
    plan = next(p for lbl, p in sink if lbl == "cluster_store:partner-lookup")
    m = re.search(
        r"PartitionFilters: \[[^\]]*\(nb#\d+ (?:= (-?\d+)|IN \(([^)]+)\))",
        plan,
    )
    assert m, plan
    probed_src = m.group(1) or m.group(2)
    probed = {int(x) for x in re.findall(r"-?\d+", probed_src)}
    assert len(probed) == 1  # exactly the single partner's bucket
    want = _recompute(spark, [(2, 901)], list(range(0, 400, 2)) + [901])
    assert _labels(spark, path) == want


def test_unpaired_batch_nodes_become_singletons(spark, tmp_path):
    path = str(tmp_path / "cs")
    _seed(spark, path)
    update_cluster_store(
        spark, _pairs(spark, []), _nodes(spark, [31, 33]), path
    )
    got = _labels(spark, path)
    assert got[31] == 31 and got[33] == 33


def test_q116_merge_plant_bridges_two_history_clusters(spark):
    """The q116 handcrafted rasters realize their designed geometry
    end-to-end: history docs 18/38 at dhash hamming 6 (distinct clusters
    after the initial build) and batch doc 45 at hamming 3 from each —
    the fold must MERGE all three into one cluster rooted at 18."""
    from pincspark.plans.queries import q116_incremental_clusters

    rows = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in q116_incremental_clusters(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows[18] == (18, True)
    assert rows[38][0] == 18 and rows[38][1] is False
    assert rows[45][0] == 18 and rows[45][1] is False
    assert len(rows) == 500


def test_rebase_folds_overlay_and_preserves_labels(spark, tmp_path):
    """VERDICT r15 #2 done-criteria: rebase is row-identical to
    read_cluster_store before/after, the overlay truncates to zero rows,
    and label buckets containing NO redirected root stay
    path+mtime-untouched."""
    from pincspark.operators.cluster_store import rebase_cluster_store

    path = str(tmp_path / "cs")
    hist_pairs, hist_nodes = _seed(spark, path)
    # two folds that each create redirects (a bridge merge, then a
    # smaller-id re-root of the merged cluster)
    update_cluster_store(
        spark, _pairs(spark, [(2, 21), (10, 21)]), _nodes(spark, [21]), path
    )
    update_cluster_store(
        spark, _pairs(spark, [(1, 4)]), _nodes(spark, [1]), path
    )
    assert read_sidecar(spark, f"{path}/redirects").count() > 0
    before_labels = _labels(spark, path)
    before_files = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/labels/**/*.parquet", recursive=True)
    }
    # which buckets actually contain a redirected root's members?
    red = {
        r["old_root"]
        for r in read_sidecar(spark, f"{path}/redirects").collect()
    }
    raw = spark.read.parquet(f"{path}/labels")
    dirty = {
        r["nb"]
        for r in raw.filter(F.col("cluster_id").isin(list(red)))
        .select("nb")
        .distinct()
        .collect()
    }
    n = rebase_cluster_store(spark, path)
    assert n == len(dirty) > 0
    # row-identical reads; overlay truncated
    assert _labels(spark, path) == before_labels
    assert read_sidecar(spark, f"{path}/redirects").count() == 0
    # clean buckets untouched on disk
    after_files = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/labels/**/*.parquet", recursive=True)
    }
    for f, m in before_files.items():
        nb = int(re.search(r"nb=(\d+)", f).group(1))
        if nb not in dirty:
            assert f in after_files and after_files[f] == m, (
                f"clean bucket rewritten: {f}"
            )
    # base table alone (no overlay) now carries the final labels
    flat = {
        r["node"]: r["cluster_id"]
        for r in spark.read.parquet(f"{path}/labels").collect()
    }
    assert flat == before_labels


def test_rebase_is_idempotent_and_folds_keep_working(spark, tmp_path):
    """A second rebase is a no-op (0 buckets rewritten, files untouched),
    and a post-rebase fold — including a fresh merge — still matches the
    from-scratch recompute over every pair ever seen."""
    from pincspark.operators.cluster_store import rebase_cluster_store

    path = str(tmp_path / "cs")
    hist_pairs, hist_nodes = _seed(spark, path)
    update_cluster_store(
        spark, _pairs(spark, [(2, 21), (10, 21)]), _nodes(spark, [21]), path
    )
    rebase_cluster_store(spark, path)
    files = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/labels/**/*.parquet", recursive=True)
    }
    assert rebase_cluster_store(spark, path) == 0
    after = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/labels/**/*.parquet", recursive=True)
    }
    assert after == files  # no-op on disk
    # post-rebase fold with a new bridge merge (23 links 8 and root 2)
    update_cluster_store(
        spark, _pairs(spark, [(8, 23), (2, 23)]), _nodes(spark, [23]), path
    )
    want = _recompute(
        spark,
        hist_pairs + [(2, 21), (10, 21), (8, 23), (2, 23)],
        hist_nodes + [21, 23],
    )
    assert _labels(spark, path) == want
