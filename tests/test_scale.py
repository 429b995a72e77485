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


def test_embedding_dedup_blocked_by_ivf_cell(spark):
    """VERDICT r2 #6: the documented unlabeled-corpus path end-to-end —
    embedding_dup_pairs blocked by trained IVF cell ids instead of labels.
    Plant 25 near-duplicates (deterministic per-dimension perturbation,
    cosine ~0.97 to their source) in the sf0.01 corpus; the cell-blocked
    sweep must recover >= 90% of the exact all-pairs truth at
    threshold 0.9, while comparing only within-cell pairs."""
    from pyspark.sql import functions as F

    from pincspark.operators.dedup import embedding_dup_pairs
    from pincspark.operators.similarity import ivf_assign, kmeans_centroids
    from tests.conftest import SF_DIR_T2

    emb = table(spark, SF_DIR_T2, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + CAST(0.03 * cos(i * 1.7 + vec_id) AS FLOAT))"
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)

    cents = kmeans_centroids(corpus, num_cells=16, iters=5)
    _, assigned = ivf_assign(corpus, num_cells=16, centroids=cents)

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(corpus, threshold=0.9).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(
            assigned, threshold=0.9, block_col="cell"
        ).collect()
    }
    assert len(exact) >= 25  # the planted dups are in the truth set
    assert blocked <= exact  # blocking only restricts, never fabricates
    assert len(blocked & exact) / len(exact) >= 0.9


def test_embedding_dedup_oversized_block_cap(spark):
    """max_block_size excludes degenerate blocks from pair generation —
    the guard the round-7 scale probe motivated (q27 measured 117x
    runtime at 16x data when one label covered a constant fraction of a
    growing corpus; scripts/scale_probe.py). A binding cap must drop
    exactly the oversized block's pairs, keep every small-block pair
    bit-identically, and match the DuckDB mirror of the capped oracle."""
    import duckdb

    from pincspark.operators.dedup import embedding_dup_pairs

    rows = [
        # block 1: 3 members (oversized under cap=2)
        (1, [1.0, 0.0], 1), (2, [0.9, 0.1], 1), (3, [0.8, 0.2], 1),
        # block 2: 2 members (within cap)
        (4, [0.0, 1.0], 2), (5, [0.1, 0.9], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    uncapped = embedding_dup_pairs(
        df, threshold=0.5, block_col="label", max_block_size=None
    )
    capped = embedding_dup_pairs(
        df, threshold=0.5, block_col="label", max_block_size=2
    )
    got_un = {(r["id_a"], r["id_b"]): r["score"] for r in uncapped.collect()}
    got = {(r["id_a"], r["id_b"]): r["score"] for r in capped.collect()}
    assert {p for p in got_un if p[0] <= 3} and got_un[(4, 5)]  # both blocks hit
    assert set(got) == {(4, 5)}  # oversized block 1 fully excluded
    assert got[(4, 5)] == got_un[(4, 5)]  # surviving pairs untouched

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        "(1, [1.0, 0.0], 1), (2, [0.9, 0.1], 1), (3, [0.8, 0.2], 1), "
        "(4, [0.0, 1.0], 2), (5, [0.1, 0.9], 2)) t(vec_id, v, label)"
    )
    oracle = con.execute(
        """
        WITH ok AS (SELECT label FROM e GROUP BY label HAVING COUNT(*) <= 2)
        SELECT a.vec_id, b.vec_id,
               ROUND(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6)
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        JOIN ok ON a.label = ok.label
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= 0.5
        """
    ).fetchall()
    assert {(r[0], r[1]): r[2] for r in oracle} == got


def test_embedding_dedup_excluded_blocks_warn(spark):
    """The oversized-block exclusion is a recall change, so it must be
    observable (ADVICE r7): warn_excluded=True (default) emits a
    RuntimeWarning naming excluded block and row counts; no oversized
    blocks (or warn_excluded=False) means no warning and no eager job."""
    import warnings

    import pytest as _pytest

    from pincspark.operators.dedup import embedding_dup_pairs

    rows = [
        (1, [1.0, 0.0], 1), (2, [0.9, 0.1], 1), (3, [0.8, 0.2], 1),
        (4, [0.0, 1.0], 2), (5, [0.1, 0.9], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    with _pytest.warns(RuntimeWarning, match=r"1 block\(s\) covering 3 row\(s\)"):
        embedding_dup_pairs(df, threshold=0.5, block_col="label", max_block_size=2)

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        embedding_dup_pairs(df, threshold=0.5, block_col="label", max_block_size=4)
        embedding_dup_pairs(
            df, threshold=0.5, block_col="label", max_block_size=2,
            warn_excluded=False,
        )


def test_pq_adc_recall_on_planted_duplicates(spark):
    """Trained product quantization (per-subspace Lloyd refinement) must
    surface a planted near-duplicate (cosine ~0.97 to its source) in the
    ADC top-5 for >= 90% of queries — PQ stores 8 sub-codes instead of 64
    floats (~32x), so this pins that the compressed index still finds the
    near-dups a dedup/retrieval pipeline exists to find."""
    from pyspark.sql import functions as F

    from pincspark.operators.similarity import pq_codebooks, pq_topk
    from tests.conftest import SF_DIR_T2

    emb = table(spark, SF_DIR_T2, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + CAST(0.03 * cos(i * 1.7 + vec_id) AS FLOAT))"
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    queries = planted.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cb = pq_codebooks(corpus, m=8, num_codes=16, iters=3)
    top = pq_topk(corpus, queries, k=5, codebooks=cb)
    hits = top.filter(F.col("neighbor_id") == F.col("query_id") - 10000).count()
    assert hits >= 23, hits  # >= 90% of 25 planted twins found in top-5


def test_ivfpq_recall_on_planted_duplicates(spark):
    """IVF + PQ composed (probe 8/16 cells, score through 8 sub-codes):
    the planted near-duplicate must still surface in the top-5 for >= 85%
    of queries — the compressed-and-pruned index config a 100-TB corpus
    would actually run."""
    from pyspark.sql import functions as F

    from pincspark.operators.similarity import ivfpq_topk
    from tests.conftest import SF_DIR_T2

    emb = table(spark, SF_DIR_T2, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + CAST(0.03 * cos(i * 1.7 + vec_id) AS FLOAT))"
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    queries = planted.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = ivfpq_topk(corpus, queries, k=5, nprobe=8)
    hits = top.filter(F.col("neighbor_id") == F.col("query_id") - 10000).count()
    assert hits >= 22, hits  # >= ~85% of 25 planted twins


def test_pq_encode_numpy_matches_expression_twin(spark):
    """The production numpy encode kernel (Arrow-batched argmin over the
    (m, k, ds) codebook tensor) and the pure-expression twin (literal
    codebooks, interpreted HOF folds) must assign IDENTICAL codes — same
    9-dp rounding, same smallest-code tie-break. This is the cross-check
    that lets q51 run the fast kernel while the oracle replicates the
    expression semantics."""
    from pincspark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_encode_expr,
    )
    from tests.conftest import SF_DIR_T2

    emb = table(spark, SF_DIR_T2, "embeddings").select("vec_id", "embedding")
    cb = pq_codebooks(emb, m=8, num_codes=16, iters=0)
    fast = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    slow = {
        r["vec_id"]: list(r["codes"]) for r in pq_encode_expr(emb, cb).collect()
    }
    assert fast == slow
    assert len(fast) == emb.count()


def test_lsh_then_verify_composition(spark):
    """The 100-TB dedup composition: MinHash-LSH proposes candidate pairs,
    ngram_jaccard_verify confirms them with EXACT shingle Jaccard. The
    verified output must equal the uncapped exact posting-list computation
    restricted to the candidate set — same pairs, same 6-dp values — so
    the verify stage can replace q20's all-pairs posting expansion
    whenever an upstream candidate frame exists (VERDICT r3 #5)."""
    from pincspark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        ngram_jaccard_verify,
    )
    from tests.conftest import SF_DIR_T2

    docs = table(spark, SF_DIR_T2, "documents").select("doc_id", "text")
    cands = minhash_lsh_pairs(docs, "doc_id", "text").filter(
        F.col("est_jaccard") >= 0.3
    )
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_verify(
            docs, cands, "doc_id", "text", threshold=0.5
        ).collect()
    }
    exact_all = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, max_posting_size=10**9
        ).collect()
    }
    cand_keys = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    expected = {k: v for k, v in exact_all.items() if k in cand_keys}
    assert verified == expected
    assert verified  # the corpus has real near-dups above threshold


def test_pq_encode_twin_parity_on_adversarial_ties(spark):
    """Tie-heavy property check for the encode twins: centroids duplicated
    and mirrored so many vectors are EXACTLY equidistant (after the 9-dp
    rounding contract) to several codes — the numpy kernel's first-argmin
    and the expression twin's array_position(array_min) must both resolve
    to the smallest code, on a deterministic lattice of corner cases."""
    from pincspark.operators.similarity import pq_encode, pq_encode_expr

    # m=2 subspaces, ds=2, k=4 codes; codes 1 and 3 are duplicates and
    # code 2 mirrors code 0, so midpoints tie across 3 codes at once
    books = [
        [[0.0, 0.0], [1.0, 1.0], [-1.0, -1.0], [1.0, 1.0]],
        [[0.5, -0.5], [0.5, -0.5], [2.0, 2.0], [-2.0, -2.0]],
    ]
    cb = spark.createDataFrame(
        [(s, c, v) for s, book in enumerate(books) for c, v in enumerate(book)],
        "sub INT, code INT, centroid ARRAY<DOUBLE>",
    )
    grid = [-1.0, -0.5, 0.0, 0.5, 1.0]
    vecs = [
        (i, [a, b, c, d])
        for i, (a, b, c, d) in enumerate(
            (a, b, c, d) for a in grid for b in grid for c in grid for d in grid
        )
    ]
    corpus = spark.createDataFrame(vecs, "vec_id INT, embedding ARRAY<DOUBLE>")
    fast = {r["vec_id"]: list(r["codes"]) for r in pq_encode(corpus, cb).collect()}
    slow = {
        r["vec_id"]: list(r["codes"]) for r in pq_encode_expr(corpus, cb).collect()
    }
    assert fast == slow
    assert len(fast) == len(vecs)
    # the duplicated/mirrored books guarantee ties were actually exercised:
    # code 3 (duplicate of 1 in sub 0, never smallest) must never win
    assert all(codes[0] != 3 for codes in fast.values())
    assert all(codes[1] != 1 for codes in fast.values())  # dup of code 0


def test_ivfpq_residual_recall_on_planted_duplicates(spark):
    """residual=True is the textbook IVFADC: PQ quantizes v - c(cell)
    (residuals concentrate near the origin, so the same codebook budget
    carries less error) and scores decompose as <q, c> + ADC. The planted
    near-duplicate must surface in the top-5 at least as reliably as the
    plain-vector variant's pinned floor."""
    from pyspark.sql import functions as F

    from pincspark.operators.similarity import ivfpq_topk
    from tests.conftest import SF_DIR_T2

    emb = table(spark, SF_DIR_T2, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + CAST(0.03 * cos(i * 1.7 + vec_id) AS FLOAT))"
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    queries = planted.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = ivfpq_topk(corpus, queries, k=5, nprobe=8, residual=True)
    hits = top.filter(F.col("neighbor_id") == F.col("query_id") - 10000).count()
    assert hits >= 22, hits


def test_zorder_box_query_prunes_partitions(spark, tmp_path):
    """Z-order layout: a lat/lon box query on a z-ordered table must (a)
    return exactly the rows the unclustered table returns, and (b) READ
    only the partitions whose Morton cells intersect the box —
    PartitionFilters pruning visible as a strict subset of input files."""
    from pincspark.operators.scale import write_zordered, zbox_buckets, zorder_key
    from pincspark.sources.tables import table
    from pyspark.sql import functions as F

    ev = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id",
        (F.lit(100.5) + F.col("value") % F.lit(2.5)).alias("lon"),
        (F.lit(1.0) + (F.col("user_id") % F.lit(21)).cast("double") / F.lit(10.0)).alias("lat"),
    )
    path = str(tmp_path / "zev")
    write_zordered(ev, path, "lon", "lat", bits=16, grid_bits=3,
                   x_range=(100.0, 104.0), y_range=(0.0, 4.0))
    zt = spark.read.parquet(path)
    assert zt.count() == ev.count()

    box = dict(x_lo=100.6, x_hi=101.2, y_lo=1.0, y_hi=1.8)
    cells = zbox_buckets(**box, bits=16, grid_bits=3,
                         x_range=(100.0, 104.0), y_range=(0.0, 4.0))
    exact = (
        F.col("lon").between(box["x_lo"], box["x_hi"])
        & F.col("lat").between(box["y_lo"], box["y_hi"])
    )
    pruned = zt.filter(F.col("zbucket").isin(cells) & exact)
    full = ev.filter(
        F.col("lon").between(box["x_lo"], box["x_hi"])
        & F.col("lat").between(box["y_lo"], box["y_hi"])
    )
    # (a) the bucket pre-filter loses no rows (the cells COVER the box)
    assert sorted(r.event_id for r in pruned.collect()) == sorted(
        r.event_id for r in full.collect()
    )
    assert pruned.count() > 0
    # (b) partition pruning actually happened: the pruned scan touches a
    # strict subset of the table's files, and the plan pushes the bucket
    # values into PartitionFilters
    all_files = set(zt.inputFiles())
    read_files = {
        r[0]
        for r in zt.filter(F.col("zbucket").isin(cells))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert read_files < all_files, (len(read_files), len(all_files))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "zbucket" in plan.split("PartitionFilters")[1][:200]
    # the z key itself stays a pure column expression (codegen-able)
    assert "__z" not in zt.columns and zorder_key(F.lit(1.0), F.lit(1.0)) is not None


def test_asof_join_under_adversarial_skew(spark):
    """VERDICT r5 #5: the flagship's one wide exchange is the as-of key
    shuffle, and its docstring waved at skew handling without a test.

    What actually protects the window path under a pathological key is
    NOT AQE skew-join splitting (that rewrite applies to joins, not to
    window sorts — see the COVERAGE.md note): the union+carry-forward
    window costs one hash shuffle plus one per-partition SPILLABLE sort
    with a running frame, so a hot key degrades to a single-task external
    sort of its rows — slower, never wrong and never OOM. Pin (a) result
    identity with the cogrouped pandas merge_asof twin on the skewed
    input, and (b) that skewed runtime stays within ~3x of uniform at
    equal row counts (generous to absorb CI noise; the honest claim is
    "degrades linearly", not "free")."""
    import time

    from pincspark.operators.asof import asof_join, asof_join_grouped

    n, n_keys = 400_000, 1_000

    def positions(skewed: bool):
        base = spark.range(n).select(
            F.col("id").alias("seq"),
            (
                # skewed: even ids (50% of rows) all collapse onto key 7
                F.when((F.col("id") % 2 == 0) & F.lit(skewed), F.lit(7))
                .otherwise(F.col("id") % n_keys)
            ).cast("long").alias("mmsi"),
            (F.col("id") * 3 % 86_400).cast("long").alias("ts"),
        )
        return base

    statics = spark.range(n_keys * 10).select(
        (F.col("id") % n_keys).cast("long").alias("mmsi"),
        (F.col("id") / n_keys).cast("long").alias("ts"),
        F.concat(F.lit("v"), F.col("id")).alias("voyage"),
    )

    def run(skewed: bool) -> float:
        t0 = time.time()
        asof_join(positions(skewed), statics, on="ts", by="mmsi").write.mode(
            "overwrite"
        ).format("noop").save()
        return time.time() - t0

    run(False)  # warm codegen + shuffle service so both timed runs are steady
    t_uniform = min(run(False), run(False))
    t_skewed = min(run(True), run(True))
    assert t_skewed <= max(3.0 * t_uniform, t_uniform + 2.0), (
        f"skewed as-of {t_skewed:.2f}s vs uniform {t_uniform:.2f}s — "
        "a 50%-hot key should degrade bounded-linearly, not explode"
    )

    # Result identity vs the cogrouped merge_asof twin on a skewed slice
    # (subset keeps the single-group pandas merge in test-time budget).
    sl = positions(True).filter(F.col("seq") < 20_000)
    a = asof_join(sl, statics, on="ts", by="mmsi")
    b = asof_join_grouped(sl, statics, on="ts", by="mmsi")
    cols = sorted(a.columns)
    assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )


def test_semantic_dedup_keep_rule_and_cap(spark):
    """SemDeDup semantics on planted vectors: within a cluster, a
    near-duplicate pair (cos >= tau) keeps the member FURTHEST from the
    centroid (lower cent_sim; id breaks ties); distinct members all
    survive; an oversized cluster skips pruning entirely (all kept) and
    warns."""
    import warnings

    import pytest as _pytest

    from pincspark.operators.dedup import semantic_dedup

    # centroids will be the first 2 vectors (ids 0, 1): orthogonal axes
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        # cluster of id 0: two near-identical vectors, one slightly
        # closer to the centroid than the other
        (10, [0.99, 0.05, 0.0]),
        (11, [0.98, 0.06, 0.0]),
        # distinct member of the same cluster (cos to 10/11 well < tau)
        (12, [0.6, 0.0, 0.8]),
        # cluster of id 1: singleton
        (20, [0.1, 0.9, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, num_clusters=2, tau=0.95, warn_excluded=False
        ).collect()
    }
    assert len(out) == 6
    # ids 0, 10, 11 are pairwise near-dups (cos >= 0.95): the least-
    # central member (11) survives; 10 and the dead-center 0 (cent_sim
    # 1.0) are each dominated by a less-central tau-neighbor.
    assert out[11]["kept"] == 1
    assert out[10]["kept"] == 0
    assert out[0]["kept"] == 0
    assert out[12]["kept"] == 1  # distinct member survives
    assert out[20]["kept"] == 1  # singleton survives
    assert out[10]["cell"] == out[11]["cell"] == out[12]["cell"] == 0

    # oversized-cluster cap: cap=2 makes cluster 0 (4 members) unprunable
    with _pytest.warns(RuntimeWarning, match="exceed max_cluster_size"):
        capped = semantic_dedup(
            df, num_clusters=2, tau=0.95, max_cluster_size=2
        )
        got = {r["vec_id"]: r["kept"] for r in capped.collect()}
    # oversized cluster 0 (ids 0/10/11/12) skips pruning entirely; the
    # within-cap cluster 1 still prunes (cos(1, 20) ~ 0.994 >= tau, and
    # the dead-center member 1 is the one dropped)
    assert {k: got[k] for k in (0, 10, 11, 12)} == {0: 1, 10: 1, 11: 1, 12: 1}
    assert got[20] == 1 and got[1] == 0

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        semantic_dedup(
            df, num_clusters=2, tau=0.95, max_cluster_size=2,
            warn_excluded=False,
        ).collect()


def test_semantic_dedup_rejects_centroids_plus_target_size(spark):
    """ADVICE r11 #3: target_cluster_size sizes the DEFAULT centroid
    pick; combined with explicit centroids it has nothing to act on and
    used to be silently ignored — now a ValueError."""
    import pytest as _pytest

    from pincspark.operators.dedup import semantic_dedup

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = df.select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cv")
    )
    with _pytest.raises(ValueError, match="target_cluster_size"):
        semantic_dedup(df, centroids=cents, target_cluster_size=100)
