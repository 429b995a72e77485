"""Connected components over candidate pairs (dedup_clusters): exercises
multi-hop chains (diameter > 1), which the LSH-derived q42 components are
too shallow to reach, plus disjoint components and symmetric input."""

from __future__ import annotations


def _clusters(spark, edges):
    from pincspark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    rows = dedup_clusters(pairs).collect()
    return {r["node"]: r["cluster_id"] for r in rows}


def test_chain_converges_to_min_label(spark):
    # 1-2-3-4-5 chain: diameter 4, needs several propagation rounds.
    got = _clusters(spark, [(2, 1), (2, 3), (4, 3), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_keep_own_minimum(spark):
    got = _clusters(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_duplicate_and_reversed_edges_are_harmless(spark):
    got = _clusters(spark, [(1, 2), (2, 1), (1, 2), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_string_ids_multi_hop(spark):
    """ADVICE r2: the convergence check must be type-agnostic. With string
    doc ids sum(label) is NULL every round, so a sum-based fixpoint test
    exits after one round and splits any component of diameter >= 2."""
    got = _clusters(
        spark, [("docB", "docA"), ("docB", "docC"), ("docD", "docC"), ("docD", "docE")]
    )
    assert got == {k: "docA" for k in ("docA", "docB", "docC", "docD", "docE")}


def test_long_chain_converges_in_logarithmic_rounds(spark):
    """r10 pointer jumping: a 300-node path (diameter 299) must converge
    well inside 12 rounds on the DISTRIBUTED path (driver_threshold=0
    forces it) — plain neighbor-min needed 299 rounds and shipped wrong,
    silently-split components past the max_iters cap."""
    import warnings

    from pincspark.operators.dedup import dedup_clusters

    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = dedup_clusters(pairs, max_iters=12, driver_threshold=0).collect()
    assert not any("did not converge" in str(x.message) for x in w)
    got = {r["node"]: r["cluster_id"] for r in rows}
    assert got == {i: 0 for i in range(n)}


def test_nonconvergence_warns(spark):
    import warnings

    from pincspark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (6, 5)], ["id_a", "id_b"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # driver_threshold=0 forces the distributed propagation path (the
        # union-find path has no iteration cap to warn about)
        dedup_clusters(pairs, max_iters=1, driver_threshold=0).collect()
    assert any("did not converge" in str(x.message) for x in w)


def test_union_find_path_matches_propagation_path(spark):
    """The size-gated driver union-find (edges <= driver_threshold) and
    the distributed min-label propagation must produce IDENTICAL
    (node, cluster_id) labels — checked on a graph with chains (deep
    diameter), a star, singleton pairs, and disconnected parts."""
    from pincspark.operators.dedup import dedup_clusters

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),      # chain, min = 1
        (10, 11), (10, 12), (10, 13),        # star, min = 10
        (20, 21),                            # pair
        (31, 30),                            # reversed pair, min = 30
    ]
    pairs = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT")
    fast = {
        (r["node"], r["cluster_id"])
        for r in dedup_clusters(pairs, driver_threshold=100).collect()
    }
    slow = {
        (r["node"], r["cluster_id"])
        for r in dedup_clusters(pairs, driver_threshold=0).collect()
    }
    assert fast == slow
    assert (5, 1) in fast and (13, 10) in fast and (31, 30) in fast


def test_byte_gate_rejects_wide_string_ids_near_edge_count_gate(spark):
    """VERDICT r5 #7: the driver union-find gate must consider BYTES, not
    just edge count — 64-char doc ids near the count gate should fall
    back to distributed propagation when they exceed driver_max_bytes,
    and both paths must still agree on the labels."""
    from pincspark.operators.dedup import dedup_clusters

    wide = lambda i: f"{i:04d}" + "x" * 60  # 64-char string ids
    edges = [(wide(i), wide(i + 1)) for i in range(0, 40, 2)] + [
        (wide(100), wide(101)), (wide(101), wide(102))
    ]
    pairs = spark.createDataFrame(edges, "id_a STRING, id_b STRING")
    # Count passes (44 directed edges <= 100) but bytes fail:
    # 44 * (128 + 16) ~ 6.3 KB > 1 KB budget -> distributed path. Identity
    # vs the driver path (byte budget ample) proves the fallback is safe.
    tight = {
        (r["node"], r["cluster_id"])
        for r in dedup_clusters(
            pairs, driver_threshold=100, driver_max_bytes=1024
        ).collect()
    }
    roomy = {
        (r["node"], r["cluster_id"])
        for r in dedup_clusters(
            pairs, driver_threshold=100, driver_max_bytes=64 << 20
        ).collect()
    }
    assert tight == roomy
    assert (wide(102), wide(100)) in tight


# ---------------------------------------------------------------------------
# Exact set-similarity join (prefix filtering)
# ---------------------------------------------------------------------------


def test_set_similarity_join_matches_brute_force(spark):
    """Zero-false-negative property across thresholds: the prefix-filtered
    join returns EXACTLY the brute-force all-pairs answer on random
    corpora (skewed Zipf-ish vocabulary so prefixes are non-trivial),
    including planted near-dup pairs."""
    import random

    from pincspark.operators.dedup import set_similarity_join

    rng = random.Random(1313)
    vocab = [f"w{i}" for i in range(120)]

    def doc():
        # zipf-ish: low ids much more frequent
        n = rng.randrange(3, 25)
        return " ".join(
            vocab[min(int(rng.expovariate(1 / 18)), 119)] for _ in range(n)
        )

    base = [doc() for _ in range(40)]
    # short docs: 1- and 2-token texts exercise the sub-n ELSE branch of
    # the shingle builder and the tiny-prefix arithmetic
    base += ["solo", "two tokens", "two tokens", ""]
    # plant near-dups: copies with small edits
    for i in range(8):
        toks = base[i].split()
        toks[rng.randrange(len(toks))] = "edited"
        base.append(" ".join(toks))
    rows = [(i, t) for i, t in enumerate(base)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    def tokset(t):
        return {w for w in t.lower().split() if w}

    sets = {i: tokset(t) for i, t in rows if tokset(t)}
    for tau100 in (30, 50, 60, 80):
        want = set()
        for i in sets:
            for j in sets:
                if i < j:
                    inter = len(sets[i] & sets[j])
                    uni = len(sets[i] | sets[j])
                    if inter * 100 >= tau100 * uni:
                        want.add((i, j, inter, uni))
        got = {
            (r["id_a"], r["id_b"], r["inter"], r["uni"])
            for r in set_similarity_join(df, "doc_id", "text", tau100).collect()
        }
        assert got == want, (tau100, got ^ want)
    assert want  # the tau=0.8 round still found the planted dups


def test_set_similarity_join_exact_on_boilerplate_corpus(spark):
    """The VERDICT r13 #6 adversarial regime in miniature: templated docs
    drawn Zipfian from a small sentence pool + unique tails. Template
    shingles share correlated frequency ranks, which makes the per-token
    positional bound inert and the first-shared-token bound the active
    filter — the probe measured it pruning the candidate set 3x at 8k
    docs. Both filters must stay EXACT: the n=3 shingle join equals a
    brute-force all-pairs recomputation."""
    import random

    from pincspark.operators.dedup import set_similarity_join

    rng = random.Random(99)
    temps = [" ".join(f"tmpl{t}w{i}" for i in range(8)) for t in range(12)]
    w = [1.0 / (k + 1) for k in range(12)]
    rows = []
    for d in range(120):
        picks = rng.choices(range(12), weights=w, k=6)
        rows.append((
            d,
            " ".join(temps[p] for p in picks)
            + " " + " ".join(f"u{d}x{j}" for j in range(4)),
        ))
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    def shingles(t):
        toks = t.lower().split()
        if len(toks) >= 3:
            return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)}

    sets = {i: shingles(t) for i, t in rows}
    tau100 = 50
    want = set()
    for i in sets:
        for j in sets:
            if i < j:
                inter = len(sets[i] & sets[j])
                uni = len(sets[i] | sets[j])
                if inter * 100 >= tau100 * uni:
                    want.add((i, j, inter, uni))
    got = {
        (r["id_a"], r["id_b"], r["inter"], r["uni"])
        for r in set_similarity_join(df, "doc_id", "text", tau100, n=3).collect()
    }
    assert got == want, got ^ want
    assert want  # the Zipf head makes genuine near-dup pairs


def test_q114_cross_modal_transitive_closure(spark):
    """The capstone's defining property: a doc dropped through a CHAIN
    that crosses modalities. doc 58 shares its AUDIO with 57
    (57 = 11*5+2, 58 = 11*5+3 -> seed 'aud5') and its IMAGE with 59
    (58 = 9*6+4, 59 = 9*6+5 -> seed 'img6'), so 57 and 59 — which share
    NO modality directly — must land in one cluster via 58."""
    from pincspark.plans.queries import q114_multimodal_keeplist
    from tests.conftest import SF_DIR

    rows = {r["doc_id"]: (r["cluster_id"], r["keep"])
            for r in q114_multimodal_keeplist(spark, SF_DIR).collect()}
    c57, c58, c59 = rows[57][0], rows[58][0], rows[59][0]
    assert c57 == c58 == c59  # cross-modal closure merged them
    kept = [d for d in (57, 58, 59) if rows[d][1]]
    # at most the cluster's min doc survives from this trio (the min of
    # the full cluster may be an even smaller text-linked doc)
    assert len(kept) <= 1
    assert all(rows[d][0] <= d for d in rows)  # min-id labels
    assert any(v[1] for v in rows.values())  # and somebody IS kept


def test_q114_heap_aware_default_mode(spark, monkeypatch):
    """VERDICT r15 #4: the staging mode defaults from the DRIVER HEAP,
    not a manual env var — below 8 g, tiers stage sequentially
    (max-of-tiers peak memory); the env var still forces either mode.
    On a small reported heap the ThreadPoolExecutor must never be
    touched, and the keep-list is identical either way."""
    import concurrent.futures

    import pincspark.plans.queries as q

    monkeypatch.delenv("PINCSPARK_Q114_SEQUENTIAL", raising=False)
    sf = "/root/testdata/sf0.001"
    default_rows = {tuple(r) for r in q.q114_multimodal_keeplist(spark, sf).collect()}

    class _Forbidden:
        def __init__(self, *a, **k):
            raise AssertionError("concurrent staging on a small heap")

    monkeypatch.setattr(q, "_driver_heap_bytes", lambda s: 4 << 30)
    monkeypatch.setattr(concurrent.futures, "ThreadPoolExecutor", _Forbidden)
    small_rows = {tuple(r) for r in q.q114_multimodal_keeplist(spark, sf).collect()}
    assert small_rows == default_rows
    # explicit override beats the heap heuristic in both directions
    monkeypatch.setenv("PINCSPARK_Q114_SEQUENTIAL", "1")
    monkeypatch.setattr(q, "_driver_heap_bytes", lambda s: 64 << 30)
    forced_rows = {tuple(r) for r in q.q114_multimodal_keeplist(spark, sf).collect()}
    assert forced_rows == default_rows


def test_driver_heap_bytes_parses_conf_units(spark):
    import pincspark.plans.queries as q

    class _Conf:
        def __init__(self, v):
            self._v = v

        def get(self, key, default=None):
            return self._v

    class _S:
        def __init__(self, v):
            self.conf = _Conf(v)

    assert q._driver_heap_bytes(_S("8g")) == 8 << 30
    assert q._driver_heap_bytes(_S("512m")) == 512 << 20
    assert q._driver_heap_bytes(_S("9216")) == 9216 << 20  # bare = MiB
    assert q._driver_heap_bytes(_S("2G")) == 2 << 30
    # the live session reports its real configured heap (8 g in tests)
    assert q._driver_heap_bytes(spark) >= 7 << 30


def test_q114_concurrent_staging_records_tier_plans(spark, monkeypatch):
    """ADVICE r15 #1: planhooks' staged-plan sink is a ContextVar, which
    does not reach ThreadPoolExecutor workers on its own — q114's default
    CONCURRENT tier staging must copy the caller's context into each
    submit, or the three tiers' pre-checkpoint plans silently vanish from
    capture_staged_plans() (and with them the staged-plan lint's view of
    exactly the hot tier plans). Pin that all three tier labels land in
    the sink in the default (concurrent) mode."""
    import pincspark.plans.queries as q
    from pincspark.planhooks import capture_staged_plans

    monkeypatch.delenv("PINCSPARK_Q114_SEQUENTIAL", raising=False)
    with capture_staged_plans() as sink:
        q.q114_multimodal_keeplist(spark, "/root/testdata/sf0.001")
    labels = {label for label, _ in sink}
    assert {"q114:text_pairs", "q114:image_pairs", "q114:audio_pairs"} <= labels
    # and the captured plans are real physical plans, not placeholders
    tier_plans = [p for label, p in sink if label.startswith("q114:")]
    assert all("Exchange" in p or "Scan" in p for p in tier_plans)


def test_q114_eager_and_lazy_staging_agree(spark, monkeypatch):
    """VERDICT r14 #3 done-criterion: q114's eager tier barriers (and the
    GC pulses between them) are a MATERIALIZATION strategy, not
    semantics — forcing every stage() lazy must produce the identical
    keep-list row set."""
    import pincspark.plans.queries as q
    from pincspark.staging import stage as real_stage

    sf = "/root/testdata/sf0.001"
    eager_rows = {tuple(r) for r in q.q114_multimodal_keeplist(spark, sf).collect()}

    def lazy_stage(df, label, eager=False):
        return real_stage(df, label, eager=False)

    monkeypatch.setattr(q, "stage", lazy_stage)
    lazy_rows = {tuple(r) for r in q.q114_multimodal_keeplist(spark, sf).collect()}
    assert eager_rows == lazy_rows and len(eager_rows) == 500
