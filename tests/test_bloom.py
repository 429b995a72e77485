"""Bloom-screen decontamination: the no-false-negative guarantee on planted
overlaps, exact flag behavior on a planted contaminated doc, filter-table
bounds, and the screen-then-verify composition against the exact
containment operator."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pincspark.operators.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    BLOOM_WORD_SHIFT,
    bloom_build,
    bloom_screen,
)

BENCH = [
    ("b1", "the quick brown fox jumps over the lazy dog tonight"),
    ("b2", "pack my box with five dozen liquor jugs right now"),
    ("b3", "how vexingly quick daft zebras jump around the fence"),
]
CORPUS = [
    # full copy of b1 -> every shingle must hit (exact_ppm = 1e6)
    ("c_copy", "the quick brown fox jumps over the lazy dog tonight"),
    # shares one full 3-gram window with b2 ("five dozen liquor")
    ("c_part", "we bought five dozen liquor bottles for the party yesterday"),
    # no 3-gram overlap with any benchmark doc
    ("c_novel", "completely unrelated sentences about gardening tools and soil"),
]


def _shingles(text: str, n: int = 3) -> list[str]:
    toks = text.lower().split()
    if len(toks) >= n:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    else:
        grams = [" ".join(toks)]
    return list(dict.fromkeys(grams))


def _screen(spark, flag_ppm=150_000):
    bench = spark.createDataFrame(BENCH, "doc_id string, text string")
    corpus = spark.createDataFrame(CORPUS, "doc_id string, text string")
    bloom = bloom_build(bench, "doc_id", "text")
    rows = bloom_screen(corpus, bloom, "doc_id", "text", flag_ppm=flag_ppm).collect()
    return {r["doc_id"]: r for r in rows}


def test_no_false_negatives_and_flags(spark):
    got = _screen(spark)
    # full copy: all shingles present in the filter, flagged
    copy = got["c_copy"]
    assert copy["n_shingles"] == len(_shingles(CORPUS[0][1]))
    assert copy["bloom_hits"] == copy["n_shingles"]
    assert copy["hit_ppm"] == 1_000_000 and copy["flagged"] == 1
    # partial overlap: the shared shingle MUST hit (Bloom never misses)
    part = got["c_part"]
    shared = set(_shingles(CORPUS[1][1])) & set(
        s for _, t in BENCH for s in _shingles(t)
    )
    assert len(shared) == 1 and part["bloom_hits"] >= len(shared)


def test_novel_doc_unflagged(spark):
    # hashes are deterministic, so this pins the concrete outcome: no
    # 3-gram of c_novel is in the benchmark set, and at 9 shingles vs
    # ~30 filter entries the false-positive odds are ~(30*3/2^20)^3 —
    # a collision here means the position arithmetic broke
    got = _screen(spark)
    novel = got["c_novel"]
    assert novel["bloom_hits"] == 0 and novel["flagged"] == 0


def test_word_table_bounds(spark):
    bench = spark.createDataFrame(BENCH, "doc_id string, text string")
    words = bloom_build(bench, "doc_id", "text").collect()
    n_words = 1 << (BLOOM_M_BITS - BLOOM_WORD_SHIFT)
    assert 0 < len(words) <= n_words
    total_bits = 0
    for r in words:
        assert 0 <= r["word_idx"] < n_words
        assert 0 < r["word"] < (1 << (1 << BLOOM_WORD_SHIFT))
        total_bits += bin(r["word"]).count("1")
    # k positions per distinct benchmark shingle, minus in-filter collisions
    n_shingles = len({s for _, t in BENCH for s in _shingles(t)})
    assert total_bits <= BLOOM_K * n_shingles


def test_positions_match_md5_slices(spark):
    """The filter positions are 20-bit slices of the shared 60-bit md5
    prefix — recompute one shingle's bits in pure Python and assert the
    built filter has them set."""
    bench = spark.createDataFrame(BENCH, "doc_id string, text string")
    words = {r["word_idx"]: r["word"] for r in bloom_build(bench, "doc_id", "text").collect()}
    h = int(hashlib.md5(b"the quick brown").hexdigest()[:15], 16)
    for i in range(BLOOM_K):
        p = (h >> (BLOOM_M_BITS * i)) & ((1 << BLOOM_M_BITS) - 1)
        word = words.get(p >> BLOOM_WORD_SHIFT, 0)
        assert (word >> (p & ((1 << BLOOM_WORD_SHIFT) - 1))) & 1 == 1


def test_screen_then_verify_composition(spark):
    """The production shape: only flagged docs enter the exact containment
    join, and every truly-contaminated doc survives the screen (the Bloom
    no-false-negative guarantee composed end-to-end)."""
    from pincspark.operators.dedup import contamination_pairs

    bench = spark.createDataFrame(BENCH, "doc_id string, text string")
    corpus = spark.createDataFrame(CORPUS, "doc_id string, text string")
    bloom = bloom_build(bench, "doc_id", "text")
    flagged = (
        bloom_screen(corpus, bloom, "doc_id", "text", flag_ppm=100_000)
        .filter(F.col("flagged") == 1)
        .select("doc_id")
    )
    screened = corpus.join(flagged, "doc_id")
    exact_all = contamination_pairs(
        bench, corpus, "doc_id", "text", n=3, threshold=0.1
    ).collect()
    exact_screened = contamination_pairs(
        bench, screened, "doc_id", "text", n=3, threshold=0.1
    ).collect()
    assert sorted(map(tuple, exact_all)) == sorted(map(tuple, exact_screened))
    assert len(exact_all) >= 1  # the planted copy is found
