"""Bloom-filter n-gram membership screen — the zero-corpus-shuffle
decontamination pre-pass.

The exact decontamination sweep (`contamination_pairs`, q37) shuffles every
corpus shingle into an inverted-index join — correct, but at 100 TB the
shuffle IS the cost. A production pipeline runs this screen first: build a
Bloom filter over the (small) benchmark set's n-grams ONCE, broadcast the
few-hundred-KB bit array to every executor, and screen the whole corpus
with a narrow scan + broadcast lookup — the corpus text never shuffles at
all (the per-doc counters partial-aggregate map-side; the only exchange
carries one row per document). Docs the screen flags then go through the
exact containment join, which now runs over a tiny fraction of the corpus.

Bloom guarantee: NO false negatives — every n-gram actually present in the
benchmark set hits the filter — so screen-then-verify finds exactly what
the exact sweep finds. False-positive rate for n benchmark n-grams is
(1 - e^{-kn/m})^k; with the defaults (m = 2^20 bits, k = 3) that is < 1e-4
up to ~30k n-grams. At larger benchmark suites raise ``m_bits`` — the
filter stays broadcastable (2^27 bits = 16 MB) far past any benchmark size.

Determinism (shared with the DuckDB oracle): the k = 3 bit positions are
20-bit slices of the SAME 60-bit md5-prefix shingle hash every other dedup
operator uses (`shingle_hash_array_py(..., hex_chars=15)`), so the filter
content is a pure function of the text — no RNG, no JVM-specific hashing.

Reference parity: the reference engine has no Bloom screen; this extends
its decontamination tier (the q37 family) with the scale shape a 100-TB
corpus demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pincspark.operators.dedup import _spread, shingle_hash_array_py

# 2^20-bit filter, 32-bit words packed in BIGINT containers (bit index
# <= 31 keeps the shifted mask positive in both engines — no BIGINT
# overflow semantics to reconcile), three 20-bit positions sliced from
# the 60-bit md5 prefix hash.
BLOOM_M_BITS = 20
BLOOM_WORD_SHIFT = 5
BLOOM_K = 3

_POS_MASK = (1 << BLOOM_M_BITS) - 1
_BIT_MASK = (1 << BLOOM_WORD_SHIFT) - 1


def _positions(h: F.Column) -> F.Column:
    """The k = 3 filter positions of one shingle hash: consecutive 20-bit
    slices of the 60-bit value. Array-typed so one explode fans a shingle
    into its k probe rows."""
    return F.array(
        *[
            F.shiftright(h, BLOOM_M_BITS * i).bitwiseAND(F.lit(_POS_MASK))
            for i in range(BLOOM_K)
        ]
    )


def bloom_build(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Build the sparse Bloom word table over a benchmark set's distinct
    word n-grams -> (word_idx int, word bigint), one row per NON-ZERO
    32-bit word of the 2^20-bit filter (<= 32768 rows — always broadcast
    range).

    Cost: one scan of the (small) benchmark set, a global distinct on the
    60-bit shingle hashes, a k-way explode, one bit_or aggregation. This
    table is what a pipeline persists next to the benchmark suite and
    broadcasts into every screening run."""
    hashes = (
        _spread(df, id_col)
        .select(F.explode(shingle_hash_array_py(text_col, n, 15)).alias("h"))
        .distinct()
    )
    pos = hashes.select(F.explode(_positions(F.col("h"))).alias("p"))
    return (
        pos.select(
            F.shiftright(F.col("p"), BLOOM_WORD_SHIFT).cast("int").alias("word_idx"),
            # F.shiftleft only takes a literal shift count; the SQL form
            # accepts the column
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p & {_BIT_MASK} AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_screen(
    corpus: DataFrame,
    bloom: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    flag_ppm: int = 150_000,
) -> DataFrame:
    """Screen every corpus document against a built Bloom filter -> one row
    per document: (id, n_shingles, bloom_hits, hit_ppm, flagged).

    - ``n_shingles`` = the document's distinct word n-grams;
    - ``bloom_hits`` = how many of them hit the filter (all k bits set) —
      an upper bound on true benchmark overlap (no false negatives, rare
      false positives);
    - ``hit_ppm`` = bloom_hits * 1e6 DIV n_shingles (integer parts-per-
      million; pure BIGINT arithmetic, the hash-stable output discipline);
    - ``flagged`` = 1 iff hit_ppm >= ``flag_ppm`` — the candidate set to
      feed into the exact containment join (`contamination_pairs`).

    Scale shape: narrow Arrow shingle scan, k-way explode, BROADCAST join
    against the word table (never a corpus shuffle), then two keyed
    aggregations that both partial-aggregate map-side — a document's
    shingle rows are co-located by construction (explode never crosses
    partitions), so the (id, h) and (id) groupings each collapse to one
    row per document BEFORE their exchange; the only shuffled bytes are
    per-document counters."""
    sh = _spread(corpus, id_col).select(
        F.col(id_col), F.explode(shingle_hash_array_py(text_col, n, 15)).alias("h")
    )
    probes = sh.select(
        id_col, "h", F.explode(_positions(F.col("h"))).alias("p")
    ).select(
        id_col,
        "h",
        F.shiftright(F.col("p"), BLOOM_WORD_SHIFT).cast("int").alias("word_idx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p & {_BIT_MASK} AS INT))").alias(
            "mask"
        ),
    )
    per_shingle = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy(id_col, "h")
        .agg(
            F.sum(
                F.when(
                    F.col("word").bitwiseAND(F.col("mask")) != 0, 1
                ).otherwise(0)
            ).alias("__hits")
        )
    )
    return (
        per_shingle.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("__hits") == BLOOM_K, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("bloom_hits"),
        )
        .select(
            id_col,
            "n_shingles",
            "bloom_hits",
            F.expr("bloom_hits * CAST(1000000 AS BIGINT) div n_shingles").alias(
                "hit_ppm"
            ),
            F.when(
                F.expr("bloom_hits * CAST(1000000 AS BIGINT) div n_shingles")
                >= F.lit(int(flag_ppm)),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("flagged"),
        )
    )
