"""The Arrow shingle kernel (shingle_array_py) must produce byte-identical
arrays to the pure-column-expression form (shingle_array) — the dedup
operators default to the Python kernel for speed, while the oracle SQL
replicates the column-expression semantics, so this equality IS the
correctness bridge."""

from __future__ import annotations

from pyspark.sql import functions as F

from pincspark.operators.dedup import (
    shingle_array,
    shingle_array_py,
    shingle_hash_array_py,
)
from tests.conftest import SF_DIR

EDGE_TEXTS = [
    None,
    "",
    " ",
    "   ",
    "one",
    "one two",
    "one two three",
    "one two three four",
    "!!! ??? ...",
    "  Leading and   trailing  ",
    "Tabs\tand\nnewlines\r\nhere",
    "MiXeD CaSe RePeAt MiXeD CaSe RePeAt",
    "digits 123 mix3d t0kens 123 digits",
    "Ünïcödé wörds stràight thróugh",
    "a b a b a b a b",
    "x" * 500,
    ("w " * 300).strip(),
]


def _both(spark, df, n):
    a = (
        df.select("i", F.to_json(shingle_array("t", n)).alias("j"))
        .orderBy("i")
        .collect()
    )
    b = (
        df.select("i", F.to_json(shingle_array_py("t", n)).alias("j"))
        .orderBy("i")
        .collect()
    )
    return [r["j"] for r in a], [r["j"] for r in b]


def test_edge_rows_identical(spark):
    df = spark.createDataFrame(
        list(enumerate(EDGE_TEXTS)), ["i", "t"]
    )
    for n in (1, 2, 3, 5):
        hof, py = _both(spark, df, n)
        assert hof == py, f"n={n}"


def test_corpus_identical(spark):
    from pincspark.sources.tables import table

    docs = table(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("i"), F.col("text").alias("t")
    )
    hof, py = _both(spark, docs, 3)
    assert hof == py


def _hash_parity(spark, df, hex_chars):
    """shingle_hash_array_py must equal md5-prefix hashing of the
    column-expression shingles (conv path == the DuckDB oracle's
    ('0x'||substring(md5(s),1,k))::BIGINT)."""
    jvm_hash = F.conv(F.substring(F.md5(F.col("s")), 1, hex_chars), 16, 10).cast(
        "bigint"
    )
    a = (
        df.select("i", F.posexplode(shingle_array("t", 3)).alias("p", "s"))
        .select("i", "p", jvm_hash.alias("h"))
        .orderBy("i", "p")
        .collect()
    )
    b = (
        df.select(
            "i", F.posexplode(shingle_hash_array_py("t", 3, hex_chars)).alias("p", "h")
        )
        .orderBy("i", "p")
        .collect()
    )
    return [tuple(r) for r in a], [tuple(r) for r in b]


def test_hash_kernel_matches_jvm_md5(spark):
    df = spark.createDataFrame(list(enumerate(EDGE_TEXTS)), ["i", "t"])
    for hex_chars in (8, 15):
        jvm, py = _hash_parity(spark, df, hex_chars)
        assert jvm == py, f"hex_chars={hex_chars}"


def test_hash_kernel_matches_jvm_md5_corpus(spark):
    from pincspark.sources.tables import table

    docs = table(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("i"), F.col("text").alias("t")
    )
    jvm, py = _hash_parity(spark, docs, 15)
    assert jvm == py


def test_minhash_from_shared_60bit_arrays_matches_text_path(spark):
    """The q53/q54 single-shingle-pass contract: minhash signatures derived
    from a precomputed 60-bit (15-hex-char) shingle-hash frame via
    shiftright(h, 28) must equal the direct width-8 text path bit-for-bit
    (the 32-bit hash is the md5 hex PREFIX of the 60-bit one), on both the
    edge corpus and real documents."""
    from pincspark.operators.dedup import minhash_signatures
    from pincspark.sources.tables import table

    edge = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS) if t is not None], ["i", "t"]
    )
    docs = table(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("i"), F.col("text").alias("t")
    )
    for df in (edge, docs):
        arrs = df.select("i", shingle_hash_array_py("t", 3, 15).alias("__arr"))
        direct = minhash_signatures(df, "i", "t").orderBy("i").collect()
        shared = (
            minhash_signatures(df, "i", "t", shingles=arrs).orderBy("i").collect()
        )
        assert [tuple(r) for r in direct] == [tuple(r) for r in shared]
