"""Persistent inverted text index: served == transient BM25 row identity,
term-bucket partition pruning (plan + files-read), driver/Spark bucket-hash
agreement, and absent-term behavior."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from pincspark.operators.search import bm25_scores
from pincspark.operators.commits import read_sidecar
from pincspark.operators.text_index import (
    build_text_index,
    search_text_index,
    term_bucket_col,
    term_bucket_py,
)
from pincspark.sources.tables import table
from tests.conftest import SF_DIR

TERMS = ("spark", "window", "merge", "vector")


def _index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("txtidx"))
    docs = table(spark, SF_DIR, "documents")
    build_text_index(docs, path, n_buckets=32)
    return path, docs


def test_served_equals_transient(spark, tmp_path_factory):
    path, docs = _index(spark, tmp_path_factory)
    served = sorted(
        map(tuple, search_text_index(spark, path, TERMS, n_buckets=32).collect())
    )
    transient = sorted(map(tuple, bm25_scores(docs, "doc_id", "text", TERMS).collect()))
    assert served == transient and len(served) > 0


def test_python_bucket_matches_spark_bucket(spark):
    df = spark.createDataFrame([(t,) for t in ("a", "spark", "Zz", "0")], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.select("term", term_bucket_col(F.col("term"), 32).alias("b")).collect()
    }
    assert got == {t: term_bucket_py(t, 32) for t in got}


def test_partition_pruning_in_plan_and_files(spark, tmp_path_factory):
    path, _ = _index(spark, tmp_path_factory)
    out = search_text_index(spark, path, TERMS, n_buckets=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "term_bucket" in plan and "PartitionFilters: [" in plan, plan
    # physical proof: the probed buckets are a strict subset of what exists
    probed = {term_bucket_py(t, 32) for t in TERMS}
    on_disk = {
        int(p.rsplit("term_bucket=", 1)[1])
        for p in glob.glob(f"{path}/postings/term_bucket=*")
    }
    assert probed < on_disk, (probed, on_disk)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and all(str(b) in m.group(1) for b in probed), m.group(0)


def test_absent_terms_score_nothing(spark, tmp_path_factory):
    path, _ = _index(spark, tmp_path_factory)
    assert search_text_index(spark, path, ("zzzzz", "qqqqq"), n_buckets=32).count() == 0


def test_dfreq_matches_recount(spark, tmp_path_factory):
    """The persisted dfreq sidecar equals a recount over the postings."""
    path, _ = _index(spark, tmp_path_factory)
    dfreq = {
        r["term"]: r["df"]
        for r in read_sidecar(spark, f"{path}/dfreq")
        .filter(F.col("term").isin(list(TERMS)))
        .collect()
    }
    recount = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{path}/postings")
        .filter(F.col("term").isin(list(TERMS)))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    assert dfreq == recount and len(dfreq) == len(TERMS)


def test_build_tokenizes_corpus_exactly_once(spark, tmp_path_factory):
    """One-pass build (VERDICT r12 #3): the postings write is the ONLY
    plan that tokenizes the corpus — the dfreq and stats sidecars derive
    from the persisted postings (their captured source plans scan parquet,
    never the documents table, and contain no tokenizer explode)."""
    from pincspark.planhooks import capture_staged_plans

    path = str(tmp_path_factory.mktemp("txtidx1p"))
    docs = table(spark, SF_DIR, "documents")
    with capture_staged_plans() as sink:
        build_text_index(docs, path, n_buckets=32)
    plans = dict(sink)
    assert set(plans) == {
        "text_index:postings-build",
        "text_index:dfreq-source",
        "text_index:stats-source",
    }
    assert "Generate explode" in plans["text_index:postings-build"]
    for label in ("text_index:dfreq-source", "text_index:stats-source"):
        assert "Generate explode" not in plans[label], label
        assert "Scan parquet" in plans[label], label


def test_zero_token_docs_counted_in_stats(spark, tmp_path):
    """Empty and NULL texts must still count toward n_docs (and stay out
    of avgdl's non-null average) even though they emit no scorable
    postings — the marker-row design."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None), (4, "alpha")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    build_text_index(docs, path, n_buckets=8)
    st = read_sidecar(spark, f"{path}/stats").collect()[0]
    assert st["n_docs"] == 4
    # doc2 tokenizes to zero tokens (dl=0, included); doc3 NULL (excluded)
    assert st["n_dl"] == 3 and st["sum_dl"] == 3
    assert st["avgdl"] == 1.0
    # marker rows never score
    assert search_text_index(spark, path, ("alpha",), n_buckets=8).count() == 2


def test_update_equals_rebuild_and_touches_only_batch_files(
    spark, tmp_path_factory
):
    """update_text_index folded with a disjoint new batch must serve
    row-identically to a full rebuild over old ∪ batch, and the update
    must not rewrite historical postings files (O(batch) proof: the
    pre-update parquet files survive byte-for-byte by path+mtime)."""
    import os

    from pincspark.operators.text_index import update_text_index

    docs = table(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    inc_path = str(tmp_path_factory.mktemp("txtidx_inc"))
    build_text_index(old, inc_path, n_buckets=32)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{inc_path}/postings/**/*.parquet", recursive=True)
    }
    update_text_index(batch, inc_path, n_buckets=32)
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{inc_path}/postings/**/*.parquet", recursive=True)
    }
    assert set(before) < set(after)  # strictly appended
    assert all(after[p] == before[p] for p in before)  # history untouched

    full_path = str(tmp_path_factory.mktemp("txtidx_full"))
    build_text_index(docs, full_path, n_buckets=32)

    served_inc = sorted(
        map(tuple, search_text_index(spark, inc_path, TERMS, n_buckets=32).collect())
    )
    served_full = sorted(
        map(tuple, search_text_index(spark, full_path, TERMS, n_buckets=32).collect())
    )
    assert served_inc == served_full and len(served_inc) > 0

    # sidecars fold exactly: dfreq and stats bit-identical to the rebuild
    assert sorted(
        map(tuple, read_sidecar(spark, f"{inc_path}/dfreq").collect())
    ) == sorted(map(tuple, read_sidecar(spark, f"{full_path}/dfreq").collect()))
    assert read_sidecar(spark, f"{inc_path}/stats").collect() == read_sidecar(
        spark, f"{full_path}/stats"
    ).collect()
