"""Persistent inverted text index: served == transient BM25 row identity,
term-bucket partition pruning (plan + files-read), driver/Spark bucket-hash
agreement, and absent-term behavior."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from pincspark.operators.search import bm25_scores
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
        for r in spark.read.parquet(f"{path}/dfreq")
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
