"""Measured scaling slopes for the engine's heavy operators.

The correctness gate runs at sf0.01 and the bench at sf0.1 — neither says
whether an operator's COST CURVE survives a 100x scale-up. This probe
materializes k-times-scaled corpora from the sf0.1 tables (k=4 and k=16 by
default, ~1.6 "sf" at the top end), runs the heavy catalog queries at each
scale, and prints per-query runtime ratios so a superlinear blowup shows
up as a number, not an argument. COVERAGE.md records the measured table.

Scaling construction (the point is constant PER-ROW structure, so cost
curves measure the operator, not an artifact of cloning):

- Facts get replica-offset primary/foreign keys (orderkey/custkey/
  partkey/suppkey/event_id/user_id/doc_id/vec_id), so join fan-outs and
  group depths scale in GROUP COUNT, not group size — 16x data means 16x
  ships/users/orders, the way a real corpus grows.
- ``documents.text`` is token-salted per replica (every token prefixed
  with a replica tag that survives the dedup normalizer as an ordinary
  token prefix): within a replica the shingle-set structure of the
  original corpus is preserved essentially verbatim (a near-bijective
  token rename), across replicas shingle sets are disjoint. Naive text
  cloning would instead plant k-clone groups everywhere and near-dup PAIR
  counts would grow k^2 — measuring the corpus, not the algorithm.
- ``embeddings.embedding`` is circularly rotated by replica index: a
  coordinate permutation is orthogonal, so within-replica inner products
  / cosines / norms are preserved up to float summation order (rotating
  the coordinates reorders the sum; measured deltas ~1e-7, which can in
  principle flip a pair sitting exactly on a ROUND(..,6) tie or a
  threshold), while cross-replica cosines decorrelate. The ANN/near-dup
  workload per replica is statistically equivalent to the original —
  close enough for a cost-curve probe, not a bitwise guarantee.
- Dimensions (region, nation) copy through; customer/part/supplier scale
  with their keys so FK references stay dense and valid.

Usage:
    python scripts/scale_probe.py [--scales 4,16] [--queries q20,q54,...]

Writes /tmp/sparkscale/x{k}/*.parquet (DuckDB does the materializing —
no Spark involvement in data prep) and prints a JSON summary line plus a
markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE = "/tmp/sparkscale"

# Key offsets: larger than any key at sf0.1 (orderkey tops out ~600k,
# doc_id ~5k, user_id ~10k, vec_id ~2k) and far below 2^63 at k<=1024.
OFF = 10_000_000

# The probed set: every operator family whose cost curve is worth
# measuring (aggregation scan, as-of join, exact/near dedup, clustering,
# census window, ANN brute + IVF index, decontamination, interval join,
# hybrid retrieval, curation composition). Sub-second dimension-shaped
# queries (enum joins, pivots) are excluded on purpose: their cost is
# plan overhead, not data.
DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q06_asof_enrich",
    "q13_sessionize",
    "q14_dedup_exact",
    "q18_knn_cosine",
    "q19_minhash_lsh",
    "q20_ngram_jaccard",
    "q27_embedding_dups",
    "q37_decontamination",
    "q42_dedup_keep_list",
    "q109_cluster_holdout",
    "q43_simhash_pairs",
    "q46_interval_join",
    "q54_curation_pipeline",
    "q55_hybrid_retrieval",
    "q59_dup_spans",
    "q62_ivf_index_topk",
    # r10 additions with data-dependent cost shapes (q88 is fixed-size
    # synthetic input, so it is deliberately NOT probed):
    "q89_domain_cap",
    "q90_link_authority",
    "q91_zone_transitions",
    # r11 additions: the heavy LM/dedup tier re-probed in r11 plus the
    # round's catch (q66 was 22.7x at 16x before the cluster-count fix —
    # keep it in the default sweep so a regression to superlinear shows),
    # and the two new gates with data-dependent shapes:
    "q64_span_removal",
    "q66_semantic_dedup",
    "q67_lm_perplexity",
    "q68_dsir_weights",
    "q72_bloom_decontam",
    "q92_session_windows",
    "q93_bucketed_join",
    # r13 additions: prefix-filtered exact similarity join (candidate
    # volume is corpus-dependent) and the HDR quantile sketch build
    "q105_hdr_quantiles",
    "q106_exact_similarity_join",
    "q108_track_resample",
    # r14 additions: perceptual-hash image near-dup (codec decode +
    # banded Hamming pairs — pair volume is corpus-dependent) and the
    # incremental ANN fold+serve (index cached per sf_dir, so the timed
    # runs measure the serving path like q62's row)
    "q111_image_neardup",
    "q112_ann_index_update",
    "q113_audio_neardup",
    # r15 additions: incremental fingerprint fold+serve and the cluster
    # store fold (both cache their build per process like q112, so the
    # timed runs measure the serving path)
    "q115_fingerprint_index_update",
    "q116_incremental_clusters",
]


def materialize(k: int, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 4}")

    def write(table: str, select_per_replica: str) -> None:
        out = os.path.join(dst, f"{table}.parquet")
        reps = " UNION ALL ".join(
            f"SELECT {select_per_replica.format(i=i)} FROM "
            f"'{SRC}/{table}.parquet'"
            for i in range(k)
        )
        con.execute(f"COPY ({reps}) TO '{out}' (FORMAT PARQUET)")

    for dim in ("region", "nation"):
        shutil.copyfile(
            os.path.join(SRC, f"{dim}.parquet"), os.path.join(dst, f"{dim}.parquet")
        )
    write("customer", "c_custkey + {i}*" + str(OFF) + " AS c_custkey, c_name, "
          "c_nationkey, c_acctbal, c_mktsegment")
    write("orders", "o_orderkey + {i}*" + str(OFF) + " AS o_orderkey, "
          "o_custkey + {i}*" + str(OFF) + " AS o_custkey, o_orderstatus, "
          "o_totalprice, o_orderdate, o_orderpriority")
    write("lineitem", "l_orderkey + {i}*" + str(OFF) + " AS l_orderkey, "
          "l_partkey + {i}*" + str(OFF) + " AS l_partkey, "
          "l_suppkey + {i}*" + str(OFF) + " AS l_suppkey, l_linenumber, "
          "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
          "l_linestatus, l_shipdate")
    write("part", "p_partkey + {i}*" + str(OFF) + " AS p_partkey, p_name, "
          "p_brand, p_type, p_size, p_retailprice")
    write("supplier", "s_suppkey + {i}*" + str(OFF) + " AS s_suppkey, s_name, "
          "s_nationkey, s_acctbal")
    write("events", "event_id + {i}*" + str(OFF) + " AS event_id, ts, "
          "user_id + {i}*" + str(OFF) + " AS user_id, event_type, value, props")
    # Token-salt: replica 0 is the original corpus byte-for-byte; replica
    # i>0 prefixes every whitespace token with 'z{i}q'. The dedup
    # normalizer lowercases and strips non-alnum, so the prefix rides
    # through as part of the token for clean tokens (the overwhelming
    # majority) — a token RENAME, preserving shingle-set structure.
    write(
        "documents",
        "doc_id + {i}*" + str(OFF) + " AS doc_id, "
        "CASE WHEN {i} = 0 THEN text ELSE array_to_string("
        "list_transform(string_split(text, ' '), t -> 'z' || {i} || 'q' || t),"
        " ' ') END AS text, lang, source, n_chars",
    )
    # Circular rotation by replica index: orthogonal, so within-replica
    # geometry (cosines, norms, neighbor ranks) is exactly the original's.
    # Labels are replica-offset by default (a bigger corpus has more
    # categories, each the same size — the growth model under which
    # label-blocking is a sane strategy). FIXED_LABELS=1 keeps labels
    # unchanged instead: every block grows linearly and block-pair cost
    # quadratically — the degenerate-key regime embedding_dup_pairs'
    # max_block_size cap exists for (measured 117x at 16x before the
    # cap; with it, oversized blocks are excluded and the curve goes
    # flat). Both regimes are worth measuring; they answer different
    # questions.
    label = (
        "label"
        if os.environ.get("FIXED_LABELS") == "1"
        else "label + {i}*10000 AS label"
    )
    write(
        "embeddings",
        "vec_id + {i}*" + str(OFF) + " AS vec_id, "
        "CASE WHEN {i} = 0 THEN embedding ELSE "
        "list_concat(embedding[1 + ({i} % len(embedding)):], "
        "embedding[:{i} % len(embedding)]) END AS embedding, " + label,
    )
    con.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="4,16")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--runs", type=int, default=2, help="timed runs; min is kept")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    names = [q for q in args.queries.split(",") if q]

    for k in scales:
        dst = os.path.join(BASE, f"x{k}")
        if not os.path.exists(os.path.join(dst, "embeddings.parquet")):
            t0 = time.time()
            materialize(k, dst)
            print(f"materialized x{k} in {time.time()-t0:.1f}s", file=sys.stderr)

    from pincspark.plans.queries import queries as catalog
    from pincspark.session import get_spark

    qs = catalog()
    spark = get_spark("pincspark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {1: SRC, **{k: os.path.join(BASE, f"x{k}") for k in scales}}
    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        row: dict[str, float] = {}
        for k, d in dirs.items():
            fn(spark, d).write.mode("overwrite").format("noop").save()  # warm
            best = min(
                _timed(fn, spark, d) for _ in range(max(1, args.runs))
            )
            row[f"t{k}"] = round(best, 3)
        for k in scales:
            row[f"r{k}"] = round(row[f"t{k}"] / row["t1"], 2) if row["t1"] else None
        results[name] = row
        print(f"{name}: {row}", file=sys.stderr, flush=True)
    spark.stop()

    hdr = "| query | t(1x) | " + " | ".join(
        f"t({k}x) | ratio({k}x) " for k in scales
    ) + "|"
    print(hdr)
    print("|" + "---|" * (2 + 2 * len(scales)))
    for name, row in results.items():
        cells = [name, f"{row['t1']:.2f}s"]
        for k in scales:
            cells += [f"{row[f't{k}']:.2f}s", f"{row[f'r{k}']:.1f}x"]
        print("| " + " | ".join(cells) + " |")
    print(json.dumps({"scales": scales, "results": results}))


def _timed(fn, spark, d) -> float:
    t0 = time.time()
    fn(spark, d).write.mode("overwrite").format("noop").save()
    return time.time() - t0


if __name__ == "__main__":
    main()
