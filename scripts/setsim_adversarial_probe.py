"""Adversarial depth probe for the exact set-similarity join (q106).

VERDICT r13 #6: the salted random corpora of the standard scale probe
keep prefix posting lists short — this probe builds the regime that
LENGTHENS them: a boilerplate-heavy corpus (each doc = K template
sentences drawn Zipfian from a small pool + a few unique tokens), where
mid-frequency template shingles land inside the tau-prefixes and the
posting join's row count grows like sum_t L_t^2.

Measured r14 (n=500/2k/8k docs, tau=0.5, 3-gram shingles, local[32]):

  raw posting-join rows   2.4M @ 2k -> 38.5M @ 8k   (~x16 per x4: quadratic)
  candidates, r13 code    594k      -> 9.59M         (waste vs answers ~13,000x)
  + positional bound 1    594k      -> 9.59M         (per-token min(i,j)+min(sz-i,sz-j):
                                                      inert when ranks correlate)
  + first-token bound 2   ~          -> 3.17M         (t* has no common token before it:
                                                      inter <= 1 + min(sz_a-i*, sz_b-j*))
  true answers            51        -> 702           (the corpus IS near-dup-dense)

Measured r16 (the partition-histogram bound, K=64, in the PPJoin+
suffix-filter role — VERDICT r15 #5):

  candidates after positional  198k @ 2k -> 3.17M @ 8k
  + histogram bound (K=64)     31.5k     -> 491k     (6.5x further cut)
  true answers                 51        -> 702      (unchanged: exact)
  wall clock @ 8k              28.0s     -> 25.3s
  (K=128 cuts candidates to 22.6k but the 2x digest shuffle costs more
   than the verify it saves: 33.5s — K=64 is the measured optimum;
   n>=2 elements bucket by plain pmod, already-uniform md5 hashes)

Conclusions recorded in COVERAGE.md: all three filters are EXACT
(answers unchanged, q106's brute-force oracle untouched), and the
residual cost is the posting join itself — on boilerplate-heavy corpora
the 100-TB defense is the q54 pipeline order (exact-dedup + LSH ahead
of the exact join), not more candidate filtering.

Usage: python scripts/setsim_adversarial_probe.py [--sizes 500,2000,8000]
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time


def corpus(spark, n: int, seed: int = 7):
    rng = random.Random(seed)
    temps = [" ".join(f"tmpl{t}w{i}" for i in range(8)) for t in range(40)]
    w = [1.0 / (k + 1) for k in range(40)]
    rows = []
    for d in range(n):
        picks = rng.choices(range(40), weights=w, k=10)
        text = (
            " ".join(temps[p] for p in picks)
            + " "
            + " ".join(f"u{d}x{j}" for j in range(8))
        )
        rows.append((d, text))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING").repartition(32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="500,2000,8000")
    args = ap.parse_args()

    from pincspark.operators.dedup import set_similarity_join
    from pincspark.session import get_spark

    spark = get_spark("setsim-adversarial-probe", cpus=32)
    out = []
    for n in (int(s) for s in args.sizes.split(",")):
        df = corpus(spark, n)
        df.count()  # materialize input before the clock
        t0 = time.time()
        counts: dict = {}
        answers = set_similarity_join(
            df, "doc_id", "text", tau100=50, n=3, _stage_counts=counts
        ).count()
        out.append({"n": n, "answers": answers, "sec": round(time.time() - t0, 2), **counts})
        print(out[-1], file=sys.stderr)
    print(json.dumps({"probe": "setsim_adversarial", "rows": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
