"""Dump `.explain("formatted")` for named catalog queries to files —
the plans/r16/<query>_{before,after}.txt artifacts the optimization
round commits (the judge checks plan claims against these).

Staged plans (pre-localCheckpoint subtrees captured via
pincspark.planhooks) are appended after the final frame's plan, each
under a `== Staged plan: <label> ==` header, so lineage-truncating
operators show their full executed shape.

Usage:
  python scripts/plan_dump.py q103,q83 --tag before [--sf-dir DIR] [--out-dir plans/r16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", help="comma list of qNN prefixes, or 'flagship'")
    ap.add_argument("--tag", required=True, help="before|after")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default="plans/r16")
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args()

    from pincspark.planhooks import capture_staged_plans
    from pincspark.plans.queries import QUERIES
    from pincspark.session import get_spark

    want = [w.strip() for w in args.queries.split(",") if w.strip()]
    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        os.cpu_count() or 4
    )
    spark = get_spark("pincspark-plandump", cpus=cpus)
    os.makedirs(args.out_dir, exist_ok=True)

    for w in want:
        if w == "flagship":
            from pincspark.analysis import batch_archive_analysis

            import tempfile

            tmp = tempfile.mkdtemp(prefix="plandump_")
            from bench import _synth_archives

            path, _, _ = _synth_archives(0.01)
            with capture_staged_plans() as staged:
                _, occ = batch_archive_analysis(
                    spark, path, gold_path=os.path.join(tmp, "gold")
                )
                plan = occ._sc._jvm.PythonSQLUtils.explainString(
                    occ._jdf.queryExecution(), "formatted"
                )
            name = "ais_flagship"
        else:
            hits = [n for n in QUERIES if n == w or n.split("_")[0] == w]
            if not hits:
                print(f"no query matches {w!r}", file=sys.stderr)
                return 2
            name = hits[0]
            fn = QUERIES[name][0]
            with capture_staged_plans() as staged:
                df = fn(spark, args.sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
        out = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(out, "w") as f:
            f.write(plan)
            for label, splan in staged:
                f.write(f"\n\n== Staged plan: {label} ==\n\n{splan}")
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
