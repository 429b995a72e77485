"""Simulate the driver's t2 correctness gate at the graded scale: run the
first 50 registered queries on Spark at sf0.01 and compare each against
its DuckDB oracle with full-precision (%.17g) canonicalization and an
arrow-level type-class check — the exact strength that caught q59 in
r6/r7 after %.9g local parity had passed it.

Usage: python scripts/driver_sim.py [--sf-dir DIR] [--queries q65,q66]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.17g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default=None, help="comma list; default = the 50-query window")
    ap.add_argument("--all", action="store_true", help="sweep the FULL catalog, not just the window")
    ap.add_argument("--json", default=None, metavar="OUT",
                    help="also write a machine-readable sweep artifact "
                         "(VERDICT r10 #6: the no-stale-greens guarantee as "
                         "a committed SWEEP_rN.json instead of a prose claim)")
    args = ap.parse_args()

    import duckdb

    from pincspark.plans.queries import QUERIES
    from pincspark.session import get_spark
    from tests.test_oracle_parity import _arrow_type_class, _spark_type_class

    names = list(QUERIES) if getattr(args, "all", False) else list(QUERIES)[:50]
    if args.queries:
        want = args.queries.split(",")
        names = [n for n in list(QUERIES) if n in want or n.split("_")[0] in want]

    spark = get_spark("driver-sim", cpus=16)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    failures = []
    report: dict[str, dict] = {}
    for name in names:
        fn, sql = QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
            if sql is None:
                print(f"{name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
                report[name] = {"status": "rows_only", "rows": len(srows),
                                "secs": round(time.time() - t0, 1)}
                continue
            arrow = con.execute(sql).fetch_arrow_table()
            ocols = arrow.schema.names
            orows = list(zip(*[c.to_pylist() for c in arrow.columns])) if arrow.num_rows else []
            problems = []
            if sorted(scols) != sorted(ocols):
                problems.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
            stypes = dict(sdf.dtypes)
            atypes = {f.name: f.type for f in arrow.schema}
            for c in set(scols) & set(ocols):
                sc, oc = _spark_type_class(stypes[c]), _arrow_type_class(atypes[c])
                if sc != oc:
                    problems.append(f"type-class {c}: spark={sc} duck={oc}")
            if len(srows) != len(orows):
                problems.append(f"rows {len(srows)} vs {len(orows)}")
            elif rowset(scols, srows) != rowset(ocols, orows):
                a, b = rowset(scols, srows), rowset(ocols, orows)
                first = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
                problems.append(f"hash diff at sorted row {first}: {a[first]} vs {b[first]}")
            status = "OK" if not problems else "FAIL " + "; ".join(p[:300] for p in problems)
            print(f"{name}: {status} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            report[name] = {"status": "ok" if not problems else "fail",
                            "rows": len(srows),
                            "secs": round(time.time() - t0, 1)}
            if problems:
                report[name]["problems"] = [p[:300] for p in problems]
                failures.append(name)
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]} [{time.time()-t0:.1f}s]")
            report[name] = {"status": "error",
                            "error": f"{type(e).__name__}: {str(e)[:200]}",
                            "secs": round(time.time() - t0, 1)}
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} green" + (f"; FAILURES: {failures}" if failures else ""))
    if args.json:
        import json as _json

        payload = {
            "sf_dir": args.sf_dir,
            "n_queries": len(names),
            "n_green": len(names) - len(failures),
            "failures": failures,
            "comparison": "%.17g canon + arrow type classes (driver-strength)",
            "queries": report,
        }
        with open(args.json, "w") as f:
            _json.dump(payload, f, indent=1)
        print(f"wrote {args.json}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
