"""Round-13 optimization profiler: time any subset of registered
queries through the bench's own methodology (noop sink, min-of-N,
release_all_cached between samples) and capture `.explain("formatted")`
to plans/<round>/<name>_<tag>.txt (--round, default r14).

Usage:
  python tools/opt_profile.py --tag before --runs 2 [--sf DIR] [names...]

With no names: the full bench HEADLINE + TIER2 set. Timing and plan
capture happen in the same process; plans are captured AFTER timing so
first-touch codegen does not leak into the walls. Queries in
plan_report.MATERIALIZED_GATES return collected LocalRelations, so for
those the txt records that fact instead of a useless one-liner.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--round", dest="round_dir", default="r14",
                    help="plans/<round> output dir (default r14)")
    ap.add_argument("--out", default=None,
                    help="JSON file for walls (default: stdout only)")
    args = ap.parse_args()

    os.environ.setdefault("BORSA_SPARK_SHINGLE_HASH", "xxhash64")
    from bench import HEADLINE, TIER2, arrow_probe, calibration_probe
    from tools.plan_report import MATERIALIZED_GATES

    from borsa_spark.queries import QUERIES
    from borsa_spark.session import get_spark, release_all_cached

    names = args.names or (HEADLINE + TIER2)
    spark = get_spark("opt-profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    probe_s = calibration_probe(spark)
    probe_arrow_s = arrow_probe(spark)

    plan_dir = os.path.join(os.path.dirname(__file__), "..", "plans",
                        args.round_dir)
    os.makedirs(plan_dir, exist_ok=True)

    walls: dict[str, float] = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"opt:{name}")
        samples = []
        for _ in range(args.runs):
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            release_all_cached(spark)
        walls[name] = round(min(samples), 3)
        print(f"{name}: {walls[name]}  (samples: "
              f"{[round(s, 3) for s in samples]})", flush=True)
        spark.sparkContext.setJobDescription(None)

        if args.no_plans:
            continue
        out_path = os.path.join(plan_dir, f"{name}_{args.tag}.txt")
        if name in MATERIALIZED_GATES:
            body = (
                f"{name}: materialized gate-harness query — the returned "
                "relation is a collected LocalRelation of the protocol's "
                "output; plan evidence for the underlying operators lives "
                "in tests/test_plan_shapes.py and PLANS.md. Wall "
                f"({args.tag}, min of {args.runs}): {walls[name]} s at "
                f"{args.sf}.\n"
            )
        else:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            release_all_cached(spark)
            body = buf.getvalue()
        with open(out_path, "w") as f:
            f.write(body)

    result = {
        "tag": args.tag,
        "sf": args.sf,
        "runs": args.runs,
        "probe_s": probe_s,
        "probe_arrow_s": probe_arrow_s,
        "walls": walls,
        "total": round(sum(walls.values()), 3),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
            f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
