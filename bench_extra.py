#!/usr/bin/env python3
"""Round-6 optimization measurement rig (guide section 1): per-query noop
timing + .explain("formatted") capture, OUTSIDE the frozen bench.py.

Same timing methodology as bench.py's _timed_noop (warm noop write, then a
timed noop write) so numbers are comparable, but with repeat support and
plan dumps for the optimization evidence trail.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--plans OUTDIR] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--plans", default=None, help="dir to write <name>.txt explain output")
    ap.add_argument("--suffix", default="", help="suffix for plan filenames (e.g. _before)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    from ocrd_tesserocr_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]", shuffle_partitions=cpus, app_name="bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = args.names or [n for n in qs]

    out: dict[str, list] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        df = qs[name](spark, args.sf)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df.write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = ts
        print(f"{name}: {ts}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({k: min(v) for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
