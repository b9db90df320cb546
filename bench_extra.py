"""Round-6 optimization harness (guide §1): per-query isolation with the
noop sink, count()-path timing (the frozen bench.py methodology), and
``.explain("formatted")`` capture for plans/r06/.

NOT part of the driver contract — bench.py stays the measured artifact;
this file exists so optimization work can be measured query-by-query
without touching it.

Usage:
    python bench_extra.py [--queries q1,q2] [--tag before|after] [--reps 3]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
round-5 measurement SF), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stellar_ingest.session import get_spark  # noqa: E402

HEADLINE = [
    "agg_basic",
    "join_large",
    "join_broadcast",
    "win_rank",
    "topk_per_group",
    "dedup_exact",
    "dedup_minhash",
    "text_quality",
    "ann_cosine_topk",
    "win_tumbling",
    "tpch_q5",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma list (default: headline)")
    ap.add_argument("--tag", default=None, help="write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-noop", action="store_true", help="skip noop-sink timing")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/stellar_bench_local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/stellar_bench_local"
    spark = get_spark("stellar-bench-extra", cores=cpus, shuffle_partitions=8 * cpus, extra_conf=extra)

    from stellar_ingest import registry

    qs = registry.queries()
    names = args.queries.split(",") if args.queries else HEADLINE
    # one untimed warmup (bench.py does the same with the first query)
    qs[names[0]](spark, sf_dir).count()

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        rec = {}
        # count()-path: the frozen bench.py methodology (build + count)
        best = None
        for _ in range(args.reps):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        rec["count_s"] = round(best, 3)
        if not args.no_noop:
            # noop sink: computes every column (guide §1.4)
            df = qs[name](spark, sf_dir)
            best = None
            for _ in range(args.reps):
                t0 = time.monotonic()
                df.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            rec["noop_s"] = round(best, 3)
        # plan build time (analysis overhead is part of the count() path)
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        rec["build_s"] = round(time.monotonic() - t0, 3)
        if args.tag:
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_{args.tag}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"all": out, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
