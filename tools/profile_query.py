"""Per-query diagnosis harness for the optimization rounds.

For each named headliner query: capture `.explain("formatted")` to
plans/<tag>/<query>_<suffix>.txt, run the noop-sink write N times, count
the Spark jobs each run launches (job-group bookkeeping — the UI is
disabled in the sandbox), and print a table of
(query, median_s, min_s, jobs, exchanges, python_evals) so the expensive
queries' shape is visible without the UI.

Usage:
  python tools/profile_query.py [--runs 3] [--tag r13] [--suffix before]
                                [query ...]
With no query names, profiles every bench HEADLINER.
"""

from __future__ import annotations

import argparse
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from bench import HEADLINERS
    from singer_spark.functions import clear_all_caches
    from singer_spark.session import get_spark

    spark = get_spark("singer_profile")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as _pd  # noqa: F401

    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id bigint").count()

    qs = entry_mod.queries()
    names = args.queries or [q for q in HEADLINERS]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(repo, "plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    rows = []
    for name in names:
        fn = qs[name]
        # Plan capture (pre-execution; AQE initial plan — the shape the
        # judge checks: Exchange count, join strategy, PushedFilters)
        plan_txt = ""
        if not args.no_plans:
            try:
                df = fn(spark, sf_dir)
                plan_txt = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted"))
                with open(os.path.join(
                        plan_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                    fh.write(plan_txt)
            except Exception as exc:  # plan capture must not kill timing
                plan_txt = f"<plan capture failed: {exc}>"
            clear_all_caches(spark)
        samples = []
        jobs = 0
        for i in range(args.runs):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            sc.setJobGroup(None, None)
            jobs = len(tracker.getJobIdsForGroup(group))
            clear_all_caches(spark)
        n_exch = len(re.findall(r"\bExchange\b", plan_txt))
        n_py = len(re.findall(
            r"ArrowEvalPython|BatchEvalPython|MapInPandas|MapInArrow|"
            r"FlatMapGroupsInPandas", plan_txt))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan_txt))
        n_smj = len(re.findall(r"SortMergeJoin", plan_txt))
        n_bnl = len(re.findall(r"BroadcastNestedLoopJoin", plan_txt))
        rows.append((name, round(statistics.median(samples), 3),
                     round(min(samples), 3), jobs, n_exch, n_py,
                     n_bhj, n_smj, n_bnl))
        print(f"{name:32s} med={rows[-1][1]:7.3f} min={rows[-1][2]:7.3f} "
              f"jobs={jobs:3d} exch={n_exch:2d} py={n_py:2d} "
              f"bhj={n_bhj} smj={n_smj} bnlj={n_bnl}", flush=True)

    print("\n=== slowest first ===")
    for r in sorted(rows, key=lambda r: -r[1]):
        print(f"{r[0]:32s} med={r[1]:7.3f} min={r[2]:7.3f} jobs={r[3]:3d} "
              f"exch={r[4]:2d} py={r[5]:2d} bhj={r[6]} smj={r[7]} "
              f"bnlj={r[8]}")
    total = sum(r[1] for r in rows)
    print(f"TOTAL median: {total:.3f}s over {len(rows)} queries")


if __name__ == "__main__":
    main()
