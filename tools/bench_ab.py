"""Single-tree leg of the code-vs-host drift A/B.

Runs the named registry queries against ONE repo tree's
`__spark_entry__` (its own JVM — trees cannot share a Spark session)
and prints one JSON line of per-query medians.  bench.py invokes this
once per tree, sequentially (never concurrently — parallel Spark jobs
on one box skew timings 1.3-8x), when its in-bench drift gate leaves a
non-empty still_slow list: same queries, same box, minutes apart, old
tree vs new tree — the manual worktree A/B that adjudicated round 7's
29.9→47.7 s scare (VERDICT r7: host drift, median inflation uniform
across touched and untouched queries), made mechanical (r7 next #2).

The script lives in the CURRENT tree and is pointed at any tree via
--repo, so prior-round worktrees don't need to contain it.

Usage: python tools/bench_ab.py --repo DIR --sf SF_DIR --runs N q1 q2...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    repo = args[args.index("--repo") + 1]
    sf_dir = args[args.index("--sf") + 1]
    runs = int(args[args.index("--runs") + 1])
    names = [a for i, a in enumerate(args)
             if not a.startswith("--") and (i == 0 or not args[i - 1].startswith("--"))]

    os.chdir(repo)
    sys.path.insert(0, repo)
    import __spark_entry__ as entry_mod  # noqa: E402 (the TARGET tree's)
    from singer_spark.session import get_spark  # noqa: E402

    # the TARGET tree may predate clear_all_caches (the r9 registry
    # drain) — a prior-round A/B leg must still run on that tree's code
    try:
        from singer_spark.functions import clear_all_caches
    except ImportError:  # pragma: no cover - exercised via prior trees
        def clear_all_caches(sp):
            sp.catalog.clearCache()

    spark = get_spark("singer_spark_bench_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id bigint").count()  # Arrow warmup

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:  # query born after the prior round: no baseline
            continue
        samples = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
        clear_all_caches(spark)
    sys.stdout.flush()
    print("BENCH_AB " + json.dumps(timings, separators=(",", ":")))


if __name__ == "__main__":
    main()
