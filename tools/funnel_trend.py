"""Print the curation funnel trend + drift alerts from a curate_stream
metrics table — the on-call view of `curation.funnel_trend`.

    python tools/funnel_trend.py /data/curation_metrics [--sigma 3.0]
        [--min-epochs 3] [--last N]

One line per (epoch, stage): survival rate, trailing mean/std over the
prior epochs, and a DRIFT marker when the rate moved more than sigma
trailing stddevs — the alert a production curation pipeline pages on.
Exit code 1 when any drift row exists in the window (cron-able).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: "list[str] | None" = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("metrics_path", help="curate_stream metrics_path table")
    p.add_argument("--sigma", type=float, default=3.0)
    p.add_argument("--min-epochs", type=int, default=3)
    p.add_argument("--last", type=int, default=None, metavar="N",
                   help="only print the newest N epochs (drift exit code "
                        "still reflects only the printed window)")
    args = p.parse_args(argv)

    from singer_spark.curation import funnel_trend
    from singer_spark.session import get_spark

    spark = get_spark("funnel_trend")
    spark.sparkContext.setLogLevel("ERROR")
    t = funnel_trend(spark, args.metrics_path, sigma=args.sigma,
                     min_epochs=args.min_epochs)
    rows = t.collect()
    if args.last is not None:
        keep = sorted({r.epoch_id for r in rows})[-args.last:]
        rows = [r for r in rows if r.epoch_id in set(keep)]
    print(f"{'epoch':>7} {'stage':<24} {'in':>9} {'kept':>9} "
          f"{'rate':>8} {'trail_mean':>11} {'trail_std':>10}  flag")
    n_drift = 0
    for r in rows:
        flag = ""
        if r.drift:
            flag = "DRIFT"
            n_drift += 1

        def f(x, w):
            return f"{x:>{w}.4f}" if x is not None else " " * (w - 1) + "-"

        print(f"{r.epoch_id:>7} {r.stage:<24} {r.n_in:>9} {r.n_kept:>9} "
              f"{f(r.rate, 8)} {f(r.trailing_mean, 11)} "
              f"{f(r.trailing_std, 10)}  {flag}")
    if n_drift:
        print(f"\n{n_drift} drift row(s) at sigma={args.sigma}")
    spark.stop()
    return 1 if n_drift else 0


if __name__ == "__main__":
    raise SystemExit(main())
