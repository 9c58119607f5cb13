"""Static plan audit over the whole query registry.

For every `queries()` entry, builds the DataFrame (no execution beyond
what plan construction itself requires — for most queries that is none;
the exceptions, all documented in their operators, are the pair-BUDGET
family (eager histogram/threshold job + posting-list cache, cleared
between queries here), the TRAINED quantizer family (sim_ivf_trained /
sim_pq_trained run their Lloyd iterations at build time), bpe_learn /
bpe_encode (one 1-row argmax collect per merge step),
bpe_encode_ranked (the vocab-size gate counts + collects the encoded
vocabulary at build time when it fits the broadcast limit), embedding_pca
(the one-pass moments collect), and corpus_shuffle (assign_global_ids'
eager range-partition checkpoint + per-partition counts) — every one a
bounded, driver-sized collect by design) and summarizes the formatted
physical plan:

Caveat on node counts: source_kl_state_bound chains four cached
summary-fold rounds; the formatted plan prints every cached subtree
fully expanded (hence its outsized exchange/broadcast counts here),
while execution substitutes the InMemoryRelations — the measured run is
summary-sized per round.

- n_scans / n_exchanges / n_broadcasts — the shuffle budget at a glance
- n_smj — SortMergeJoin count (the shuffle-heavy join form; broadcast
  joins don't shuffle the big side)
- pushed — whether any parquet scan carries PushedFilters
  (codegen spans aren't visible pre-execution under AQE, so they're not
  reported here — the plan-invariant tests pin the hot paths instead)

Prints a table sorted by exchange count (the queries most worth a second
look first) and writes PLANS.json next to the repo root for
round-over-round diffing.  A query whose plan fails to BUILD is reported
as an error row — this doubles as a registry smoke check that needs no
oracle run.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bracket_groups(s: str) -> "list[str]":
    """TOP-LEVEL `[...]` group contents of a formatted-plan Arguments
    line (a depth scan, not a regex — window expressions can nest
    brackets, e.g. array element access `x[0]`)."""
    depth = 0
    start = 0
    groups = []
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0:
                groups.append(s[start:i])
    return groups


def n_global_windows(plan: str) -> int:
    """Window nodes with an EMPTY partition spec — the single-task global
    sort shape (Spark funnels every row through one WindowExec task; the
    plan that cannot survive a 100× scale-up unless the frame is bounded
    by construction).  Mechanically, a formatted `(N) Window` block
    prints `Arguments: [exprs]` + an optional `[partitionSpec]` + an
    optional `[orderSpec]` — BOTH tails are independently omitted when
    empty, so three groups = partitioned+ordered, one group = fully
    global, and the ambiguous two-group form is disambiguated by
    content: an order spec's entries carry direction markers
    (`ASC NULLS` / `DESC NULLS`), a partition spec's bare expressions
    never do.  This counts the SHAPE, so masking tricks (partitioning
    on a constant-valued column expression) still show as partitioned:
    don't mask — allowlist bounded frames in test_plan_invariants."""
    n = 0
    for block in plan.split("\n\n"):
        lines = block.strip().splitlines()
        if not lines or not re.match(r"\(\d+\) Window$", lines[0].strip()):
            continue
        for ln in lines[1:]:
            if ln.startswith("Arguments: "):
                groups = _bracket_groups(ln[len("Arguments: "):])
                if len(groups) == 1:
                    n += 1  # neither partitioned nor ordered: global
                elif len(groups) == 2 and (" ASC NULLS" in groups[1]
                                           or " DESC NULLS" in groups[1]):
                    n += 1  # ordered but NOT partitioned: global sort
                break
    return n


def audit_one(df) -> dict:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return {
        "n_scans": len(re.findall(r"\(\d+\) Scan parquet", plan)),
        "n_exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "n_broadcasts": len(re.findall(r"Broadcast(?:Exchange|HashJoin|NestedLoopJoin)", plan)),
        "n_smj": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        # the every-pair join forms (review r9 #3: the "0 cartesians" claim
        # must be mechanically derivable, not asserted).  CartesianProduct
        # shuffle-pairs BOTH sides — always a plan bug at 100 TB, pinned to
        # 0 registry-wide by test_plan_invariants.  BroadcastNestedLoopJoin
        # is the scalar-broadcast cross-join form (a 1-row totals/threshold
        # frame against the corpus — the broadcast side is driver-sized by
        # construction); it is counted separately and every query carrying
        # one must be on the test's documented allowlist.
        "n_cartesian": len(re.findall(r"\(\d+\) CartesianProduct", plan)),
        "n_bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
        # empty-partition-spec Window nodes (single-task global sorts);
        # every query carrying one must be on test_plan_invariants'
        # documented bounded-frame allowlist
        "n_global_window": n_global_windows(plan),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from singer_spark.session import get_spark
    from singer_spark.functions import clear_all_caches

    spark = get_spark("plan_audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rows = {}
    errors = []
    for name, fn in sorted(entry.queries().items()):
        if only and name not in only:
            continue
        try:
            rows[name] = audit_one(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            errors.append(name)
            rows[name] = {"error": str(e).splitlines()[0][:120]}
        finally:
            # plan isolation: a query that persists a subtree (pair-budget
            # posting lists, centroid frames) would otherwise have its
            # cache SUBSTITUTED into every later logically-equal plan by
            # Spark's CacheManager, making the recorded plans depend on
            # audit order — clear between queries so PLANS.json is the
            # plan each query builds on its own
            clear_all_caches(spark)

    print(f"{'query':32s} {'scans':>5s} {'exch':>5s} {'bcast':>5s} "
          f"{'smj':>4s} {'cart':>4s} {'bnlj':>4s} {'gwin':>4s} {'pushed':>6s}")
    ok = {k: v for k, v in rows.items() if "error" not in v}
    for name, r in sorted(ok.items(), key=lambda kv: -kv[1]["n_exchanges"]):
        print(f"{name:32s} {r['n_scans']:5d} {r['n_exchanges']:5d} "
              f"{r['n_broadcasts']:5d} {r['n_smj']:4d} "
              f"{r.get('n_cartesian', 0):4d} {r.get('n_bnlj', 0):4d} "
              f"{r.get('n_global_window', 0):4d} "
              f"{str(r['pushed']):>6s}")
    n_cart = sum(r.get("n_cartesian", 0) for r in ok.values())
    if n_cart:
        print(f"!! {n_cart} CartesianProduct node(s) in the registry")
    n_gwin = sum(r.get("n_global_window", 0) for r in ok.values())
    if n_gwin:
        print(f"?? {n_gwin} empty-partition Window node(s) — "
              f"each must be on the bounded-frame allowlist")
    for name in errors:
        print(f"{name:32s} ERROR {rows[name]['error']}")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.json")
    if only:
        # subset run: merge into the existing audit rather than clobbering
        # the full registry record with a partial one
        try:
            with open(out) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
        merged.update(rows)
        rows = merged
    with open(out, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    print(f"\n{len(ok)} plans audited, {len(errors)} errors -> {out}")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
