"""Round-over-round bench comparison: flag per-query regressions.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold] [abs_floor]

Reads two bench JSON files (either the raw driver artifact with a `tail`
field or a bare one-line bench output), aligns queries present in both,
and prints the per-query delta table with anything slower than
`threshold` (default 1.15x) AND at least `abs_floor` seconds slower
(default 0.1 s — a 15% swing on a 0.3 s query is scheduler noise, not a
plan change) marked REGRESSED.  Queries only in NEW are listed as added
(no baseline).  Exit code 1 if any regression — usable as a gate.

Quiet-box protocol: bench.py now self-polices — after its first pass it
re-runs every query this gate would flag against the latest BENCH_r*.json
(end of process, warm JIT, no concurrent stages) and records the verdict
in the artifact's `drift` field.  A query listed in `drift.still_slow`
regressed twice in a row on the same box; treat it as real and bisect
the plan.  Never run bench.py concurrently with another Spark job — the
contention skews results 1.3-8x and fakes regressions.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict[str, float]:
    """Per-query medians from any artifact shape this repo produces:
    a bare compact line (either separator style), a raw JSON doc with
    `queries`, a driver artifact with a pre-parsed `parsed` field, or a
    driver artifact whose `tail` still holds the compact line."""
    raw = open(path).read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict):
        if isinstance(doc.get("queries"), dict):
            return doc["queries"]
        parsed = doc.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            return parsed["queries"]
        raw = doc.get("tail", "") or ""
    # compact line embedded in text: bench.py emits separators=(",",":"),
    # older artifacts used ", " — accept both
    m = re.search(r'\{"metric".*\}', raw)
    if m:
        try:
            return json.loads(m.group(0))["queries"]
        except (json.JSONDecodeError, KeyError):
            pass
    # tail truncated mid-line (the r04 shape): salvage query medians by
    # pair extraction — query values are floats, scalar fields by name
    pairs = re.findall(r'"([A-Za-z_]\w*)":\s*([0-9]+\.[0-9]+)', raw)
    out = {k: float(v) for k, v in pairs if k not in ("value", "sf")}
    if not out:
        raise SystemExit(f"no bench line found in {path}")
    return out


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.15
    abs_floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1
    regressed = []
    print(f"{'query':30s} {'old':>7s} {'new':>7s} {'ratio':>7s}")
    for q in sorted(set(old) & set(new)):
        r = new[q] / old[q] if old[q] else float("inf")
        flag = ("  REGRESSED" if r > threshold and new[q] - old[q] >= abs_floor
                else "")
        if flag:
            regressed.append(q)
        print(f"{q:30s} {old[q]:7.2f} {new[q]:7.2f} {r:6.2f}x{flag}")
    for q in sorted(set(new) - set(old)):
        print(f"{q:30s} {'—':>7s} {new[q]:7.2f}   added")
    if regressed:
        print(f"\n{len(regressed)} regression(s) beyond {threshold}x: "
              + ", ".join(regressed))
        return 1
    print(f"\nno regressions beyond {threshold}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
