"""One-command release evidence: gate -> plans -> bench -> soak -> README.

Every round's verification ritual was four separate invocations whose
outputs had to be collated by hand (VERDICT r6 task #8).  This runs them
SEQUENTIALLY (never concurrently — parallel Spark jobs on one box skew
bench numbers 1.3-8x; see BENCH notes) as subprocesses, each with its own
JVM, and writes one machine-readable summary:

  1. oracle gate      tools/verify_local.py --json (full registry, sf0.01)
  1b. second oracle   tools/verify_local.py --second-oracle (byte-exact
                      UDF-side hash/zlib/wordpiece parity — the values the
                      self-verifying queries pin via booleans)
  2. plan audit       tools/plan_audit.py (all plans build, PLANS.json)
  3. bench            bench.py (sf0.1 medians + in-bench drift verdict +
                      code-vs-host A/B when still_slow survives)
  4. short soak       tools/soak_tail.py (rotation churn, kill/restart,
                      duplicates-metric phase; SKIPPED with --no-soak)
  5. full pytest      pytest tests/ -q with SPARK_GRAFT_FULL_TESTS=1 (the
                      soak-marked tests skipped by the default suite run
                      here; SKIPPED with --no-tests)
  6. README check     tools/readme_stats.py --check (numbers match artifact)

Summary lands in RELEASE_GATE.json: per-step status, duration, and the
step's own key numbers; exit code 1 if any step fails.

Usage: python tools/release_gate.py [--no-soak] [--soak-seconds N]
                                    [--no-tests]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_step(name: str, cmd: list[str], timeout: int) -> dict:
    print(f"=== {name}: {' '.join(cmd)}")
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                              timeout=timeout)
        rc = proc.returncode
        tail = (proc.stdout + proc.stderr)[-4000:]
    except subprocess.TimeoutExpired:
        rc, tail = -1, f"timeout after {timeout}s"
    sec = round(time.time() - t0, 1)
    status = "OK" if rc == 0 else "FAIL"
    print(f"=== {name}: {status} in {sec}s")
    return {"name": name, "status": status, "rc": rc, "sec": sec,
            "tail": tail}


def main() -> int:
    no_soak = "--no-soak" in sys.argv
    soak_seconds = "60"
    if "--soak-seconds" in sys.argv:
        soak_seconds = sys.argv[sys.argv.index("--soak-seconds") + 1]
    py = sys.executable
    steps: list[dict] = []

    gate_json = os.path.join(REPO, "CORRECTNESS_local_latest.json")
    s = run_step("oracle_gate",
                 [py, "tools/verify_local.py", "--json", gate_json,
                  "/root/testdata/sf0.01"], timeout=900)
    if s["status"] == "OK" and os.path.exists(gate_json):
        with open(gate_json) as f:
            g = json.load(f)
        checks = {k: v for k, v in g.items() if isinstance(v, dict)}
        failed = [k for k, v in checks.items()
                  if v.get("hash_match") is False
                  or v.get("err") not in (None, "", "no_oracle")]
        s["queries"] = len(checks)
        s["failed"] = failed
        if failed:
            s["status"] = "FAIL"
    steps.append(s)

    steps.append(run_step(
        "second_oracle",
        [py, "tools/verify_local.py", "--second-oracle",
         "/root/testdata/sf0.01"], timeout=600))

    s = run_step("plan_audit", [py, "tools/plan_audit.py",
                                "/root/testdata/sf0.001"], timeout=900)
    plans_path = os.path.join(REPO, "PLANS.json")
    if s["status"] == "OK" and os.path.exists(plans_path):
        with open(plans_path) as f:
            plans = json.load(f)
        errors = [k for k, v in plans.items()
                  if isinstance(v, dict) and v.get("error")]
        cartesians = [k for k, v in plans.items()
                      if isinstance(v, dict) and v.get("n_cartesian")]
        s["plans"] = len(plans)
        s["build_errors"] = errors
        s["cartesians"] = cartesians  # must stay [] (review r9 #3)
        if errors or cartesians:
            s["status"] = "FAIL"
    steps.append(s)

    # timeout covers the main pass + drift re-runs + (when still_slow is
    # non-empty) the code-vs-host A/B legs, each its own JVM.  bench.py
    # self-enforces SPARK_GRAFT_BENCH_BUDGET on the optional A/B work
    # (legs shrink/skip as the budget runs out), so adjudication overage
    # can never hit this outer timeout and void the suite's timings
    # (ADVICE r8 #5)
    os.environ.setdefault("SPARK_GRAFT_BENCH_BUDGET", "3000")
    s = run_step("bench", [py, "bench.py"], timeout=3600)
    bench_full = os.path.join(REPO, "BENCH_full.json")
    if s["status"] == "OK" and os.path.exists(bench_full):
        # read the artifact, not stdout (progress bars can push the compact
        # JSON line out of the captured tail)
        with open(bench_full) as f:
            p = json.load(f)
        s["headline_total"] = p.get("value")
        s["drift"] = p.get("drift")
        still = (p.get("drift") or {}).get("still_slow") or []
        if still:
            # WARN, not FAIL: the in-bench drift gate already re-ran these
            # at end-of-process and they stayed slow, but a still_slow list
            # spanning untouched queries means HOST drift (measured
            # round 7: the same query set ran 25% slower on the same box
            # hours apart, old and new code alike — see README bench
            # notes).  Cross-ROUND regressions are judged by
            # tools/bench_diff.py against the driver's own artifacts.
            s["status"] = "WARN"
    steps.append(s)

    if not no_soak:
        s = run_step("soak", [py, "tools/soak_tail.py", soak_seconds,
                              "/tmp/singer_spark_release_soak"],
                     timeout=int(float(soak_seconds)) * 6 + 600)
        if s["status"] == "OK":
            s["fails_in_table"] = len(re.findall(r"\bFAIL\b", s["tail"]))
        steps.append(s)

    if "--no-tests" not in sys.argv:
        # FULL pytest suite, soak markers included (r14): the default
        # `pytest tests/` run skips @pytest.mark.soak so it fits the
        # driver's verify window; the release gate is where the soak /
        # property sweeps still run.
        env = dict(os.environ, SPARK_GRAFT_FULL_TESTS="1")
        print("=== pytest_full: full suite (soak markers included)")
        t0 = time.time()
        try:
            proc = subprocess.run(
                [py, "-m", "pytest", "tests/", "-q"], cwd=REPO,
                capture_output=True, text=True, timeout=7200, env=env)
            rc, tail = proc.returncode, (proc.stdout + proc.stderr)[-4000:]
        except subprocess.TimeoutExpired:
            rc, tail = -1, "timeout after 7200s"
        sec = round(time.time() - t0, 1)
        status = "OK" if rc == 0 else "FAIL"
        print(f"=== pytest_full: {status} in {sec}s")
        steps.append({"name": "pytest_full", "status": status, "rc": rc,
                      "sec": sec, "tail": tail})

    steps.append(run_step("readme_stats",
                          [py, "tools/readme_stats.py", "--check"],
                          timeout=60))

    ok = all(st["status"] in ("OK", "WARN") for st in steps)
    summary = {"ok": ok,
               "steps": [{k: v for k, v in st.items() if k != "tail"}
                         for st in steps],
               "tails": {st["name"]: st["tail"] for st in steps
                         if st["status"] != "OK"}}
    out = os.path.join(REPO, "RELEASE_GATE.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nrelease gate: {'OK' if ok else 'FAIL'} -> {out}")
    for st in steps:
        extra = ""
        if "queries" in st:
            extra = f" ({st['queries']} queries, {len(st['failed'])} failed)"
        if "plans" in st:
            extra = f" ({st['plans']} plans, {len(st['build_errors'])} errors)"
        if "headline_total" in st:
            extra = f" (headline_total {st['headline_total']}s, drift {st.get('drift')})"
        print(f"  {st['name']:14} {st['status']} {st['sec']}s{extra}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
