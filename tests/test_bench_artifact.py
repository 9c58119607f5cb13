"""The bench stdout contract (VERDICT r13 next #1): ONE JSON line, every
headliner's median present, parseable, inside the ~2 KB tail-capture
window.  Round 13 shipped a compact line that truncated 35/75 per-query
timings because the drift block carried 36 full query names — these
tests pin the never-truncate property of the r14 rewrite without a
SparkSession."""

from __future__ import annotations

import json

from bench import HEADLINERS, _compact_drift, _compact_line


def _drift(n_still: int, code: "list[str] | None" = None) -> dict:
    return {
        "vs": 13, "reran": 40,
        "still_slow": [f"query_name_{i:02d}" for i in range(n_still)],
        "shared": {"n": 71, "total": 79.813, "prior": 75.615,
                   "ratio": 1.056},
        "ab": {"verdict": "code" if code else "host",
               "commit": "ac8aa43ab1", "leg_pairs": 4, "leg_runs": 2,
               "queries": {}, "code_queries": code or []},
    }


def _line(drift, timings=None) -> str:
    t = timings or {q: 1.234 for q in HEADLINERS}
    return _compact_line(t, sum(t.values()), 5, 0.1, drift)


def test_all_headliners_fit_with_full_drift():
    line = _line(_drift(36))
    assert len(line) <= 2000
    doc = json.loads(line)
    assert set(doc["queries"]) == set(HEADLINERS)
    assert "queries_truncated" not in doc
    # contract fields intact
    assert doc["metric"] == "headline_total" and doc["unit"] == "sec"
    # drift compresses to counts + verdict, never name lists
    assert doc["drift"]["still_slow"] == 36
    assert doc["drift"]["ab"]["verdict"] == "host"


def test_code_stamps_survive_or_shed_before_queries():
    # a couple of code-stamped names ride along when they fit…
    line = _line(_drift(36, code=["dedup_minhash_lsh", "sim_ivfpq_ann"]))
    doc = json.loads(line)
    assert set(doc["queries"]) == set(HEADLINERS)
    assert len(line) <= 2000
    # …and a pathological worst case sheds drift detail, not queries:
    # every query slow (5-char values) plus a huge code list
    slow = {q: 123.456 for q in HEADLINERS}
    line = _line(_drift(36, code=[f"code_stamped_query_{i}" for i in
                                  range(20)]), timings=slow)
    doc = json.loads(line)
    assert set(doc["queries"]) == set(HEADLINERS)
    assert len(line) <= 2000


def test_compact_drift_drops_names_keeps_counts():
    c = _compact_drift(_drift(36))
    assert c["still_slow"] == 36 and "shared" not in c
    assert c["ab"] == {"verdict": "host", "pairs": 4}
    assert _compact_drift(None) is None
    # an ab that was skipped reports the skip, not a KeyError
    c = _compact_drift({"vs": 12, "ab": {"skipped": "deadline"}})
    assert c["ab"] == {"skipped": "deadline"}
