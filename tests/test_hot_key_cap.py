"""Hot-key cap (`max_events_per_key`) for the per-user collect_list family.

The reference drops oversize records rather than let one kill the pipeline
(`reader/ThriftLogFileReader.java:152-157`); the analytical twin of that
discipline is bounding the per-key array a groupBy/collect_list assembles —
at 100 TB a single 10M-event bot user is otherwise a guaranteed task OOM.
These tests build a synthetic log with one pathological hot user and prove:

1. the cap truncates ONLY the hot key, to its oldest-N window;
2. normal keys produce byte-identical results with and without the cap;
3. a generous cap (>= every key's size) is a semantic no-op;
4. `max_events_per_key=None` adds nothing to the plan (no Window node).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from singer_spark.queries import (
    cap_events_per_key,
    event_pattern_match,
    frequent_sequences,
    funnel_counts,
    funnel_windowed,
    user_event_sequences,
)

HOT_USER = 999_000
HOT_N = 120_000          # big enough that an unbounded array would be the
                         # dominant task allocation at test scale
CAP = 500


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory) -> str:
    """events.parquet with ~40 normal users (3-60 events) + one hot user
    with HOT_N events, schema-identical to TESTDATA."""
    out = tmp_path_factory.mktemp("hotkey")
    base = int(dt.datetime(2024, 3, 1).timestamp())
    types = F.array(*[F.lit(t) for t in
                      ("view", "click", "purchase", "signup", "error")])
    normal = (
        spark.range(1200)
        .select(
            (F.col("id") + 1_000_000).alias("event_id"),
            F.timestamp_seconds(base + F.col("id") * 17).alias("ts"),
            (F.col("id") % 40).alias("user_id"),
            F.get(types, (F.xxhash64("id") % 5 + 5) % 5).alias("event_type"),
            (F.col("id") % 97 / 10.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    hot = (
        spark.range(HOT_N)
        .select(
            (F.col("id") + 5_000_000).alias("event_id"),
            F.timestamp_seconds(base + F.col("id")).alias("ts"),
            F.lit(HOT_USER).alias("user_id"),
            F.get(types, (F.xxhash64("id", F.lit(7)) % 5 + 5) % 5).alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    normal.unionByName(hot).write.parquet(f"{out}/events.parquet")
    return str(out)


def test_cap_truncates_only_the_hot_key(spark, hot_dir):
    got = {r["user_id"]: r["n_events"]
           for r in user_event_sequences(spark, hot_dir,
                                         max_events_per_key=CAP).collect()}
    full = {r["user_id"]: r["n_events"]
            for r in user_event_sequences(spark, hot_dir).collect()}
    assert full[HOT_USER] == HOT_N
    assert got[HOT_USER] == CAP  # bounded before the array materialized
    for u, n in full.items():
        if u != HOT_USER:
            assert got[u] == n


def test_cap_keeps_oldest_n(spark, hot_dir):
    """The capped window is the chronologically FIRST events (first-touch
    operators walk forward from the earliest events)."""
    row = (user_event_sequences(spark, hot_dir, max_events_per_key=CAP)
           .where(F.col("user_id") == HOT_USER).collect()[0])
    base = dt.datetime(2024, 3, 1)
    assert row["first_ts"] == base.strftime("%Y-%m-%d %H:%M:%S")
    assert row["last_ts"] == (base + dt.timedelta(seconds=CAP - 1)
                              ).strftime("%Y-%m-%d %H:%M:%S")


def test_normal_keys_identical_under_cap(spark, hot_dir):
    for fn in (funnel_counts, funnel_windowed, event_pattern_match,
               frequent_sequences):
        uncapped = fn(spark, hot_dir)
        capped = fn(spark, hot_dir, max_events_per_key=HOT_N + 1)
        assert uncapped.collect() == capped.collect(), fn.__name__


def test_funnel_with_cap_bounded_and_sane(spark, hot_dir):
    """With the cap active, funnel depths stay monotone and the stage-1
    count still includes every user who viewed within their window."""
    rows = funnel_counts(spark, hot_dir, max_events_per_key=CAP).collect()
    ns = [r["n_users"] for r in sorted(rows, key=lambda r: r["stage_idx"])]
    assert ns == sorted(ns, reverse=True)
    assert ns[0] > 0


def test_none_cap_is_plan_noop(spark, hot_dir):
    ev = spark.read.parquet(f"{hot_dir}/events.parquet")
    same = cap_events_per_key(ev, "user_id", ["ts", "event_id"], None)
    assert same is ev
    # and the full query's optimized plan carries no Window when uncapped
    plan = (user_event_sequences(spark, hot_dir)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "row_number" not in plan
    capped_plan = (user_event_sequences(spark, hot_dir, max_events_per_key=CAP)
                   ._jdf.queryExecution().optimizedPlan().toString())
    assert "row_number" in capped_plan


def test_cap_shares_the_user_exchange(spark, hot_dir):
    """The row_number window must not add a second shuffle: the physical
    plan keeps exactly one Exchange hashpartitioning(user_id) feeding both
    the window filter and the aggregation."""
    df = user_event_sequences(spark, hot_dir, max_events_per_key=CAP)
    physical = df._jdf.queryExecution().executedPlan().toString()
    n_user_exchanges = physical.count("hashpartitioning(user_id")
    assert n_user_exchanges == 1, physical
