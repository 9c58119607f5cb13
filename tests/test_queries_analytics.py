"""Guards for the analytics queries whose formulations have been rewritten
for plan efficiency: `funnel_counts` (sorted-event F.aggregate walk) and
`cohort_retention`.  Each is checked against an independent formulation —
the chained per-stage min-join the reference shape implies for funnels, and
a pandas recomputation for cohorts — so future plan edits can't drift the
semantics silently (the round-3 advice: the walk had no unit test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from singer_spark.queries import cohort_retention, funnel_counts
from singer_spark.session import read_events

STAGES = ("view", "click", "purchase")


def _funnel_chained_min_joins(spark, sf_dir, stages=STAGES):
    """Reference formulation: stage k counts users whose first stage-k event
    strictly follows their stage-(k-1) completion time (first-touch,
    min-after semantics) — one join per stage, driver-side chaining."""
    ev = read_events(spark, sf_dir)
    prev = None  # DataFrame(user_id, t) of users who completed stage k-1
    counts = []
    for k, stage in enumerate(stages):
        st = ev.filter(F.col("event_type") == stage).select("user_id", "ts")
        if prev is None:
            cur = st.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                st.join(prev.withColumnRenamed("t", "prev_t"), "user_id")
                .filter(F.col("ts") > F.col("prev_t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        counts.append((stage, k + 1, cur.count()))
        prev = cur
    return counts


def test_funnel_counts_matches_chained_min_joins(spark, sf_dir):
    got = {
        (r["stage"], r["stage_idx"]): r["n_users"]
        for r in funnel_counts(spark, sf_dir, STAGES).collect()
    }
    want = {(s, i): n for s, i, n in _funnel_chained_min_joins(spark, sf_dir, STAGES)}
    assert got == want
    # funnel depths are monotone non-increasing
    ns = [got[(s, i + 1)] for i, s in enumerate(STAGES)]
    assert ns == sorted(ns, reverse=True)
    assert ns[0] > 0  # sf0.001 has view events


def test_funnel_counts_strict_ordering_semantics(spark, sf_dir):
    """A user whose purchase precedes every click must not count at stage 3;
    exercised on a hand-built frame via the same walk."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1 completes the full funnel in order
        (1, "view", base), (1, "click", base + dt.timedelta(minutes=1)),
        (1, "purchase", base + dt.timedelta(minutes=2)),
        # u2 purchases BEFORE clicking: stops at click
        (2, "view", base), (2, "purchase", base + dt.timedelta(minutes=1)),
        (2, "click", base + dt.timedelta(minutes=2)),
        # u3 only views
        (3, "view", base),
        # u4 clicks with no view: counts nowhere
        (4, "click", base),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")

    import singer_spark.queries as q

    orig = q.read_events if hasattr(q, "read_events") else None
    q.read_events = lambda _spark, _sf: df
    try:
        got = {r["stage"]: r["n_users"] for r in funnel_counts(spark, "ignored").collect()}
    finally:
        q.read_events = orig
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_cohort_retention_matches_pandas(spark, sf_dir):
    got = cohort_retention(spark, sf_dir).toPandas()

    ev = read_events(spark, sf_dir).select("user_id", "ts").toPandas()
    ev["week"] = ev["ts"].dt.to_period("W-SUN").dt.start_time  # Monday-start weeks
    first = ev.groupby("user_id")["week"].min().rename("cohort_week")
    act = ev[["user_id", "week"]].drop_duplicates().join(first, on="user_id")
    act["week_offset"] = ((act["week"] - act["cohort_week"]).dt.days // 7).astype(int)
    want = (
        act.groupby([act["cohort_week"].dt.strftime("%Y-%m-%d"), "week_offset"])["user_id"]
        .nunique()
        .reset_index()
        .rename(columns={"user_id": "n_users"})
    )

    got_map = {(r.cohort_week, int(r.week_offset)): int(r.n_users) for r in got.itertuples()}
    want_map = {(r.cohort_week, int(r.week_offset)): int(r.n_users) for r in want.itertuples()}
    assert got_map == want_map
    # offset 0 row exists for every cohort (the cohort's own first week)
    cohorts = {c for c, _ in got_map}
    assert all((c, 0) in got_map for c in cohorts)


def test_rollup_merge_equals_from_scratch_and_chains(spark, sf_dir):
    """IVM algebra: any partition of the events into increments, merged in
    any grouping, equals the from-scratch rollup; merging an empty delta
    is the identity."""
    from pyspark.sql import functions as F

    from singer_spark.queries import (
        hourly_event_rollup,
        merge_rollups,
        rollup_finalize,
        rollup_increment,
    )
    from singer_spark.session import read_events

    ev = read_events(spark, sf_dir)
    parts = [rollup_increment(ev.filter(F.col("event_id") % 3 == k))
             for k in range(3)]
    merged = rollup_finalize(merge_rollups(merge_rollups(parts[0], parts[1]),
                                           parts[2]))
    want = {(r.hour, r.event_type): (r.n, r.sum_value)
            for r in hourly_event_rollup(spark, sf_dir).collect()}
    got = {(r.hour, r.event_type): (r.n, r.sum_value)
           for r in merged.collect()}
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]               # counts exact
        assert abs(got[k][1] - want[k][1]) < 0.011   # sums to the cent
    empty = rollup_increment(ev.filter(F.lit(False)))
    ident = merge_rollups(parts[0], empty)
    a = sorted((r.h, r.event_type, r.n, round(r.sv, 6)) for r in parts[0].collect())
    b = sorted((r.h, r.event_type, r.n, round(r.sv, 6)) for r in ident.collect())
    assert a == b


def test_rollup_merge_null_value_groups(spark):
    """Review-fix regression: a group whose values are all NULL must merge
    to a NULL sum (matching from-scratch SQL sum semantics), while
    NULL ⊎ x = x — blanket coalesce-to-0 would have finalized 0.0."""
    import pandas as pd

    from singer_spark.queries import merge_rollups, rollup_increment

    def ev_df(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                          "event_type", "value", "props"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        return spark.createDataFrame(
            pdf, "event_id bigint, ts timestamp, user_id bigint, "
                 "event_type string, value double, props string")

    a = rollup_increment(ev_df([(1, "2024-01-01 10:05:00", 1, "x", None, "{}")]))
    b = rollup_increment(ev_df([(2, "2024-01-01 10:20:00", 1, "x", None, "{}"),
                                (3, "2024-01-01 11:00:00", 1, "y", 2.5, "{}")]))
    got = {(r.h.hour, r.event_type): (r.n, r.sv)
           for r in merge_rollups(a, b).collect()}
    assert got[(10, "x")] == (2, None)   # all-NULL group stays NULL
    assert got[(11, "y")] == (1, 2.5)    # join-missing side is additive 0


def test_rolling_active_users_vs_naive_range_join(spark, sf_dir):
    from singer_spark.queries import rolling_active_users

    ev = read_events(spark, sf_dir).select(
        "user_id", F.date_trunc("day", "ts").alias("ed"))
    days = ev.select(F.col("ed").alias("d")).distinct()
    naive = (
        days.join(ev, F.col("ed").between(
            F.col("d") - F.expr("INTERVAL 6 DAYS"), F.col("d")))
        .groupBy("d").agg(F.count_distinct("user_id").alias("n_active"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "n_active")
    )
    got = {(r.day, r.n_active) for r in rolling_active_users(spark, sf_dir).collect()}
    want = {(r.day, r.n_active) for r in naive.collect()}
    assert got == want and got


def test_purchase_attribution_vs_join_argmax(spark, sf_dir):
    from singer_spark.queries import purchase_attribution

    ev = read_events(spark, sf_dir)
    p = ev.where("event_type = 'purchase'").select("user_id", F.col("ts").alias("pt"), "value")
    c = ev.where("event_type = 'click'").select("user_id", F.col("ts").alias("ct"))
    naive = (
        p.join(c, ["user_id"], "left")
        .groupBy("user_id", "pt", "value")
        .agg(F.max(F.when(F.col("ct") <= F.col("pt"), F.col("ct"))).alias("mct"))
        .select(F.coalesce(F.date_format(F.date_trunc("day", "mct"), "yyyy-MM-dd"),
                           F.lit("organic")).alias("attrib_day"), "value")
        .groupBy("attrib_day")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("rev"))
    )
    got = {(r.attrib_day, r.n_purchases, round(r.revenue, 2))
           for r in purchase_attribution(spark, sf_dir).collect()}
    want = {(r.attrib_day, r.n, round(r.rev, 2)) for r in naive.collect()}
    assert got == want and got


def test_funnel_windowed_tightens_with_window(spark, sf_dir):
    from singer_spark.queries import funnel_windowed

    wide = {r.stage_idx: r.n_users
            for r in funnel_windowed(spark, sf_dir, STAGES, 24 * 365).collect()}
    tight = {r.stage_idx: r.n_users
             for r in funnel_windowed(spark, sf_dir, STAGES, 1).collect()}
    plain = {(r["stage"], r["stage_idx"]): r["n_users"]
             for r in funnel_counts(spark, sf_dir, STAGES).collect()}
    # an unbounded-ish window reproduces the plain funnel's stage-1 count,
    # and monotonicity holds: tighter windows never convert MORE users
    assert wide[1] == plain[("view", 1)]
    for k in (1, 2, 3):
        assert tight[k] <= wide[k]
    assert tight[3] < wide[3], "1h window should lose conversions vs a year"


def test_debounce_events_collapses_chained_bursts(spark):
    from singer_spark.queries import debounce_events

    rows = [
        # burst: each event within 300s of its predecessor -> only the
        # first survives even though the chain spans > 300s total
        (1, "2024-01-01 00:00:00", 7, "click"),
        (2, "2024-01-01 00:04:00", 7, "click"),
        (3, "2024-01-01 00:08:00", 7, "click"),
        # gap > 300s from event 3 -> new burst
        (4, "2024-01-01 00:20:00", 7, "click"),
        # different event_type: independent stream, kept
        (5, "2024-01-01 00:00:10", 7, "view"),
        # different user: independent, kept
        (6, "2024-01-01 00:00:20", 8, "click"),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t) for i, ts, u, t in rows],
        "event_id bigint, ts_s string, user_id bigint, event_type string"
    ).selectExpr("event_id", "cast(ts_s as timestamp) AS ts",
                 "user_id", "event_type")
    kept = [r.event_id for r in
            debounce_events(ev, interval_seconds=300).collect()]
    assert kept == [1, 4, 5, 6]


# ---------------------------------------------------------------------------
# Property test: debounce == a pure-Python lag walk on adversarial dense
# streams (equal timestamps within a key resolve by event_id — pin that).
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_ev = st.tuples(st.integers(0, 2),        # user
                st.sampled_from(["a", "b"]),  # type
                st.integers(0, 20))       # ts seconds (dense => ties)


@settings(max_examples=8, deadline=None)
@given(st.lists(_ev, min_size=1, max_size=30), st.integers(1, 8))
def test_debounce_property(spark_sess, evs, interval):
    from singer_spark.queries import debounce_events

    spark = spark_sess
    rows = [(i, u, t, s) for i, (u, t, s) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, sec bigint"
    ).selectExpr("event_id", "user_id", "event_type",
                 "timestamp_seconds(sec) AS ts").repartition(4)
    got = sorted(r.event_id for r in
                 debounce_events(df, interval_seconds=interval).collect())

    # reference: per key, walk (sec, event_id) ascending with lag semantics
    bykey = {}
    for i, u, t, s in rows:
        bykey.setdefault((u, t), []).append((s, i))
    want = []
    for evs_k in bykey.values():
        last = None
        for s, i in sorted(evs_k):
            if last is None or s - last > interval:
                want.append(i)
            last = s
    assert got == sorted(want)
