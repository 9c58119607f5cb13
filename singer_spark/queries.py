"""Relational analytics surface.

The reference has no joins/aggregations (SURVEY.md §2.7) — Catalyst provides
them natively; these queries exercise that surface over the TESTDATA tables
and serve as the bench headliners.  Plan hygiene rules applied throughout:

- filters before joins (pushed to the parquet scan — check PushedFilters)
- dimension sides broadcast explicitly when guaranteed small
- aggregates alias-stable so oracle comparison is by-name
- timestamps rendered to strings at the boundary (cross-engine hashing)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from singer_spark.functions import qround
from singer_spark.session import read_events


def cap_events_per_key(df: DataFrame, key: str, order_cols: list[str],
                       max_events: int | None) -> DataFrame:
    """Hot-key guard for the per-user collect_list family: keep only the
    OLDEST `max_events` rows per key (row_number over the same
    (key, order) exchange the downstream groupBy reuses — no extra
    shuffle; WindowExec's partition buffer spills to disk, so even the
    pathological key never holds more than `max_events` rows in the
    assembled array downstream).

    With ``max_events=None`` (every registry default) this is an exact
    no-op — the plan is byte-identical, so oracle hashes and PLANS.json
    are unaffected.  The discipline mirrors the reference's oversize-drop
    (`reader/ThriftLogFileReader.java:152-157`): one pathological record
    (here: one 10M-event bot user) must never kill the pipeline.
    First-touch operators (funnels, pattern match, sequence builders)
    keep oldest-N because their semantics walk time forward from the
    earliest events; a capped hot key loses only its tail, which those
    walks would usually never reach."""
    if max_events is None:
        return df
    w = Window.partitionBy(key).orderBy(*order_cols)
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_events).drop("_rn"))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with map-side partial aggregation;
    the shuffle carries only (4 groups × 8 aggregates)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter broadcast into a fact join,
    then top-k. customer is broadcast (small at every SF relative to fact)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(F.col("c_mktsegment") == "BUILDING")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join; every dimension chain
    (region→nation→customer/supplier) broadcasts, so the fact table joins
    without a shuffle of the big side."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_nationkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .join(F.broadcast(sup), (li.l_suppkey == sup.s_suppkey) & (dim.n_nationkey == sup.s_nationkey))
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
             F.count("*").alias("n_items"))
        .orderBy("r_name", "n_name")
    )


def top_orders_per_customer(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Window ranking: top-k orders per customer by totalprice.
    One hash-shuffle on o_custkey; rank inside partitions."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("o_totalprice"),
                F.col("rnk").cast("int").alias("rnk"))
        .orderBy("o_custkey", "rnk")
    )


def sessionize_events(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via event-time gaps: a session breaks when the gap to
    the previous event of the same user exceeds `gap_minutes`.  Batch analog
    of the streaming session-window operator; one shuffle on user_id."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = gap_minutes * 60 * 1_000_000
    with_breaks = ev.withColumn(
        "new_session",
        F.when(F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)) > gap_us, 1)
         .when(F.lag("ts").over(w).isNull(), 1)
         .otherwise(0),
    )
    sessions = with_breaks.withColumn("session_seq", F.sum("new_session").over(
        Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"),
             F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"))
        .select("user_id", F.col("session_seq").cast("bigint").alias("session_seq"),
                "n_events", "session_value", "session_start")
        .orderBy("user_id", "session_seq")
    )


def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup (batch twin of the streaming
    `window(ts, '1 hour')` aggregation): per (hour, event_type) counts +
    value stats.  At scale this is the hypertable-rollup pattern: partial
    aggregation map-side, tiny shuffle."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"),
             F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                "event_type", "n", "sum_value", "avg_value")
        .orderBy("hour", "event_type")
    )


def rollup_increment(events: DataFrame) -> DataFrame:
    """Mergeable per-(hour, type) partial state from an event slice:
    (hour, event_type, n, sum_value) — counts and sums are ADDITIVE, so
    increments combine without ever re-scanning history."""
    return (events.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sv")))


def merge_rollups(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental-view maintenance of the hourly rollup: fold a new
    increment's partial state into the accumulated state by ADDITION on the
    (hour, type) key — the materialized-rollup refresh pattern.  At 100 TB
    the delta touches only its own hours, the merge join is keyed on the
    (tiny) rollup table, and raw history is never re-read; avg derives from
    (sum, count) at read time, which is why the STORED state keeps raw
    sums, not averages (averages don't merge).

    Both inputs are `rollup_increment` frames; the result is one too, so
    merges chain day after day."""
    e = existing.select(F.col("h"), F.col("event_type"),
                        F.col("n").alias("n_a"), F.col("sv").alias("sv_a"))
    d = delta.select(F.col("h"), F.col("event_type"),
                     F.col("n").alias("n_b"), F.col("sv").alias("sv_b"))
    # NULL accumulator ≠ missing side: a group whose values were all NULL
    # carries sv NULL with n > 0, and SQL sum semantics make the merged
    # sum NULL only when BOTH sides are NULL (sum ignores nulls, so
    # NULL ⊎ 5.0 = 5.0) — blanket coalesce-to-0 would finalize 0.0 where
    # the from-scratch rollup says NULL
    sv = F.when(F.col("sv_a").isNull() & F.col("sv_b").isNull(),
                F.lit(None).cast("double")) \
         .otherwise(F.coalesce("sv_a", F.lit(0.0)) + F.coalesce("sv_b", F.lit(0.0)))
    return (e.join(d, ["h", "event_type"], "full_outer")
            .select("h", "event_type",
                    (F.coalesce("n_a", F.lit(0)) + F.coalesce("n_b", F.lit(0))).alias("n"),
                    sv.alias("sv")))


def rollup_finalize(state: DataFrame) -> DataFrame:
    """Read-time projection of the merged state into the serving shape of
    `hourly_event_rollup` (rounding and avg happen HERE, not in state).

    avg derives from the GRID-SNAPPED sum, not the raw accumulator: the
    merge's two-step partial sums differ from a one-pass sum by an ulp,
    and an ulp is enough to flip a half-grid average's 4-digit rounding —
    snapping the (2-decimal-valued) sum first collapses both accumulation
    orders onto the identical double before the division."""
    snapped = qround(F.col("sv"), 2)
    return (state.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type", "n",
        snapped.alias("sum_value"),
        qround(snapped / F.col("n"), 4).alias("avg_value"))
        .orderBy("hour", "event_type"))


def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form: yesterday's state (events with event_id % 10 != 0)
    merged with today's increment (the rest) must equal the full rollup —
    the oracle IS `hourly_event_rollup` over all events, so the merge
    algebra is value-checked end to end."""
    ev = read_events(spark, sf_dir)
    # split on a non-nullable expression so the two filters PARTITION the
    # rows (a NULL event_id fails both `x % 10 == 0` and `x % 10 != 0`)
    part = F.coalesce(F.col("event_id"), F.lit(0)) % 10
    state = rollup_increment(ev.filter(part != 0))
    delta = rollup_increment(ev.filter(part == 0))
    return rollup_finalize(merge_rollups(state, delta))


def debounce_events(events: DataFrame, interval_seconds: int = 300,
                    keys: tuple[str, ...] = ("user_id", "event_type"),
                    ts_col: str = "ts",
                    order_col: str = "event_id") -> DataFrame:
    """Burst suppression for telemetry streams: drop an event arriving
    within `interval_seconds` of the PREVIOUS event with the same keys —
    the standard debounce for double-fires, retry storms, and rage
    clicks.  Chained bursts collapse to their first event (each drop
    extends the window from its predecessor, lag semantics — simple,
    deterministic, and exactly replayable in SQL).

    Plan shape at 100 TB: one exchange keyed on `keys` (the same
    partitioning every per-user operator here reuses), a per-key sort,
    one lag — no state beyond the window buffer, which spills.

    Output: the surviving events' (order_col, keys..., ts_us) with the
    timestamp as epoch microseconds (cross-engine-stable), ordered by
    order_col."""
    # asc_nulls_first PINNED (not just Spark's asc default): DuckDB's bare
    # ORDER BY sorts NULLs LAST, so a corpus with NULL timestamps would
    # otherwise disagree with the oracle on which event is "previous" —
    # both sides state NULL placement explicitly (ADVICE r6).
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc_nulls_first(),
                                          F.col(order_col).asc_nulls_first())
    prev = F.lag(ts_col).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
    return (events.withColumn("_gap", gap_us)
            .where(F.col("_gap").isNull()
                   | (F.col("_gap") > interval_seconds * 1_000_000))
            .select(order_col, *keys,
                    F.unix_micros(F.col(ts_col)).alias("ts_us"))
            .orderBy(order_col))


def user_event_sequences(spark: SparkSession, sf_dir: str, max_len: int = 50,
                         max_events_per_key: int | None = None) -> DataFrame:
    """Per-user chronological event sequences — the training-example builder
    that turns an event log into model inputs: one groupBy shuffle keyed by
    user, sequence assembly JVM-side (collect_list → array_sort → slice),
    deterministic tie-break by event_id.

    Output projects sequence summaries (length, span, joined type string of
    the first `max_len` events) rather than nested structs, so an external
    SQL oracle can hash-compare it.

    `max_events_per_key` (off by default) bounds the per-user array via
    :func:`cap_events_per_key` BEFORE collection — with a cap, n_events /
    last_ts summarize the user's oldest-N window, not their full
    history."""
    ev = read_events(spark, sf_dir)
    ev = cap_events_per_key(ev, "user_id", ["ts", "event_id"], max_events_per_key)
    seq = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    head = F.slice(F.col("seq"), 1, max_len)
    return (
        ev.groupBy("user_id")
        .agg(seq.alias("seq"), F.count("*").alias("n_events"))
        .select(
            "user_id", "n_events",
            F.date_format(F.element_at("seq", 1).ts, "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.element_at("seq", -1).ts, "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.array_join(F.transform(head, lambda s: s.event_type), ",").alias("seq_types"),
        )
        .orderBy("user_id")
    )


def funnel_counts(spark: SparkSession, sf_dir: str,
                  stages: tuple[str, ...] = ("view", "click", "purchase"),
                  max_events_per_key: int | None = None) -> DataFrame:
    """Ordered funnel: how many users completed stage k strictly AFTER
    completing stage k-1 (first-touch semantics — min event time per
    stage).

    ONE Spark job, one shuffle keyed by user: events filtered to the stage
    types are collected per user as a time-sorted array, and an
    `F.aggregate` walk advances the funnel greedily — the first stage-k
    event strictly after the stage-(k-1) time IS min(ts_k > t_{k-1}), so
    the walk is equivalent to the chained per-stage min-joins but without
    the per-stage driver `count()` actions (each of which re-ran the scan
    and every earlier join).  The per-user state is its stage-typed events
    only, and the stage-name frame is a constant 3-row broadcast.
    `max_events_per_key` bounds the per-user array (oldest-N — first-touch
    walks forward from the earliest events, so a capped hot key can only
    under-report its deepest stages, never mis-order them).
    Output: (stage, stage_idx, n_users)."""
    ev = read_events(spark, sf_dir)
    stage_arr = F.array(*[F.lit(s) for s in stages])
    evs = F.array_sort(F.collect_list(F.struct(F.col("ts"), F.col("event_type"))))
    init = F.struct(F.lit(0).alias("k"), F.lit(None).cast("timestamp").alias("t"))

    def step(acc, e):
        # F.get is 0-based and null-on-out-of-bounds, so a fully-converted
        # user (k == len(stages)) compares against NULL instead of raising
        # under ANSI mode
        advance = ((e["event_type"] == F.get(stage_arr, acc["k"]))
                   & (acc["t"].isNull() | (e["ts"] > acc["t"])))
        return F.when(advance,
                      F.struct((acc["k"] + 1).alias("k"),
                               e["ts"].alias("t"))).otherwise(acc)

    depth = (
        cap_events_per_key(ev.filter(F.col("event_type").isin(*stages)),
                           "user_id", ["ts", "event_id"], max_events_per_key)
        .groupBy("user_id").agg(evs.alias("evs"))
        .select(F.aggregate("evs", init, step)["k"].alias("k"))
        .filter(F.col("k") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("k"))).alias("stage_idx"))
        .groupBy("stage_idx").agg(F.count("*").alias("cnt"))
    )
    names = spark.createDataFrame([(s, i + 1) for i, s in enumerate(stages)],
                                  "stage string, stage_idx int")
    return (
        names.join(depth, "stage_idx", "left")
        .select("stage", "stage_idx",
                F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_users"))
        .orderBy("stage_idx")
    )


def event_hourly_anomalies(spark: SparkSession, sf_dir: str,
                           z_threshold: float = 3.0) -> DataFrame:
    """Hourly event-rate anomaly screen: per (event_type, hour) counts
    z-scored against that event type's own hourly distribution — the
    monitoring query behind rate-spike/drop alerting (the reference's
    heartbeat surfaces per-topic write rates for exactly this purpose;
    `common/SingerStatus.java:108-149` — this is its analytical twin over
    the delivered stream).

    ONE scan, one (type, hour) partial agg, then a per-type window over the
    (tiny) hourly frame — no second scan for the mean/stddev.  Stddev is
    population form (both engines define it identically); z-scores
    quantize-round before the flag so the threshold compares identical
    doubles cross-engine.  A type whose hourly counts are constant
    (stddev 0 — every n equals the mean) gets zscore 0 and is never
    flagged.

    Output: (event_type, hour, n, zscore, is_anomaly)."""
    ev = read_events(spark, sf_dir)
    hourly = (
        ev.groupBy(F.col("event_type"),
                   F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type")
    mu = F.avg("n").over(w)
    sd = F.stddev_pop("n").over(w)
    zscore = F.when(sd > 0, qround((F.col("n") - mu) / sd, 4)).otherwise(F.lit(0.0))
    return (
        hourly.select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n",
            zscore.alias("zscore"),
        )
        .withColumn("is_anomaly", F.abs(F.col("zscore")) >= z_threshold)
        .orderBy("event_type", "hour")
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by their first-activity week,
    counted in each later week they return.

    ONE scan and ONE user-keyed shuffle: per user, aggregate the distinct
    active weeks as a set (min(week) = the cohort, since date_trunc is
    monotone), explode, and count — (cohort, offset, user) rows are unique
    by construction, so the final rollup is a plain count, no
    count-distinct.  The previous formulation scanned events twice (first-
    seen + distinct activity) and joined them back; at 100 TB that is a
    second full scan and a second exchange for the same answer.
    Output: (cohort_week, week_offset, n_users)."""
    ev = read_events(spark, sf_dir)
    week = F.date_trunc("week", F.col("ts"))
    per_user = (
        ev.select("user_id", week.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cohort_week"), F.collect_set("w").alias("weeks"))
    )
    return (
        per_user.select("cohort_week", F.explode("weeks").alias("active_week"))
        .groupBy("cohort_week",
                 ((F.unix_timestamp("active_week") - F.unix_timestamp("cohort_week"))
                  / (7 * 86400)).cast("int").alias("week_offset"))
        .agg(F.count("*").alias("n_users"))
        .select(F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
                "week_offset", "n_users")
        .orderBy("cohort_week", "week_offset")
    )


def event_pattern_match(spark: SparkSession, sf_dir: str,
                        pattern: str = "vc+p",
                        symbols: dict[str, str] | None = None,
                        max_events_per_key: int | None = None) -> DataFrame:
    """MATCH_RECOGNIZE-style contiguous pattern search over each user's
    chronological event stream (the reference engines expose this as SQL
    MATCH_RECOGNIZE / CEP pattern operators; Spark has no built-in, so the
    sequence is materialized per key and searched with a regex).

    Each event type maps to one symbol character; the per-user ordered
    sequence becomes a symbol string and `pattern` is a regex over it —
    the default `vc+p` finds view -> one-or-more clicks -> purchase with
    NO intervening events (contiguity is exactly what MATCH_RECOGNIZE's
    row-pattern semantics give and what the per-stage min-join funnel
    cannot express).  Matches are counted non-overlapping, left-to-right —
    both Java and RE2 regex engines scan that way, so the count is
    portable to the DuckDB oracle.

    100 TB shape: ONE shuffle keyed by user (same exchange the funnel and
    sequence builders use); the collect_list state per user is its events
    only, the regex walk is JVM-side on the assembled string, and the
    output is one row per matching user.  Skew bound: enforce
    `max_events_per_key` (oldest-N via :func:`cap_events_per_key` on the
    same exchange) so a pathological hot key is truncated before the
    array materializes; with a cap, matches past the cap boundary are
    missed (n_events then reports the capped count).
    Output: (user_id, n_events, n_matches, first_match_pos 1-based)."""
    symbols = symbols or {"view": "v", "click": "c", "purchase": "p",
                          "signup": "s", "error": "e"}
    ev = read_events(spark, sf_dir)
    ev = cap_events_per_key(ev, "user_id", ["ts", "event_id"], max_events_per_key)
    sym_map = F.create_map(*[F.lit(x) for kv in symbols.items() for x in kv])
    seq = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    per_user = (
        ev.groupBy("user_id")
        .agg(seq.alias("seq"), F.count("*").alias("n_events"))
        .select(
            "user_id", "n_events",
            # unmapped event types become a filler symbol rather than
            # DISAPPEARING (array_join drops NULLs) — a dropped event
            # would fake contiguity across an intervening unknown event
            F.array_join(
                F.transform("seq", lambda s: F.coalesce(
                    F.element_at(sym_map, s.event_type), F.lit("x"))), ""
            ).alias("symstr"),
        )
    )
    return (
        per_user
        .select(
            "user_id", "n_events",
            F.size(F.regexp_extract_all("symstr", F.lit(pattern), 0)).alias("n_matches"),
            # the leftmost regex match IS the first occurrence of its own
            # literal text (an earlier occurrence would itself match), so
            # locate() on the extracted match gives the 1-based match start
            F.position(F.regexp_extract("symstr", pattern, 0), F.col("symstr")).alias("first_match_pos"),
        )
        .where(F.col("n_matches") > 0)
        .orderBy("user_id")
    )


def rolling_active_users(spark: SparkSession, sf_dir: str,
                         window_days: int = 7) -> DataFrame:
    """Trailing-window distinct actives: for each calendar day, how many
    distinct users had any event in the preceding `window_days` days
    (inclusive) — the DAU/WAU family.

    Scale shape: a COUNT(DISTINCT) over a range-joined window would pair
    every day with every event row; instead the log first collapses to
    distinct (user, day) — one exchange that shrinks the input to at most
    users × days — and each user-day then EXPLODES into the `window_days`
    window anchors it serves (a constant ×7 on the collapsed frame, not
    the raw log).  The final per-anchor distinct count rides one more
    exchange keyed by day.  Anchors are restricted to days that actually
    appear in the log (broadcast semi-join), matching the oracle's day
    spine.  Anchor arithmetic is in DATE space (to_date + date_add) —
    a timestamp + fixed-24h interval would miss midnight across a DST
    shift and silently drop that day from the spine in non-UTC session
    timezones.  Output: (day, n_active)."""
    ev = read_events(spark, sf_dir)
    user_days = (ev.select("user_id", F.to_date("ts").alias("ed"))
                 .distinct())
    days = user_days.select(F.col("ed").alias("d")).distinct()
    anchored = user_days.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("i"),
        F.col("ed"),
    ).select("user_id", F.date_add(F.col("ed"), F.col("i")).alias("d"))
    return (
        anchored.join(F.broadcast(days), "d", "left_semi")
        .groupBy("d").agg(F.count_distinct("user_id").alias("n_active"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "n_active")
        .orderBy("day")
    )


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase's value is credited
    to the day of the user's latest click at-or-before the purchase;
    purchases with no prior click fall into the 'organic' bucket.

    Composes the engine's as-of join (operators/joins.py — union + ONE
    (user, time) sort + carry-forward window) instead of the naive
    purchase×click join-and-argmax, so the wide state is one sorted pass
    over the user's stage-typed events.  Output: (attrib_day,
    n_purchases, revenue) by day."""
    from singer_spark.operators.joins import asof_join

    ev = read_events(spark, sf_dir)
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("cts"),
                      F.col("ts").alias("click_ts")))
    matched = asof_join(purchases, clicks, key="user_id",
                        left_time="ts", right_time="cts",
                        payload_cols=["click_ts"])
    return (
        matched
        .select(
            F.coalesce(F.date_format(F.date_trunc("day", "click_ts"),
                                     "yyyy-MM-dd"),
                       F.lit("organic")).alias("attrib_day"),
            "value",
        )
        .groupBy("attrib_day")
        .agg(F.count("*").alias("n_purchases"),
             qround(F.sum("value"), 4).alias("revenue"))
        .orderBy("attrib_day")
    )


def multi_touch_attribution(spark: SparkSession, sf_dir: str,
                            window_hours: int = 24) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    EQUALLY across all of the user's clicks in the preceding
    `window_hours` (vs :func:`purchase_attribution`'s last-touch winner-
    takes-all) — the other standard attribution model.  Its join core is
    the batch twin of the engine's stream-stream
    `streaming.streaming_interval_join` (clicks = left/earlier side,
    purchases = right side, max_delay = the window).

    Plan: one user-keyed interval join between the (small) purchase and
    click slices of the same log — the time-bound condition keeps state
    and output proportional to touches-per-purchase, and both sides come
    from the same pushed-down scan.  Per-purchase touch counts come from
    a window over the join output (same user key, no extra exchange of
    the log).  Purchases with no qualifying click credit 'organic'.
    Output: (attrib_day, n_touches, revenue_share) by click day."""
    ev = read_events(spark, sf_dir)
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("pid"),
                         F.col("ts").alias("pts"), "value"))
    clicks = (ev.where(F.col("event_type") == "click")
              .select(F.col("user_id").alias("cuser"),
                      F.col("ts").alias("cts")))
    bound = F.expr(f"INTERVAL {window_hours} HOURS")
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("cuser"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - bound),
        "left")
    w = Window.partitionBy("pid")
    n_touches = F.count("cts").over(w)
    share = F.when(n_touches > 0, F.col("value") / n_touches) \
             .otherwise(F.col("value"))
    return (joined
            .select(
                F.coalesce(F.date_format(F.date_trunc("day", "cts"),
                                         "yyyy-MM-dd"),
                           F.lit("organic")).alias("attrib_day"),
                share.alias("share"))
            .groupBy("attrib_day")
            .agg(F.count("*").alias("n_touches"),
                 qround(F.sum("share"), 4).alias("revenue_share"))
            .orderBy("attrib_day"))


def rolling_active_users_hll(spark: SparkSession, sf_dir: str,
                             window_days: int = 7,
                             lg_k: int = 14) -> DataFrame:
    """Sketch-merged trailing actives — the 100 TB form of
    :func:`rolling_active_users`: ONE day-keyed aggregation builds a
    per-day HyperLogLog sketch of active users (map-side combined: the
    exchange carries one ~2^lg_k-byte sketch per day per task, never
    user rows), then each anchor day UNIONS its trailing sketches and
    estimates.

    The exact variant's exchange grows with users × days; this one's is
    days × sketch-size — constant in the user population — and the merge
    reuses the sketches across the 7 anchors they serve (the sliding
    window never re-scans the log).  Estimate error ~1.6%/sqrt(2^lg_k)·…
    — at lg_k=14, well under 2%; verified against the exact count with a
    tolerance oracle.  Output: (day, n_active_approx)."""
    ev = read_events(spark, sf_dir)
    daily = (ev.groupBy(F.to_date("ts").alias("ed"))
             .agg(F.hll_sketch_agg(F.col("user_id"), F.lit(lg_k)).alias("sk")))
    days = daily.select(F.col("ed").alias("d"))
    # anchor each day's sketch at the window_days anchors it serves, then
    # union-merge per anchor; the frame is |days| × window_days rows of
    # sketches — tiny, and unaffected by corpus size.  date_add (not a
    # fixed-24h interval) keeps the anchors on midnight across DST.
    anchored = daily.select(
        "sk",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("i"),
        F.col("ed"),
    ).select("sk", F.date_add(F.col("ed"), F.col("i")).alias("d"))
    return (
        anchored.join(F.broadcast(days), "d", "left_semi")
        .groupBy("d").agg(F.hll_union_agg("sk").alias("merged"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                F.hll_sketch_estimate("merged").alias("n_active_approx"))
        .orderBy("day")
    )


def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of `value` (TWAP): each event's
    value is weighted by the seconds until the user's next event, so
    irregular sampling doesn't bias toward burst periods — the standard
    irregular-time-series aggregate plain AVG gets wrong.

    One user-keyed window (LEAD for the holding duration) and one
    aggregation on the same exchange; the final event's open interval is
    excluded (no duration).  Users with a single event emit NULL.
    Output: (user_id, n_events, twap)."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")) / 1e6
    per = ev.select("user_id", "value", dur.alias("dur"))
    return (
        per.groupBy("user_id")
        .agg(F.count("*").alias("n_events"),
             qround(F.sum(F.col("value") * F.col("dur")) / F.sum("dur"), 4).alias("twap"))
        .orderBy("user_id")
    )


def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the warehouse: orphan and
    dangling-key counts for each declared relationship — the data-quality
    gate a pipeline runs after every load.

    Each check is a LEFT ANTI join on the key (the orphan side streams,
    the referenced keys reduce to distinct ids first — broadcastable for
    dimension keys, AQE otherwise); results union into one small report.
    Output: (relationship, n_orphans)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    def orphans(name, child, ckey, parent, pkey):
        pk = parent.select(F.col(pkey).alias(ckey)).distinct()
        n = (child.select(ckey).join(pk, ckey, "left_anti")
             .agg(F.count("*").alias("n")))
        return n.select(F.lit(name).alias("relationship"),
                        F.col("n").alias("n_orphans"))

    checks = [
        orphans("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
        orphans("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey"),
        orphans("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey"),
        orphans("supplier.s_nationkey->nation", sup, "s_nationkey", nation, "n_nationkey"),
        orphans("lineitem.l_suppkey->supplier", li, "l_suppkey", sup, "s_suppkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("relationship")


def value_histogram(spark: SparkSession, sf_dir: str, bins: int = 20) -> DataFrame:
    """Equi-width histogram of the events value column: fixed [min, max]
    bin grid — ONE pass for the bounds (tiny agg, broadcast back), one
    partial-agg pass for the counts; both map-side combined.

    The bin expression is spelled as explicit IEEE arithmetic
    (floor((v-lo)/(hi-lo)*bins)+1, clamped) rather than width_bucket so
    the SQL oracle evaluates the bit-identical formula — engine-internal
    bucketing can disagree on boundary values.  Output: (bin, lo, hi, n)."""
    ev = read_events(spark, sf_dir)
    bounds = ev.agg(F.min("value").alias("_lo"), F.max("value").alias("_hi"))
    raw_bin = F.floor((F.col("value") - F.col("_lo"))
                      / (F.col("_hi") - F.col("_lo")) * bins) + 1
    binned = (
        ev.crossJoin(F.broadcast(bounds))
        .select(F.least(raw_bin, F.lit(bins)).alias("bin"), "_lo", "_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / bins
    return (
        binned.groupBy("bin", "_lo", "_hi")
        .agg(F.count("*").alias("n"))
        .select(F.col("bin").cast("int").alias("bin"),
                qround(F.col("_lo") + (F.col("bin") - 1) * width, 6).alias("lo"),
                qround(F.col("_lo") + F.col("bin") * width, 6).alias("hi"),
                "n")
        .orderBy("bin")
    )


def order_value_rank_profile(spark: SparkSession, sf_dir: str,
                             tiles: int = 4) -> DataFrame:
    """Rank-function profile over order values per priority class: NTILE
    quartile, PERCENT_RANK, CUME_DIST and dense rank for every order —
    the remaining rank-window surface (row_number/rank/lag/lead are
    exercised elsewhere).  One exchange keyed by the partition column.
    Output keeps only each (priority, quartile) boundary row (min/max
    percentiles per tile) so the result stays small and stable."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        F.ntile(tiles).over(w).alias("tile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return (
        ranked.groupBy("o_orderpriority", "tile")
        .agg(F.count("*").alias("n"),
             qround(F.min("pr"), 6).alias("pr_lo"),
             qround(F.max("pr"), 6).alias("pr_hi"),
             qround(F.max("cd"), 6).alias("cd_hi"))
        .select("o_orderpriority", F.col("tile").cast("int").alias("tile"),
                "n", "pr_lo", "pr_hi", "cd_hi")
        .orderBy("o_orderpriority", "tile")
    )


def funnel_windowed(spark: SparkSession, sf_dir: str,
                    stages: tuple[str, ...] = ("view", "click", "purchase"),
                    window_hours: int = 24,
                    max_events_per_key: int | None = None) -> DataFrame:
    """Conversion-window funnel: stage k counts only when it happens
    within `window_hours` of the user's stage-(k-1) completion —
    first-touch semantics throughout (each stage's time is the EARLIEST
    qualifying event, the standard product-analytics definition; an
    exists-any-chain variant would need per-user DP over the same
    collected array).

    Same ONE-job sorted-walk plan as :func:`funnel_counts`, the advance
    condition just gains the upper bound; `max_events_per_key` bounds the
    per-user array the same way (oldest-N on the same exchange).
    Output: (stage, stage_idx, n_users)."""
    ev = read_events(spark, sf_dir)
    stage_arr = F.array(*[F.lit(s) for s in stages])
    evs = F.array_sort(F.collect_list(F.struct(F.col("ts"), F.col("event_type"))))
    init = F.struct(F.lit(0).alias("k"), F.lit(None).cast("timestamp").alias("t"))
    bound = F.expr(f"INTERVAL {window_hours} HOURS")

    def step(acc, e):
        advance = ((e["event_type"] == F.get(stage_arr, acc["k"]))
                   & (acc["t"].isNull()
                      | ((e["ts"] > acc["t"]) & (e["ts"] <= acc["t"] + bound))))
        return F.when(advance,
                      F.struct((acc["k"] + 1).alias("k"),
                               e["ts"].alias("t"))).otherwise(acc)

    depth = (
        cap_events_per_key(ev.filter(F.col("event_type").isin(*stages)),
                           "user_id", ["ts", "event_id"], max_events_per_key)
        .groupBy("user_id").agg(evs.alias("evs"))
        .select(F.aggregate("evs", init, step)["k"].alias("k"))
        .filter(F.col("k") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("k"))).alias("stage_idx"))
        .groupBy("stage_idx").agg(F.count("*").alias("cnt"))
    )
    names = spark.createDataFrame([(s, i + 1) for i, s in enumerate(stages)],
                                  "stage string, stage_idx int")
    return (
        names.join(depth, "stage_idx", "left")
        .select("stage", "stage_idx",
                F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_users"))
        .orderBy("stage_idx")
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: counts of consecutive event-type
    transitions per user (the Markov transition matrix path analysis
    reads).  One user-keyed window for the LAG pairing, one tiny
    aggregation; share_from normalizes each row over its source state.
    Output: (from_type, to_type, n, share_from)."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select(F.lag("event_type").over(w).alias("from_type"),
                       F.col("event_type").alias("to_type"))
             .where(F.col("from_type").isNotNull()))
    counts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    totals = Window.partitionBy("from_type")
    return (counts
            .select("from_type", "to_type", "n",
                    qround(F.col("n") / F.sum("n").over(totals), 6).alias("share_from"))
            .orderBy("from_type", "to_type"))


def frequent_sequences(spark: SparkSession, sf_dir: str, k: int = 3,
                       min_users: int = 20,
                       max_events_per_key: int | None = None) -> DataFrame:
    """Sequential-pattern mining, contiguous form: event-type k-grams that
    appear in at least `min_users` distinct users' chronological streams —
    the frequent-subsequence report behind "common paths" dashboards
    (full PrefixSpan relaxes contiguity; the contiguous variant is the
    one-pass form and the usual first screen).

    One user-keyed shuffle assembles each user's ordered type sequence;
    its k-windows dedupe PER USER in the same JVM pass (support counts
    users, not occurrences), explode to (pattern, user) rows and a
    map-side-combined count finishes.  `max_events_per_key` bounds the
    per-user sequence (oldest-N) before assembly — capped hot keys
    contribute only their earliest window's k-grams.
    Output: (pattern, n_users) with support >= min_users, ordered by
    n_users desc, pattern."""
    from singer_spark.functions import kgram_join_col

    ev = read_events(spark, sf_dir)
    ev = cap_events_per_key(ev, "user_id", ["ts", "event_id"], max_events_per_key)
    seq = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    types = F.transform(seq, lambda s: s.event_type)
    # zip-shift k-gram build (kgram_join_col): the slice-per-position loop
    # re-evaluates `types` inside every lambda call — quadratic, and a
    # single 100k-event user wedges its task for hours
    kgrams = F.array_distinct(kgram_join_col(types, k, ">"))
    return (
        ev.groupBy("user_id").agg(kgrams.alias("pats"))
        .select(F.explode("pats").alias("pattern"))
        .groupBy("pattern").agg(F.count("*").alias("n_users"))
        .where(F.col("n_users") >= min_users)
        .orderBy(F.desc("n_users"), "pattern")
    )


def correlation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per event type: Pearson correlation,
    sample covariance, and slope of the least-squares fit between event
    value and time-of-day seconds — the corr/covar/regr aggregate family
    in one map-side-combined pass (each statistic reduces from the same
    (Σx, Σy, Σxy, Σx², n) partials; no second scan).
    Output: (event_type, n, corr_value_tod, covar_value_tod, slope)."""
    ev = read_events(spark, sf_dir)
    tod = (F.unix_micros("ts") % (86400 * 1_000_000)) / 1e6
    base = ev.select("event_type", F.col("value").alias("y"), tod.alias("x"))
    return (
        base.groupBy("event_type")
        .agg(F.count("*").alias("n"),
             qround(F.corr("y", "x"), 4).alias("corr_value_tod"),
             qround(F.covar_samp("y", "x"), 4).alias("covar_value_tod"),
             qround(F.covar_samp("y", "x") / F.var_samp("x"), 6).alias("slope"))
        .orderBy("event_type")
    )


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order revenue across customers — the
    inequality/concentration index (how much of the business a few
    accounts carry).  Formula over ascending per-customer revenue x_i:
    G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x), with ranks deterministic
    (revenue, then key).  The per-customer frame is one row PER CUSTOMER
    — it scales with the data, so the rank comes from
    :func:`operators.ids.assign_global_ids`' range-shuffle +
    partition-offset construction (the zipWithIndex shape), NOT a
    global `Window.orderBy` whose single sort task dies at 100×.
    Output: one row (n_customers, total_revenue, gini)."""
    from singer_spark.operators.ids import assign_global_ids

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.sum("o_totalprice").alias("rev")))
    # (rev, o_custkey) is duplicate-free (custkey unique per row), so the
    # 0-based id + 1 equals row_number() OVER (ORDER BY rev, o_custkey)
    ranked = assign_global_ids(per_cust, ["rev", "o_custkey"], id_name="_i")
    i = F.col("_i") + 1
    return (ranked.agg(
        F.count("*").alias("n_customers"),
        qround(F.sum("rev"), 2).alias("total_revenue"),
        qround((2 * F.sum(i * F.col("rev"))
                - (F.count("*") + 1) * F.sum("rev"))
               / (F.count("*") * F.sum("rev")), 6).alias("gini"),
    ))


def revenue_pareto(spark: SparkSession, sf_dir: str,
                   tiles: int = 10) -> DataFrame:
    """Pareto profile: customers bucketed into revenue deciles (1 = top
    spenders) with each decile's share and the running cumulative share —
    the 80/20 report.  One per-customer agg, a partition-offset global
    rank (no single-task ntile window — the per-customer frame scales
    with the data) mapped to exact ntile buckets in closed form,
    cumulative share via a window over the `tiles`-row decile frame
    (bounded by construction).  Output: (decile, n_customers, revenue,
    share, cum_share)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.sum("o_totalprice").alias("rev")))
    # Global DESC rank via the partition-offset construction (negated
    # revenue makes the lexicographic ascending order equal
    # ORDER BY rev DESC, o_custkey), then ntile's bucket layout in
    # closed form: with n rows and t tiles, q = n div t and r = n mod t,
    # the first r buckets hold q+1 rows — bucket(i) for 1-based rank i
    # is ceil(i/(q+1)) inside the first r*(q+1) rows, else
    # r + ceil((i - r*(q+1))/q).  Exact ntile semantics, no single-task
    # global sort (the per-customer frame scales with the data).
    from singer_spark.operators.ids import assign_global_ids

    ranked = assign_global_ids(
        per_cust.withColumn("_negrev", -F.col("rev")),
        ["_negrev", "o_custkey"], id_name="_i")
    n = ranked.count()  # the id pass already pinned the frame; O(1) scan
    q, r = divmod(n, tiles)
    q1 = max(q, 1)  # q == 0 (n < tiles): every row lands in the ceil arm
    i = F.col("_i") + 1
    boundary = r * (q + 1)
    bucket = (F.when(i <= boundary, F.floor((i + q) / (q + 1)))
              .otherwise(r + F.floor((i - boundary + q1 - 1) / q1)))
    deciles = (ranked.withColumn("decile", bucket)
               .groupBy("decile")
               .agg(F.count("*").alias("n_customers"),
                    F.sum("rev").alias("rev_raw")))
    # Cumulative share WITHOUT a window (even a tiles-row global window
    # would land on the bounded-frame allowlist — here it's free to not
    # need one): pack the <= tiles decile rows into ONE sorted array and
    # left-fold a prefix sum with F.aggregate.  The fold adds ratios in
    # decile order starting from 0.0 — float-identical to the window's
    # running sum (and to the oracle's ORDER BY decile ROWS UNBOUNDED
    # PRECEDING), and the packed row is tiles structs by construction.
    packed = deciles.agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("decile").cast("int").alias("decile"),
            F.col("n_customers").alias("n_customers"),
            F.col("rev_raw").alias("rev_raw")))).alias("rows"),
        F.sum("rev_raw").alias("_t"))
    out_t = ("array<struct<decile:int,n_customers:bigint,"
             "rev_raw:double,ratio:double,cum:double>>")
    acc0 = F.struct(
        F.lit(0.0).alias("acc"),
        F.expr(f"CAST(array() AS {out_t})").alias("out"))
    pref = F.aggregate(
        F.col("rows"), acc0,
        lambda st, r: F.struct(
            (st["acc"] + r["rev_raw"] / F.col("_t")).alias("acc"),
            F.concat(st["out"], F.array(F.struct(
                r["decile"].alias("decile"),
                r["n_customers"].alias("n_customers"),
                r["rev_raw"].alias("rev_raw"),
                (r["rev_raw"] / F.col("_t")).alias("ratio"),
                (st["acc"] + r["rev_raw"] / F.col("_t")).alias("cum"))))
            .alias("out")),
        lambda st: st["out"])
    return (packed.select(F.explode(pref).alias("e"))
            .select(F.col("e.decile").alias("decile"),
                    F.col("e.n_customers").alias("n_customers"),
                    qround(F.col("e.rev_raw"), 2).alias("revenue"),
                    qround(F.col("e.ratio"), 6).alias("share"),
                    qround(F.col("e.cum"), 6).alias("cum_share"))
            .orderBy("decile"))


def robust_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/scale per event type: median and MAD (median
    absolute deviation) — the outlier-resistant complement to
    mean/stddev.  Two aggregation passes (the median must exist before
    deviations can), each map-side combined; the 5-row median frame
    broadcasts back onto the scan.  Output: (event_type, n, median_value,
    mad_value)."""
    ev = read_events(spark, sf_dir)
    med = (ev.groupBy("event_type")
           .agg(F.expr("percentile(value, 0.5)").alias("_med"),
                F.count("*").alias("n")))
    return (ev.join(F.broadcast(med), "event_type")
            .groupBy("event_type")
            .agg(F.first("n").alias("n"),
                 qround(F.first("_med"), 4).alias("median_value"),
                 qround(F.expr("percentile(abs(value - _med), 0.5)"), 4)
                 .alias("mad_value"))
            .orderBy("event_type"))


def new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily acquisition split: distinct users active each day, divided
    into first-ever-seen (new) and returning.  The log collapses to
    distinct (user, day) once; each user's min day rides the same frame
    (a user-keyed window min avoids a second scan-and-join).
    Output: (day, n_new, n_returning)."""
    ev = read_events(spark, sf_dir)
    user_days = (ev.select("user_id", F.date_trunc("day", "ts").alias("d"))
                 .distinct())
    w = Window.partitionBy("user_id")
    flagged = user_days.withColumn("first_d", F.min("d").over(w))
    return (flagged.groupBy("d")
            .agg(F.sum((F.col("d") == F.col("first_d")).cast("bigint"))
                 .alias("n_new"),
                 F.sum((F.col("d") != F.col("first_d")).cast("bigint"))
                 .alias("n_returning"))
            .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                    "n_new", "n_returning")
            .orderBy("day"))


def stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per calendar month: average daily distinct
    actives divided by the month's distinct actives — the engagement
    ratio product teams track.  One collapsed user-day frame feeds both
    numerator and denominator (count-distinct per month over the
    already-distinct frame).  Output: (month, avg_dau, mau, stickiness)."""
    ev = read_events(spark, sf_dir)
    user_days = (ev.select("user_id",
                           F.date_trunc("day", "ts").alias("d"))
                 .distinct()
                 .withColumn("m", F.date_trunc("month", "d")))
    dau = (user_days.groupBy("m", "d").agg(F.count("*").alias("dau"))
           .groupBy("m").agg(F.avg("dau").alias("avg_dau_raw"),
                             F.count("*").alias("n_days")))
    mau = user_days.groupBy("m").agg(F.count_distinct("user_id").alias("mau"))
    return (dau.join(mau, "m")
            .select(F.date_format("m", "yyyy-MM").alias("month"),
                    qround(F.col("avg_dau_raw"), 4).alias("avg_dau"),
                    "mau",
                    qround(F.col("avg_dau_raw") / F.col("mau"), 6)
                    .alias("stickiness"))
            .orderBy("month"))
