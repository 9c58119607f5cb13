"""Guards for the round-4 additions: SCD2 merge (`operators/cdc.py`),
MATCH_RECOGNIZE-style pattern matching (`queries.event_pattern_match`),
and exact heavy hitters with Misra-Gries pruning
(`operators/diagnostics.heavy_hitters`).

Each is checked against an independent formulation — the SCD2 merge
against the one-shot rebuild over the full log, the pattern matcher
against a Python re walk, and the pruned heavy hitters against the plain
full groupBy — so plan edits can't drift semantics silently."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from singer_spark.operators.cdc import scd2_apply, scd2_build
from singer_spark.operators.diagnostics import heavy_hitters
from singer_spark.queries import event_pattern_match
from singer_spark.session import read_events


def _purchases(spark, sf_dir):
    return (read_events(spark, sf_dir)
            .where(F.col("event_type") == "purchase")
            .select("user_id", F.round("value", 4).alias("v"), "ts"))


def test_scd2_apply_equals_full_rebuild(spark, sf_dir):
    ch = _purchases(spark, sf_dir)
    cutoff = "2024-01-16"
    merged = scd2_apply(
        scd2_build(ch.where(F.col("ts") < cutoff), "user_id", "v", "ts",
                   order_cols=["v"]),
        ch.where(F.col("ts") >= cutoff), "user_id", "v", "ts",
    )
    full = scd2_build(ch, "user_id", "v", "ts", order_cols=["v"])
    cols = ["key", "attr", "valid_from", "valid_to"]
    assert sorted(map(tuple, merged.select(cols).collect())) == \
           sorted(map(tuple, full.select(cols).collect()))
    # exactly one open row per key with >=1 change
    opens = merged.where(F.col("valid_to").isNull()).groupBy("key").count()
    assert opens.where(F.col("count") != 1).count() == 0
    assert opens.count() == ch.select("user_id").distinct().count()


def test_scd2_apply_empty_batch_is_identity(spark, sf_dir):
    ch = _purchases(spark, sf_dir)
    current = scd2_build(ch, "user_id", "v", "ts", order_cols=["v"])
    merged = scd2_apply(current, ch.limit(0), "user_id", "v", "ts")
    assert sorted(map(tuple, merged.collect())) == \
           sorted(map(tuple, current.collect()))


def test_event_pattern_match_vs_python_re(spark, sf_dir):
    sym = {"view": "v", "click": "c", "purchase": "p",
           "signup": "s", "error": "e"}
    rows = (read_events(spark, sf_dir)
            .select("user_id", "ts", "event_id", "event_type").collect())
    seqs: dict[int, list] = {}
    for r in rows:
        seqs.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    expect = {}
    for uid, evs in seqs.items():
        s = "".join(sym[t] for _, _, t in sorted(evs))
        ms = re.findall(r"vc+p", s)
        if ms:
            m = re.search(r"vc+p", s)
            expect[uid] = (len(evs), len(ms), m.start() + 1)
    got = {r.user_id: (r.n_events, r.n_matches, r.first_match_pos)
           for r in event_pattern_match(spark, sf_dir).collect()}
    assert got == expect
    assert expect, "fixture should contain at least one vc+p match"


def test_heavy_hitters_equals_plain_groupby(spark, sf_dir):
    toks = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.explode(F.split("text", r"\s+")).alias("token"))
            .where(F.col("token") != ""))
    share = 0.03
    pruned = {(r.item, r.n) for r in
              heavy_hitters(toks, "token", min_share=share).collect()}
    total = toks.count()
    plain = {(r.token, r.n) for r in
             toks.groupBy("token").agg(F.count("*").alias("n"))
                 .where(F.col("n") >= total * share).collect()}
    assert pruned == plain
    assert plain, "fixture should contain heavy hitters at this threshold"


def test_heavy_hitters_tiny_capacity_still_exact(spark, sf_dir):
    # capacity smaller than the distinct count forces real Misra-Gries
    # evictions; the recount must still produce the exact answer for the
    # matching support threshold s = 1/m
    toks = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.explode(F.split("text", r"\s+")).alias("token"))
            .where(F.col("token") != ""))
    m = 5
    pruned = {(r.item, r.n) for r in
              heavy_hitters(toks, "token", min_share=1.0 / m,
                            capacity=m).collect()}
    total = toks.count()
    plain = {(r.token, r.n) for r in
             toks.groupBy("token").agg(F.count("*").alias("n"))
                 .where(F.col("n") >= total / m).collect()}
    assert pruned == plain


def test_scd2_stream_sink_matches_full_rebuild(spark, sf_dir, tmp_path):
    from singer_spark.operators.cdc import scd2_read, scd2_stream_sink

    ch = _purchases(spark, sf_dir).orderBy("ts")
    rows = ch.collect()
    cuts = [len(rows) // 3, 2 * len(rows) // 3, len(rows)]
    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id bigint, v double, ts timestamp"

    import os
    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(schema).parquet(src)
    q = scd2_stream_sink(stream, dim, "user_id", "v", "ts",
                         checkpoint=ckpt, buckets=4).start()
    try:
        lo = 0
        for i, hi in enumerate(cuts):
            # publish each CDC chunk ATOMICALLY (single file, rename into
            # the watched dir) — a multi-file non-atomic append can
            # straddle two triggers with a partial file set, violating the
            # sink's per-key monotone-arrival contract (see docstring)
            stage = str(tmp_path / f"stage{i}")
            spark.createDataFrame(rows[lo:hi], schema) \
                 .coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(p for p in os.listdir(stage)
                        if p.endswith(".parquet"))
            os.rename(os.path.join(stage, part),
                      os.path.join(src, f"chunk{i}.parquet"))
            lo = hi
            q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(map(tuple, scd2_read(spark, dim).collect()))
    want = sorted(map(tuple,
                      scd2_build(ch, "user_id", "v", "ts",
                                 order_cols=["v"]).collect()))
    extra, missing = set(got) - set(want), set(want) - set(got)
    assert got == want, (
        f"n_got={len(got)} n_want={len(want)} "
        f"extra={sorted(extra)[:4]} missing={sorted(missing)[:4]}")
    # history dir only ever receives appends; open/ has one row per key
    import os
    assert os.path.isdir(os.path.join(dim, "closed"))
    open_rows = scd2_read(spark, dim).where("valid_to IS NULL")
    assert open_rows.count() == ch.select("user_id").distinct().count()


# ---------------------------------------------------------------------------
# Property tests: adversarial tie/ordering cases the fixture can't produce
# (equal timestamps within a key, duplicate change rows, skewed item
# streams with tiny Misra-Gries capacities).  Few examples — each runs
# real Spark jobs.
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

change = st.tuples(st.integers(0, 3),        # key
                   st.integers(0, 9),        # attr
                   st.integers(0, 6))        # ts (dense => many ties)


@settings(max_examples=8, deadline=None)
@given(st.lists(change, min_size=1, max_size=25), st.integers(0, 7))
def test_scd2_merge_property(spark_sess, changes, cutoff):
    spark = spark_sess
    df = spark.createDataFrame(
        [(k, float(a), t) for k, a, t in changes],
        "key bigint, attr double, ts bigint").dropDuplicates()
    full = scd2_build(df, "key", "attr", "ts", order_cols=["attr"])
    merged = scd2_apply(
        scd2_build(df.where(F.col("ts") < cutoff), "key", "attr", "ts",
                   order_cols=["attr"]),
        df.where(F.col("ts") >= cutoff), "key", "attr", "ts")
    cols = ["key", "attr", "valid_from", "valid_to"]
    assert sorted(map(tuple, merged.select(cols).collect())) == \
           sorted(map(tuple, full.select(cols).collect()))


@settings(max_examples=8, deadline=None)
@given(st.lists(st.sampled_from("abcde"), min_size=1, max_size=200),
       st.integers(2, 6))
def test_heavy_hitters_property(spark_sess, items, m):
    spark = spark_sess
    df = spark.createDataFrame([(i,) for i in items], "item string") \
              .repartition(4)
    got = {(r.item, r.n) for r in
           heavy_hitters(df, "item", min_share=1.0 / m, capacity=m).collect()}
    total = len(items)
    from collections import Counter
    want = {(i, c) for i, c in Counter(items).items() if c >= total / m}
    assert got == want


def test_apply_cdc_batch_retry_after_swap_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: replaying an epoch AFTER its
    open-bucket swap must not corrupt history (the naive recompute loses
    the row that closed the pre-batch version)."""
    from singer_spark.operators.cdc import apply_cdc_batch, scd2_read

    ch = _purchases(spark, sf_dir).orderBy("ts")
    rows = ch.collect()
    cuts = [len(rows) // 3, 2 * len(rows) // 3, len(rows)]
    dim = str(tmp_path / "dim_retry")
    schema = "user_id bigint, v double, ts timestamp"

    lo = 0
    for epoch, hi in enumerate(cuts):
        bdf = spark.createDataFrame(rows[lo:hi], schema)
        apply_cdc_batch(bdf, dim, "user_id", "v", "ts", 4, epoch)
        # full retry of the same epoch (crash after complete apply)
        apply_cdc_batch(bdf, dim, "user_id", "v", "ts", 4, epoch)
        lo = hi

    got = sorted(map(tuple, scd2_read(spark, dim).collect()))
    want = sorted(map(tuple,
                      scd2_build(ch, "user_id", "v", "ts",
                                 order_cols=["v"]).collect()))
    assert got == want


def test_apply_cdc_batch_stale_run_backup_not_restored(spark, tmp_path):
    """Epoch ids restart at 0 when a checkpoint is recreated: a leftover
    `epoch=0` backup from run A must NOT be restored over run B's live
    open buckets when B's own epoch 0 arrives (ADVICE r4)."""
    import os

    from singer_spark.operators.cdc import apply_cdc_batch, scd2_read

    dim = str(tmp_path / "dim_runs")
    schema = "user_id bigint, v double, ts timestamp"
    import datetime as dt

    t = dt.datetime(2024, 1, 1)

    def batch(rows):
        return spark.createDataFrame(
            [(u, v, t + dt.timedelta(hours=h)) for u, v, h in rows], schema)

    # run A, epoch 0 — and leave its backup in place by simulating a crash
    # BEFORE the later-epoch cleanup (just don't run a later epoch)
    apply_cdc_batch(batch([(1, 1.0, 0), (2, 5.0, 0)]), dim,
                    "user_id", "v", "ts", 4, 0, run_id="runA")
    assert os.path.isdir(os.path.join(dim, "_epoch_backup", "epoch=0"))

    # run B (recreated checkpoint → epoch numbering restarts at 0)
    apply_cdc_batch(batch([(1, 2.0, 1)]), dim,
                    "user_id", "v", "ts", 4, 0, run_id="runB")

    rows = sorted(map(tuple, scd2_read(spark, dim).collect()))
    assert [(r[0], r[1]) for r in rows] == [(1, 1.0), (1, 2.0), (2, 5.0)]
    # user 1's v=1.0 version closed at v=2.0's arrival; v=2.0 is open
    closed = [r for r in rows if r[3] is not None]
    assert [(r[0], r[1]) for r in closed] == [(1, 1.0)]

    # and a genuine same-run retry still restores (idempotent)
    apply_cdc_batch(batch([(1, 2.0, 1)]), dim,
                    "user_id", "v", "ts", 4, 0, run_id="runB")
    assert sorted(map(tuple, scd2_read(spark, dim).collect())) == rows


def test_corpus_snapshot_diff_classifies_all_transitions(spark):
    from singer_spark.operators.cdc import corpus_snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")],
        "doc_id bigint, text string")
    new = spark.createDataFrame(
        [(2, "beta"),            # unchanged -> omitted
         (3, "gamma EDITED"),    # changed
         (4, "delta")],          # added
        "doc_id bigint, text string")
    got = {r.doc_id: r.change_type
           for r in corpus_snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_corpus_snapshot_diff_null_text_and_duplicate_ids(spark):
    """NULL text is a PRESENT doc with a NULL digest (presence is a flag,
    not digest nullability); duplicate ids collapse to their max digest
    before the join."""
    from singer_spark.operators.cdc import corpus_snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "beta"), (3, None), (5, "x"), (5, "y")],
        "doc_id bigint, text string")
    new = spark.createDataFrame(
        [(1, None),              # NULL -> NULL: unchanged, omitted
         (2, None),              # 'beta' -> NULL: changed
         (4, None),              # added (with NULL text)
         (5, "y"), (5, "x")],    # same digest SET -> same max: unchanged
        "doc_id bigint, text string")
    got = {r.doc_id: r.change_type
           for r in corpus_snapshot_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}
