"""Slowly-changing-dimension (SCD2) build and incremental merge.

The lakehouse-side counterpart of the log pipeline: the agent delivers an
attribute-change stream (reference: the Kafka topics Singer feeds,
`singer/src/main/java/com/pinterest/singer/writer/KafkaWriter.java`); a
downstream dimension table wants versioned history — one row per
(key, value) epoch with `valid_from`/`valid_to`, open rows having
valid_to = NULL.  Warehouses express the apply step as MERGE INTO; Spark
without a table format needs the same semantics as a join + union plan.

Scale design: the ONLY rows that ever shuffle in `scd2_apply` are the
OPEN rows of the current table (one per live key) and the update batch —
closed history is passed through untouched, so a 100 TB dimension with
years of versions pays for its live keys only, and a small change batch
broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_build(changes: DataFrame, key_col: str, attr_col: str,
               ts_col: str, order_cols: list[str] | None = None) -> DataFrame:
    """SCD2 history from a full change log: each change opens a version at
    its timestamp and the next change for the same key closes it (LEAD
    window) — the last version per key stays open (valid_to NULL).

    One shuffle keyed by `key_col` (the window's own partitioning)."""
    order_by = [ts_col] + (order_cols or [])
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_by])
    return changes.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )


def scd2_apply(current: DataFrame, updates: DataFrame, key_col: str,
               attr_col: str, ts_col: str) -> DataFrame:
    """MERGE a change batch into an SCD2 table: close each touched key's
    open row at its first new change, append one version per change, leave
    the newest change open.  Equivalent to rebuilding from the full
    concatenated log, without touching closed history.

    Plan: closed rows (valid_to NOT NULL) pass through with no exchange;
    open rows union the batch's versions and one LEAD window over that
    small frame re-links the chain.  An open row whose key has no update
    keeps valid_to NULL through the same window (LEAD over a 1-row
    partition is NULL), so no separate anti-join is needed.

    Tie-break is ALWAYS (valid_from, attr) — the only columns that exist
    after the rename — so pair this with a `scd2_build` whose
    `order_cols` is the attr column (or nothing) for merged == rebuilt."""
    closed = current.where(F.col("valid_to").isNotNull())
    open_rows = current.where(F.col("valid_to").isNull()) \
                       .select("key", "attr", "valid_from")
    batch = updates.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
    )
    live = open_rows.unionByName(batch)
    # tie-break equal timestamps on attr so the relink is deterministic
    # (and matches an oracle ordering by the same two columns)
    w = Window.partitionBy("key").orderBy("valid_from", "attr")
    relinked = live.select(
        "key", "attr", "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
    )
    return closed.unionByName(relinked)


def scd2_stream_sink(changes_stream: DataFrame, dim_path: str,
                     key_col: str, attr_col: str, ts_col: str,
                     checkpoint: str, buckets: int = 16):
    """Structured-Streaming SCD2 maintenance: each CDC micro-batch folds
    into a versioned dimension on disk via :func:`scd2_apply` semantics —
    the always-on twin of the batch merge (reference deployment: the
    change topic Singer delivers, replayed into a queryable history).

    On-disk layout under `dim_path`:

    - ``closed/`` — append-only parquet of finished versions.  Never read
      or rewritten by the sink; at 100 TB this is the history and it only
      ever receives appends.
    - ``open/kb=<i>/`` — the live row per key, hash-bucketed into
      `buckets` partitions.  A micro-batch reads ONLY the buckets its keys
      touch (partition pruning on `kb`), relinks open ∪ batch with one
      LEAD window, appends the newly-closed versions to ``closed/`` and
      atomically swaps just those bucket directories.  Per-trigger cost is
      O(live keys in touched buckets), independent of history size.

    Ordering contract: WITHIN a trigger, arbitrary order is fine (the
    relink window sorts); ACROSS triggers, each key's changes must arrive
    in timestamp order.  With a file-based change feed that means each CDC
    chunk must appear ATOMICALLY in the watched directory (write to a
    staging path, rename in — the same discipline the log-rotation tail
    source relies on): a multi-file non-atomic append can straddle two
    triggers with a partial file set and deliver a key's changes out of
    order.  A late row older than its key's open row still gets a
    correctly-linked version row, but the earlier-closed neighbor keeps
    its stale valid_to — repairing that needs a closed-history rewrite,
    which belongs to a table format with row-level merge.
    Returns a DataStreamWriter (caller starts it).  The directory swap is
    filesystem-rename based, matching the local/shared-FS deployment of
    the agent (see streaming/tail.py for the same envelope); a dimension
    that must live on object storage should use the versioned-dir +
    pointer-log pattern (`similarity.py` codes_v{n}/codes_ptr, r12)
    rather than per-bucket renames."""
    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from singer_spark.streaming.stateful import streaming_run_id

        apply_cdc_batch(batch_df, dim_path, key_col, attr_col, ts_col,
                        buckets, epoch_id,
                        run_id=streaming_run_id(checkpoint,
                                                batch_df.sparkSession))

    return (changes_stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", checkpoint))


def apply_cdc_batch(batch_df: DataFrame, dim_path: str, key_col: str,
                    attr_col: str, ts_col: str, buckets: int,
                    epoch_id: int, run_id: str = "") -> None:
    """One idempotent SCD2 micro-batch apply (the foreachBatch body of
    :func:`scd2_stream_sink`, exposed so retries are testable).

    Retry safety: foreachBatch is at-least-once, and a naive retry AFTER
    the open-bucket swap would recompute the relink from POST-batch state
    — the epoch's closed-rows overwrite then loses the row that closed the
    pre-batch version (silent history loss).  So before mutating open/,
    the touched buckets' PRE state is moved into a per-epoch backup (the
    touched-bucket list written first); a retry of the same epoch restores
    that backup and recomputes from genuine pre-state, and the arrival of
    a LATER epoch (its checkpoint commit proves this one finished) clears
    the backup.  Every step is recompute-or-restore idempotent, so a crash
    at any point between filesystem operations replays cleanly.

    `run_id` (the streaming query id — see `streaming_run_id`) is stamped
    into the backup's touched.json: epoch ids restart at 0 when a
    checkpoint is recreated, so without the stamp a stale `epoch=0` backup
    from a dead run could be restored OVER live open-bucket state.  A
    run_id mismatch discards the old backups instead of restoring them.
    Keeping the dim dir across a checkpoint reset still replays the whole
    source into the existing history — delete them together for a true
    reset."""
    import json
    import os
    import shutil
    import uuid

    closed_path = os.path.join(dim_path, "closed")
    open_path = os.path.join(dim_path, "open")
    backups_root = os.path.join(dim_path, "_epoch_backup")
    my_backup = os.path.join(backups_root, f"epoch={epoch_id}")

    # restore pre-state if this epoch partially applied before — but ONLY
    # if the backup belongs to THIS run (epoch numbering restarts on a
    # recreated checkpoint, so a same-numbered backup from a dead run is
    # stale and restoring it would clobber live open-bucket state)
    touched_file = os.path.join(my_backup, "touched.json")
    if os.path.isfile(touched_file):
        with open(touched_file) as f:
            meta = json.load(f)
        if meta.get("run_id", "") == run_id:
            for kb in meta["touched"]:
                dst = os.path.join(open_path, f"kb={kb}")
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                src = os.path.join(my_backup, f"kb={kb}")
                if os.path.isdir(src):
                    shutil.copytree(src, dst)
        else:
            shutil.rmtree(backups_root, ignore_errors=True)
    # any OTHER epoch's backup means that epoch committed — clear it
    if os.path.isdir(backups_root):
        for d in os.listdir(backups_root):
            if d != f"epoch={epoch_id}":
                shutil.rmtree(os.path.join(backups_root, d),
                              ignore_errors=True)

    spark = batch_df.sparkSession
    batch = batch_df.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
    ).withColumn("kb", F.pmod(F.xxhash64(F.col("key").cast("string")),
                              F.lit(buckets)))
    if batch.isEmpty():
        return
    touched = sorted(r.kb for r in batch.select("kb").distinct().collect())
    # open/ may exist but hold zero buckets (e.g. a restored first epoch);
    # parquet schema inference fails on an empty dir
    has_open = (os.path.isdir(open_path)
                and any(d.startswith("kb=") for d in os.listdir(open_path)))
    if has_open:
        open_df = (spark.read.option("basePath", open_path)
                   .parquet(open_path)
                   .where(F.col("kb").isin(touched)))
    else:
        open_df = spark.createDataFrame([], batch.schema)
    live = open_df.select("key", "attr", "valid_from", "kb") \
                  .unionByName(batch)
    w = Window.partitionBy("key").orderBy("valid_from", "attr")
    relinked = live.select(
        "key", "attr", "valid_from", "kb",
        F.lead("valid_from").over(w).alias("valid_to"),
    ).localCheckpoint()  # compute once; consumed by two writes below
    # closed versions land in a per-epoch subdir with overwrite, so a
    # retry of the same epoch replaces rather than duplicates
    (relinked.where(F.col("valid_to").isNotNull())
     .select("key", "attr", "valid_from", "valid_to")
     .write.mode("overwrite")
     .parquet(os.path.join(closed_path, f"epoch={epoch_id}")))
    tmp = os.path.join(dim_path, f"_open_tmp_{epoch_id}_{uuid.uuid4().hex[:8]}")
    (relinked.where(F.col("valid_to").isNull())
     .select("key", "attr", "valid_from", "kb")
     .write.partitionBy("kb").mode("overwrite").parquet(tmp))
    os.makedirs(open_path, exist_ok=True)
    # snapshot pre-state of the touched buckets, then commit the marker,
    # THEN swap — the marker must follow the backups: a restore trusts the
    # touched list to delete buckets, so it may only exist once every
    # listed bucket's pre-state is safely copied (a crash before the
    # marker leaves open/ untouched and retry recomputes from scratch)
    os.makedirs(my_backup, exist_ok=True)
    for kb in touched:
        dst = os.path.join(open_path, f"kb={kb}")
        bak = os.path.join(my_backup, f"kb={kb}")
        if os.path.isdir(dst) and not os.path.isdir(bak):
            shutil.copytree(dst, bak)
    tf_tmp = touched_file + ".tmp"
    with open(tf_tmp, "w") as f:
        json.dump({"touched": touched, "run_id": run_id}, f)
    os.replace(tf_tmp, touched_file)
    for kb in touched:
        src = os.path.join(tmp, f"kb={kb}")
        dst = os.path.join(open_path, f"kb={kb}")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        if os.path.isdir(src):
            shutil.move(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)


def scd2_read(spark, dim_path: str) -> DataFrame:
    """Read the streaming-maintained SCD2 dimension back as one frame
    (closed history ∪ open rows, open carrying valid_to NULL)."""
    import os

    closed_path = os.path.join(dim_path, "closed")
    open_path = os.path.join(dim_path, "open")
    parts = []
    if os.path.isdir(closed_path):
        parts.append(spark.read.parquet(closed_path)
                     .select("key", "attr", "valid_from", "valid_to"))
    if os.path.isdir(open_path):
        odf = spark.read.parquet(open_path)
        # valid_to's type follows valid_from (times may be timestamps,
        # epoch ints, or anything orderable)
        vt = F.lit(None).cast(dict(odf.dtypes)["valid_from"])
        parts.append(odf.select("key", "attr", "valid_from",
                                vt.alias("valid_to")))
    assert parts, f"no SCD2 data under {dim_path}"
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scd2_snapshot_diff(old_dim: DataFrame, new_dim: DataFrame) -> DataFrame:
    """Change-data-feed OUT of two SCD2 states: compare the OPEN rows of
    two dimension snapshots and emit what changed between them — the
    inverse of :func:`scd2_apply`, for feeding downstream consumers that
    want a delta, not a rebuild.

    Only open rows join (one row per live key each side, full outer on
    key); closed history is never touched.  Output: (key, old_attr,
    new_attr, change_type ∈ {added, removed, changed}) — unchanged keys
    are omitted."""
    old_open = old_dim.where(F.col("valid_to").isNull()) \
                      .select("key", F.col("attr").alias("old_attr"))
    new_open = new_dim.where(F.col("valid_to").isNull()) \
                      .select("key", F.col("attr").alias("new_attr"))
    joined = old_open.join(new_open, "key", "full_outer")
    change = (F.when(F.col("old_attr").isNull(), F.lit("added"))
              .when(F.col("new_attr").isNull(), F.lit("removed"))
              .otherwise(F.lit("changed")))
    return (joined
            .where(F.col("old_attr").isNull() | F.col("new_attr").isNull()
                   | (F.col("old_attr") != F.col("new_attr")))
            .select("key", "old_attr", "new_attr", change.alias("change_type"))
            .orderBy("key"))


def corpus_snapshot_diff(old_docs: DataFrame, new_docs: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Change feed between two CORPUS snapshots — the dataset-versioning
    primitive ("what moved between crawl N and crawl N+1?"): per doc id,
    whether it was added, removed, or changed (same id, different
    content digest); unchanged docs are omitted.

    Text never joins: each side reduces to (id, 16-byte digest) in its
    scan, so the full-outer join shuffles two digest frames — the same
    shape as exact dedup, and the reason this works at 100 TB where a
    text-comparing diff would move the whole corpus twice.

    Presence is tracked by an explicit flag, NOT digest nullability: a
    doc with NULL text is a present doc whose digest is NULL, and the
    change comparison is null-safe (NULL -> NULL is unchanged, NULL ->
    'x' is changed).  Duplicate ids within a snapshot (real crawl
    snapshots have them) collapse deterministically to their MAX digest
    before the join, so one id yields one verdict.

    Output: (doc_id, change_type ∈ {added, removed, changed}), ordered
    by doc_id."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        return (df.groupBy(F.col(id_col).alias("doc_id"))
                .agg(F.max(F.md5(F.col(text_col).cast("binary")))
                     .alias(f"{tag}_dg"))
                .withColumn(f"in_{tag}", F.lit(True)))

    joined = side(old_docs, "old").join(side(new_docs, "new"),
                                        "doc_id", "full_outer")
    change = (F.when(F.col("in_old").isNull(), F.lit("added"))
              .when(F.col("in_new").isNull(), F.lit("removed"))
              .otherwise(F.lit("changed")))
    return (joined
            .where(F.col("in_old").isNull() | F.col("in_new").isNull()
                   | ~F.col("old_dg").eqNullSafe(F.col("new_dg")))
            .select("doc_id", change.alias("change_type"))
            .orderBy("doc_id"))
