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
               attr_col: str, ts_col: str,
               order_cols: list[str] | None = None) -> DataFrame:
    """MERGE a change batch into an SCD2 table: close each touched key's
    open row at its first new change, append one version per change, leave
    the newest change open.  Equivalent to rebuilding from the full
    concatenated log, without touching closed history.

    Plan: closed rows (valid_to NOT NULL) pass through with no exchange;
    open rows union the batch's versions and one LEAD window over that
    small frame re-links the chain.  An open row whose key has no update
    keeps valid_to NULL through the same window (LEAD over a 1-row
    partition is NULL), so no separate anti-join is needed."""
    order_by = [ts_col] + (order_cols or [])
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
