"""Bucketed-table helpers — the co-located-join path for 100 TB fact⋈fact
joins.

A shuffle join on two large tables moves BOTH sides across the network every
time the join runs.  Writing each side bucketed (`bucketBy(n, key)` +
`sortBy`) pins rows to hash buckets on disk, so every later equi-join or
aggregation on the bucket key runs with NO exchange: Spark aligns bucket i
of one table with bucket i of the other.  For pipelines that join the same
fact tables daily (lineitem⋈orders-shaped joins, fingerprint tables,
inverted lists keyed by cluster id), this converts the dominant recurring
shuffle into a one-time write cost.

Bucketed tables require the session catalog (`saveAsTable`), which works on
the local Derby metastore in tests and on any Hive/Glue metastore in
production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str] | str,
                   num_buckets: int = 32, sort: bool = True,
                   fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Persist `df` as a bucketed (and bucket-sorted) catalog table.

    `num_buckets` should divide evenly into the executor count you join
    with; at 100 TB pick buckets so one bucket's rows fit an executor's
    memory (rows/bucket = table_rows / num_buckets)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if mode == "overwrite":
        _clear_orphaned_location(df.sparkSession, table)
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def _clear_orphaned_location(spark: SparkSession, table: str) -> None:
    """Remove a stale default-warehouse location for `table` when the
    CURRENT catalog has no such table.

    An interrupted process can leave `spark-warehouse/<table>` on disk
    with no catalog entry (each session starts a fresh in-memory/Derby
    catalog, so the dir is invisible to `DROP TABLE IF EXISTS`), and the
    next `saveAsTable` then refuses with LOCATION_ALREADY_EXISTS even in
    overwrite mode — overwrite replaces catalog tables, not orphan dirs.
    Scope is deliberately narrow: unqualified table names, local-fs
    warehouse, and ONLY when the catalog does not know the table (a
    cataloged table's location is saveAsTable's own responsibility).

    The warehouse-root dir `spark-warehouse/<t>` belongs to DEFAULT.t;
    an unqualified `tableExists(t)` checks only the CURRENT database, so
    with a persistent metastore and `USE otherdb` in effect the probe
    could miss a live default.t and delete its data (ADVICE r11 #2) —
    hence the extra guards: never touch the dir while the current
    database is non-default OR default.<t> is cataloged."""
    if "." in table or spark.catalog.tableExists(table):
        return
    if spark.catalog.currentDatabase() != "default" \
            or spark.catalog.tableExists(f"default.{table}"):
        return
    import os
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    elif "://" in warehouse:  # non-local warehouse: nothing to clean here
        return
    loc = os.path.join(warehouse, table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def bucketed_join_is_shuffle_free(spark: SparkSession, left: str, right: str,
                                  on: str) -> bool:
    """True when joining the two bucketed tables on `on` plans without any
    SHUFFLE exchange (`Exchange hashpartitioning`) — the verifiable
    co-location property; use in tests/CI to catch bucket-spec drift.

    A BroadcastExchange may still appear when one side is tiny enough to
    broadcast (the planner then ignores bucketing because broadcasting is
    cheaper) — that is not a co-location failure, so measure with
    autoBroadcastJoinThreshold=-1 to see the bucketed path itself."""
    plan = (spark.table(left).join(spark.table(right), on)
            ._jdf.queryExecution().executedPlan().toString())
    return "Exchange hashpartitioning" not in plan
