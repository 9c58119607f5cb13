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
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


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
