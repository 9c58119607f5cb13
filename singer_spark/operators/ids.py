"""Distributed contiguous ID assignment.

`row_number() OVER (ORDER BY key)` is the SQL answer, but a global window
is a SINGLE sort partition — one task sorts the entire corpus, which is
exactly the plan that cannot survive a 100× scale-up.  This module computes
the same ids with a range shuffle plus per-partition offsets (the
zipWithIndex construction, expressed over DataFrames + one Arrow pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_global_ids(df: DataFrame, order_col: str,
                      id_name: str = "global_id",
                      num_partitions: int | None = None) -> DataFrame:
    """Add a 0-based contiguous id column equal to the row's rank in the
    total order of `order_col` (which must be duplicate-free — ids would
    otherwise be ambiguous across engines and runs).

    Construction (the zipWithIndex shape):

    1. Range-partition on `order_col` (partition p's keys all precede
       partition p+1's) and sort within partitions — ONE shuffle, sort
       work distributed across partitions.
    2. Pin the materialization with an eager localCheckpoint: range
       boundaries come from sampling, so an unpinned recompute could
       place rows differently between the count pass and the id pass.
    3. Count rows per partition — a |partitions|-row aggregate to the
       driver — and prefix-sum the starts.
    4. One Arrow `mapInPandas` pass adds `start[pid] + local position`.
       No second shuffle, no per-partition window sort: rows already
       arrive range-ordered, the pass is a counter.

    Compare: the global-window plan funnels the corpus through one task;
    this plan's largest single-task unit is one range partition.

    Output: df's columns + `id_name` (bigint)."""
    ranged = df.repartitionByRange(
        *([num_partitions] if num_partitions else []), F.col(order_col))
    pinned = (ranged.sortWithinPartitions(order_col)
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint(eager=True))
    counts = {row["_pid"]: row["n"]
              for row in pinned.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    starts = {}
    cum = 0
    for pid in sorted(counts):
        starts[pid] = cum
        cum += counts[pid]

    from pyspark.sql.types import LongType

    schema = pinned.drop("_pid").schema.add(id_name, LongType(), False)

    def add_ids(batches):
        import pandas as pd  # noqa: F401 — executors deserialize lazily

        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = starts[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[id_name] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return pinned.mapInPandas(add_ids, schema)
