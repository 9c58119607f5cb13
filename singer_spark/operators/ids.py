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


def assign_global_ids(df: DataFrame, order_col: "str | list[str]",
                      id_name: str = "global_id",
                      num_partitions: int | None = None) -> DataFrame:
    """Add a 0-based contiguous id column equal to the row's rank in the
    total order of `order_col` — one column name or a list of them,
    compared lexicographically ascending; the combination must be
    duplicate-free (ids would otherwise be ambiguous across engines and
    runs).  Descending components: negate (numeric) before calling.

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
    order_cols = ([order_col] if isinstance(order_col, str)
                  else list(order_col))
    ranged = df.repartitionByRange(
        *([num_partitions] if num_partitions else []),
        *[F.col(c) for c in order_cols])
    pinned = (ranged.sortWithinPartitions(*order_cols)
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


def corpus_shuffle(docs: DataFrame, salt: str = "shuffle",
                   id_col: str = "doc_id", num_shards: int = 8,
                   num_partitions: int | None = None) -> DataFrame:
    """Deterministic global shuffle for training: every doc gets its rank
    in md5-hash order (`position`) and a round-robin `shard`.

    Pretraining wants the corpus visited in a uniform-random but
    REPRODUCIBLE order (same data + same salt → same batch sequence, for
    restartable/bisectable training runs).  A seeded RDD shuffle is not
    reproducible across partitionings; `ORDER BY rand(seed)` re-rolls
    under retries.  Hashing is: the sort key is md5(salt:id) — stable
    under repartitioning, retries, and engine — and the rank is computed
    with :func:`assign_global_ids`' range-shuffle construction, so there
    is no single-task global sort (the plan that dies at 100 TB).

    `shard = position % num_shards`: round-robin over the hash order
    makes shards equal-sized (±1) AND each shard itself a uniform sample
    of the corpus — downstream per-shard readers see the same
    distribution.  A new salt is a fresh epoch permutation.

    Output: (id_col, position, shard).  The tie-break suffix on the sort
    key (zero-padded id) makes it duplicate-free, which
    assign_global_ids requires for a well-defined rank."""
    key = F.concat(F.md5(F.concat(F.lit(salt + ":"),
                                  F.col(id_col).cast("string"))),
                   F.lit("-"),
                   F.lpad(F.col(id_col).cast("string"), 20, "0"))
    ranked = assign_global_ids(
        docs.select(F.col(id_col), key.alias("_shuffle_key")),
        "_shuffle_key", id_name="position", num_partitions=num_partitions)
    return ranked.select(
        F.col(id_col), F.col("position"),
        (F.col("position") % num_shards).cast("int").alias("shard"))
