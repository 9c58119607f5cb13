"""Distribution diagnostics for join/agg keys.

The pre-flight check of the skew workflow: every big join or aggregation
shuffles on its keys, and ONE hot key serializes its whole sort-group onto
one task no matter how many executors exist (AQE splits oversized
partitions, but cannot split a single key's group).  The report below is
what decides between a plain join, `operators.joins.salted_join`, or a
broadcast — measured, not guessed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from singer_spark.functions import qround


def key_skew_report(df: DataFrame, key_cols: list[str] | str,
                    top_n: int = 20) -> DataFrame:
    """Top-N keys by row count with their share of the table and their
    ratio to the mean per-key count — the two numbers that size a salting
    decision (a key at ratio r needs ~ceil(r) salt buckets to level its
    sort-group with the average task).

    Plan shape at 100 TB: one partial-agg shuffle keyed on the key columns
    (map-side combine collapses rows to one partial count per key per
    task); the totals reduce from the already-aggregated key frame, and
    only key-count rows — never data rows — reach the final top-N sort.

    Output: (key, n, share, ratio_to_avg) ordered by n desc, key asc."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    key_expr = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    counts = (df.select(key_expr.alias("key"))
              .groupBy("key").agg(F.count("*").alias("n")))
    totals = counts.agg(F.sum("n").alias("_total"),
                        F.avg("n").alias("_avg"))
    return (counts.crossJoin(F.broadcast(totals))
            .select("key", "n",
                    qround(F.col("n") / F.col("_total"), 6).alias("share"),
                    qround(F.col("n") / F.col("_avg"), 4).alias("ratio_to_avg"))
            .orderBy(F.col("n").desc(), F.col("key").asc())
            .limit(top_n))
