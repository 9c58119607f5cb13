"""Sequence packing for training-data pipelines.

LLM pretraining consumes a corpus as ONE token stream cut into fixed-length
windows ("concat-and-chunk" packing): documents are concatenated in a
deterministic order and the stream is sliced every `max_len` tokens.  The
per-document question is *where in the stream do my tokens land* — a global
prefix sum of token counts, which naively is a single-task
`Window.orderBy(...)` sort.  This module computes it scalably:

1. bucket each doc by its sortable id (fixed width for dense ids, or
   approxQuantile boundaries for skewed/sparse ids),
2. one tiny aggregation produces per-bucket token totals; the running
   bucket offsets are computed on the driver (#buckets rows, not #docs)
   and broadcast back as a literal map,
3. a Window partitioned BY BUCKET (bounded work per task) adds the
   within-bucket cumulative sum to the bucket's offset.

No global sort, no single-task window: the only shuffles are the per-bucket
aggregation and the per-bucket window, both keyed on the bucket id.

Reference scope note: the reference system (a log-shipping agent) has no
packing operator — this extends the engine toward the training-data
pipeline surface, like operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def token_count_col(text_col: str = "text"):
    """Whitespace token count — matches
    `coalesce(length(string_split(text, ' ')), 0)` on the SQL side so
    packing layouts are oracle-checkable.  NULL text counts 0 tokens
    (a NULL here would poison the running-offset prefix sum's derived
    chunk columns differently on each engine — r8 NULL harness)."""
    return F.coalesce(F.size(F.split(F.col(text_col), " ")), F.lit(0))


def _bucket_col(id_col: str, bucket_width: int):
    return (F.col(id_col) / F.lit(bucket_width)).cast("bigint")


def pack_sequences(docs: DataFrame, max_len: int = 2048,
                   text_col: str = "text", id_col: str = "doc_id",
                   bucket_width: int = 10_000) -> DataFrame:
    """Concat-and-chunk packing layout: for each document, its global token
    offset and the chunk (training-window) range it lands in when the
    corpus is concatenated in `id_col` order and cut every `max_len`
    tokens.

    Output: (id, n_tokens, start_tok, first_chunk, last_chunk, n_chunks,
    offset_in_first_chunk).  A doc with first_chunk != last_chunk straddles
    a window boundary — the packing-aware loss masks handle that downstream.

    `bucket_width` groups ids into prefix-sum buckets: per-bucket totals
    are a #buckets-row aggregate (collected — thousands of rows at 100 TB,
    not documents), and the per-doc cumsum windows over one bucket at a
    time.  Dense integer ids are the common case; for sparse/skewed ids
    pass a pre-bucketized frame or re-id first (dedup_clusters emits dense
    ids)."""
    from pyspark import StorageLevel

    # persisted: consumed twice (bucket totals + per-doc window), and
    # recomputing means re-tokenizing the whole corpus.  ~24 B/doc —
    # columnar-tiny relative to the text it summarizes.
    t = docs.select(F.col(id_col).alias("id"),
                    token_count_col(text_col).alias("n_tokens"),
                    _bucket_col(id_col, bucket_width).alias("bucket")) \
        .persist(StorageLevel.MEMORY_AND_DISK)

    # per-bucket totals -> running offsets, driver-side over #buckets rows
    # (thousands at 100 TB — documents never leave the executors), shipped
    # back as a broadcast-joined frame: a literal map would bloat the plan
    # at large bucket counts
    totals = (t.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_total"))
              .orderBy("bucket").collect())
    rows, running = [], 0
    for row in totals:
        rows.append((int(row["bucket"]), running))
        running += int(row["bucket_total"])
    offsets_df = docs.sparkSession.createDataFrame(
        rows or [(0, 0)], "bucket bigint, bucket_offset bigint")

    w = Window.partitionBy("bucket").orderBy("id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    out = (
        t.join(F.broadcast(offsets_df), "bucket", "left")
        .withColumn("start_tok",
                    F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
                    + F.coalesce(F.col("bucket_offset"), F.lit(0)))
    )
    end_tok = F.col("start_tok") + F.col("n_tokens")  # exclusive
    return out.select(
        F.col("id").alias(id_col),
        "n_tokens",
        "start_tok",
        F.floor(F.col("start_tok") / max_len).cast("bigint").alias("first_chunk"),
        F.floor((end_tok - 1) / max_len).cast("bigint").alias("last_chunk"),
        (F.floor((end_tok - 1) / max_len) - F.floor(F.col("start_tok") / max_len) + 1)
        .cast("bigint").alias("n_chunks"),
        (F.col("start_tok") % max_len).cast("bigint").alias("offset_in_first_chunk"),
    )


def packing_stats(packed: DataFrame, max_len: int = 2048) -> DataFrame:
    """Corpus-level packing summary: total tokens, number of training
    windows, boundary-straddling doc fraction — the sanity dashboard row a
    packing job emits."""
    return packed.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / max_len).cast("bigint").alias("n_windows"),
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_chunks") > 1, 1).otherwise(0)).alias("n_straddling"),
    )
