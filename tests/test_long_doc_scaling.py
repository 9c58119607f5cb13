"""Long-input linearity guards for the shingle/chunk/segment family.

Catalyst does no common-subexpression elimination inside higher-order-
function lambdas and interpreted `Slice` copies its whole input per call,
so the natural `transform(sequence(...), i -> slice(arr, i, k))` shingle
loop is O(n²): a 120k-element hot key or 100k-token document wedges its
task for hours.  The operators were rewritten round 5 (kgram_join_col /
strided_join_col / chunk membership explode); these tests pin the rewrite
by pushing inputs where the quadratic form would need ~10^10 element
copies — if a regression reintroduces it, this module times out instead
of passing slowly.

Correctness at the same time: outputs are checked against a pure-Python
recomputation on a smaller doc, so the rewrite can't drift semantics.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

N_TOKENS = 60_000  # quadratic form: ~3.6e9 element copies → hours


def _long_doc(spark, n=N_TOKENS):
    # tokens "t0 t1 t2 ..." — unique so shingle dedup keeps everything
    return spark.range(1).select(
        F.lit(1).alias("doc_id"),
        F.array_join(F.transform(F.sequence(F.lit(0), F.lit(n - 1)),
                                 lambda i: F.concat(F.lit("t"), i)), " ")
        .alias("text"))


def test_shingles_linear_on_long_doc(spark):
    from singer_spark.operators.dedup import shingle_frame

    t0 = time.time()
    row = shingle_frame(_long_doc(spark), "text", "doc_id", k=4).collect()[0]
    assert row["n"] == N_TOKENS - 3
    assert time.time() - t0 < 120


def test_chunking_linear_on_long_doc(spark):
    from singer_spark.operators.text_analysis import chunk_documents

    t0 = time.time()
    rows = chunk_documents(_long_doc(spark), window=128, overlap=32).collect()
    stride = 128 - 32
    want_chunks = -(-(N_TOKENS - 32) // stride)
    assert len(rows) == want_chunks
    assert sum(r["n_tokens"] for r in rows) == N_TOKENS + 32 * (want_chunks - 1)
    assert time.time() - t0 < 120


def test_segment_dedup_linear_on_long_doc(spark):
    from singer_spark.operators.dedup import segment_dedup

    t0 = time.time()
    row = segment_dedup(_long_doc(spark), words_per_segment=20).collect()[0]
    assert row["n_segments"] == -(-N_TOKENS // 20)
    assert row["n_kept"] == row["n_segments"]  # all tokens unique
    assert len(row["text"].split(" ")) == N_TOKENS
    assert time.time() - t0 < 120


def test_chunking_matches_python_reference(spark):
    from singer_spark.operators.text_analysis import chunk_documents

    toks = [f"w{i}" for i in range(301)]
    docs = spark.createDataFrame([(7, " ".join(toks)), (8, "")],
                                 "doc_id bigint, text string")
    got = {(r["doc_id"], r["chunk_idx"]):
           (r["start_token"], r["n_tokens"], r["chunk"])
           for r in chunk_documents(docs, window=128, overlap=32).collect()}
    stride = 96
    want = {}
    n_chunks = max(-(-(301 - 32) // stride), 1)
    for i in range(n_chunks):
        seg = toks[i * stride: i * stride + 128]
        want[(7, i)] = (i * stride, len(seg), " ".join(seg))
    want[(8, 0)] = (0, 0, "")
    assert got == want


def test_segments_match_python_reference(spark):
    from singer_spark.operators.dedup import segment_dedup

    toks = [f"w{i}" for i in range(60)] + [f"w{i}" for i in range(20)]
    # doc repeats its first segment (w0..w19) as segment 3 → tail copy cut
    docs = spark.createDataFrame([(1, " ".join(toks))],
                                 "doc_id bigint, text string")
    row = segment_dedup(docs, words_per_segment=20).collect()[0]
    assert row["n_segments"] == 4
    assert row["n_kept"] == 3
    # kept: segments 0,1,2 (the tail segment 3 == segment 0 is dropped)
    assert row["text"] == " ".join(toks[:60])


def test_heavy_hitters_vectorized_on_wide_stream(spark):
    """Pin the vectorized Misra-Gries kernel (chunked value_counts +
    mergeable-summaries prune).  20M tokens with a mostly-unique tail and
    capacity 1000 force constant eviction pressure: the round-5 per-token
    Python dict loop pays O(capacity) per eviction (~2e10 ops — hours);
    the vectorized kernel prunes once per Arrow chunk.  Output must still
    equal the exact groupBy (the candidate-superset + recount contract)."""
    from singer_spark.operators.diagnostics import heavy_hitters

    n = 20_000_000
    toks = spark.range(n).select(
        F.when(F.col("id") % 100 < 5,
               F.concat(F.lit("hot"), (F.col("id") % 100).cast("string")))
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("token"))
    t0 = time.time()
    got = {(r.item, r.n) for r in
           heavy_hitters(toks, "token", min_share=0.005,
                         capacity=1000).collect()}
    elapsed = time.time() - t0
    want = {(f"hot{i}", n // 100) for i in range(5)}
    assert got == want
    assert elapsed < 120, f"MG nomination took {elapsed:.0f}s — per-token loop is back?"
