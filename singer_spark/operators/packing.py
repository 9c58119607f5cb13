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
                   bucket_width: int = 10_000,
                   count_col: "str | None" = None) -> DataFrame:
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
    ids).

    `count_col` (r12): pack by a PRE-COMPUTED per-doc length instead of
    the raw whitespace token count — e.g. unigram_encode's `n_pieces`,
    the real unit a training batch is cut in; NULLs pack as 0.  The
    text column is then never read."""
    from pyspark import StorageLevel

    n = (F.coalesce(F.col(count_col).cast("bigint"), F.lit(0))
         if count_col else token_count_col(text_col))
    # persisted: consumed twice (bucket totals + per-doc window), and
    # recomputing means re-tokenizing the whole corpus.  ~24 B/doc —
    # columnar-tiny relative to the text it summarizes.
    t = docs.select(F.col(id_col).alias("id"),
                    n.alias("n_tokens"),
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


def pack_manifest(packed: DataFrame, max_len: int = 2048,
                  id_col: str = "doc_id",
                  count_col: str = "n_tokens") -> DataFrame:
    """Per-(window, document) slice manifest from a :func:`pack_sequences`
    layout — the table a dataloader actually consumes: which documents
    compose each fixed-length training window, where each slice starts
    inside its document and inside the window, and how long it is.
    This is the input to packing-aware loss masks (don't attend/score
    across document boundaries inside a window) and to random-access
    window materialization (seek each doc's slice instead of re-scanning
    the corpus).

    For each doc spanning windows first_chunk..last_chunk, one row per
    window it touches:

    - ``chunk_id`` — the window; ``doc_off`` — slice start within the
      document; ``win_off`` — slice start within the window; ``len`` —
      slice length in tokens.  Pure integer arithmetic on the packed
      frame: slice = [max(start_tok, chunk·L), min(start_tok+n, (chunk+1)·L)).

    Invariants (pytest-pinned): per-doc slices concatenate to the whole
    document (Σ len = n_tokens, doc_off contiguous from 0); per-window
    slices tile it exactly (win_off contiguous, Σ len = max_len except
    the final window); zero-token docs emit no rows.

    100 TB shape: one explode of the packed frame — output rows ≈
    total_tokens/max_len + n_docs (each doc adds its window count), the
    same order as the window table itself; no join, no extra shuffle —
    the manifest inherits pack_sequences' partitioning.  Output sorted
    by (chunk_id, win_off) is one exchange if a global layout is wanted;
    this returns it unsorted for the writer to range-partition."""
    L = int(max_len)
    chunk = F.explode(F.sequence(F.col("first_chunk"),
                                 F.col("last_chunk"))).alias("chunk_id")
    e = (packed.filter(F.col(count_col) > 0)
         .select(F.col(id_col), F.col(count_col).alias("_n"),
                 "start_tok", chunk))
    seg_start = F.greatest(F.col("start_tok"), F.col("chunk_id") * L)
    seg_end = F.least(F.col("start_tok") + F.col("_n"),
                      (F.col("chunk_id") + 1) * L)
    return (e.select(
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col(id_col),
        (seg_start - F.col("start_tok")).cast("bigint").alias("doc_off"),
        (seg_start - F.col("chunk_id") * L).cast("bigint").alias("win_off"),
        (seg_end - seg_start).cast("bigint").alias("len")))


def window_boundaries(packed: DataFrame, max_len: int = 2048,
                      id_col: str = "doc_id",
                      count_col: str = "n_tokens") -> DataFrame:
    """Per-WINDOW boundary arrays from a :func:`pack_sequences` layout
    (r13, VERDICT r12 task #6) — :func:`pack_manifest` pivoted into the
    row shape a dataloader collator consumes directly: one row per
    training window with

    - ``doc_ids`` / ``doc_starts`` / ``seg_lens`` — the documents
      composing the window in position order, each slice's start offset
      WITHIN the window, and its length;
    - ``segment_ids`` — the attention-reset mask: position p holds the
      index of the segment that owns it, so block-diagonal attention
      (don't attend across document boundaries) and loss masks are an
      equality test on this array;
    - ``n_docs`` / ``window_len`` — Σ seg_lens; == `max_len` for every
      window except the final partial one.

    Invariants (pytest-pinned, property-tested over random packings):
    doc_starts[0] == 0, doc_starts[k+1] == doc_starts[k] + seg_lens[k]
    (the slices tile the window exactly), segment_ids is non-decreasing
    from 0 to n_docs-1 with segment k occupying exactly seg_lens[k]
    positions.

    100 TB shape: the manifest explode plus ONE shuffle keyed by
    chunk_id (rows ≈ total_tokens/max_len); the per-window arrays are
    built by JVM higher-order functions (sort_array/zip_with/
    array_repeat — no UDF), each row O(window_len) element writes (the
    segment mask is flatten(zip_with(seg_lens, ..., array_repeat)), not
    a per-position ownership scan — r13) and ≤ max_len ints of output —
    the same order as the window tensor itself."""
    m = pack_manifest(packed, max_len=max_len, id_col=id_col,
                      count_col=count_col)
    s = (m.groupBy("chunk_id")
         .agg(F.sort_array(F.collect_list(
             F.struct(F.col("win_off"), F.col(id_col).alias("_id"),
                      F.col("len")))).alias("_s")))
    out = s.select(
        "chunk_id",
        F.size("_s").cast("int").alias("n_docs"),
        F.aggregate("_s.len", F.lit(0).cast("bigint"),
                    lambda a, x: a + x).alias("window_len"),
        F.col("_s._id").alias("doc_ids"),
        F.col("_s.win_off").alias("doc_starts"),
        F.col("_s.len").alias("seg_lens"))
    # segment k owns exactly seg_lens[k] consecutive positions, so the
    # mask is array_repeat(k, seg_lens[k]) per segment, flattened —
    # O(window_len) element writes per row instead of the r13-draft
    # per-position filter scan (O(window_len · n_docs) comparisons).
    # Identical values: for a zero-length slice array_repeat emits
    # nothing, exactly as no position satisfied the old ownership test.
    return out.withColumn(
        "segment_ids",
        F.flatten(F.zip_with(
            F.sequence(F.lit(0), F.size("seg_lens") - 1),
            F.col("seg_lens"),
            lambda k, ln: F.array_repeat(k.cast("int"), ln.cast("int")))))


def bin_boundaries(binned: DataFrame, max_len: int = 2048,
                   id_col: str = "doc_id") -> DataFrame:
    """Per-BIN collator arrays from a :func:`pack_bins` layout (r13) —
    :func:`window_boundaries`' sibling for the padding-minimizing,
    no-document-straddling packing: one row per bin with

    - ``doc_ids`` / ``seg_lens`` / ``doc_starts`` — the whole documents
      placed in the bin in deterministic (n_tokens desc, id asc) order
      (FFD's own placement order), each segment's length, and its start
      offset inside the bin (prefix sums of the lengths);
    - ``fill`` = Σ seg_lens, ``pad`` = max_len − fill (0 for oversize
      singleton bins) — the padding budget a collator allocates;
    - ``n_docs`` / ``oversize_bin``.

    Attention still must not cross document boundaries INSIDE a bin
    (bins hold several whole documents); doc_starts is that reset mask
    in compact form — position p belongs to the last start ≤ p, the
    same equality test :func:`window_boundaries`' segment_ids encodes.

    100 TB shape: one shuffle keyed by bin_id (rows = number of bins ≈
    total_tokens/max_len), arrays built by JVM sort_array / aggregate
    (no UDF), ≤ docs-per-bin entries each."""
    L = int(max_len)
    s = (binned.groupBy("bin_id")
         .agg(F.sort_array(F.collect_list(F.struct(
             (-F.col("n_tokens")).alias("_negn"),
             F.col(id_col).alias("_id"),
             F.col("n_tokens").alias("_n"),
             F.col("oversize")))).alias("_s")))
    # prefix sums of the ordered lengths -> per-doc start offsets
    starts = F.expr(
        "slice(aggregate(_s, array(cast(0 as bigint)),"
        "  (acc, x) -> concat(acc, array(element_at(acc, -1) + x._n))),"
        " 1, size(_s))")
    fill = F.aggregate("_s._n", F.lit(0).cast("bigint"),
                       lambda a, x: a + x)
    return (s.select(
        F.col("bin_id").cast("bigint").alias("bin_id"),
        F.size("_s").cast("int").alias("n_docs"),
        fill.alias("fill"),
        F.greatest(F.lit(0).cast("bigint"),
                   F.lit(L) - fill).alias("pad"),
        F.array_max("_s.oversize").alias("oversize_bin"),
        F.col("_s._id").alias("doc_ids"),
        F.col("_s._n").alias("seg_lens"),
        starts.alias("doc_starts")))


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


# ---------------------------------------------------------------------------
# Bin packing ("packing without cross-document contamination")
# ---------------------------------------------------------------------------
def ffd_reference(lengths: "list[tuple[int, int]]",
                  max_len: int) -> "dict[int, int]":
    """Per-item first-fit-decreasing of (id, n_tokens) pairs — the
    INDEPENDENT reference the histogram solver is pytest-pinned against:
    items sorted by (length DESC, id ASC), each placed into the
    lowest-created bin with room; an item longer than `max_len` always
    opens its own bin.  Returns {id: bin_index} with bins numbered in
    creation order.  O(n·bins) — test-sized corpora only."""
    bins: list[int] = []  # residual capacity per bin, creation order
    out: dict[int, int] = {}
    for did, ln in sorted(lengths, key=lambda x: (-x[1], x[0])):
        if ln > max_len:
            bins.append(0)
            out[did] = len(bins) - 1
            continue
        for i, r in enumerate(bins):
            if r >= ln:
                bins[i] = r - ln
                out[did] = i
                break
        else:
            bins.append(max_len - ln)
            out[did] = len(bins) - 1
    return out


def ffd_histogram_solve(hist: "list[tuple[int, int]]", max_len: int
                        ) -> "tuple[list[tuple[int, int, int, int, int]], int]":
    """First-fit-decreasing solved over the LENGTH HISTOGRAM — the
    Graphcore-style packing solve (Krell et al. 2021 §4: histogram in,
    assignment strategies out; cost depends on DISTINCT lengths
    (≤ max_len in practice), never corpus size).  Exactly replicates
    per-item FFD (ffd_reference, pytest-pinned): bins of identical
    residual history stay contiguous runs in creation order, and fills
    always consume a PREFIX of a run, so every placement compresses to
    a closed-form run.

    Returns (runs, n_bins) where each run (length, rank_start,
    bin_start, slots_per_bin, n_ranks) maps the ranks [rank_start,
    rank_start + n_ranks) of that length's id-ordered documents to bins
    bin_start + (rank - rank_start) // slots_per_bin."""
    # open-bin runs in creation (== position) order:
    # [residual, start_pos, n_instances]
    types: list[list[int]] = []
    runs: list[tuple[int, int, int, int, int]] = []
    next_pos = 0
    for length, count in sorted(hist, key=lambda x: -x[0]):
        L, c = int(length), int(count)
        rank = 0
        while c > 0:
            hit = None
            for idx, t in enumerate(types):
                if t[0] >= L:
                    hit = idx
                    break
            if hit is None:
                per = max(max_len // L, 1)  # oversize L -> singleton bins
                full, rem = divmod(c, per)
                if full:
                    runs.append((L, rank, next_pos, per, full * per))
                    types.append([max(max_len - per * L, 0),
                                  next_pos, full])
                    next_pos += full
                    rank += full * per
                if rem:
                    runs.append((L, rank, next_pos, rem, rem))
                    types.append([max_len - rem * L, next_pos, 1])
                    next_pos += 1
                    rank += rem
                c = 0
                continue
            R, S, n = types[hit]
            s = R // L  # >= 1
            m = min(c // s, n)
            if m:
                runs.append((L, rank, S, s, m * s))
                rank += m * s
                c -= m * s
                filled = [R - s * L, S, m]
                if m == n:
                    types[hit] = filled
                else:
                    types[hit] = [R, S + m, n - m]
                    types.insert(hit, filled)
            else:
                # fewer items than one instance takes: partial fill of
                # the run's first instance
                runs.append((L, rank, S, c, c))
                rank += c
                filled = [R - c * L, S, 1]
                if n == 1:
                    types[hit] = filled
                else:
                    types[hit] = [R, S + 1, n - 1]
                    types.insert(hit, filled)
                c = 0
    return runs, next_pos


def pack_bins(docs: DataFrame, max_len: int = 2048,
              text_col: str = "text", id_col: str = "doc_id",
              bucket_width: int = 10_000) -> DataFrame:
    """Bin-packed sequence layout — the padding-minimizing alternative to
    concat-and-chunk (:func:`pack_sequences`): each document lands WHOLE
    in exactly one `max_len`-token bin, no window ever mixes a document
    boundary, the "packing without cross-document contamination" recipe
    (Krell et al. 2021).  First-fit-decreasing, fully deterministic.

    100 TB shape: the pack is SOLVED ON THE LENGTH HISTOGRAM — one
    groupBy(n_tokens) whose result is ≤ max_len rows regardless of
    corpus size — and the driver solve (ffd_histogram_solve, cost in
    distinct lengths, not documents) emits a bounded run table that
    broadcasts back; each doc then computes its bin with integer
    arithmetic from its rank within its length group.  Ranks use the
    pack_sequences bucket discipline: per-(length, id-bucket) totals
    collect (bounded), windows partition by (length, bucket) — no
    global or single-length-task window.  Docs longer than max_len get
    singleton bins (flagged); NULL-text docs are excluded.

    Output: (id, n_tokens, bin_id, oversize)."""
    from pyspark.sql.window import Window as W

    from singer_spark.functions import maybe_persist

    t = maybe_persist(
        docs.select(F.col(id_col).alias("id"),
                    token_count_col(text_col).alias("n_tokens"),
                    _bucket_col(id_col, bucket_width).alias("bucket"))
        .where(F.col("n_tokens") >= 1), True)

    hist = [(r["n_tokens"], r["cnt"]) for r in
            t.groupBy("n_tokens").agg(F.count("*").alias("cnt")).collect()]
    runs, _ = ffd_histogram_solve(hist, max_len)
    spark = docs.sparkSession
    runs_df = spark.createDataFrame(
        runs, "len bigint, rank_start bigint, bin_start bigint,"
              " slots bigint, n_ranks bigint")

    # rank within the length group, bucketed (single-length Zipf spikes
    # never serialize into one window task).  The running bucket offsets
    # are a DISTRIBUTED cumsum over the (length, bucket) totals frame —
    # per-length windows over #buckets rows, nothing driver-sized: at
    # 10^11 docs the totals frame is lengths × buckets rows, far too big
    # to collect (the pack_sequences driver hop is safe only because its
    # frame is #buckets alone)
    wb = (W.partitionBy("n_tokens").orderBy("bucket")
          .rowsBetween(W.unboundedPreceding, -1))
    offs_df = (t.groupBy("n_tokens", "bucket")
               .agg(F.count("*").alias("n"))
               .select("n_tokens", "bucket",
                       F.coalesce(F.sum("n").over(wb), F.lit(0))
                       .alias("off")))
    w = (W.partitionBy("n_tokens", "bucket").orderBy("id")
         .rowsBetween(W.unboundedPreceding, -1))
    # no broadcast hint: offs_df is lengths x buckets rows — AQE
    # broadcasts it at fixture scale and shuffle-joins when it grows
    ranked = (t.join(offs_df, ["n_tokens", "bucket"], "left")
              .withColumn("rank",
                          F.coalesce(F.count("*").over(w), F.lit(0))
                          + F.coalesce(F.col("off"), F.lit(0))))
    joined = ranked.join(
        F.broadcast(runs_df),
        (F.col("n_tokens") == F.col("len"))
        & (F.col("rank") >= F.col("rank_start"))
        & (F.col("rank") < F.col("rank_start") + F.col("n_ranks")))
    return joined.select(
        F.col("id").alias(id_col), "n_tokens",
        (F.col("bin_start")
         + F.floor((F.col("rank") - F.col("rank_start")) / F.col("slots"))
         ).cast("bigint").alias("bin_id"),
        (F.col("n_tokens") > max_len).alias("oversize"))


def pack_bins_audit(docs: DataFrame, max_len: int = 2048,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Self-verifying pack_bins summary (the KMV/wordpiece discipline:
    the bin layout itself is not SQL-expressible — FFD is sequential —
    so the query recomputes every SQL-checkable invariant in-plan and
    emits booleans the oracle pins true, alongside exact aggregates the
    oracle derives independently):

    - docs_conserved: every non-NULL-text doc assigned exactly one bin
    - all_bins_fit: every bin holds ≤ max_len tokens, except singleton
      oversize bins (exactly one doc, itself longer than max_len)
    - anyfit_bound_ok: regular bins ≤ ceil(2·tokens/max_len) + 1 (the
      any-fit guarantee: at most one open bin is ever ≤ half full) and
      oversize bins == oversize docs

    Output 1 row: (n_docs, total_tokens, n_oversize, docs_conserved,
    all_bins_fit, anyfit_bound_ok)."""
    from singer_spark.functions import maybe_persist

    # registered persist: long-lived drivers drain via
    # release_cache_handles (ADVICE r7 #4 discipline)
    p = maybe_persist(pack_bins(docs, max_len, text_col, id_col), True)
    bins = p.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.count("*").alias("nd"),
        F.max(F.col("oversize").cast("int")).alias("has_over"))
    binagg = bins.agg(
        F.count("*").alias("n_bins"),
        F.sum(F.when((F.col("fill") > max_len)
                     & ~((F.col("nd") == 1) & (F.col("has_over") == 1)),
                     1).otherwise(0)).alias("bad_bins"),
        F.sum(F.when(F.col("has_over") == 1, 1).otherwise(0))
         .alias("over_bins"))
    # every aggregate coalesced: on a zero-eligible corpus (all NULL
    # text) the sums are NULL and the booleans must still read
    # true/0 exactly like the oracle's literals
    pagg = p.agg(
        F.count("*").alias("n_assigned"),
        F.countDistinct(id_col).alias("n_distinct_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
        F.coalesce(F.sum(F.col("oversize").cast("int")), F.lit(0))
         .alias("n_oversize"))
    base = docs.agg(
        F.coalesce(F.sum(F.when(token_count_col(text_col) >= 1, 1)
                         .otherwise(0)), F.lit(0)).alias("n_eligible"))
    n_bins = F.coalesce(F.col("n_bins"), F.lit(0))
    bad_bins = F.coalesce(F.col("bad_bins"), F.lit(0))
    over_bins = F.coalesce(F.col("over_bins"), F.lit(0))
    reg_tokens = F.col("total_tokens")  # oversize tokens only loosen it
    bound = F.ceil(F.lit(2) * reg_tokens / max_len) + 1 + over_bins
    return (pagg.crossJoin(F.broadcast(binagg))
            .crossJoin(F.broadcast(base))
            .select(
                F.col("n_eligible").cast("bigint").alias("n_docs"),
                F.col("total_tokens").cast("bigint").alias("total_tokens"),
                F.col("n_oversize").cast("bigint").alias("n_oversize"),
                ((F.col("n_assigned") == F.col("n_eligible"))
                 & (F.col("n_distinct_docs") == F.col("n_eligible")))
                .alias("docs_conserved"),
                (bad_bins == 0).alias("all_bins_fit"),
                ((n_bins <= bound)
                 & (over_bins == F.col("n_oversize")))
                .alias("anyfit_bound_ok")))
