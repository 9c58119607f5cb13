"""Deduplication operators for large-scale text corpora.

Designed for the 100 TB regime:

- exact dedup        one hash-shuffle on a 16-byte digest (not the full text)
- n-gram Jaccard     inverted-index co-occurrence (PPJoin-style counting):
                     posting lists capped at `max_shingle_df` docs emit
                     candidate pairs map-side and their count IS the
                     cold-shingle intersection; the (tiny) hot-shingle set
                     is intersected separately per pair, so scores are
                     exact while per-doc shingle arrays never shuffle
- MinHash + LSH      constant-size signatures (k hashes) per doc, banded
                     into buckets; the only wide shuffle is on band keys;
                     verification shares the candidate-array join (the
                     corpus is shingle-exploded exactly once)
- SimHash            one 60-bit signature per doc; candidates via the
                     multi-index pigeonhole: (max_hamming + 2) blocks,
                     join key = a PAIR of blocks (C(B,2) combos × 24-bit
                     values) — key space 10 × 2²⁴, so bucket sizes stay
                     ~N/10·2²⁴ and a bucket-size guard caps degenerate
                     buckets; verify = popcount(xor) — cheap
- embedding near-dup cosine > threshold via the similarity module

Every hash is the cross-engine-reproducible md5-based 60-bit hash
(singer_spark.functions.md5_int) so results verify bit-for-bit against an
ANSI-SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from singer_spark.functions import (fan_out, kgram_join_col, maybe_persist,
                                    md5_int, qround, windowed_join)


def tokens_col(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def raw_shingles_col(text_col: str = "text", k: int = 4):
    """All k-word shingles in order (duplicates kept); a doc shorter than
    k words yields its full text as the single shingle; NULL text yields
    NO shingles — the otherwise-branch used to produce [NULL], which
    Spark's groupBy keeps as a posting list (two NULL-text docs became a
    candidate pair) while every DuckDB oracle's unnest drops it (caught
    by the NULL-corpus conformance harness, r8).  Built with
    `kgram_join_col` (zip-shift, O(n·k) per row) — the natural
    slice-per-position loop re-evaluates the token expression inside every
    lambda call and is quadratic on long documents."""
    toks = tokens_col(text_col)
    return F.when(toks.isNull(), F.array().cast("array<string>")) \
            .when(F.size(toks) >= k, kgram_join_col(toks, k, " ")) \
            .otherwise(F.array(F.array_join(toks, " ")))


def shingles_col(text_col: str = "text", k: int = 4):
    """Distinct k-word shingles."""
    return F.array_distinct(raw_shingles_col(text_col, k))


def hashed_shingles_col(text_col: str = "text", k: int = 4):
    """Distinct md5_int-hashed k-shingles — THE shingle/hash discipline
    every set-similarity operator and the shared SQL oracle CTE
    (_SH_CTE) must agree on; one definition so they cannot diverge."""
    return F.array_distinct(F.transform(raw_shingles_col(text_col, k),
                                        lambda s: md5_int(s)))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group on md5(text); keep the lowest id as the canonical survivor.
    Shuffles 16-byte digests + ids only — at 100 TB the shuffle is ~32 B/doc
    regardless of document size, and AQE coalesces the post-agg partitions."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("sig"))
        .groupBy("sig")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "sig", "n_copies")
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard set-similarity join
# ---------------------------------------------------------------------------
def shingle_frame(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 4) -> DataFrame:
    """(id, shingles: array<bigint>, n) — the md5-hashed distinct k-shingle
    set per doc, computed in one narrow pass.  Blocking explodes this once;
    verification joins the arrays back by id (candidate-proportional, no
    second explode).

    Shingles are 60-bit `md5_int` hashes, not strings: grouping and
    intersecting fixed-width ints is several× cheaper than ~25-byte UTF-8
    shingles, the shuffle shrinks accordingly, and minhash consumes the very
    same hash as its base.  Jaccard over the hashed sets equals Jaccard over
    the string sets up to md5 collisions (~n²/2⁶⁰ per doc — negligible), and
    the SQL oracle hashes identically, so results stay bit-identical.
    (Distinct applies once, on the hashes — distinct-of-hashes equals
    hash-of-distinct up to the same collision bound.)"""
    return fan_out(docs).select(
        F.col(id_col).alias("id"),
        hashed_shingles_col(text_col, k).alias("shingles")
    ).withColumn("n", F.size("shingles"))


def _verify_jaccard(candidates: DataFrame, base: DataFrame,
                    threshold: float) -> DataFrame:
    """Exact Jaccard over candidate pairs: join the per-doc shingle arrays by
    id and intersect them JVM-side.  Cost ∝ |candidates| — at 100 TB this is
    the cheap half; the corpus-wide explode happens exactly once, in blocking.

    Output: (id_a, id_b, jaccard) with jaccard quantize-rounded to 4 digits."""
    va = base.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"),
                     F.col("n").alias("n_a"))
    vb = base.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"),
                     F.col("n").alias("n_b"))
    shared = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = shared / (F.col("n_a") + F.col("n_b") - shared)
    return (
        candidates.join(va, "id_a").join(vb, "id_b")
        .withColumn("jaccard", qround(jac, 4))
        .filter(jac >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# cache helper shared across operators — see functions.maybe_persist for
# the lifecycle contract (CacheManager holds it until clearCache; callers
# in long-lived drivers clear between increments)
_maybe_persist = maybe_persist


def _pairs_col():
    """Candidate pairs a df-class contributes: n_lists * C(df, 2)."""
    return F.col("n_lists") * F.col("df") * (F.col("df") - 1) / 2


def _df_hist(dfs: DataFrame, max_shingle_df: int) -> DataFrame:
    """(df, n_lists) histogram from any frame with a `df` column,
    restricted to the candidate-generating classes 2 <= df <= cap."""
    return (dfs.where((F.col("df") >= 2) & (F.col("df") <= max_shingle_df))
            .groupBy("df").agg(F.count("*").alias("n_lists")))


def _pair_budget_threshold(hist: DataFrame, pair_budget: int) -> DataFrame:
    """One-row (_thr) frame from a :func:`_df_hist` histogram: the
    largest df cap t such that candidate generation from all lists with
    2 <= df <= t stays within `pair_budget` total pairs.  The histogram
    is <= max_shingle_df rows, so the global-order cumsum window runs on
    a frame that fits one task by construction (same shape as streaming
    mg_merge's rank).  Callers collect the one-row result eagerly: one
    aggregation job at build time, so the main plan keeps the uncapped
    shape instead of replicating this subtree under every consumer.
    This function is the ONE copy of the budget rule — the capped
    operators and :func:`shingle_pair_budget_report` both route through
    it, so they cannot drift apart."""
    from pyspark.sql.window import Window

    # A PLAIN global window, on purpose: the histogram is bounded by
    # construction (<= max_shingle_df rows — one per df class), so the
    # single WindowExec task holds a few hundred rows at ANY corpus
    # size.  Earlier rounds masked the "No Partition Defined" warning by
    # partitioning on `df % 1`; that hid the shape from log greps while
    # changing nothing — the mechanical n_global_window counter in
    # tools/plan_audit.py now counts the shape structurally and
    # test_plan_invariants allowlists this bounded frame explicitly.
    w = (Window.orderBy("df")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = hist.withColumn("cum_pairs", F.sum(_pairs_col()).over(w))
    return (cum.where(F.col("cum_pairs") <= pair_budget)
            .agg(F.coalesce(F.max("df"), F.lit(1)).alias("_thr")))


def shingle_cooccurrence(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                         k: int = 4, max_shingle_df: int = 256,
                         pair_budget: int | None = None,
                         base: DataFrame | None = None) -> DataFrame:
    """(id_a, id_b, shared, n_a, n_b) for every candidate pair — the shared
    inverted-index core under :func:`ngram_jaccard_pairs` and
    :func:`overlap_pairs` (any set-similarity metric is a cheap expression
    over these five columns).

    Inverted-index co-occurrence form (the PPJoin family's counting step):
    intersection sizes fall out of the index itself, so the per-doc shingle
    ARRAYS are never shuffled or joined — the wide data moves once, as
    (shingle, id) rows.

    - One explode + one groupBy(shingle) builds posting lists.
    - Hot-shingle guard: lists longer than `max_shingle_df` are excluded
      from candidate generation (one ubiquitous 4-gram would otherwise
      create a single O(df²) bucket — quadratic and skewed at corpus
      scale).
    - Cold lists emit (id_a, id_b) map-side; `groupBy(pair).count()` IS the
      cold-shingle intersection size — no verification join over arrays.
    - Exactness is restored for the hot shingles separately: the hot set is
      tiny by construction (≤ |shingles|/cap lists), so each doc carries a
      small `hot` array (from the SAME grouped frame — the exchange is
      reused) and pairs add `|intersect(hot_a, hot_b)|`.
    - Set sizes `n` come from a narrow `size(array_distinct(...))` over the
      raw shingles — no second hashing pass (distinct-of-strings counts
      equal distinct-of-hashes counts up to the md5 collision bound already
      accepted corpus-wide).

    `shared` is the exact intersection size over the FULL shingle sets for
    every emitted pair, identical to verifying with array intersections.
    RECALL BOUND: candidates come only from cold posting lists, so a pair
    whose shared shingles are ALL hot (> max_shingle_df docs each — e.g.
    hundreds of near-identical boilerplate copies) yields no candidate and
    is not emitted.  That regime is exact duplication at scale; run
    :func:`dedup_exact` first (the curation DAG does) so byte-identical
    floods collapse before near-dup blocking, leaving hot shingles to
    boilerplate *fragments* where some distinguishing cold shingle exists.
    Wider k → fewer, more selective blocks.

    `pair_budget` (optional) additionally caps TOTAL candidate pairs: the
    df cap tightens via one eager histogram-cumsum job (see
    :func:`_pair_budget_threshold`) so the
    worst boilerplate-flooded corpus generates at most `pair_budget`
    pairs instead of max_shingle_df²-sized blocks times however many
    near-cap lists the flood created.  Demoted lists (df above the
    computed threshold but within max_shingle_df) fold into the SAME
    hot-shingle correction, so every emitted pair's `shared` stays exact
    — the budget trades RECALL (pairs co-occurring only in demoted
    lists), never precision, and :func:`shingle_pair_budget_report`
    quantifies exactly what was given up."""
    # `base` (an existing, typically persisted shingle_frame) lets a
    # caller that also feeds minhash share ONE corpus shingling pass
    if base is not None:
        sh = base.select("id", F.explode("shingles").alias("s"))
    else:
        sh = (fan_out(docs).select(
            F.col(id_col).alias("id"),
            F.explode(hashed_shingles_col(text_col, k)).alias("s")))
    groups = sh.groupBy("s").agg(F.array_sort(F.collect_list("id")).alias("ids"))
    if pair_budget is not None:
        # eager one-job threshold (the length_matched_sample collect
        # pattern): folding the histogram subtree into the plan instead
        # would replicate the whole shingle-agg subtree under every
        # consumer (measured: 6 -> 12 corpus scans).  The posting-list
        # frame is CACHED first, so the threshold job materializes it
        # and the main plan reads the cache — the budget costs one
        # histogram aggregation over cached lists, not a second corpus
        # explode (same persist discipline as minhash_lsh_pairs' base).
        # Lifecycle: the persist registers with functions._CACHE_HANDLES;
        # call functions.release_cache_handles() after the result's last
        # consumer (long-lived drivers otherwise accumulate one cached
        # posting-list frame per budgeted query — ADVICE r7 #4).
        groups = _maybe_persist(groups, True)
        hist = _df_hist(groups.select(F.size("ids").alias("df")),
                        max_shingle_df)
        thr = _pair_budget_threshold(hist, pair_budget).collect()[0]["_thr"]
        cap_col = F.lit(int(thr))
    else:
        cap_col = F.lit(max_shingle_df)
    small = groups.filter((F.size("ids") >= 2) & (F.size("ids") <= cap_col))
    pair_structs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.size("ids") - 1),
        lambda i: F.transform(
            F.slice(F.col("ids"), i + 1, F.size("ids") - i),
            lambda y: F.struct(F.element_at(F.col("ids"), i).alias("id_a"),
                               y.alias("id_b")),
        ),
    ))
    cooc = (small.select(F.explode(pair_structs).alias("p"))
            .groupBy("p.id_a", "p.id_b")
            .agg(F.count("*").alias("c_cold"))
            .select(F.col("id_a"), F.col("id_b"), F.col("c_cold")))
    # Per-doc stats ride the SAME posting lists: `n` is the number of lists
    # the doc appears in (== its distinct-shingle count, since every shingle
    # has a list), `hot` collects the shingles whose lists exceeded the cap
    # (collect_set drops the nulls the `when` leaves for cold rows).  No
    # second corpus scan or shingling pass — the shuffle here moves compact
    # (id, partial-count, tiny-hot-set) rows, and Catalyst reuses the
    # groupBy(s) exchange between this branch and the candidate branch, so
    # the corpus-wide explode is shuffled exactly once.
    per_doc = (groups.select(
        (F.size("ids") > cap_col).alias("is_hot"),
        F.col("s"), F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n"),
             F.collect_set(F.when(F.col("is_hot"), F.col("s"))).alias("hot")))
    sa = per_doc.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"),
                        F.col("hot").alias("hot_a"))
    sb = per_doc.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"),
                        F.col("hot").alias("hot_b"))
    shared = F.col("c_cold") + F.size(F.array_intersect("hot_a", "hot_b"))
    return (
        cooc.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", shared.alias("shared"), "n_a", "n_b")
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 4, threshold: float = 0.8,
                        max_shingle_df: int = 256,
                        pair_budget: int | None = None,
                        base: DataFrame | None = None) -> DataFrame:
    """All pairs with Jaccard(shingle sets) >= threshold — an expression over
    :func:`shingle_cooccurrence` (see there for the plan shape, the
    hot-shingle recall bound, the optional global `pair_budget`, and the
    shared-`base` shingle frame).  Output: (id_a, id_b, jaccard)."""
    co = shingle_cooccurrence(docs, text_col, id_col, k, max_shingle_df,
                              pair_budget, base=base)
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (co.withColumn("jaccard", qround(jac, 4))
            .filter(jac >= threshold)
            .select("id_a", "id_b", "jaccard"))


def overlap_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 4, threshold: float = 0.8,
                  max_shingle_df: int = 256,
                  pair_budget: int | None = None) -> DataFrame:
    """All pairs with overlap coefficient |A∩B| / min(|A|,|B|) >= threshold —
    the CONTAINMENT screen: a short document quoted or embedded inside a
    longer one scores near 1.0 here while its Jaccard stays low (the union
    is dominated by the long side), so Jaccard-only dedup never surfaces
    it.  The standard quote/boilerplate-inclusion detector for pretraining
    corpora.

    Same inverted-index plan and recall bound as
    :func:`ngram_jaccard_pairs` (see :func:`shingle_cooccurrence`); only
    the final expression differs, so at 100 TB the cost is identical and a
    pipeline computing both metrics shares every exchange.

    Output: (id_a, id_b, overlap, jaccard) — Jaccard rides along for free
    so downstream policy can distinguish containment (high overlap, low
    jaccard) from near-identity (both high)."""
    co = shingle_cooccurrence(docs, text_col, id_col, k, max_shingle_df,
                              pair_budget)
    ov = F.col("shared") / F.least("n_a", "n_b")
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (co.withColumn("overlap", qround(ov, 4))
            .withColumn("jaccard", qround(jac, 4))
            .filter(ov >= threshold)
            .select("id_a", "id_b", "overlap", "jaccard"))


def minhash_recall_report(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 4,
                          threshold: float = 0.5, num_hashes: int = 8,
                          bands: int = 4,
                          max_shingle_df: int = 256) -> DataFrame:
    """One-row quality audit of the MinHash-LSH blocking: how many of the
    BLOCKED-exact near-dup pairs (inverted-index jaccard at `threshold`,
    posting lists capped at `max_shingle_df`) does the banded-signature
    path surface?  Both sides verify with the same exact jaccard, so
    every pair either side emits truly exceeds the threshold; the number
    that matters is RECALL — the banding probability term operators tune
    (more bands → higher recall, more candidates).

    Baseline caveat (each side can see pairs the other misses): the
    exact side inherits shingle_cooccurrence's cold-list recall bound,
    so a pair whose shared shingles are ALL hot (df > max_shingle_df —
    a boilerplate flood) can appear in the LSH output but not the
    baseline, making n_lsh > n_common; conversely LSH misses pairs the
    banding probability drops.  Recall here is therefore "recall against
    the df-capped exact join", the operational ground truth this family
    actually runs — run :func:`dedup_exact` first (the curation DAG
    does) so hot-only regimes collapse before either path.

    Run this per corpus before trusting an LSH-only dedup at a new
    shingle/band setting; the no-silent-caps discipline applied to
    probabilistic blocking.

    Plan: ONE persisted shingle_frame feeds both sides (the dominant
    cost — shingling + hashing every document — is paid once, not once
    per side); both pair sets are id-only frames, and the audit join and
    aggregate are pair-count-sized.

    Output: (n_exact, n_lsh, n_common, recall)."""
    base = _maybe_persist(shingle_frame(docs, text_col, id_col, k), True)
    exact = (ngram_jaccard_pairs(docs, text_col, id_col, k, threshold,
                                 max_shingle_df, base=base)
             .select("id_a", "id_b").withColumn("_e", F.lit(1)))
    lsh = (minhash_lsh_pairs(docs, text_col, id_col, k=k,
                             num_hashes=num_hashes, bands=bands,
                             threshold=threshold, base=base)
           .select("id_a", "id_b").withColumn("_l", F.lit(1)))
    j = exact.join(lsh, ["id_a", "id_b"], "full_outer")
    n_exact = F.count("_e")
    n_common = F.count(F.when(F.col("_e").isNotNull()
                              & F.col("_l").isNotNull(), 1))
    return j.agg(
        n_exact.alias("n_exact"),
        F.count("_l").alias("n_lsh"),
        n_common.alias("n_common"),
        qround(F.when(n_exact > 0, n_common / n_exact)
               .otherwise(F.lit(1.0)), 6).alias("recall"))


def cross_source_overlap(docs: DataFrame, text_col: str = "text",
                         source_col: str = "source",
                         unit: str = "kgram", k: int = 4,
                         persist: bool = True) -> DataFrame:
    """Pairwise content overlap between sources — the dataset-hygiene
    matrix for multi-snapshot corpora ("how much of crawl-B is already
    in curated-A?"): per source pair, the number of distinct content
    digests present in both, each side's distinct-digest count, and the
    digest Jaccard.

    `unit="doc"` digests whole documents (exact cross-source
    duplication); `unit="kgram"` (default) digests k-token shingles, so
    shared boilerplate, quotations, and partial copies register even
    when no document is byte-identical — the usual situation between
    snapshots.

    Plan shape at 100 TB: text reduces to digests in the scan (never
    shuffles), one distinct over (source, digest), then digests group to
    their source SETS — bounded by the source count, a few dozen in
    practice.  The source-set frame is cached (`persist=True`) and BOTH
    downstream branches — per-source totals (via a set explode, so no
    second corpus pass) and pair generation — read the cache: the corpus
    is scanned and digested exactly once.  NULL text digests to NULL and
    is excluded — a NULL is absent content, not a shared unit two
    sources can "have in common".

    Output: (source_a, source_b, shared, n_a, n_b, jaccard) for pairs
    with shared >= 1, source_a < source_b, ordered."""
    if unit == "doc":
        dg = F.md5(F.col(text_col).cast("binary")).alias("dg")
        d = docs.select(F.col(source_col).alias("src"), dg)
    elif unit == "kgram":
        d = fan_out(docs).select(
            F.col(source_col).alias("src"),
            F.explode(hashed_shingles_col(text_col, k)).alias("dg"))
    else:
        raise ValueError("unit must be 'doc' or 'kgram'")
    d = d.where(F.col("dg").isNotNull()).distinct()
    srcsets = _maybe_persist(
        d.groupBy("dg").agg(F.array_sort(F.collect_set("src")).alias("srcs")),
        persist)
    totals = (srcsets.select(F.explode("srcs").alias("src"))
              .groupBy("src").agg(F.count("*").alias("n")))
    pair_structs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.size("srcs") - 1),
        lambda i: F.transform(
            F.slice(F.col("srcs"), i + 1, F.size("srcs") - i),
            lambda y: F.struct(F.element_at(F.col("srcs"), i).alias("source_a"),
                               y.alias("source_b")),
        ),
    ))
    shared = (srcsets.where(F.size("srcs") >= 2)
              .select(F.explode(pair_structs).alias("p"))
              .groupBy("p.source_a", "p.source_b")
              .agg(F.count("*").alias("shared")))
    ta = totals.select(F.col("src").alias("source_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("src").alias("source_b"), F.col("n").alias("n_b"))
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (shared.join(F.broadcast(ta), "source_a")
            .join(F.broadcast(tb), "source_b")
            .select("source_a", "source_b", "shared", "n_a", "n_b",
                    qround(jac, 6).alias("jaccard"))
            .orderBy("source_a", "source_b"))


def shingle_pair_budget_report(docs: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id", k: int = 4,
                               max_shingle_df: int = 256,
                               pair_budget: int = 1_000_000) -> DataFrame:
    """One-row audit of what a `pair_budget` would keep and drop — the
    `dropped_pairs` side count the capped operators owe their operator
    (same no-silent-caps discipline as contamination_report's
    max_gram_df): (df_threshold, kept_lists, demoted_lists, kept_pairs,
    dropped_pairs).  `dropped_pairs` counts candidate pairs the UNCAPPED
    operator would have generated from lists the budget demotes; a
    boilerplate-flooded corpus shows up here as a large drop count
    instead of a wedged stage.  Plan: the shingle explode reduces to a
    <=max_shingle_df-row df histogram; everything after is
    histogram-sized."""
    sh = (fan_out(docs).select(
        F.col(id_col).alias("id"),
        F.explode(hashed_shingles_col(text_col, k)).alias("s")))
    hist = _df_hist(sh.groupBy("s").agg(F.count("*").alias("df")),
                    max_shingle_df)
    thr = _pair_budget_threshold(hist, pair_budget)
    pairs = _pairs_col()
    kept = F.col("df") <= F.col("_thr")
    return (hist.crossJoin(F.broadcast(thr)).agg(
        F.coalesce(F.max("_thr"), F.lit(1)).cast("int").alias("df_threshold"),
        F.coalesce(F.sum(F.when(kept, F.col("n_lists"))), F.lit(0))
         .cast("bigint").alias("kept_lists"),
        F.coalesce(F.sum(F.when(~kept, F.col("n_lists"))), F.lit(0))
         .cast("bigint").alias("demoted_lists"),
        F.coalesce(F.sum(F.when(kept, pairs)), F.lit(0))
         .cast("bigint").alias("kept_pairs"),
        F.coalesce(F.sum(F.when(~kept, pairs)), F.lit(0))
         .cast("bigint").alias("dropped_pairs")))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
# Universal-hash family over one md5 base hash: h_i(s) = (a_i·h + b_i) mod p,
# p = 2^31-1.  One md5 per shingle instead of `num_hashes` — hashing is the
# dominant cost of minhash at corpus scale, and the linear transforms are
# free in codegen.  Constants are fixed so an external SQL oracle reproduces
# the exact signatures.
MINHASH_P = 2_147_483_647
MINHASH_A = (1000003, 1000033, 1000037, 1000039, 1000081, 1000099, 1000117, 1000121,
             1000133, 1000151, 1000159, 1000171, 1000183, 1000187, 1000193, 1000199)
MINHASH_B = (12345, 23456, 34567, 45678, 56789, 67890, 78901, 89012,
             90123, 91234, 92345, 93456, 94567, 95678, 96789, 97890)


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       k: int = 4, num_hashes: int = 8,
                       base: DataFrame | None = None) -> DataFrame:
    """k-shingle → `num_hashes` min-hash values per doc.  One explode + one
    groupBy with map-side partial mins; signature size is constant per doc,
    so downstream state is O(n·num_hashes) regardless of document size.
    Pass `base` (a :func:`shingle_frame`) to reuse an existing shingle set."""
    if num_hashes > len(MINHASH_A):
        raise ValueError(f"at most {len(MINHASH_A)} hash functions supported")
    if base is None:
        base = shingle_frame(docs, text_col, id_col, k)
    # shingle_frame already emits md5_int hashes — reduce mod p directly
    sh = base.select("id", F.explode("shingles").alias("s"))
    hashed = sh.select("id", (F.col("s") % MINHASH_P).alias("h"))
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i])) % MINHASH_P).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("id").agg(*aggs)


def _band_buckets(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, key) LSH bucket rows from an (id, h0..h{n-1}) signature
    frame — shared by the batch pair join and the incremental history
    join, so both sides of any band join bucket identically."""
    rows_per_band = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws("_", *[F.col(f"h{bi * rows_per_band + r}")
                               for r in range(rows_per_band)]).alias("key"),
        )
        for bi in range(bands)
    ]
    return (sigs.select("id", F.explode(F.array(*band_cols)).alias("b"))
            .select("id", F.col("b.band").alias("band"), F.col("b.key").alias("key")))


def minhash_lsh_incremental(new_docs: DataFrame, seen_sigs: DataFrame,
                            text_col: str = "text", id_col: str = "doc_id",
                            k: int = 4, num_hashes: int = 8,
                            bands: "int | None" = None,
                            threshold: float = 0.6,
                            persist: bool = True) -> DataFrame:
    """Incremental NEAR-dup dedup — the daily-increment pattern of
    :func:`dedup_incremental`, lifted from exact digests to MinHash: drop
    new documents that are near-duplicates of the ACCUMULATED corpus, then
    keep one representative of each near-dup set WITHIN the increment.

    `seen_sigs` is the history state: one (id, h0..h{n-1}) signature row
    per retained doc — `num_hashes` ints per document, independent of
    document size, which is why this state can live for years.  The
    history check joins band buckets (equi-join, both sides banded by the
    same :func:`_band_buckets`) and accepts a candidate when the
    signature-agreement estimate of Jaccard ≥ `threshold` (history
    documents' shingles are long gone; the signature IS the state — the
    standard estimator, exact in expectation).  The in-increment pass is
    the full :func:`minhash_lsh_pairs` machinery (shingles still at hand →
    exact verification), dropping any doc with a lower-id near-dup.

    Returns the SURVIVORS' signature rows (id, h0..h{n-1}) — append them
    to `seen_sigs` for the next increment.  Nothing wider than band keys
    and signatures shuffles; history is never re-scanned.

    `bands=None` (the default since r10, matching
    :func:`minhash_lsh_pairs`) auto-selects the
    :func:`lsh_tuning_report` total_err argmin via :func:`optimal_bands`
    — at (8, 0.6) that is (2, 4).  Banding only shapes the CANDIDATE
    set (both the history and in-increment accepts re-verify against
    the threshold), but a mid-stream (num_hashes, threshold) change
    still shifts which candidates surface — pin `bands` explicitly if
    an existing deployment's behavior must stay frozen."""
    if bands is None:
        bands, _ = optimal_bands(num_hashes, threshold)
    base = _maybe_persist(shingle_frame(new_docs, text_col, id_col, k), persist)
    sigs = _maybe_persist(
        minhash_signatures(new_docs, text_col, id_col, k, num_hashes, base=base),
        persist)
    seen = seen_sigs.withColumnRenamed(id_col, "id") \
        if id_col in seen_sigs.columns else seen_sigs
    nb = _band_buckets(sigs, num_hashes, bands)
    hb = (_band_buckets(seen, num_hashes, bands)
          .withColumnRenamed("id", "old_id"))
    cand = (nb.join(hb, ["band", "key"])
            .select("id", "old_id").distinct())
    agree = sum((F.col(f"h{i}") == F.col(f"old_h{i}")).cast("int")
                for i in range(num_hashes))
    old_sigs = seen.select(F.col("id").alias("old_id"),
                           *[F.col(f"h{i}").alias(f"old_h{i}")
                             for i in range(num_hashes)])
    hist_dup = (cand.join(sigs, "id").join(old_sigs, "old_id")
                .filter(agree / num_hashes >= F.lit(threshold))
                .select("id").distinct())
    l, r = nb.alias("l"), nb.alias("r")
    in_cand = (l.join(r, (F.col("l.band") == F.col("r.band"))
                     & (F.col("l.key") == F.col("r.key"))
                     & (F.col("l.id") < F.col("r.id")))
               .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
               .distinct())
    in_pairs = _verify_jaccard(in_cand, base, threshold)
    # an in-increment dup is dropped only when its lower-id representative
    # SURVIVES the history check — otherwise the whole near-dup family
    # would vanish from the returned state (the representative gone as a
    # history dup, the partner gone as its in-increment dup) and the same
    # content would be re-admitted in a later increment
    incr_dup = (in_pairs
                .join(hist_dup.withColumnRenamed("id", "id_a"), "id_a", "left_anti")
                .select(F.col("id_b").alias("id")).distinct())
    return (sigs.join(hist_dup, "id", "left_anti")
            .join(incr_dup, "id", "left_anti")
            .withColumnRenamed("id", id_col))


def optimal_bands(n_perm: int, threshold: float, grid: int = 99) -> "tuple[int, int]":
    """(bands, rows) minimizing :func:`lsh_tuning_report`'s `total_err`
    for a given (n_perm, threshold) — the closed-form argmin computed
    locally (same divisor splits, same Riemann grid, same qround(1e-6)
    quantization before the compare; a pytest pins this twin to the
    report's argmin row).  Datasketch's `_optimal_param` shape without a
    Spark job: d(n_perm)·grid float ops on the driver."""
    import math

    best: "tuple[float, int, int] | None" = None
    for b in range(1, n_perm + 1):
        if n_perm % b:
            continue
        r = n_perm // b
        ds = 1.0 / (grid + 1)
        fp = fn = 0.0
        for i in range(1, grid + 1):
            s = i / (grid + 1)
            p = 1.0 - (1.0 - s ** r) ** b
            if s < threshold:
                fp += p * ds
            else:
                fn += (1.0 - p) * ds
        err = math.floor((fp + fn) * 1e6 + 0.5) / 1e6  # qround(1e-6)
        if best is None or (err, b) < (best[0], best[1]):
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 4, num_hashes: int = 8,
                      bands: "int | None" = None,
                      threshold: float = 0.6, persist: bool = True,
                      base: DataFrame | None = None) -> DataFrame:
    """LSH-banded candidate generation + exact Jaccard verification.

    `num_hashes` minhashes split into `bands` bands (rows = num_hashes/bands);
    docs sharing any band bucket become candidates (probability
    1-(1-j^rows)^bands — the S-curve).  `bands=None` (the default since
    r10, VERDICT r9 task #6) picks the :func:`lsh_tuning_report`
    total_err argmin for this (num_hashes, threshold) via
    :func:`optimal_bands` — at the registry's (8, 0.5) that is the same
    (4, 2) split the oracle-pinned entries pass explicitly.  Only
    candidates pay the verification join: the per-doc shingle ARRAYS are
    joined back by id and intersected JVM-side, so the corpus is
    shingle-exploded exactly once (for the signatures).  Pass `base` (an
    existing shingle_frame) to share that one pass with other consumers.
    Output: (id_a, id_b, jaccard >= threshold)."""
    if bands is None:
        bands, _ = optimal_bands(num_hashes, threshold)
    if base is None:
        base = _maybe_persist(shingle_frame(docs, text_col, id_col, k), persist)
    sigs = minhash_signatures(docs, text_col, id_col, k, num_hashes, base=base)
    buckets = _band_buckets(sigs, num_hashes, bands)
    l, r = buckets.alias("l"), buckets.alias("r")
    candidates = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.key") == F.col("r.key"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(candidates, base, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
SIMHASH_BITS = 60  # md5_int is a 60-bit hash, and 60-bit signatures stay
                   # positive in a signed BIGINT on every engine


def simhash_block_combos(max_hamming: int,
                         bits: int = SIMHASH_BITS) -> tuple[int, int, list[tuple[int, int]]]:
    """Multi-index pigeonhole layout (Manku et al., WWW'07 style): split the
    signature into B = max_hamming + 2 blocks; any pair within `max_hamming`
    touches at most `max_hamming` blocks, so at least TWO blocks agree
    exactly — some pair-of-blocks key matches.  Returns
    (num_blocks, block_bits, [(b0, b1), ...] combos).

    With 60-bit signatures and max_hamming=3: 5 blocks × 12 bits,
    C(5,2) = 10 combos, each key 24 bits → 10 × 2²⁴ ≈ 1.7·10⁸ distinct
    buckets.  Bucket population scales as N / (combos · 2^(2·block_bits)),
    i.e. it SHRINKS per added signature bit instead of being pinned to a
    constant 12-bit space — the quadratic-at-scale failure mode of
    single-block keys."""
    num_blocks = max_hamming + 2
    block_bits = bits // num_blocks
    combos = [(i, j) for i in range(num_blocks) for j in range(i + 1, num_blocks)]
    return num_blocks, block_bits, combos


def simhash_col(text_col: str = "text", bits: int = SIMHASH_BITS):
    """SimHash over distinct tokens: bit j of the signature is the
    sign of sum over tokens of (+1 if bit j of md5_int(token) else -1).
    Pure higher-order functions — no explode, no shuffle for the signature
    itself."""
    toks = F.array_distinct(tokens_col(text_col))
    hashes = F.transform(toks, lambda t: md5_int(t) % F.lit(2 ** bits).cast("bigint"))

    def bit_sum(j: int):
        return F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1,
                                        F.lit(1)).otherwise(F.lit(-1)),
        )

    out = F.lit(0).cast("bigint")
    for j in range(bits):
        out = out + F.when(bit_sum(j) > 0, F.lit(2 ** j).cast("bigint")).otherwise(F.lit(0))
    return out


def simhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash, Arrow-vectorized: one pandas-UDF pass computes the
    whole signature per document (md5 each distinct token once, numpy
    popcount matrix for the bit majorities).

    Semantically identical to :func:`simhash_col` and to the explode →
    48-partial-sum aggregation form (bit j set ⟺ more than half the
    distinct-token hashes have bit j set), but with NO shuffle at all —
    signatures are a narrow map over the corpus, which is what you want at
    100 TB: the only shuffle in simhash dedup is the chunk-bucket join."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    mask = (1 << bits) - 1
    jbits = np.arange(bits, dtype=np.int64)

    @pandas_udf("bigint")
    def sig_udf(texts: pd.Series) -> pd.Series:
        # token→hash memo shared across the batch: natural-language
        # vocabulary is heavily repeated, so most tokens hash once per
        # worker-batch instead of once per document (md5 is the dominant
        # cost of the signature pass)
        memo: dict[str, int] = {}

        def h(x: str) -> int:
            v = memo.get(x)
            if v is None:
                v = int(hashlib.md5(x.encode("utf-8")).hexdigest()[:15], 16) & mask
                memo[x] = v
            return v

        out: list = [None] * len(texts)
        for i, t in enumerate(texts):
            if t is None:  # NULL text -> NULL signature (a kernel crash
                continue   # here used to abort the whole query — r8)
            toks = set(t.split(" "))
            hs = np.fromiter((h(x) for x in toks), dtype=np.int64, count=len(toks))
            ones = ((hs[:, None] >> jbits) & 1).sum(axis=0)
            out[i] = int((((2 * ones > len(hs)).astype(np.int64)) << jbits).sum())
        return pd.Series(out, dtype="object")

    return fan_out(docs).select(F.col(id_col).alias("id"),
                                sig_udf(F.col(text_col)).alias("sig"))


def simhash_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, bits: int = SIMHASH_BITS,
                  max_bucket_size: int = 100_000) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidates via the multi-index pigeonhole (:func:`simhash_block_combos`):
    with B = max_hamming + 2 blocks, every qualifying pair agrees exactly on
    at least one PAIR of blocks, so the join key is (combo_id, block_b0 ‖
    block_b1) — C(B,2) combos × 2^(2·block_bits) values.  For the defaults
    that is 10 × 2²⁴ keys, so bucket sizes scale as N/10·2²⁴ instead of
    being pinned to a constant space (single 12-bit chunks cap at 16,384
    buckets total and go quadratic at billion-doc corpora).

    `max_bucket_size` is the degenerate-bucket guard: buckets larger than it
    (near-identical boilerplate floods) are excluded from candidate
    generation — such pairs are still found through their other 9 combos
    unless every combo floods, which only happens for corpora that exact
    dedup should have collapsed first.  The guard's window count rides the
    same (c, v) shuffle the self-join needs — no extra exchange."""
    sigs = simhash_signatures(docs, text_col, id_col, bits)
    return signature_near_dup_pairs(sigs, max_hamming, bits, max_bucket_size)


def signature_near_dup_pairs(sigs: DataFrame, max_hamming: int = 3,
                             bits: int = SIMHASH_BITS,
                             max_bucket_size: int = 100_000) -> DataFrame:
    """(id_a, id_b, hamming) pairs within `max_hamming` over an (id, sig)
    signature frame — the multi-index pigeonhole join shared by text
    SimHash and any other fixed-width fingerprint (e.g. perceptual image
    hashes): B = max_hamming + 2 blocks, join key = (combo, pair-of-block
    values), bucket-size guard, popcount verify.  `bits` beyond
    B·block_bits are uncovered by blocks — the pigeonhole guarantee still
    holds (uncovered differing bits only INCREASE block agreement) and the
    verify counts all bits."""
    num_blocks, block_bits, combos = simhash_block_combos(max_hamming, bits)
    mask = (1 << block_bits) - 1

    def block(b: int):
        return F.shiftright("sig", b * block_bits).bitwiseAND(F.lit(mask))

    keys = sigs.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(ci).alias("c"),
                     (block(b0) * F.lit(mask + 1) + block(b1)).alias("v"))
            for ci, (b0, b1) in enumerate(combos)
        ])).alias("kb"),
    ).select("id", "sig", F.col("kb.c").alias("c"), F.col("kb.v").alias("v"))
    if max_bucket_size:
        w = Window.partitionBy("c", "v")
        keys = (keys.withColumn("bucket_n", F.count("*").over(w))
                .filter(F.col("bucket_n") <= max_bucket_size).drop("bucket_n"))
    # persist the keyed-signature frame: the self-join consumes it TWICE,
    # and without an explicit cache each side re-runs the corpus scan + the
    # signature UDF (AQE's runtime exchange reuse is not guaranteed across
    # the join's build/probe subtrees).  ~10 rows × ~30 B per doc — tiny
    # next to re-hashing every document
    keys = _maybe_persist(keys, True)
    l, r = keys.alias("l"), keys.alias("r")
    ham = F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig")))
    return (
        l.join(r, (F.col("l.c") == F.col("r.c")) & (F.col("l.v") == F.col("r.v"))
               & (F.col("l.id") < F.col("r.id")))
        .filter(ham <= max_hamming)
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                ham.alias("hamming"))
        .distinct()
    )


def dedup_incremental(new_docs: DataFrame, seen: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      sig_col: str = "sig") -> DataFrame:
    """Incremental exact dedup — the daily-increment pattern: drop new
    documents whose digest already exists in the `seen` fingerprint table
    (the accumulated corpus state), then collapse duplicates WITHIN the
    increment (lowest id survives).  Returns (id, sig) survivors; the caller
    appends them to `seen` for the next increment.

    At scale `seen` is a digest-only table (16 bytes/doc) partitioned by
    sig; the anti-join and the in-increment groupBy shuffle digests, never
    text — the increment never re-scans the historical corpus."""
    sigs = new_docs.select(F.col(id_col), F.md5(F.col(text_col)).alias(sig_col))
    fresh = sigs.join(seen.select(sig_col), sig_col, "left_anti")
    return (fresh.groupBy(sig_col).agg(F.min(id_col).alias(id_col))
            .select(id_col, sig_col))


def _bloom_position_cols(sig_col: str, num_bits: int, num_hashes: int) -> list:
    """`num_hashes` bit positions per digest, all JVM-side: position_i =
    xxhash64(sig, i) mod num_bits.  Both the build pass and the probe pass
    use these same expressions, so Python never has to reimplement the
    hash."""
    return [F.pmod(F.xxhash64(F.col(sig_col), F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)]


def bloom_from_sigs(seen_sigs: DataFrame, sig_col: str = "sig",
                    num_bits: int = 1 << 23, num_hashes: int = 4) -> bytes:
    """Build a Bloom-filter bitset over a digest column.

    Per-partition Arrow pass sets bits into a fixed `num_bits/8`-byte numpy
    array and emits ONE row per batch; the driver ORs the partial bitsets.
    Driver traffic is (partitions × num_bits/8) bytes — independent of row
    count, the treeAggregate shape — so a billion-row fingerprint table
    costs the same driver memory as a thousand-row one.  (1<<23 bits = 1 MiB
    ≈ 1% false positives at ~1M entries; size num_bits ≈ 10× expected
    entries for ~1-2%.)"""
    pos = seen_sigs.select(
        F.array(*_bloom_position_cols(sig_col, num_bits, num_hashes)).alias("p"))

    nbytes = (num_bits + 7) // 8  # round UP: positions range over [0, num_bits)

    def to_bits(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        saw = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            saw = True
            idx = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["p"]])
            np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        if saw:
            yield pd.DataFrame({"b": [bits.tobytes()]})

    out = np.zeros(nbytes, dtype=np.uint8)
    for row in pos.mapInPandas(to_bits, "b binary").collect():
        out |= np.frombuffer(row.b, dtype=np.uint8)
    return out.tobytes()


def dedup_incremental_bloom(new_docs: DataFrame, seen: DataFrame,
                            text_col: str = "text", id_col: str = "doc_id",
                            sig_col: str = "sig",
                            num_bits: int = 1 << 23, num_hashes: int = 4) -> DataFrame:
    """:func:`dedup_incremental` with a broadcast Bloom prefilter — same
    exact result, a fraction of the shuffle.

    The accumulated fingerprint table dwarfs each daily increment, and the
    plain anti-join shuffles BOTH sides on sig.  Here the history is
    compressed into a bitset once (one narrow scan, ~1 MiB to the driver per
    8M bits), broadcast, and probed map-side: increment digests that are
    definitely-unseen skip the join entirely; only `maybe`-seen rows (true
    positives + the ~1% false-positive tail) reach the anti-join.  The big
    join's left side shrinks from |increment| to |already-seen ∩ increment|
    + ε — and Bloom false positives are then rejected by the exact
    anti-join, so the output is bit-identical to the exact path.

    At 100 TB: rebuild the bitset per increment from the digest table, or
    persist it alongside and OR in each day's new digests."""
    spark = new_docs.sparkSession
    bloom = bloom_from_sigs(seen.select(sig_col), sig_col, num_bits, num_hashes)
    bc = spark.sparkContext.broadcast(bloom)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        if len(pos) == 0:
            return pd.Series([], dtype="bool")
        idx = np.stack([np.asarray(a, dtype=np.int64) for a in pos])
        hit = (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    from singer_spark.functions import maybe_persist

    # Persisted: the maybe/not-maybe branches below are two consumers of
    # this frame, and the optimizer additionally duplicates a UDF under
    # a pushed filter on its output — unpersisted, the increment was
    # scanned and Bloom-probed three times (probe pass, branch, union).
    # The cache is (id, 32-char sig, bool) — narrow at any increment size.
    sigs = maybe_persist(
        new_docs.select(F.col(id_col), F.md5(F.col(text_col)).alias(sig_col))
        .withColumn("_maybe", might_contain(
            F.array(*_bloom_position_cols(sig_col, num_bits, num_hashes)))),
        True)
    definitely_new = sigs.filter(~F.col("_maybe")).drop("_maybe")
    candidates = (sigs.filter(F.col("_maybe")).drop("_maybe")
                  .join(seen.select(sig_col), sig_col, "left_anti"))
    fresh = definitely_new.unionByName(candidates.select(id_col, sig_col))
    return (fresh.groupBy(sig_col).agg(F.min(id_col).alias(id_col))
            .select(id_col, sig_col))


# ---------------------------------------------------------------------------
# Segment-level (sub-document) dedup
# ---------------------------------------------------------------------------
def segment_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  words_per_segment: int = 20) -> DataFrame:
    """Sub-document exact dedup: drop duplicated SEGMENTS across the corpus,
    keep documents (the practical approximation of exact-substring dedup —
    boilerplate headers, licence blocks, and quoted passages recur across
    documents that are not themselves duplicates, and dropping whole docs
    loses their unique remainder).

    Segmenter: fixed windows of `words_per_segment` tokens (this corpus has
    no paragraph breaks; with natural text pass a pre-split `text_col`).
    The first occurrence of each distinct segment — ordered by (doc id,
    position) — survives; later occurrences are cut and the document is
    reassembled from its surviving segments in order.

    100 TB shape: segment TEXT never shuffles.  The wide operations see only
    (16-byte digest, id, seg_idx) rows — the keep/drop decision is a window
    over digests, the per-doc survivor list is an int-array aggregation, and
    the cleaned text is rebuilt by indexing the per-doc segment array
    JVM-side after a final id-keyed join of (id → kept positions) back to
    the docs table (the doc's own text moves once through that join, as any
    rebuild must).  Shuffle volume on the wide ops is
    O(total segments × ~32 B), independent of document size.

    Both segment passes index a MATERIALIZED token-array attribute with
    `windowed_join` — the segmenter reads it across a Generate (explode)
    boundary, the rebuild across the join boundary — so every lookup is
    O(1).  This is deliberate: the natural slice-per-segment /
    re-slice-per-kept-idx lambdas over the raw `split(text)` expression
    re-evaluate it on every element (Catalyst has no CSE inside HOF
    lambdas), which is quadratic in document length
    (tests/test_long_doc_scaling.py pins the linearity).

    Output: (doc_id, text, n_segments, n_kept) with `text` rebuilt from the
    surviving segments (empty string when every segment was seen before).
    """
    w = words_per_segment

    def n_segs_of(toks_attr):
        # NULL text -> 0 segments: windowed_join over a NULL array joins
        # to '' (array_join drops NULLs), which would collide NULL docs
        # with genuinely-empty docs in the dedup window (r8 NULL harness)
        return F.when(toks_attr.isNull(), F.lit(0)).otherwise(
            F.greatest(F.ceil(F.size(toks_attr) / w).cast("int"), F.lit(1)))

    base = fan_out(docs).select(F.col(id_col).alias("id"),
                                tokens_col(text_col).alias("toks"))
    segs = base.select(
        "id",
        F.posexplode(
            # explicit empty for NULL toks — sequence(0, -1) DESCENDS
            F.when(F.col("toks").isNull(),
                   F.array().cast("array<string>"))
            .otherwise(F.transform(
                F.sequence(F.lit(0), F.greatest(
                    F.ceil(F.size("toks") / w).cast("int"), F.lit(1)) - 1),
                lambda i: windowed_join(F.col("toks"), i * w + 1, w, " ")))
        ).alias("seg_idx", "segment"),
    )
    # Narrow rows only from here: (sig, id, seg_idx).
    sigs = segs.select("id", "seg_idx", F.md5("segment").alias("sig"))
    # first occurrence by (id, seg_idx) as ONE map-side-combinable
    # aggregation: min over struct(id, seg_idx) IS the rank-1 row of the
    # old row_number window, without its per-sig sort
    kept = (
        sigs.groupBy("sig")
        .agg(F.min(F.struct("id", "seg_idx")).alias("_f"))
        .select(F.col("_f.id").alias("id"), F.col("_f.seg_idx").alias("seg_idx"))
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("seg_idx")).alias("kept_idx"))
    )
    docs_toks = docs.select(F.col(id_col), tokens_col(text_col).alias("toks"))
    rebuilt = F.array_join(
        F.transform(F.col("kept_idx"),
                    lambda i: windowed_join(F.col("toks"), i * w + 1, w, " ")),
        " ")
    return (
        docs_toks.join(kept, docs_toks[id_col] == kept.id, "left")
        .select(
            F.col(id_col),
            F.when(F.col("kept_idx").isNotNull(), rebuilt).otherwise(F.lit("")).alias(text_col),
            n_segs_of(F.col("toks")).alias("n_segments"),
            F.coalesce(F.size("kept_idx"), F.lit(0)).alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Cluster assignment (pairs → canonical doc)
# ---------------------------------------------------------------------------
def dedup_clusters(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   max_iters: int = 50,
                   driver_edge_threshold: int = 500_000) -> DataFrame:
    """Connected components over near-dup pairs: every doc gets the minimum
    doc id of its component as `cluster` (the canonical survivor), singletons
    map to themselves.

    Iterative min-label propagation: each round, a node takes the min of its
    own label and its neighbors' labels; converges in O(component diameter)
    rounds (tiny for dedup graphs, which are dense cliques of copies).
    Per round: one equi-join + groupBy-min — all shuffles on ids only.
    `localCheckpoint` truncates the growing lineage so plans stay constant
    size at any iteration count; the edge list is checkpointed ONCE up
    front, otherwise every iteration's join would re-run the (expensive)
    candidate-generation lineage that produced `pairs`.

    Small-graph fast path: near-dup edge lists are a sliver of the
    corpus (pairs above a similarity threshold), so when the UNDIRECTED
    pair count is under `driver_edge_threshold` (default 500k pairs)
    the components are solved by one driver-side union-find (min-id
    root — IDENTICAL labels to the propagation loop) and a single
    broadcast join back: ~3 jobs total instead of 2 per propagation
    round.  The edges land as Arrow → two int64 numpy arrays (~16 MB
    per million edges on the wire; the union-find dict costs ~100-200 B
    per NODE touched by an edge, so a 500k-edge clique-heavy graph
    stays well under ~200 MB transient driver memory — vs ~0.5-1 GB/M
    edges the old Row-based collect risked).  Pairs are first
    restricted to BOTH endpoints in `docs` (review r9 #2: the loop only
    conducts labels through doc nodes, so a stale pair table
    referencing foreign ids must not bridge components in one path and
    not the other).  The distributed loop remains the path for
    genuinely huge pair graphs; pass driver_edge_threshold=0 to force
    it."""
    ids = docs.select(F.col(id_col).cast("bigint").alias("_n"))
    p = (pairs.select(F.col("id_a").cast("bigint").alias("a"),
                      F.col("id_b").cast("bigint").alias("b"))
         .join(ids.withColumnRenamed("_n", "a"), "a", "left_semi")
         .join(ids.withColumnRenamed("_n", "b"), "b", "left_semi")
         .localCheckpoint(eager=True))
    if driver_edge_threshold and p.count() <= driver_edge_threshold:
        parent: dict = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        pdf = p.toPandas()  # Arrow path: 2 int64 columns, no Row objects
        for ia, ib in zip(pdf["a"].to_numpy(), pdf["b"].to_numpy()):
            ra, rb = find(int(ia)), find(int(ib))
            if ra != rb:  # min-id root keeps label parity with the loop
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        mapping = [(x, find(x)) for x in list(parent)]
        spark = docs.sparkSession
        lab = spark.createDataFrame(mapping, "id bigint, cluster bigint") \
            if mapping else spark.createDataFrame([], "id bigint, cluster bigint")
        return (docs.select(F.col(id_col).alias("id"))
                .join(F.broadcast(lab), "id", "left")
                .select(F.col("id").alias(id_col),
                        F.coalesce("cluster", F.col("id").cast("bigint"))
                        .alias("cluster")))
    edges = p.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        p.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = docs.select(F.col(id_col).alias("id"),
                         F.col(id_col).cast("bigint").alias("label"))
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src").agg(F.min("label").alias("nl"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(labels.id,
                    F.least(labels.label, F.coalesce(F.col("nl"), labels.label)).alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.withColumnRenamed("label", "new_label")
            .join(labels, "id")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster"))


def dup_cluster_stats(docs: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id",
                      max_iters: int = 50) -> DataFrame:
    """Size histogram of the near-duplicate components — the dedup-impact
    report ("how much of the corpus sits in 2-doc pairs vs 500-doc
    boilerplate floods") that decides cluster-keep policy before any doc
    is dropped.

    One :func:`dedup_clusters` pass (id-only label propagation), then two
    tiny aggregations: per-cluster size, then the size histogram.
    Output: (cluster_size, n_clusters, n_docs) ordered by cluster_size."""
    clusters = dedup_clusters(docs, pairs, id_col=id_col, max_iters=max_iters)
    sizes = clusters.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (sizes.groupBy("cluster_size")
            .agg(F.count("*").alias("n_clusters"))
            .select("cluster_size", "n_clusters",
                    (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"))
            .orderBy("cluster_size"))


def leakage_safe_split(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       val_percent: int = 5, test_percent: int = 5,
                       salt: str = "split",
                       max_iters: int = 50) -> DataFrame:
    """Cluster-aware train/val/test split: near-duplicate components never
    straddle the split boundary.

    The plain hash split (`text_analysis.train_val_split`) assigns each doc
    independently, so a val doc whose near-duplicate twin landed in train
    leaks eval answers into training — the contamination mode the
    dedup-before-split literature warns about (Lee et al. 2022 §6.2).
    Here the split hash is taken over the COMPONENT's canonical id
    (:func:`dedup_clusters` min-label), so every member of a near-dup
    cluster lands in the same split by construction; singletons hash over
    their own id, making their assignment identical to
    `train_val_split(salt=...)`.  Note the flip side: a doc's split can
    move when a LOWER-id near-duplicate later joins the corpus (its
    canonical label changes) — cluster-stability is bought with
    member-stability, the documented tradeoff of canonical-id hashing.

    Shuffle budget = dedup_clusters (id-only label propagation) plus one
    hash projection; the doc text never moves.

    Output: (id_col, cluster, bucket, split)."""
    from singer_spark.functions import md5_int

    clusters = dedup_clusters(docs, pairs, id_col=id_col, max_iters=max_iters)
    bucket = md5_int(F.concat(F.lit(salt + ":"),
                              F.col("cluster").cast("string"))) % 100
    split = (F.when(bucket < val_percent, F.lit("val"))
             .when(bucket < val_percent + test_percent, F.lit("test"))
             .otherwise(F.lit("train")))
    return clusters.select(F.col(id_col), F.col("cluster"),
                           bucket.cast("int").alias("bucket"),
                           split.alias("split"))


def dedup_exact_priority(docs: DataFrame, priority: dict[str, int],
                         source_col: str = "source",
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Exact dedup with SOURCE-RANKED canonical selection: among identical
    copies, the survivor comes from the most-trusted source (lower rank
    wins; unknown sources sink below every ranked one), ties broken by
    lowest id — the real-corpus policy where curated data outranks crawl
    mirrors (plain :func:`dedup_exact` keeps the arbitrary lowest id).

    Same shuffle budget as dedup_exact: (digest, rank, id) rows only;
    the survivor is a min over a packed (rank, id) struct, so one
    map-side-combined aggregation decides every group.
    Output: (doc_id, source, sig, n_copies)."""
    rank = F.create_map(*[F.lit(x) for kv in priority.items() for x in kv])
    ranked = docs.select(
        F.col(id_col), F.col(source_col),
        F.md5(F.col(text_col)).alias("sig"),
        F.coalesce(F.element_at(rank, F.col(source_col)),
                   F.lit(2 ** 31 - 1)).alias("_rank"),
    )
    best = F.min(F.struct(F.col("_rank"), F.col(id_col), F.col(source_col)))
    return (ranked.groupBy("sig")
            .agg(best.alias("b"), F.count("*").alias("n_copies"))
            .select(F.col("b")[id_col].alias(id_col),
                    F.col("b")[source_col].alias(source_col),
                    "sig", "n_copies"))


def dedup_normalized(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Fuzzy-exact dedup: canonicalize text (lowercase, strip
    punctuation, collapse whitespace) BEFORE hashing, so trivially-edited
    mirrors (case changes, punctuation drift, reflowed spaces) collapse
    into one group — the cheap first rung of the near-dup ladder, catching
    what byte-exact dedup misses without any candidate join.

    The normalization is plain SQL expressions (shared verbatim with the
    oracle); everything wide is still (digest, id).
    Output: (doc_id, sig, n_copies) — survivor = lowest id per group."""
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
        r"\s+", " "))
    return (
        docs.select(F.col(id_col), F.md5(norm).alias("sig"))
        .groupBy("sig")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "sig", "n_copies")
    )


def dedup_spans(docs: DataFrame, k: int = 8, text_col: str = "text",
                id_col: str = "doc_id",
                min_run: "int | None" = None) -> DataFrame:
    """Cross-document duplicate-SPAN removal — the corpus-internal half
    of Lee et al. 2022's exact-substring deduplication (the eval-set
    half is :func:`text_analysis.decontaminate_spans`): any k-token
    window whose digest appears in MORE THAN ONE document keeps its
    first copy (the lowest-id document holding it) and is cut from
    every other document's text; non-duplicated text survives intact.
    This is the surgical alternative to whole-document near-dup removal
    for boilerplate — headers, licenses, navigation chrome — that
    whole-doc Jaccard scores below threshold.

    Plan, nothing doc-sized in any exchange except the final join-back:

    1. positional k-gram digests per doc — (id, start, 16-byte md5)
       rows from one narrow JVM pass (`windowed_join`, O(k) per window);
    2. one digest-keyed aggregation finds each gram's owner (min id)
       and whether it is shared (max id > min id) — the data-
       proportional shuffle, ~24 B per corpus token;
    3. non-owner hit starts re-join the gram frame map-side and
       collapse per doc to a small int array;
    4. each doc rebuilds its text by filtering covered token positions
       — an O(n_tokens × n_hits) JVM lambda.  Unlike decontaminate's
       rare-hit broadcast, duplicate spans can cover a large corpus
       fraction (boilerplate floods), so the hit arrays JOIN back by id
       (AQE broadcasts when they ARE a sliver) — the corpus text moves
       through at most this one exchange.

    `min_run` (default k) is Lee et al.'s minimum duplicated-substring
    length in TOKENS: overlapping/adjacent shared windows stitch into
    maximal covered intervals (gaps-and-islands over the sorted hit
    starts — a per-doc window, partitions bounded by doc length), and
    only intervals of at least `min_run` tokens are cut, so an
    incidental shared 8-gram survives while a 50-token boilerplate run
    goes.  At min_run == k every window passes the filter and the
    result is plain window coverage.

    Output: (id, clean_text, n_tokens, n_removed) for every input doc,
    ordered by id; NULL text stays NULL."""
    min_run = k if min_run is None else int(min_run)
    if min_run < k:
        raise ValueError(f"min_run must be >= k ({k}), got {min_run}")
    # the gram frame feeds the owner aggregation AND the hit join —
    # persist it or the corpus explode runs once per consumer
    grams = maybe_persist(
        span_grams(docs, k, text_col, id_col, positional=True), True)
    return _rebuild_without_spans(docs, _span_hit_rows(grams), k, min_run,
                                  text_col, id_col)


def span_grams(docs: DataFrame, k: int = 8, text_col: str = "text",
               id_col: str = "doc_id",
               positional: bool = False) -> DataFrame:
    """Positional k-gram window digests — the shared featurizer of the
    span-dedup family and the STATE table of its incremental variant
    (persist `span_grams(batch).select("g").distinct()` unioned across
    increments; 16 bytes per corpus token).  Returns (id, start, g) with
    `positional`, else DISTINCT (g)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size("t") - F.lit(k - 1)
    starts = F.when(n >= 1, F.sequence(F.lit(1), n.cast("int"))) \
        .otherwise(F.array().cast("array<int>"))
    digests = F.transform(
        starts, lambda i: F.md5(windowed_join(F.col("t"), i, k, " ")))
    grams = (fan_out(docs)
             .select(F.col(id_col).alias("id"), toks.alias("t"))
             .select("id", F.posexplode(digests).alias("p0", "g"))
             .select("id", (F.col("p0") + 1).alias("start"), "g"))
    return grams if positional else grams.select("g").distinct()


def _span_hit_rows(grams: DataFrame) -> DataFrame:
    """Owner rule over a positional gram frame: digests held by more
    than one doc keep their lowest-id copy; every other (id, start)
    window is a hit.  Rows are unique by construction — one digest per
    (id, start) and one owner row per digest — so no distinct is needed
    (review r9 #7: the old distinct added a corpus-proportional extra
    exchange for nothing)."""
    shared = (grams.groupBy("g")
              .agg(F.min("id").alias("_owner"), F.max("id").alias("_max"))
              .where(F.col("_max") > F.col("_owner"))
              .select("g", "_owner"))
    return (grams.join(shared, "g")
            .where(F.col("id") > F.col("_owner"))
            .select("id", "start"))


def _hit_islands(hit_rows: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands over hit window starts: stitch overlapping/
    adjacent k-windows into maximal covered intervals (the running max
    of prior window ends finds island breaks — a window whose start
    clears every previous end + 1 opens a new island).  Returns
    (id, _isl, _lo, _hi) — ONE definition so the operators and the
    min_run decision table can never desynchronize (review r9 #6)."""
    w_ord = Window.partitionBy("id").orderBy("start")
    prev_hi = F.max(F.col("start") + F.lit(k - 1)).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_hi.isNull() | (F.col("start") > prev_hi + 1),
                 F.lit(1)).otherwise(F.lit(0))
    return (hit_rows
            .withColumn("_isl", F.sum(brk).over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("id", "_isl")
            .agg(F.min("start").alias("_lo"),
                 (F.max("start") + F.lit(k - 1)).alias("_hi")))


def _rebuild_without_spans(docs: DataFrame, hit_rows: DataFrame, k: int,
                           min_run: int, text_col: str,
                           id_col: str) -> DataFrame:
    """Shared back half of the span-dedup family: :func:`_hit_islands`
    intervals filtered to >= min_run tokens, then rebuild each doc's
    text by filtering covered token positions."""
    toks = F.split(F.col(text_col), " ")
    islands = _hit_islands(hit_rows, k) \
        .where(F.col("_hi") - F.col("_lo") + 1 >= min_run)
    hits = (islands.groupBy("id")
            .agg(F.sort_array(F.collect_list(F.struct("_lo", "_hi")))
                 .alias("hits")))
    empty_ivl = F.array().cast("array<struct<_lo:int,_hi:int>>")
    base = (docs.select(F.col(id_col).alias("id"), toks.alias("t"))
            .join(hits, "id", "left")
            .select("id", "t",
                    F.coalesce("hits", empty_ivl).alias("hits")))
    j_covered = lambda j: F.exists(  # noqa: E731
        "hits", lambda iv: (iv["_lo"] <= j) & (j <= iv["_hi"]))
    kept = F.filter(F.sequence(F.lit(1), F.size("t")),
                    lambda j: ~j_covered(j))
    return (base.select(
        "id",
        F.array_join(F.transform(kept, lambda j: F.element_at("t", j)),
                     " ").alias("clean_text"),
        F.size("t").alias("n_tokens"),
        (F.size("t") - F.size(kept)).alias("n_removed"))
        .orderBy("id"))


def dedup_spans_incremental(new_docs: DataFrame, seen_grams: DataFrame,
                            k: int = 8, min_run: "int | None" = None,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            num_bits: "int | None" = None,
                            num_hashes: int = 4,
                            base_grams: "DataFrame | None" = None) -> DataFrame:
    """:func:`dedup_spans` in the daily-increment pattern: cut from the
    increment every k-token window whose digest exists in the
    accumulated `seen_grams` state (one DISTINCT-digest column `g` —
    maintain it by appending `span_grams(increment)` after each batch)
    PLUS the increment-internal duplicates (owner = lowest id keeps its
    copy, exactly :func:`dedup_spans`).  The increment never re-reads
    historical text — only its 16-byte digests.

    `num_bits` switches the history probe to a broadcast Bloom
    prefilter (:func:`bloom_from_sigs` over `seen_grams`): window
    digests that are definitely-unseen skip the history join entirely,
    and maybe-seen rows are confirmed by the exact semi-join — output
    BIT-IDENTICAL to the exact path, the shuffle shrunk to the
    actually-duplicated tail (the right shape when the history dwarfs
    the increment; a pytest pins bloom == exact).

    Pass `base_grams` (an already-persisted POSITIONAL
    `span_grams(new_docs, ..., positional=True)` frame) to share the
    increment's one window-explode pass with other consumers — the
    streaming curation backend reuses it for the state append instead
    of re-exploding the batch (review r10 #5).

    Output: (id, clean_text, n_tokens, n_removed) over the increment,
    ordered by id."""
    min_run = k if min_run is None else int(min_run)
    if min_run < k:
        raise ValueError(f"min_run must be >= k ({k}), got {min_run}")
    # three consumers (history probe, owner agg, intra hit join)
    grams = base_grams if base_grams is not None else maybe_persist(
        span_grams(new_docs, k, text_col, id_col, positional=True), True)

    probe = grams
    if num_bits:
        spark = new_docs.sparkSession
        bloom = bloom_from_sigs(seen_grams.select("g"), "g",
                                num_bits, num_hashes)
        bc = spark.sparkContext.broadcast(bloom)
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def might_contain(pos: pd.Series) -> pd.Series:
            bits = np.frombuffer(bc.value, dtype=np.uint8)
            if len(pos) == 0:
                return pd.Series([], dtype="bool")
            idx = np.stack([np.asarray(a, dtype=np.int64) for a in pos])
            hit = (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
            return pd.Series(hit.all(axis=1))

        probe = grams.where(might_contain(
            F.array(*_bloom_position_cols("g", num_bits, num_hashes))))
    hist_hits = (probe.join(seen_grams.select("g"), "g", "left_semi")
                 .select("id", "start"))
    # the union CAN repeat an (id, start) — history hit AND intra hit —
    # so this distinct is load-bearing, unlike the single-source paths
    hit_rows = hist_hits.unionByName(_span_hit_rows(grams)).distinct()
    return _rebuild_without_spans(new_docs, hit_rows, k, min_run,
                                  text_col, id_col)


def lsh_tuning_report(spark, n_perm: int = 64, threshold: float = 0.5,
                      grid: int = 99) -> DataFrame:
    """Banding-parameter tuning table for the MinHash-LSH family — the
    (bands, rows) selection every LSH deployment does before indexing
    (datasketch's `_optimal_param`; Leskovec/Rajaraman/Ullman MMDS ch.3
    S-curve analysis): for every divisor split b·r = n_perm, the
    candidate probability at similarity s is p(s) = 1 − (1 − s^r)^b.
    The report gives each split's MMDS threshold approximation
    (1/b)^(1/r) (where the S-curve rises steeply), its
    probability at the target threshold, and Riemann false-positive /
    false-negative areas against the target on a `grid`-point uniform
    similarity grid (fp = Σ_{s<t} p(s)Δs, fn = Σ_{s≥t} (1−p(s))Δs —
    the uniform-prior error masses the MMDS analysis integrates).

    Pure closed-form arithmetic over a generated (split × grid) frame —
    no corpus scan, replays exactly in SQL, and at any corpus scale the
    cost is O(d(n_perm)·grid) rows.  Pick the row minimizing total_err
    (or bias fn down for dedup, fp down for candidate-budgeted joins)
    and feed (b, r) to `minhash_lsh_pairs`.

    Output: (b, r, s50 [=(1/b)^(1/r)], p_at_threshold, fp_area,
    fn_area, total_err)
    qround(1e-6), ordered by b."""
    from singer_spark.functions import qround

    t = float(threshold)
    splits = spark.createDataFrame(
        [(b, n_perm // b) for b in range(1, n_perm + 1) if n_perm % b == 0],
        "b int, r int")
    g = spark.range(1, grid + 1).select(
        (F.col("id") / F.lit(float(grid + 1))).alias("s"))
    p = 1 - F.pow(1 - F.pow(F.col("s"), F.col("r")), F.col("b"))
    ds = 1.0 / float(grid + 1)
    per = (splits.crossJoin(g)
           .select("b", "r", "s", p.alias("p")))
    agg = (per.groupBy("b", "r")
           .agg(F.sum(F.when(F.col("s") < t, F.col("p") * ds)
                      .otherwise(F.lit(0.0))).alias("_fp"),
                F.sum(F.when(F.col("s") >= t, (1 - F.col("p")) * ds)
                      .otherwise(F.lit(0.0))).alias("_fn")))
    s50 = F.pow(1.0 / F.col("b"), 1.0 / F.col("r"))
    p_at_t = 1 - F.pow(1 - F.pow(F.lit(t), F.col("r")), F.col("b"))
    return (agg.select(
        "b", "r",
        qround(s50, 6).alias("s50"),
        qround(p_at_t, 6).alias("p_at_threshold"),
        qround(F.col("_fp"), 6).alias("fp_area"),
        qround(F.col("_fn"), 6).alias("fn_area"),
        qround(F.col("_fp") + F.col("_fn"), 6).alias("total_err"))
        .orderBy("b"))


def dedup_spans_report(docs: DataFrame, k: int = 8,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """min_run decision table for :func:`dedup_spans` (the span family's
    :func:`lsh_tuning_report`): the distribution of maximal duplicated-
    run lengths across the corpus, with the token mass each candidate
    threshold would remove.  Read it bottom-up: `cut_tokens_at_min_run`
    on the row run_len = m is exactly the tokens `dedup_spans(...,
    min_run=m)` deletes, so pick the knee before unique-ish short
    overlaps start bleeding in.

    Same plan prefix as dedup_spans (digests → owner → islands); the
    report is a run-length histogram plus one reverse cumulative sum —
    nothing doc-sized past the owner aggregation.

    Output: (run_len, n_runs, tokens_covered, cut_tokens_at_min_run)
    ordered by run_len."""
    grams = maybe_persist(
        span_grams(docs, k, text_col, id_col, positional=True), True)
    runs = _hit_islands(_span_hit_rows(grams), k).select(
        "id", (F.col("_hi") - F.col("_lo") + 1).alias("run_len"))
    hist = (runs.groupBy("run_len")
            .agg(F.count("*").alias("n_runs"),
                 F.sum("run_len").alias("tokens_covered")))
    # plain global window: the frame is the run-length HISTOGRAM
    # (distinct maximal run lengths — bounded by the longest document,
    # not the corpus), counted structurally by plan_audit's
    # n_global_window and allowlisted in test_plan_invariants; masking
    # the spec (the old `% 1` trick) only hid the shape from log greps
    w_cum = (Window.orderBy(F.col("run_len").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
    return (hist.select(
        "run_len", "n_runs",
        F.col("tokens_covered").cast("bigint").alias("tokens_covered"),
        F.sum("tokens_covered").over(w_cum).cast("bigint")
        .alias("cut_tokens_at_min_run"))
        .orderBy("run_len"))
