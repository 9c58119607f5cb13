"""Empirical scaling probe — measures how the corpus-linear operator paths
grow with input size, the local stand-in for the 100 TB question ("does
runtime track bytes, or does something accidentally quadratic hide here?").

Method: union the sf documents table k times (k = 1, 2, 4 ...), each copy
re-keyed to fresh doc_ids and salted with a per-copy token so copies are
near- but not exact duplicates, then time the SCAN-SIDE operator passes
(signatures, quality, LM scoring, tokenization, segment decisions).
Candidate-pair operators are deliberately excluded: duplicating a corpus
k× inflates their OUTPUT k²-fold by construction (every base near-dup pair
exists between every copy pair), which measures the synthetic corpus, not
the plan.  Pair-op scaling is covered instead by the plan-shape pins
(bounded posting lists, bucket guards) in tests/test_plan_invariants.py.

Prints one table: per operator, median seconds at each k and the 4×/1×
growth ratio (≈4 = linear).

Round 5 adds `markov` mode — a seeded pseudo-Markov generator whose UNIQUE
content grows with scale and whose near-dup density is fixed (every 10th
doc is a one-token mutation of its neighbor) — so pair-operator candidate
growth is MEASURED rather than excluded: the table reports both wall time
and pairs found at each scale (linear plan → ~k× pairs, ~k× time).

Round 7 adds two modes (VERDICT r6 tasks #2/#3):

- `events` — the event-analytics scaling table: events.parquet multiplied
  k× with RE-KEYED users and per-copy time shifts (more users over more
  time — the shape a growing 100 TB event log actually has; per-user
  history length stays constant), written to a scratch sf dir so the
  REGISTRY entries run unmodified.  Measures the ~12 heaviest event
  queries (funnels, sessionize, sequences, pattern match, as-of, SCD2,
  rolling actives, attribution) at 1/4/16/64×.  Caveat: the orders side
  of as-of/attribution/SCD2 stays at base scale (those queries derive
  their join domain via o_custkey % 20 internally), so their growth
  reflects the scaled LEFT side against a fixed dimension — the realistic
  shape for a fact-to-dim join.

- `skew` — Zipf-robustness: one user is forced to ~10% of all events and
  one 4-gram run to ~30% document frequency, then the per-user operators
  run WITH and WITHOUT their caps and the jaccard family with its
  hot-shingle guard on vs effectively off.  This is the engine's
  time-slice-fairness discipline (reference
  processor/DefaultLogStreamProcessor.java:233-240: one hot log stream
  must not starve the rest) applied to analytics: bounded degradation
  with the guards on, measured cliff with them off.

Round 7 also adds `ann` — the embeddings table multiplied k× (re-keyed,
deterministically perturbed; quantizer seeds stay the base copy's) and the
ANN family timed per scale: pq_encode (the index build) plus the exact-L2
/ PQ / IVF-PQ top-k paths over 10 queries.  All four are corpus-linear
scans by design; the table verifies it.

Round 10 adds `spans` (VERDICT r9 task #1) — the span-dedup analog of the
`pairs` discipline: per-copy token prefixes (no k-gram window collides
across copies) plus a PLANTED fixed-rate duplicated-span set, so hit
fraction stays constant in k and measured growth is the plan's, not the
salted-copy fixture's (where every window turns cross-copy shared and hit
fraction rises with k — adversarial for a span remover by construction).

Round 11 adds `ann_incr` — the append_ann_codes write-path claim: a
FIXED-SIZE increment appended to an index whose base grows 1-64× must
cost the same at every scale (the append encodes only its own rows),
while a probe over the grown codes table grows with the base (the
contrast row proving the fixture scales).

Usage: python tools/scale_probe.py [sf_dir] [max_k] [scan|pairs|markov|events|skew|ann|ann_incr|spans]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from singer_spark.functions import clear_all_caches  # noqa: E402


def multiplied_docs(spark, sf_dir: str, k: int) -> DataFrame:
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = []
    for i in range(k):
        parts.append(base.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copysalt{i}")).alias("text"),
            "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def disjoint_docs(spark, sf_dir: str, k: int) -> DataFrame:
    """k copies whose TOKEN SPACES are disjoint (every token carries a
    per-copy prefix): shingles/signatures never collide across copies, so
    a pair operator's candidate set and output scale k×, not k² — the
    honest input for measuring pair-join scaling (the salted copies of
    `multiplied_docs` would near-duplicate each other and measure the
    synthetic corpus instead)."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = []
    for i in range(k):
        toks = F.split(F.col("text"), " ")
        prefixed = F.array_join(
            F.transform(toks, lambda t: F.concat(F.lit(f"c{i}x"), t)), " ")
        parts.append(base.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            prefixed.alias("text"), "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def disjoint_span_docs(spark, sf_dir: str, k: int,
                       boiler_every: int = 10,
                       boiler_len: int = 40) -> DataFrame:
    """The span-dedup analog of `disjoint_docs` (VERDICT r9 task #1): k
    copies with per-copy token PREFIXES — no k-gram window ever collides
    across copies — plus a PLANTED duplicated-span set at a fixed rate
    (every `boiler_every`-th doc gets the same `boiler_len`-token
    boilerplate run appended BEFORE prefixing, so within each copy the
    planted spans duplicate each other but never cross copies).  Hit
    fraction is therefore constant in k and output grows ~k×, isolating
    the PLAN's growth from the salted-copy fixture's artifact (where
    every window becomes cross-copy shared and hit fraction rises with
    k — adversarial for a span remover by construction)."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    boiler = " ".join(f"boilertok{j}" for j in range(boiler_len))
    planted = base.withColumn(
        "text",
        F.when(F.col("doc_id") % boiler_every == 0,
               F.concat(F.col("text"), F.lit(" " + boiler)))
        .otherwise(F.col("text")))
    parts = []
    for i in range(k):
        toks = F.split(F.col("text"), " ")
        prefixed = F.array_join(
            F.transform(toks, lambda t: F.concat(F.lit(f"c{i}x"), t)), " ")
        parts.append(planted.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            prefixed.alias("text"), "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def markov_docs(spark, n_docs: int, vocab: int = 4000,
                doc_len: int = 120, dup_every: int = 10) -> DataFrame:
    """Seeded synthetic corpus whose UNIQUE content grows with `n_docs`
    and whose near-duplicate density is FIXED: every doc is a word chain
    from a deterministic per-doc-seeded pseudo-Markov walk over a shared
    `vocab`-word space, and each `dup_every`-th doc re-generates its
    neighbor's chain with one token mutated (a true near-dup).

    This is the honest pair-operator input the salted-copy corpus can't
    be: duplicating a corpus k× inflates pair OUTPUT k²-fold by
    construction, and the disjoint-token corpus never collides across
    copies — here candidates and true pairs both grow ∝ n_docs while
    shingle vocabulary keeps growing, so measured growth is the PLAN's,
    not the generator's.  Generation is an Arrow-batched map over
    spark.range (distributed, reproducible per doc_id)."""
    import pandas as pd

    def gen(batches):
        import numpy as np

        for pdf in batches:
            texts = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                is_dup = dup_every and doc_id % dup_every == 0
                seed_id = doc_id + 1 if is_dup else doc_id
                rng = np.random.RandomState(seed_id % (2**31 - 1))
                cur = int(rng.randint(vocab))
                toks = []
                for _ in range(doc_len):
                    toks.append(f"w{cur}")
                    cur = int((cur * 131 + rng.randint(7)) % vocab)
                if is_dup:  # one-token mutation → near- not exact dup
                    toks[doc_len // 2] = f"w{(doc_id * 17) % vocab}x"
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    # source column in the fixture's 'src{n}' style so the scan-side
    # operator dict (per-source ops, seed predicates) runs unmodified in
    # `markovscan` mode; pair ops ignore it
    return (spark.range(n_docs).repartition(32)
            .mapInPandas(gen, "doc_id bigint, text string")
            .withColumn("source",
                        F.concat(F.lit("src"),
                                 (F.col("doc_id") % 20).cast("string"))))


TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings")


def scaled_events_dir(spark, sf_dir: str, k: int, root: str) -> str:
    """Materialize a scratch sf dir whose events.parquet is the base table
    multiplied k×: copy i re-keys user_id (+i·10_000) and event_id
    (+i·10_000_000) and shifts ts by i·31 days, so users are DISJOINT
    across copies (per-user history length constant — the growing-corpus
    shape) and the timeline extends.  All other tables symlink to the
    base dir, so registry queries run unmodified.  Written once per
    (sf_dir, k); reused on re-runs."""
    out = os.path.join(root, f"events_{k}x")
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    from singer_spark.session import read_events

    ev = read_events(spark, sf_dir)
    parts = []
    for i in range(k):
        parts.append(ev.select(
            (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i * 31} DAYS")).alias("ts"),
            (F.col("user_id") + F.lit(i * 10_000)).alias("user_id"),
            "event_type", "value", "props"))
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    scaled.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# The ~12 heaviest event-analytics registry entries — the queries a 100 TB
# event log actually runs (VERDICT r6 task #2 names funnels, sessionize,
# as-of, SCD2, rolling actives; the rest are the other per-user shuffles).
EVENT_QUERY_KEYS = (
    "funnel_counts", "funnel_windowed", "sessionize_events",
    "user_event_sequences", "event_pattern_match", "rolling_active_users",
    "cohort_retention", "multi_touch_attribution", "asof_join_events_orders",
    "scd2_user_value", "frequent_sequences", "debounce_events",
)


def event_ops(spark, ev_dir: str):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    return {name: (lambda n=name: qs[n](spark, ev_dir))
            for name in EVENT_QUERY_KEYS}


def pair_ops(docs: DataFrame):
    from singer_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    return {
        "ngram_jaccard_pairs": lambda: ngram_jaccard_pairs(docs, threshold=0.5),
        # budgeted twin: candidate generation capped at 600k total pairs
        # (dedup._pair_budget_threshold).  Sized to sit ABOVE this corpus's
        # 1x/4x candidate volume (plans identical there) and bind at 16x
        # (841k candidates -> the df>=3 classes demote, ~316k candidate
        # pairs dropped) — the graceful-degradation demo, not the cliff
        "ngram_jaccard_budget": lambda: ngram_jaccard_pairs(
            docs, threshold=0.5, pair_budget=600_000),
        "minhash_lsh_pairs": lambda: minhash_lsh_pairs(docs, threshold=0.5),
        "simhash_pairs": lambda: simhash_pairs(docs, max_hamming=3),
    }


def ops(docs: DataFrame):
    from singer_spark.operators.dedup import (
        minhash_signatures,
        segment_dedup,
        simhash_signatures,
    )
    from singer_spark.operators.text_analysis import (
        WORDPIECE_DEMO_WORDS,
        demo_vocab,
        hash_embed,
        ngram_lm_score,
        quality_features,
        wordpiece_encode,
    )

    return {
        "quality_features": lambda: quality_features(docs),
        "minhash_signatures": lambda: minhash_signatures(docs),
        "simhash_signatures": lambda: simhash_signatures(docs),
        "hash_embed": lambda: hash_embed(docs, dim=16),
        "ngram_lm_score": lambda: ngram_lm_score(docs),
        "wordpiece": lambda: wordpiece_encode(
            docs, demo_vocab(WORDPIECE_DEMO_WORDS)),
        "segment_dedup": lambda: segment_dedup(docs),
        "decontaminate_spans": lambda: _spans(docs),
        "heavy_hitters": lambda: _hh(docs),
        "bpe_learn+encode": lambda: _bpe(docs),
        "bpe_learn+encode_ranked": lambda: _bpe_ranked(docs),
        "bpe_learn+enc_joinback": lambda: _bpe_ranked(docs, joinback=True),
        "corpus_shuffle": lambda: _shuffle(docs),
        "dedup_spans": lambda: _dedup_spans(docs),
        "dsir_sample": lambda: _dsir(docs),
        "nb_quality": lambda: _nb_quality(docs),
        "unigram_train+encode": lambda: _unigram(docs),
        "corpus_diversity": lambda: _diversity(docs),
        "pack_bins": lambda: _pack_bins(docs),
        "unigram_em_soft": lambda: _em_soft(docs),
        "doremi_converge": lambda: _doremi(docs),
        "unigram_prune_loss": lambda: _prune_loss(docs),
        "window_boundaries": lambda: _win_bounds(docs),
        "unigram_to_size": lambda: _to_size(docs),
        "bin_boundaries": lambda: _bin_bounds(docs),
        # r14 rows (VERDICT r13 next #9): the rewritten retrieval /
        # repetition / reweight shapes and the full curate->batches chain
        "bm25_topk": lambda: _bm25(docs),
        "hybrid_rrf": lambda: _hybrid(docs),
        "repetition_chars": lambda: _repetition(docs),
        "source_reweight": lambda: _src_reweight(docs),
        "corpus_to_batches": lambda: _c2b(docs),
    }


def _bm25(docs: DataFrame) -> DataFrame:
    """bm25_topk post-r13/r14 rewrite: ONE corpus scan into the persisted
    (id, dl, tf-vector) proxy, stats as literals, TakeOrdered top-k —
    expected linear in the scan."""
    from singer_spark.operators.text_analysis import bm25_topk

    return bm25_topk(docs, ["join", "spark", "window"], k=20)


def _hybrid(docs: DataFrame) -> DataFrame:
    """hybrid_topk_rrf post-r14 fuse: ONE corpus scan computes the bm25
    proxy (JVM) and the hash embedding (Arrow kernel) together —
    expected linear in the scan, like each arm was separately."""
    from singer_spark.operators.text_analysis import hybrid_topk_rrf

    return hybrid_topk_rrf(docs, ["join", "spark", "window"], k=15)


def _repetition(docs: DataFrame) -> DataFrame:
    """repetition_signals post-r14 fused explode: one pass over the
    cached tokenize emits all nine gram families into one aggregation —
    expected linear in corpus tokens (the gram stream)."""
    from singer_spark.operators.text_analysis import repetition_signals

    return repetition_signals(docs)


def _src_reweight(docs: DataFrame) -> DataFrame:
    """One-step DoReMi post-r14 rollup+driver-step: the LM scoring pass
    plus ONE rollup(source) — expected to track ngram_lm_score."""
    from singer_spark.operators.text_analysis import source_reweight

    return source_reweight(docs)


def _c2b(docs: DataFrame) -> DataFrame:
    """The full curate -> train -> encode -> pack chain (the
    corpus_to_batches headliner's config, benchmark derived from the
    corpus itself like the registry entry) — the suite's most expensive
    query; expected ~linear (every stage is scan- or distinct-word-
    proportional)."""
    from singer_spark.curation import CurationConfig, corpus_to_batches

    cfg = CurationConfig(lang="en", min_quality=0.5,
                         repetition_screen=True, dedup="exact",
                         decontaminate_k=8, decontaminate_mode="drop",
                         split=True)
    return corpus_to_batches(
        docs, cfg, benchmark=docs.filter(F.col("doc_id") % 50 == 0),
        train_split_only=True, max_len=256, max_multi=100,
        max_piece_len=4, em_rounds=1, keep_ratio=0.6, max_word_len=16)


def _bin_bounds(docs: DataFrame) -> DataFrame:
    """Per-bin collator arrays (r13): the FFD histogram solve (driver,
    cost in distinct lengths) + one bin-keyed groupBy building the
    arrays — expected ~linear in the tokenize + rank scans, rows ≈
    tokens/max_len."""
    from singer_spark.operators.packing import bin_boundaries, pack_bins

    return bin_boundaries(pack_bins(docs, max_len=256), max_len=256)


def _to_size(docs: DataFrame) -> DataFrame:
    """Shrink-to-target trainer + encode (r13): two (EM, prune) cycles
    over the one persisted distinct-word frame, landing on 40 multis —
    expected near-flat like the other distinct-word trainers, with the
    final encode the only corpus-linear pass."""
    from singer_spark.operators.text_analysis import (unigram_encode,
                                                      unigram_train_to_size)

    vocab = unigram_train_to_size(docs, target_multi=40, shrink=0.6,
                                  rounds=2, max_multi=100,
                                  max_piece_len=4)
    return unigram_encode(docs, vocab)


def _prune_loss(docs: DataFrame) -> DataFrame:
    """Loss-ranked prune + encode (r13): the per-piece banned-lattice
    loss pass runs on the DISTINCT-word table like the soft-EM step
    (sub-linear once the word set saturates), usage counts share the
    same frame, encode is the corpus-linear Arrow pass."""
    from singer_spark.operators.text_analysis import (unigram_encode,
                                                      unigram_prune,
                                                      unigram_vocab)

    vocab = unigram_vocab(docs, max_multi=100, max_piece_len=4)
    pruned = unigram_prune(docs, vocab, keep_ratio=0.6, rank="loss")
    return unigram_encode(docs, pruned)


def _win_bounds(docs: DataFrame) -> DataFrame:
    """Per-window collator arrays (r13): the pack layout plus one
    chunk-keyed groupBy building the boundary/segment arrays with JVM
    higher-order functions — expected ~linear (rows ≈ tokens/max_len,
    each O(max_len) array work)."""
    from singer_spark.operators.packing import (pack_sequences,
                                                window_boundaries)

    return window_boundaries(pack_sequences(docs, max_len=256),
                             max_len=256)


def _em_soft(docs: DataFrame) -> DataFrame:
    """Soft-EM round + marginal NLL (r12): forward-backward over the
    DISTINCT-word table (sub-linear once the word set saturates, the
    trainer shape), edge explode + exact integer sums for the expected
    counts — expected ~linear in the word-count scan."""
    from singer_spark.operators.text_analysis import (unigram_em_converge,
                                                      unigram_vocab)

    vocab = unigram_vocab(docs, max_multi=100, max_piece_len=4)
    return unigram_em_converge(docs, vocab, rounds=1, mode="soft")


def _doremi(docs: DataFrame) -> DataFrame:
    """Iterated DoReMi (r12): the corpus LM-scores once into a persisted
    frame; each round is one per-source window pass + k-row weight
    arithmetic — expected ~linear in the scoring pass, near-flat per
    extra round."""
    from singer_spark.operators.text_analysis import source_reweight_converge

    return source_reweight_converge(docs, rounds=2)


def _pack_bins(docs: DataFrame) -> DataFrame:
    """Histogram-FFD bin packing: the solve is driver-local over the
    bounded length histogram, the per-doc mapping is rank arithmetic —
    expected ~linear in the tokenize + rank scans."""
    from singer_spark.operators.packing import pack_bins

    return pack_bins(docs, max_len=256)


def _nb_quality(docs: DataFrame) -> DataFrame:
    """Learned quality filter: one token shuffle for the class counts,
    vocab-capped broadcast model, one per-doc sum — expected ~linear
    (the model stays <=1000 rows at every scale)."""
    from singer_spark.operators.text_analysis import nb_quality_scores

    return nb_quality_scores(docs, F.col("source") == "src0",
                             max_vocab=1000)


def _unigram(docs: DataFrame) -> DataFrame:
    """Unigram-LM train+apply: vocab derivation on the distinct-word
    table (sub-linear once the word set saturates, the BPE-trainer
    shape), encode is one Arrow pass with a per-batch word memo —
    expected ~linear in the encode scan."""
    from singer_spark.operators.text_analysis import (unigram_encode,
                                                      unigram_vocab)

    vocab = unigram_vocab(docs, max_multi=100, max_piece_len=4)
    return unigram_encode(docs, vocab)


def _diversity(docs: DataFrame) -> DataFrame:
    """Distinct-n report: one scan, tagged gram explode, two
    aggregations — expected ~linear with a combiner-collapsed shuffle."""
    from singer_spark.operators.text_analysis import corpus_diversity

    return corpus_diversity(docs)


def _dedup_spans(docs: DataFrame) -> DataFrame:
    """Cross-doc duplicate-span removal: digest explode + owner agg +
    coverage rebuild — expected ~linear (the owner agg is the
    data-proportional shuffle)."""
    from singer_spark.operators.dedup import dedup_spans

    return dedup_spans(docs, k=8)


def _dsir(docs: DataFrame) -> DataFrame:
    """DSIR featurize+score+Gumbel-cut with a fixed-size target slice:
    models stay 1024-row broadcasts at every scale — expected ~linear in
    the featurize pass."""
    from singer_spark.operators.text_analysis import dsir_sample

    return dsir_sample(docs, docs.where(F.col("source") == "src0"),
                       k=50, n_buckets=1024)


def _bpe(docs: DataFrame) -> DataFrame:
    """Tokenizer train+apply: merge learning runs on the distinct-word
    table (sub-linear in the corpus once vocab saturates), encode is the
    corpus-linear replace chain."""
    from singer_spark.operators.text_analysis import bpe_encode, bpe_learn_merges

    merges = [(r.left_sym, r.right_sym)
              for r in bpe_learn_merges(docs, n_merges=12).collect()]
    return bpe_encode(docs, merges)


def _bpe_ranked(docs: DataFrame, joinback: bool = False) -> DataFrame:
    """Same train pass, PRODUCTION encode (r8/r10): distinct-word heap
    kernel, then the r10 vocab-size-gated apply — broadcast-dict per-doc
    pass by default (no posexplode/join/regroup), or the word-keyed
    join-back when `joinback` forces the unbounded-vocab path.  Both
    value-identical; cost independent of merge count either way (the
    chain column stops being runnable past ~700 merges; see bpe mode)."""
    from singer_spark.operators.text_analysis import (
        bpe_encode_ranked,
        bpe_learn_merges,
    )

    merges = [(r.left_sym, r.right_sym)
              for r in bpe_learn_merges(docs, n_merges=12).collect()]
    return bpe_encode_ranked(docs, merges,
                             broadcast_vocab_limit=0 if joinback else 2_000_000)


def _shuffle(docs: DataFrame) -> DataFrame:
    from singer_spark.operators.ids import corpus_shuffle

    return corpus_shuffle(docs, num_shards=8)


def _spans(docs: DataFrame) -> DataFrame:
    from singer_spark.operators.text_analysis import decontaminate_spans

    return decontaminate_spans(docs, docs.filter(F.col("doc_id") % 50 == 0))


def _hh(docs: DataFrame) -> DataFrame:
    from singer_spark.operators.diagnostics import heavy_hitters

    toks = (docs.select(F.explode(F.split("text", r"\s+")).alias("token"))
            .where(F.col("token") != ""))
    return heavy_hitters(toks, "token", min_share=0.02)


def spans_main(spark, sf_dir: str, ks: list[int]) -> None:
    """Span-dedup scale table on the DISJOINT fixture (VERDICT r9 task
    #1): wall time + removed-token mass per scale.  Removed tokens must
    grow ~k× (the planted duplicated-span rate is fixed per copy); the
    time curve is then the plan's, not the fixture's — decomposing the
    salted-copy table's 6.1×-at-64× into fixture artifact vs structure."""
    from singer_spark.operators.dedup import dedup_spans

    results: dict[str, dict[int, float]] = {}
    removed: dict[str, dict[int, int]] = {}
    for k in ks:
        docs = disjoint_span_docs(spark, sf_dir, k).persist()
        docs.count()
        builds = {
            "dedup_spans": lambda: dedup_spans(docs, k=8),
            "dedup_spans_minrun": lambda: dedup_spans(docs, k=8, min_run=16),
        }
        for name, build in builds.items():
            results.setdefault(name, {})[k] = _timed(build)
            removed.setdefault(name, {})[k] = build().agg(
                F.sum("n_removed")).collect()[0][0]
            clear_all_caches(spark)
        docs.unpersist()
        clear_all_caches(spark)
    hdr = "operator".ljust(20) + "".join(f"  {k}x".rjust(8) for k in ks) + "   growth"
    print(hdr)
    for name, times in results.items():
        ratio = times[ks[-1]] / times[ks[0]]
        row = name.ljust(20) + "".join(f"{times[k]:8.2f}" for k in ks)
        print(f"{row}   {ratio:.1f}x over {ks[-1]}x data")
    print("\nremoved tokens (planted dup rate fixed per copy; "
          "linear plan -> ~kx removal, ~kx time)")
    print("operator".ljust(20) + "".join(f"  {k}x".rjust(10) for k in ks))
    for name, by_k in removed.items():
        print(name.ljust(20) + "".join(f"{by_k[k]:10d}" for k in ks))


def _timed(build, runs: int = 3) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def events_main(spark, sf_dir: str, ks: list[int]) -> None:
    import tempfile

    root = tempfile.mkdtemp(prefix="scale_events_")
    results: dict[str, dict[int, float]] = {}
    for k in ks:
        ev_dir = scaled_events_dir(spark, sf_dir, k, root)
        for name, build in event_ops(spark, ev_dir).items():
            results.setdefault(name, {})[k] = _timed(build)
        clear_all_caches(spark)
    hdr = "query".ljust(26) + "".join(f"  {k}x".rjust(8) for k in ks) + "   growth"
    print(hdr)
    for name, times in results.items():
        ratio = times[ks[-1]] / times[ks[0]]
        row = name.ljust(26) + "".join(f"{times[k]:8.2f}" for k in ks)
        print(f"{row}   {ratio:.1f}x over {ks[-1]}x data")


def multiplied_emb(spark, sf_dir: str, k: int) -> DataFrame:
    """k copies of the embeddings table, re-keyed and deterministically
    perturbed per copy (copies are near- but not exact duplicates; the
    codebook/centroid seeds vec_id < 32 stay the base copy's, as a real
    grown corpus keeps its trained quantizer)."""
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    parts = []
    for i in range(k):
        parts.append(base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.transform("embedding",
                        lambda x: x * (1.0 + 0.0001 * i) + 0.0003 * i
                        ).alias("embedding"),
            "label"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ann_ops(emb: DataFrame):
    """The ANN family's corpus-linear passes: encode (the index build) and
    the three top-k paths over 10 queries.  Builders construct the
    operator fresh each run, so the bounded driver-side stages (codebook
    seeds, query LUTs) are INSIDE the timing — the honest per-batch cost a
    production query pays."""
    from singer_spark.operators.similarity import (
        _pq_seed_codebooks,
        ivfpq_ann_topk,
        l2_topk,
        pq_ann_topk,
        pq_encode,
    )

    q = emb.filter(F.col("vec_id") < 10)
    return {
        "pq_encode": lambda: pq_encode(
            emb, _pq_seed_codebooks(emb, 8, 16, "vec_id", "embedding")),
        "l2_exact_topk": lambda: l2_topk(emb, q, 5),
        "pq_ann_topk": lambda: pq_ann_topk(emb, q, 5),
        "ivfpq_ann_topk": lambda: ivfpq_ann_topk(emb, q, 5),
        "embedding_pca": lambda: _pca(emb),
        "cluster_balanced": lambda: _cbs(emb),
    }


def _cbs(emb: DataFrame) -> DataFrame:
    """Lloyd train (2 iters, k·dim collect per iter) + assignment pass +
    integer budgets + per-cluster md5 rank — expected ~linear (the rank
    window partitions by cluster)."""
    from singer_spark.operators.similarity import cluster_balanced_sample

    return cluster_balanced_sample(emb, k=100, n_clusters=8, iters=2)


def _pca(emb: DataFrame) -> DataFrame:
    """One moments pass (dim²-per-partition driver traffic) + driver
    eigensolve + shuffle-free projection — corpus-linear by design."""
    from singer_spark.operators.similarity import pca_project

    return pca_project(emb, iters=8)


def ann_main(spark, sf_dir: str, ks: list[int]) -> None:
    results: dict[str, dict[int, float]] = {}
    for k in ks:
        emb = multiplied_emb(spark, sf_dir, k).persist()
        emb.count()
        for name, build in ann_ops(emb).items():
            results.setdefault(name, {})[k] = _timed(build)
        emb.unpersist()
        clear_all_caches(spark)
    hdr = "query".ljust(26) + "".join(f"  {k}x".rjust(8) for k in ks) + "   growth"
    print(hdr)
    for name, times in results.items():
        ratio = times[ks[-1]] / times[ks[0]]
        row = name.ljust(26) + "".join(f"{times[k]:8.2f}" for k in ks)
        print(f"{row}   {ratio:.1f}x over {ks[-1]}x data")


def ann_incr_main(spark, sf_dir: str, ks: "list[int]") -> None:
    """r11 (VERDICT r10 task #4 evidence): the append_ann_codes claim —
    appending a FIXED-SIZE increment to a stored index costs the same
    whether the base corpus is 1x or 64x, because the append encodes
    only its own rows (the base is never re-read).  Per base scale k:
    build the index over k-times-multiplied embeddings (untimed setup),
    then time (a) append of the same fixed increment — expect ~FLAT —
    and (b) a 10-query probe over the grown codes table — expect
    ~linear in the base, the contrast row that shows the fixture is
    actually growing."""
    import shutil
    import tempfile

    from singer_spark.operators.similarity import (
        append_ann_codes,
        ivfpq_ann_topk,
        ivfpq_encode,
        ivfpq_train_model,
        save_ann_model,
    )

    base1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # fixed increment: the base copy re-keyed far above any scaled id,
    # deterministically perturbed — its size never changes with k
    incr = base1.select(
        (F.col("vec_id") + F.lit(900_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.0001 + 0.0007)
        .alias("embedding"), "label").persist()
    n_incr = incr.count()
    # a real grown index keeps its trained quantizer: train ONCE on the
    # base copy, reuse across scales
    C, CB = ivfpq_train_model(base1, n_clusters=16, m=8, kc=16,
                              iters_coarse=1, iters_pq=1)
    q = base1.filter(F.col("vec_id") < 10)
    root = tempfile.mkdtemp(prefix="scale_ann_incr_")
    t_append: dict[int, float] = {}
    t_probe: dict[int, float] = {}
    n_base: dict[int, int] = {}
    for k in ks:
        base = multiplied_emb(spark, sf_dir, k).persist()
        n_base[k] = base.count()
        path = os.path.join(root, f"idx_{k}")
        save_ann_model(spark, path, "ivfpq", centroids=C, codebooks=CB,
                       codes=ivfpq_encode(base, (C, CB)))  # untimed build
        ts = []
        for _ in range(3):
            t0 = time.time()
            append_ann_codes(spark, path, incr)
            ts.append(time.time() - t0)
        t_append[k] = statistics.median(ts)
        grown = spark.read.parquet(f"{path}/codes")
        t_probe[k] = _timed(lambda: ivfpq_ann_topk(
            base, q, 5, nprobe=4, model=(C, CB), encoded=grown))
        base.unpersist()
        clear_all_caches(spark)
    incr.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    hdr = ("op".ljust(26) + "".join(f"  {k}x".rjust(8) for k in ks)
           + "   growth")
    print(f"fixed increment: {n_incr} rows; base rows per scale: "
          + ", ".join(f"{k}x={n_base[k]}" for k in ks))
    print(hdr)
    for name, times in (("append_fixed_increment", t_append),
                        ("probe_grown_codes", t_probe)):
        ratio = times[ks[-1]] / times[ks[0]]
        row = name.ljust(26) + "".join(f"{times[k]:8.2f}" for k in ks)
        print(f"{row}   {ratio:.1f}x over {ks[-1]}x data")


def bpe_main(spark, sf_dir: str, max_merges: int = 1000) -> None:
    """Encoder-shape probe (VERDICT r7 wrong #1): the replace-CHAIN
    encoder grows O(n_merges) plan nodes and per-document work, the
    RANKED encoder is merge-count-independent.  Learned merges padded
    with never-firing synthetic pairs isolate the structural cost: both
    encoders produce byte-identical output at every size (the pads
    cannot fire), so the time curve is pure plan/algorithm shape."""
    from singer_spark.operators.text_analysis import (
        bpe_encode,
        bpe_encode_ranked,
        bpe_learn_merges,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    docs.count()
    learned = [(r.left_sym, r.right_sym)
               for r in bpe_learn_merges(docs, n_merges=12).collect()]
    sizes = [12]
    while sizes[-1] < max_merges:
        sizes.append(min(max_merges, sizes[-1] * 4))

    def padded(n):
        return learned + [(f"¤{i}", "¤")
                          for i in range(max(0, n - len(learned)))]

    # ranked FIRST across all sizes: the chain's failure mode at large n
    # is a JVM StackOverflowError (measured at 768 merges: StringReplace
    # doGenCode recursion), which can take the py4j gateway with it
    ranked: dict[int, tuple[float, int]] = {}
    for n in sizes:
        r_df = bpe_encode_ranked(docs, padded(n))
        r_lines = r_df._jdf.queryExecution().optimizedPlan() \
            .treeString().count("\n")
        ranked[n] = (_timed(lambda: bpe_encode_ranked(docs, padded(n))),
                     r_lines)
        clear_all_caches(spark)
    print("n_merges   ranked_sec  ranked_plan_lines")
    for n in sizes:
        print(f"{n:8d}   {ranked[n][0]:10.2f}  {ranked[n][1]:17d}")
    print("n_merges   chain_sec")
    for n in sizes:
        try:
            # one run for the chain at large n — the point is the
            # blow-up, not a tight median
            c_sec = f"{_timed(lambda: bpe_encode(docs, padded(n)), runs=3 if n <= 64 else 1):9.2f}"
        except Exception as exc:  # codegen/JVM collapse IS a result
            print(f"{n:8d}   FAIL({type(exc).__name__})")
            print("chain aborted: JVM-level failure ends the column")
            break
        print(f"{n:8d}   {c_sec}")
        clear_all_caches(spark)
    docs.unpersist()


def skew_main(spark, sf_dir: str, k: int = 1) -> None:
    """Zipf-robustness probe: measured wall-time of the per-user and pair
    operators on a deliberately skewed corpus, with the engine's guards on
    vs off.  The discipline is the reference's time-slice fairness
    (processor/DefaultLogStreamProcessor.java:233-240): one hot key must
    degrade boundedly, never starve the rest of the corpus."""
    import tempfile

    from singer_spark.operators.dedup import ngram_jaccard_pairs
    from singer_spark.queries import (
        funnel_counts,
        sessionize_events,
        user_event_sequences,
    )
    from singer_spark.session import read_events

    # --- skewed events: user 0 forced to ~10% of ALL events -------------
    root = tempfile.mkdtemp(prefix="scale_skew_")
    ev_dir = os.path.join(root, "skewed")
    os.makedirs(ev_dir, exist_ok=True)
    if k > 1:  # harsher probe: skew a k×-scaled corpus (hot user grows k×)
        sf_dir_events = scaled_events_dir(spark, sf_dir, k, root)
    else:
        sf_dir_events = sf_dir
    ev = read_events(spark, sf_dir_events).withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 == 0, F.lit(0)).otherwise(F.col("user_id")))
    ev.write.mode("overwrite").parquet(os.path.join(ev_dir, "events.parquet"))
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(ev_dir, f"{t}.parquet"))
    hot_n = spark.read.parquet(os.path.join(ev_dir, "events.parquet")) \
        .where("user_id = 0").count()
    total = read_events(spark, sf_dir_events).count()
    print(f"skewed events: user 0 holds {hot_n}/{total} events "
          f"({100.0 * hot_n / total:.1f}%)")

    scenarios = [
        ("funnel uncapped", lambda: funnel_counts(spark, ev_dir)),
        ("funnel cap=1000", lambda: funnel_counts(spark, ev_dir,
                                                  max_events_per_key=1000)),
        ("sessionize (window spills)", lambda: sessionize_events(spark, ev_dir)),
        ("sequences uncapped", lambda: user_event_sequences(spark, ev_dir)),
        ("sequences cap=1000", lambda: user_event_sequences(
            spark, ev_dir, max_events_per_key=1000)),
    ]

    # --- skewed documents: one shared 4-gram run at ~30% df -------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "text",
        F.when(F.col("doc_id") % 10 < 3,
               F.concat(F.col("text"), F.lit(" zq1 zq2 zq3 zq4 zq5")))
        .otherwise(F.col("text")))
    n_hot_docs = docs.where("doc_id % 10 < 3").count()
    print(f"skewed documents: shared 4-gram run in {n_hot_docs} docs "
          f"(~{100.0 * 3 / 10:.0f}% df; guard cap is 256)")
    scenarios += [
        ("jaccard guard on (df<=256)", lambda: ngram_jaccard_pairs(
            docs, threshold=0.5)),
        # guard effectively OFF: the hot lists enter candidate generation
        # and each emits C(df,2) pairs — the cliff the cap prevents
        ("jaccard guard off (df<=10^6)", lambda: ngram_jaccard_pairs(
            docs, threshold=0.5, max_shingle_df=1_000_000)),
    ]

    print("scenario".ljust(32) + "   sec")
    times: dict[str, float] = {}
    for name, build in scenarios:
        sec = _timed(build)
        times[name] = sec
        print(f"{name.ljust(32)}{sec:7.2f}")
        clear_all_caches(spark)
    # the headline ratios the README table cites: capped/guarded vs open
    for on, off in (("funnel cap=1000", "funnel uncapped"),
                    ("sequences cap=1000", "sequences uncapped"),
                    ("jaccard guard on (df<=256)", "jaccard guard off (df<=10^6)")):
        if times.get(off):
            print(f"ratio {on} / {off}: {times[on] / times[off]:.2f}x")


def main(sf_dir: str = "/root/testdata/sf0.1", max_k: int = 4,
         mode: str = "scan", only: str = "") -> None:
    from singer_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as _pd  # noqa: F401

    spark.range(64).repartition(32).mapInPandas(
        lambda it: (p for p in it), "id bigint").count()

    if mode == "skew":
        skew_main(spark, sf_dir, k=max_k)
        spark.stop()
        return
    if mode == "bpe":
        bpe_main(spark, sf_dir, max_merges=max(max_k, 1000))
        spark.stop()
        return
    if mode == "events":
        ks = [1]
        while ks[-1] * 4 <= max_k:
            ks.append(ks[-1] * 4)
        events_main(spark, sf_dir, ks)
        spark.stop()
        return
    if mode == "ann":
        ks = [1]
        while ks[-1] * 4 <= max_k:
            ks.append(ks[-1] * 4)
        ann_main(spark, sf_dir, ks)
        spark.stop()
        return
    if mode == "ann_incr":
        ks = [1]
        while ks[-1] * 4 <= max_k:
            ks.append(ks[-1] * 4)
        ann_incr_main(spark, sf_dir, ks)
        spark.stop()
        return
    if mode == "spans":
        ks = [1]
        while ks[-1] * 4 <= max_k:
            ks.append(ks[-1] * 4)
        spans_main(spark, sf_dir, ks)
        spark.stop()
        return

    # ×4 steps: at sf0.1 the corpus is ~1.5 MB of text, and below ~10 MB
    # fixed per-job overhead (scheduling, Arrow worker fan-out) swamps the
    # data-dependent cost — the curve only shows at 16×-64×
    ks = [1]
    while ks[-1] * 4 <= max_k:
        ks.append(ks[-1] * 4)
    if mode == "markov":
        make_docs = lambda sp, _sf, k: markov_docs(sp, 5000 * k)  # noqa: E731
        make_ops = pair_ops
    elif mode == "markovscan":
        # scan-side ops on UNIQUE-content growth — the fixture that
        # separates "plan grows" from "salted copies mint k× grams"
        # (the corpus_diversity 10.0× README row reproduces here)
        make_docs = lambda sp, _sf, k: markov_docs(sp, 5000 * k)  # noqa: E731
        make_ops = ops
    elif mode == "pairs":
        make_docs, make_ops = disjoint_docs, pair_ops
    else:
        make_docs, make_ops = multiplied_docs, ops
    results: dict[str, dict[int, float]] = {}
    pairs: dict[str, dict[int, int]] = {}
    for k in ks:
        # persist (not localCheckpoint): checkpoint blocks from earlier
        # scales cannot be dropped and accumulate into a driver OOM by 16×
        docs = make_docs(spark, sf_dir, k).persist()
        docs.count()
        wanted = {w for w in only.split(",") if w}
        for name, build in make_ops(docs).items():
            if wanted and name not in wanted:
                continue
            ts = []
            for _ in range(3):
                t0 = time.time()
                build().write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            if make_ops is pair_ops:
                pairs.setdefault(name, {})[k] = build().count()
            results.setdefault(name, {})[k] = statistics.median(ts)
            # drop THIS op's registered caches before the next op runs:
            # at 64x the heavyweight chains (corpus_to_batches, doremi)
            # otherwise stack their persisted frames until the driver
            # heap dies (r14: the 64x probe OOM'd exactly this way).
            # release_cache_handles() drains only maybe_persist-
            # registered frames — the probe's own docs.persist() stays.
            from singer_spark.functions import release_cache_handles
            release_cache_handles()
        docs.unpersist()
        clear_all_caches(spark)
    hdr = "operator".ljust(20) + "".join(f"  {k}x".rjust(8) for k in ks) + "   growth"
    print(hdr)
    for name, times in results.items():
        ratio = times[ks[-1]] / times[ks[0]]
        row = name.ljust(20) + "".join(f"{times[k]:8.2f}" for k in ks)
        print(f"{row}   {ratio:.1f}x over {ks[-1]}x data")
    if pairs:
        print("\npairs found (near-dup density fixed by the generator; "
              "linear plan → ~k× pairs, ~k× time)")
        print("operator".ljust(20) + "".join(f"  {k}x".rjust(10) for k in ks))
        for name, by_k in pairs.items():
            print(name.ljust(20) + "".join(f"{by_k[k]:10d}" for k in ks))
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:5]
    main(*(int(a) if i == 1 else a for i, a in enumerate(args)))
