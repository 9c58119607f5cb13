"""Unit tests for the round-4 training-pipeline additions: overlap
(containment) dedup, corpus mixing to a token budget, and per-source
TF-IDF profiling.  Semantics are pinned against brute-force Python on
constructed corpora; the cross-engine value check lives in the
verify_local/driver oracles."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


# ---------------------------------------------------------------------------
# overlap_pairs — containment that Jaccard misses
# ---------------------------------------------------------------------------
def test_overlap_catches_contained_quote(spark):
    from singer_spark.operators.dedup import ngram_jaccard_pairs, overlap_pairs

    long_words = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(20, 30))  # verbatim slice
    other = " ".join(f"z{i}" for i in range(40))
    docs = _docs_df(spark, [(1, long_words, "a"), (2, quote, "b"), (3, other, "c")])

    ov = {(r.id_a, r.id_b): (r.overlap, r.jaccard)
          for r in overlap_pairs(docs, k=4, threshold=0.8).collect()}
    assert (1, 2) in ov
    overlap, jaccard = ov[(1, 2)]
    # every 4-shingle of the quote appears in the long doc
    assert overlap == 1.0
    # ... but the union is dominated by the long doc: Jaccard-only dedup
    # at the same threshold never surfaces this pair
    assert jaccard < 0.2
    jac_pairs = ngram_jaccard_pairs(docs, k=4, threshold=0.8).collect()
    assert not any({r.id_a, r.id_b} == {1, 2} for r in jac_pairs)
    assert not any(set(pair) == {1, 3} for pair in ov)


def test_pair_budget_flood_degrades_measurably(spark):
    """A boilerplate-flooded corpus under a pair_budget: the df cap
    tightens, dropped_pairs reports exactly what was given up, emitted
    pairs are a subset of the uncapped set with IDENTICAL jaccard values
    (the hot-array correction keeps `shared` exact)."""
    from singer_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_pair_budget_report,
    )

    # 12 docs sharing a verbatim boilerplate run (its shingles hit df=12)
    # + per-doc unique tails; 3 genuine near-dup docs via a distinct run
    boiler = " ".join(f"b{i}" for i in range(10))
    near = " ".join(f"n{i}" for i in range(12))
    rows = [(i, f"{boiler} u{i}a u{i}b u{i}c u{i}d", "s") for i in range(12)]
    rows += [(100 + j, f"{near} t{j}", "s") for j in range(3)]
    docs = _docs_df(spark, rows)

    # budget below the flood's pair volume: the df-12 boilerplate lists
    # must demote while the df-3 near-dup lists survive
    budget = 60
    rep = shingle_pair_budget_report(docs, pair_budget=budget).collect()[0]
    assert rep.dropped_pairs > 0 and rep.demoted_lists > 0
    assert rep.kept_pairs <= budget
    full = {(r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    capped = {(r.id_a, r.id_b): r.jaccard
              for r in ngram_jaccard_pairs(docs, threshold=0.3,
                                           pair_budget=budget).collect()}
    assert set(capped) < set(full)          # recall traded, measurably
    for pair, jac in capped.items():
        assert jac == full[pair]            # precision and values intact
    # the genuine near-dups (df=3 lists, inside budget) still surface
    assert any({a, b} <= {100, 101, 102} for a, b in capped)
    # report's accounting matches the uncapped candidate volume
    rep_full = shingle_pair_budget_report(docs,
                                          pair_budget=10**9).collect()[0]
    assert rep_full.dropped_pairs == 0
    assert rep.kept_pairs + rep.dropped_pairs == rep_full.kept_pairs


def test_overlap_matches_bruteforce(spark, sf_dir):
    """Overlap over real docs == brute-force shingle-set arithmetic."""
    from singer_spark.operators.dedup import overlap_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.select("doc_id", "text").collect()

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i:i + 4]) for i in range(max(len(toks) - 3, 1))}

    sets = {r.doc_id: shingles(r.text) for r in rows}
    expected = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = len(sets[a] & sets[b])
            if shared and shared / min(len(sets[a]), len(sets[b])) >= 0.6:
                expected[(a, b)] = math.floor(
                    shared / min(len(sets[a]), len(sets[b])) * 10000 + 0.5) / 10000

    got = {(r.id_a, r.id_b): r.overlap
           for r in overlap_pairs(docs, k=4, threshold=0.6).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# corpus_mix_sample — weighted greedy fill to a token budget
# ---------------------------------------------------------------------------
def _mix(spark, sf_dir, weights, frac=0.3):
    from singer_spark.operators.text_analysis import corpus_mix_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_mix_sample(docs, weights, token_frac=frac)


def test_corpus_mix_budget_and_greedy_prefix(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    weights = {f"src{i}": (2.0 if i < 5 else 1.0) for i in range(20)}
    present = {r.source for r in docs.select("source").distinct().collect()}
    wsum = sum(w for s, w in weights.items() if s in present)

    out = _mix(spark, sf_dir, weights).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) <= present and by_src
    for src, rows in by_src.items():
        allotted = 0.3 * total * weights.get(src, 1.0) / wsum
        toks = sum(r.n_tokens for r in rows)
        # greedy prefix: everything before the crossing doc fits the
        # allotment; at most one doc overshoots it
        assert toks - max(r.n_tokens for r in rows) < allotted
        src_total = docs.filter(F.col("source") == src) \
                        .select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
        if src_total > allotted:  # source had enough to fill its budget
            assert toks >= allotted

    # deterministic: a second run selects the identical set
    again = {(r.doc_id, r.n_tokens) for r in _mix(spark, sf_dir, weights).collect()}
    assert again == {(r.doc_id, r.n_tokens) for r in out}


def test_corpus_mix_weights_shift_allocation(spark, sf_dir):
    """Doubling one source's weight must not shrink its selected tokens."""
    flat = _mix(spark, sf_dir, {}, frac=0.2).collect()
    boosted = _mix(spark, sf_dir, {"src1": 4.0}, frac=0.2).collect()

    def toks(rows, src):
        return sum(r.n_tokens for r in rows if r.source == src)

    assert toks(boosted, "src1") >= toks(flat, "src1")
    # monotone in the budget: a bigger frac selects a superset
    small = {r.doc_id for r in _mix(spark, sf_dir, {}, frac=0.1).collect()}
    large = {r.doc_id for r in _mix(spark, sf_dir, {}, frac=0.4).collect()}
    assert small <= large


# ---------------------------------------------------------------------------
# tfidf_top_terms — per-source vocabulary profile
# ---------------------------------------------------------------------------
def test_tfidf_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from singer_spark.operators.text_analysis import tfidf_top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.select("source", "text").collect()
    tf = Counter()
    sources_of = {}
    for r in rows:
        for t in r.text.lower().split(" "):
            if t:
                tf[(r.source, t)] += 1
                sources_of.setdefault(t, set()).add(r.source)
    n_sources = len({r.source for r in rows})

    expected = {}
    per_src = {}
    for (src, term), c in tf.items():
        score = math.floor(
            c * math.log((n_sources + 1) / (len(sources_of[term]) + 1))
            * 10000 + 0.5) / 10000
        per_src.setdefault(src, []).append((-score, term, c))
    for src, items in per_src.items():
        for neg, term, c in sorted(items)[:10]:
            expected[(src, term)] = (c, -neg)

    got = {(r.source, r.term): (r.tf, r.score)
           for r in tfidf_top_terms(docs, k=10).collect()}
    assert got == expected
    counts = Counter(s for s, _ in got)
    assert all(v == 10 for v in counts.values())


def test_ngram_lm_scores_fluent_below_surprising(spark):
    from singer_spark.operators.text_analysis import ngram_lm_score

    # LM trained on repetitions of "a b"; a doc following that pattern is
    # fluent (low score), a doc of never-seen bigrams is surprising (high)
    lm = _docs_df(spark, [(100 + i, "a b a b a b a b", "s") for i in range(5)])
    docs = _docs_df(spark, [
        (1, "a b a b", "s"),
        (2, "x y z q", "s"),      # every bigram unseen → add-one floor
        (3, "solo", "s"),         # no bigrams
    ])
    got = {r.doc_id: r for r in ngram_lm_score(docs, lm_docs=lm).collect()}
    assert got[1].lm_score < got[2].lm_score
    assert got[3].n_bigrams == 0 and got[3].lm_score is None
    assert got[1].n_bigrams == 3 and got[2].n_bigrams == 3


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from singer_spark.operators.text_analysis import weighted_sample_k

    rows = [(i, f"t{i}", "s") for i in range(200)]
    docs = _docs_df(spark, rows).withColumn(
        "w", F.when(F.col("doc_id") < 100, 1000.0).otherwise(1.0))
    a = [r.doc_id for r in weighted_sample_k(docs, 20, "w").collect()]
    b = [r.doc_id for r in weighted_sample_k(docs, 20, "w").collect()]
    assert a == b  # same salt → identical draw
    # 1000:1 weights: the heavy half should dominate the sample
    assert sum(1 for i in a if i < 100) >= 18
    c = [r.doc_id for r in weighted_sample_k(docs, 20, "w", salt="other").collect()]
    assert a != c  # different salt → independent draw
    # zero/negative weights are excluded; k >= N returns all positive rows
    small = _docs_df(spark, [(1, "x", "s"), (2, "y", "s")]).withColumn(
        "w", F.when(F.col("doc_id") == 1, 5.0).otherwise(0.0))
    got = [r.doc_id for r in weighted_sample_k(small, 10, "w").collect()]
    assert got == [1]


def test_bm25_ranks_term_dense_docs_first(spark):
    from singer_spark.operators.text_analysis import bm25_topk

    docs = _docs_df(spark, [
        (1, "spark spark spark filler filler", "s"),   # dense in one term
        (2, "spark join window filler filler", "s"),   # matches all terms
        (3, "filler filler filler filler filler", "s"),  # no match
        (4, "join filler filler filler filler", "s"),
    ])
    got = bm25_topk(docs, ["spark", "join", "window"], k=10).collect()
    ids = [r.doc_id for r in got]
    assert 3 not in ids                      # non-matching doc excluded
    assert ids[0] == 2                       # all three terms beat one term
    by_id = {r.doc_id: r for r in got}
    assert by_id[2].matched_terms == 3
    assert by_id[1].matched_terms == 1
    assert by_id[1].score > by_id[4].score   # 3×tf beats 1×tf, same length


def test_hybrid_rrf_fuses_lexical_and_dense_arms(spark):
    from singer_spark.operators.text_analysis import (
        hash_embed_vector,
        hybrid_topk_rrf,
    )

    docs = _docs_df(spark, [
        (1, "spark join window spark join window", "s"),  # both arms love it
        (2, "spark filler filler filler filler", "s"),    # lexical-leaning
        (3, "filler filler filler filler filler", "s"),   # neither
        (4, "join window other other other", "s"),
    ])
    got = hybrid_topk_rrf(docs, ["spark", "join", "window"], k=4, k_each=4)
    rows = got.collect()
    by_id = {r.doc_id: r for r in rows}
    # doc 1 tops both arms → highest fused score; doc 3 retrieved by
    # neither arm → absent
    assert rows[0].doc_id == 1
    assert by_id[1].bm25_rank == 1 and by_id[1].dense_rank == 1
    assert 3 not in by_id
    # a doc in both arms outscores a doc in one arm at a similar rank
    assert by_id[1].rrf_score > by_id[2].rrf_score
    # score arithmetic: exactly sum of reciprocal ranks, qround 1e-6
    r = by_id[4]
    expect = sum(1.0 / (60 + x) for x in (r.bm25_rank, r.dense_rank)
                 if x is not None)
    assert abs(r.rrf_score - expect) < 2e-6
    # driver-side query embedding matches the engine recipe: unit norm
    import math

    qv = hash_embed_vector(["join", "spark", "window"])
    assert abs(math.sqrt(sum(x * x for x in qv)) - 1.0) < 1e-4


def test_contamination_report_counts_planted_leaks(spark):
    from singer_spark.operators.text_analysis import contamination_report

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs_df(spark, [
        (0, bench_text, "bench"),                            # the bench item
        (1, "x " + bench_text + " y", "s"),                  # leaks all grams
        (2, "alpha beta gamma delta epsilon zeta eta theta junk words", "s"),
        (3, "totally unrelated content with no shared windows at all", "s"),
        (50, "another bench item with its own private words", "bench"),
    ])
    bench = docs.where(F.col("doc_id").isin(0, 50))
    got = {r.bench_id: (r.n_leaked_docs, r.n_leaked_grams)
           for r in contamination_report(docs, bench, k=8).collect()}
    # doc 0 has 1 distinct 8-gram (8 tokens); docs 1 and 2 both contain it
    assert got[0] == (2, 1)
    assert got[50] == (0, 0)  # zero rows included


def test_length_matched_sample_matches_reference_distribution(spark):
    from singer_spark.operators.text_analysis import length_matched_sample

    # corpus: 150 short docs + 150 long; reference: short-heavy (5:1)
    rows = ([(i, "w " * 8, "s") for i in range(150)]
            + [(1000 + i, "w " * 200, "s") for i in range(150)])
    docs = _docs_df(spark, [(i, t.strip(), s) for i, t, s in rows])
    ref_rows = ([(i, "w " * 8) for i in range(100)]
                + [(1000 + i, "w " * 200) for i in range(20)])
    ref = spark.createDataFrame([(i, t.strip()) for i, t in ref_rows],
                                "doc_id bigint, text string")
    out = length_matched_sample(docs, ref)
    kept = out.where("kept").groupBy("len_bin").count().collect()
    by_bin = {r.len_bin: r["count"] for r in kept}
    short_bin, long_bin = 3, 7  # floor(log2(9))=3, floor(log2(201))=7
    # the corpus is 1:1 but the reference is 5:1 short:long — the kept set
    # must lean decisively short (rate_short = 1.0, rate_long = 0.2)
    assert by_bin[short_bin] == 150           # max-ratio bin keeps all
    assert 10 <= by_bin.get(long_bin, 0) <= 60  # ~0.2 of 150, hash noise
    # deterministic under repartitioning
    again = (length_matched_sample(docs.repartition(7), ref)
             .where("kept").collect())
    assert {r.id for r in again} == {r.id for r in out.where("kept").collect()}


def test_length_matched_sample_disjoint_bins_keeps_nothing(spark):
    # reference shares NO length bins with the corpus: every ratio is 0
    # and the max-ratio normalizer would divide by zero — the guard must
    # return the full report with keep_rate 0 / kept false instead
    from singer_spark.operators.text_analysis import length_matched_sample

    docs = _docs_df(spark, [(i, "w " * 8, "s") for i in range(20)])
    ref = spark.createDataFrame([(i, ("w " * 200).strip())
                                 for i in range(10)],
                                "doc_id bigint, text string")
    out = length_matched_sample(docs, ref).collect()
    assert len(out) == 20
    assert all(r.keep_rate == 0.0 and r.kept is False for r in out)


def test_dup_cluster_stats_histogram(spark):
    from singer_spark.operators.dedup import dup_cluster_stats

    docs = _docs_df(spark, [(i, f"doc {i}", "s") for i in range(7)])
    # components: {0,1,2} (chain), {3,4}, singletons {5},{6}
    pairs = spark.createDataFrame([(0, 1), (1, 2), (3, 4)],
                                  "id_a bigint, id_b bigint")
    got = {r.cluster_size: (r.n_clusters, r.n_docs)
           for r in dup_cluster_stats(docs, pairs).collect()}
    assert got == {1: (2, 2), 2: (1, 2), 3: (1, 3)}


def test_source_unigram_kl_orders_by_divergence(spark):
    """KL is ~0 for a source matching the corpus mix, strictly larger for
    a template-flooded source, and always non-negative (Gibbs); matches a
    plain-Python reference with the same Jeffreys smoothing."""
    import math
    from collections import Counter

    from singer_spark.operators.text_analysis import source_unigram_kl

    balanced = "alpha beta gamma delta epsilon zeta"
    rows = [(i, balanced, "clean") for i in range(20)]
    rows += [(100 + i, "spam spam spam buy now", "floody") for i in range(20)]
    docs = _docs_df(spark, rows)

    got = {r.source: (r.n_tokens, r.kl)
           for r in source_unigram_kl(docs).collect()}
    assert set(got) == {"clean", "floody"}
    assert got["clean"][1] >= 0 and got["floody"][1] >= 0
    assert got["floody"][1] > got["clean"][1]

    # independent reference
    per_src = {"clean": Counter(), "floody": Counter()}
    for _i, t, s in rows:
        per_src[s].update(w for w in t.split(" ") if w)
    corpus = per_src["clean"] + per_src["floody"]
    V = len(corpus)
    N = sum(corpus.values())
    for src, cnt in per_src.items():
        ns = sum(cnt.values())
        kl = sum(((cnt[t] + 0.5) / (ns + 0.5 * V))
                 * math.log(((cnt[t] + 0.5) / (ns + 0.5 * V))
                            / ((corpus[t] + 0.5) / (N + 0.5 * V)))
                 for t in corpus)
        want = math.floor(kl * 1e6 + 0.5) / 1e6
        assert got[src] == (ns, want)


def _bpe_reference(word_freqs, n_merges):
    """Sennrich et al. 2016 alg. 1, greedy left-to-right merges, ties by
    pair string ascending — the independent twin bpe_learn_merges must
    match."""
    state = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get(
                    (syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0] + "\x03" + kv[0][1]))
        merges.append((step, a, b, a + b, c))
        nxt = {}
        for syms, f in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
        state = nxt
    return merges


def test_bpe_learn_matches_reference(spark):
    """Corpus engineered with overlap runs (aaaa → greedy pairs), a
    frequency tie broken lexicographically, and single-char words; the
    Spark merge table must equal the reference algorithm exactly."""
    from collections import Counter

    from singer_spark.operators.text_analysis import bpe_learn_merges

    texts = ["low low low lower lowest",
             "aaaa aaaa aa a",
             "zz yy zz yy",          # tie: (z,z) vs (y,y) same count
             "newer newest new b",
             "cr\rcr cr\rcr cr\rcr"]  # CR inside a word: Java's bare `.`
                                      # skips line terminators — the (?s)
                                      # framing must still cover it
    docs = _docs_df(spark, [(i, t, "s") for i, t in enumerate(texts)])
    # split on ' ' exactly (the operator's word boundary) — bare split()
    # would also split on \r and miss the in-word control-char case
    freqs = Counter(w for t in texts for w in t.lower().split(" ") if w)
    want = _bpe_reference(freqs, 10)

    got = [(r.step, r.left_sym, r.right_sym, r.merged, r.pair_freq)
           for r in bpe_learn_merges(docs, n_merges=10).collect()]
    assert got == want
    # the overlap-run case specifically: 'aaaa' contributes 3 (a,a) pairs
    # at step time but greedy merging yields aa+aa, never aa inside aaa
    assert any(m[3] == "aa" for m in got)


def test_bpe_encode_roundtrip_and_compression(spark):
    """Lossless: concatenating a doc's tokens reproduces its words
    exactly; applying merges never increases token count and strictly
    decreases it where a merge fires; zero merges = character count."""
    from singer_spark.operators.text_analysis import bpe_encode, bpe_learn_merges

    texts = ["low lower lowest", "aaaa aa a", "mixed bag of words here"]
    docs = _docs_df(spark, [(i, t, "s") for i, t in enumerate(texts)])
    merges = [(r.left_sym, r.right_sym)
              for r in bpe_learn_merges(docs, n_merges=8).collect()]
    assert merges

    enc = {r.doc_id: (r.n_tokens, r.tokens)
           for r in bpe_encode(docs, merges).collect()}
    enc0 = {r.doc_id: r.n_tokens
            for r in bpe_encode(docs, []).collect()}
    for i, t in enumerate(texts):
        words = t.lower().split()
        n, toks = enc[i]
        assert "".join(toks.split(" ")) == "".join(words)   # lossless
        assert n == len(toks.split(" "))
        assert enc0[i] == sum(len(w) for w in words)        # chars at 0 merges
        assert n <= enc0[i]
    assert any(enc[i][0] < enc0[i] for i in enc)            # compression real


def test_bpe_encode_ranked_matches_chain(spark):
    """The production rank-based encoder must be VALUE-IDENTICAL to the
    replace-chain twin on learned merges — including overlap runs
    (aaaa), in-word control chars, repeated words, multi-merge cascades
    (l+o, lo+w), and wordless documents."""
    from singer_spark.operators.text_analysis import (
        bpe_encode,
        bpe_encode_ranked,
        bpe_learn_merges,
    )

    texts = ["low low low lower lowest",
             "aaaa aaaa aa a",
             "zz yy zz yy",
             "newer newest new b",
             "cr\rcr cr\rcr cr\rcr",
             "",                       # wordless: must yield (0, '')
             "   ",                    # only separators: also wordless
             "low aaaa newer zz low",
             None]                     # NULL text: (NULL, NULL) like the chain
    docs = _docs_df(spark, [(i, t, "s") for i, t in enumerate(texts)])
    merges = [(r.left_sym, r.right_sym)
              for r in bpe_learn_merges(docs, n_merges=10).collect()]
    assert merges

    chain = [(r.doc_id, r.n_tokens, r.tokens)
             for r in bpe_encode(docs, merges).orderBy("doc_id").collect()]
    ranked = [(r.doc_id, r.n_tokens, r.tokens)
              for r in bpe_encode_ranked(docs, merges)
              .orderBy("doc_id").collect()]
    assert ranked == chain
    by_id = dict((d, (n, t)) for d, n, t in ranked)
    assert by_id[5] == (0, "")
    assert by_id[8] == (None, None)


def test_bpe_encode_ranked_merge_count_independent(spark):
    """The point of the ranked encoder: 2,000 padded merges (pairs that
    can never fire) must change neither the output nor the PLAN — the
    merge table lives in the kernel closure, not in the expression tree,
    where the chain grows one replace node per merge."""
    from singer_spark.operators.text_analysis import (
        bpe_encode,
        bpe_encode_ranked,
        bpe_learn_merges,
    )

    texts = ["low low low lower lowest", "aaaa aa a", "mixed bag of words"]
    docs = _docs_df(spark, [(i, t, "s") for i, t in enumerate(texts)])
    learned = [(r.left_sym, r.right_sym)
               for r in bpe_learn_merges(docs, n_merges=8).collect()]
    padded = learned + [(f"¤{i}", "¤") for i in range(2000)]

    def rows(df):
        return [(r.doc_id, r.n_tokens, r.tokens)
                for r in df.orderBy("doc_id").collect()]

    small = bpe_encode_ranked(docs, learned)
    big = bpe_encode_ranked(docs, padded)
    assert rows(big) == rows(small) == rows(bpe_encode(docs, learned))
    # constant plan: the optimized trees are the same size (UDF ids
    # differ, merge count must not show up as nodes)
    plan_small = small._jdf.queryExecution().optimizedPlan().treeString()
    plan_big = big._jdf.queryExecution().optimizedPlan().treeString()
    assert plan_small.count("\n") == plan_big.count("\n")


def test_bpe_encode_broadcast_path_matches_joinback_and_chain(spark):
    """VERDICT r9 task #2: the broadcast-dict apply path (vocab map in
    the Arrow kernel closure — no posexplode/join/regroup, the skew-safe
    default) must be value-identical to the forced join-back path AND
    the replace chain, including NULL text, wordless docs, repeated
    words, and a word-count above the gate (forcing join-back via
    broadcast_vocab_limit=0 and via a limit smaller than the vocab must
    both agree)."""
    from singer_spark.operators.text_analysis import (
        bpe_encode,
        bpe_encode_ranked,
        bpe_learn_merges,
    )

    texts = ["low low low lower lowest",
             "aaaa aaaa aa a",
             "Mixed CASE Words lower",   # lowercase parity across paths
             "",
             "   ",
             "low aaaa newer zz low",
             None]
    docs = _docs_df(spark, [(i, t, "s") for i, t in enumerate(texts)])
    merges = [(r.left_sym, r.right_sym)
              for r in bpe_learn_merges(docs, n_merges=10).collect()]
    assert merges

    def rows(df):
        return [(r.doc_id, r.n_tokens, r.tokens)
                for r in df.orderBy("doc_id").collect()]

    chain = rows(bpe_encode(docs, merges))
    bcast = rows(bpe_encode_ranked(docs, merges))            # default gate: broadcast
    joinback = rows(bpe_encode_ranked(docs, merges,
                                      broadcast_vocab_limit=0))
    over_gate = rows(bpe_encode_ranked(docs, merges,
                                       broadcast_vocab_limit=3))  # vocab > 3
    assert bcast == joinback == over_gate == chain
    # the broadcast plan carries no exchange past the vocab build: the
    # apply is a single projection over the corpus scan
    plan = (bpe_encode_ranked(docs, merges)
            ._jdf.queryExecution().executedPlan().treeString())
    assert "Exchange" not in plan


def test_bpe_word_encoder_sequential_semantics():
    """The heap kernel replays the chain's SEQUENTIAL order, not
    iterative min-rank: a later merge that re-creates an earlier-rank
    pair must leave it unmerged (the chain is already past it), and
    scan-left non-overlap must match Java replace on overlap runs."""
    from singer_spark.operators.text_analysis import _bpe_word_encoder

    # rank0 (x, ab) learned against ab=(a,b)@rank1; encoding "xab":
    # initial pairs (x,a),(a,b) -> rank1 fires first present rank is
    # rank1? (x,a) has no rank; apply rank1 -> "x","ab" creates (x,ab)
    # = rank0 < passed -> stays unmerged, exactly like the chain
    enc = _bpe_word_encoder([("x", "ab"), ("a", "b")])
    assert enc("xab") == ["x", "ab"]
    # overlap run: scan-left (a,a) on aaaaa -> aa aa a
    enc2 = _bpe_word_encoder([("a", "a")])
    assert enc2("aaaaa") == ["aa", "aa", "a"]
    # cascade: (l,o) then (lo,w)
    enc3 = _bpe_word_encoder([("l", "o"), ("lo", "w")])
    assert enc3("lower") == ["low", "e", "r"]
    # zero merges = characters
    assert _bpe_word_encoder([])("abc") == ["a", "b", "c"]


def test_bpe_word_encoder_duplicate_merge_pairs(spark):
    """A duplicated pair CAN fire at its later rank when an intermediate
    merge re-creates the adjacency (ADVICE r8 #1): merges
    [(a,bc),(b,c),(a,bc)] on "abc" — rank 1 yields (a, bc), which the
    chain's rank-2 duplicate replace then merges to "abc".  A
    first-rank-wins dict leaves it unmerged; the multi-rank kernel must
    match the chain, here and through the Spark twins."""
    from singer_spark.operators.text_analysis import (
        _bpe_word_encoder,
        bpe_encode,
        bpe_encode_ranked,
    )

    dup = [("a", "bc"), ("b", "c"), ("a", "bc")]
    assert _bpe_word_encoder(dup)("abc") == ["abc"]
    # a duplicate whose adjacency is NOT re-created stays a no-op
    assert _bpe_word_encoder([("a", "b"), ("a", "b")])("aab") == ["a", "ab"]
    # and a re-created pair with NO later duplicate stays unmerged
    assert _bpe_word_encoder(dup[:2])("abc") == ["a", "bc"]

    texts = ["abc abc ab", "babc", "aabc", None]
    docs = _docs_df(spark, [(i, t, "s") for i, t in enumerate(texts)])

    def rows(df):
        return [(r.doc_id, r.n_tokens, r.tokens)
                for r in df.orderBy("doc_id").collect()]

    assert rows(bpe_encode_ranked(docs, dup)) == rows(bpe_encode(docs, dup))


def _clustered_emb(spark, n=400, n_clusters=8, dim=64):
    """Deterministic clustered embedding fixture: md5-derived cluster
    centers with small per-vector perturbations — the regime PQ's
    codebooks exploit (the isotropic synthetic corpus is its honest
    worst case; VERDICT r7 next #5)."""
    from singer_spark.functions import md5_int

    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    center = (md5_int(F.concat(
        (F.col("vec_id") % n_clusters).cast("string"), F.lit(":"),
        F.col("d").cast("string"))) % 1000) / 250.0 - 2.0
    noise = (md5_int(F.concat(F.col("vec_id").cast("string"), F.lit("/"),
                              F.col("d").cast("string"))) % 100) / 500.0
    return (ids.crossJoin(spark.range(dim).select(F.col("id").alias("d")))
            .select("vec_id", "d", (center + noise).alias("x"))
            .groupBy("vec_id")
            .agg(F.array_sort(F.collect_list(F.struct("d", "x"))).alias("_s"))
            .select("vec_id",
                    F.transform("_s", lambda s: s["x"]).alias("embedding")))


def test_pq_trained_kc256_recall_gate(spark):
    """The production PQ parameterization (kc=256 — 8-bit codes, FAISS's
    default) must reach useful recall on clustered data: recall@5 vs
    exact L2 >= 0.5 (measured ~0.5 even on the isotropic sf0.01 corpus,
    PQ's worst case), and kc=256 must beat the SQL-replay kc=16
    setting."""
    from singer_spark.operators.similarity import (
        l2_topk,
        pq_ann_topk,
        pq_train_codebooks,
    )

    emb = _clustered_emb(spark).persist()
    q = emb.filter(F.col("vec_id") < 10)
    exact = set((r.query_id, r.neighbor_id)
                for r in l2_topk(emb, q, 5).collect())

    def recall(kc):
        cb = pq_train_codebooks(emb, m=8, kc=kc, iters=2)
        got = set((r.query_id, r.neighbor_id)
                  for r in pq_ann_topk(emb, q, 5, m=8, kc=kc,
                                       codebooks=cb).collect())
        return len(got & exact) / len(exact)

    r256, r16 = recall(256), recall(16)
    emb.unpersist()
    assert r256 >= 0.5, f"trained kc=256 recall@5 {r256} below gate"
    assert r256 >= r16  # more codebook budget never hurts here


@pytest.mark.soak
def test_ann_model_save_load_probe_only_roundtrip(spark, tmp_path,
                                                  monkeypatch):
    """VERDICT r9 task #5: a trained IVF / PQ / IVF-PQ model persisted
    through save_ann_model and reloaded must (a) round-trip the
    centroid/codebook arrays BIT-identically, and (b) serve probe-only
    queries — zero Lloyd iterations, zero seeded-model derivations, and
    for IVF-PQ zero corpus encodes (the stored codes table) — with
    values identical to the train-in-place path."""
    from singer_spark.operators import similarity as sim

    emb = _clustered_emb(spark, n=200).persist()
    q = emb.filter(F.col("vec_id") < 6)

    def rows(df):
        return sorted((r.query_id, r.neighbor_id, r.rank)
                      for r in df.collect())

    # --- train every family once ----------------------------------------
    C, CB = sim.ivfpq_train_model(emb, n_clusters=8, m=8, kc=16,
                                  iters_coarse=1, iters_pq=1)
    cent_df = sim.ivf_train_centroids(emb, n_clusters=8, iters=1)
    CBp = sim.pq_train_codebooks(emb, m=8, kc=16, iters=1)
    want_ivfpq = rows(sim.ivfpq_ann_topk(emb, q, 5, nprobe=3, model=(C, CB)))
    want_ivf = rows(sim.ivf_ann_topk(emb, q, 5, nprobe=3, centroids=cent_df))
    want_pq = rows(sim.pq_ann_topk(emb, q, 5, codebooks=CBp))

    # --- persist ---------------------------------------------------------
    codes = sim.ivfpq_encode(emb, (C, CB))
    sim.save_ann_model(spark, str(tmp_path / "ivfpq"), "ivfpq",
                       centroids=C, codebooks=CB, codes=codes)
    sim.save_ann_model(spark, str(tmp_path / "ivf"), "ivf",
                       centroids=sim._centroid_matrix(cent_df))
    sim.save_ann_model(spark, str(tmp_path / "pq"), "pq", codebooks=CBp,
                       codes=sim.pq_encode(emb, CBp))

    # --- reload: arrays bit-identical -----------------------------------
    m_ivfpq = sim.load_ann_model(spark, str(tmp_path / "ivfpq"))
    m_ivf = sim.load_ann_model(spark, str(tmp_path / "ivf"))
    m_pq = sim.load_ann_model(spark, str(tmp_path / "pq"))
    import numpy as np
    assert np.array_equal(m_ivfpq["C"], C)
    assert np.array_equal(m_ivfpq["CB"], CB)
    assert np.array_equal(m_pq["CB"], CBp)
    assert m_ivfpq["codes"] is not None and m_pq["codes"] is not None

    # --- probe-only: no training, no seeded derivation, no encode -------
    def boom(*a, **k):
        raise AssertionError("probe-only query touched a training path")

    for name in ("ivfpq_train_model", "ivf_train_centroids",
                 "pq_train_codebooks", "_ivfpq_model",
                 "_pq_seed_codebooks", "_seeded_centroids",
                 "ivfpq_encode", "pq_encode"):
        monkeypatch.setattr(sim, name, boom)

    got_ivfpq = rows(sim.ivfpq_ann_topk(
        emb, q, 5, nprobe=3, model=(m_ivfpq["C"], m_ivfpq["CB"]),
        encoded=m_ivfpq["codes"]))
    got_ivf = rows(sim.ivf_ann_topk(emb, q, 5, nprobe=3,
                                    centroids=m_ivf["centroids_df"]))
    got_pq = rows(sim.pq_ann_topk(emb, q, 5, codebooks=m_pq["CB"]))
    # PQ from STORED codes: the probe never touches an embedding column
    got_pq_codes = rows(sim.pq_ann_topk(emb, q, 5, codebooks=m_pq["CB"],
                                        encoded=m_pq["codes"]))
    emb.unpersist()
    assert got_ivfpq == want_ivfpq
    assert got_ivf == want_ivf
    assert got_pq == want_pq
    assert got_pq_codes == want_pq


@pytest.mark.soak
def test_append_ann_codes_increment_equals_full_reencode(spark, tmp_path,
                                                         monkeypatch):
    """VERDICT r10 task #4: the incremental encode-append — a model
    trained on the BASE corpus, base codes persisted, then
    append_ann_codes over a NEW increment only — must serve probes
    identical to a full re-encode of base+increment, for both ivfpq and
    pq; the append path must never re-read or re-encode the base, and a
    codes-less or ivf model must refuse."""
    import numpy as np

    from singer_spark.operators import similarity as sim

    emb = _clustered_emb(spark, n=240).persist()
    base = emb.filter(F.col("vec_id") < 200)
    incr = emb.filter(F.col("vec_id") >= 200)
    q = emb.filter(F.col("vec_id") < 6)

    def rows(df):
        return sorted((r.query_id, r.neighbor_id, r.rank)
                      for r in df.collect())

    C, CB = sim.ivfpq_train_model(base, n_clusters=8, m=8, kc=16,
                                  iters_coarse=1, iters_pq=1)
    sim.save_ann_model(spark, str(tmp_path / "ivfpq"), "ivfpq",
                       centroids=C, codebooks=CB,
                       codes=sim.ivfpq_encode(base, (C, CB)))
    CBp = sim.pq_train_codebooks(base, m=8, kc=16, iters=1)
    sim.save_ann_model(spark, str(tmp_path / "pq"), "pq", codebooks=CBp,
                       codes=sim.pq_encode(base, CBp))
    sim.save_ann_model(spark, str(tmp_path / "bare"), "pq", codebooks=CBp)

    grown = sim.append_ann_codes(spark, str(tmp_path / "ivfpq"), incr)
    assert grown.count() == emb.count()  # base + increment, no dupes
    grown_pq = sim.append_ann_codes(spark, str(tmp_path / "pq"), incr)
    assert grown_pq.count() == emb.count()

    want = rows(sim.ivfpq_ann_topk(emb, q, 5, nprobe=3, model=(C, CB)))
    want_pq = rows(sim.pq_ann_topk(emb, q, 5, codebooks=CBp))

    # probe-only: the grown tables serve without any encode pass
    def boom(*a, **k):
        raise AssertionError("incremental probe touched an encode path")

    monkeypatch.setattr(sim, "ivfpq_encode", boom)
    monkeypatch.setattr(sim, "pq_encode", boom)
    got = rows(sim.ivfpq_ann_topk(emb, q, 5, nprobe=3, model=(C, CB),
                                  encoded=grown))
    got_pq = rows(sim.pq_ann_topk(emb, q, 5, codebooks=CBp,
                                  encoded=grown_pq))
    emb.unpersist()
    assert got == want
    assert got_pq == want_pq

    # refusal paths: codes-less model, and appended codes must be the
    # same dtype family (np untouched — sanity the model round-tripped)
    assert np.array_equal(sim.load_ann_model(
        spark, str(tmp_path / "ivfpq"))["CB"], CB)
    with pytest.raises(ValueError, match="without a codes table"):
        sim.append_ann_codes(spark, str(tmp_path / "bare"), incr)


@pytest.mark.soak
def test_delete_and_compact_ann_codes(spark, tmp_path):
    """r11: tombstone deletion + compaction — deletes cost one id-sized
    append, load serves only live rows, double-delete is idempotent,
    compaction folds tombstones in without changing what a probe sees,
    and a fresh model dir with no tombstones loads untouched."""
    from singer_spark.operators import similarity as sim

    emb = _clustered_emb(spark, n=200).persist()
    q = emb.filter(F.col("vec_id") < 6)
    C, CB = sim.ivfpq_train_model(emb, n_clusters=8, m=8, kc=16,
                                  iters_coarse=1, iters_pq=1)
    path = str(tmp_path / "idx")
    sim.save_ann_model(spark, path, "ivfpq", centroids=C, codebooks=CB,
                       codes=sim.ivfpq_encode(emb, (C, CB)))
    dead = emb.filter(F.col("vec_id") % 5 == 2)
    n_dead = dead.count()

    live = sim.delete_ann_codes(spark, path, dead)
    assert live.count() == 200 - n_dead
    # idempotent: re-deleting the same ids changes nothing
    live = sim.delete_ann_codes(spark, path, dead)
    assert live.count() == 200 - n_dead

    def rows(df):
        return sorted((r.query_id, r.neighbor_id, r.rank)
                      for r in df.collect())

    want = rows(sim.ivfpq_ann_topk(emb.filter(F.col("vec_id") % 5 != 2),
                                   q, 5, nprobe=3, model=(C, CB)))
    got = rows(sim.ivfpq_ann_topk(emb, q, 5, nprobe=3, model=(C, CB),
                                  encoded=live).localCheckpoint(eager=True))
    assert got == want

    n_after = sim.compact_ann_codes(spark, path)
    assert n_after == 200 - n_dead
    import os

    assert not os.path.exists(os.path.join(path, "tombstones"))
    reloaded = sim.load_ann_model(spark, path)["codes"]
    assert rows(sim.ivfpq_ann_topk(emb, q, 5, nprobe=3, model=(C, CB),
                                   encoded=reloaded)) == want
    # compacting a tombstone-less index is a no-op count
    assert sim.compact_ann_codes(spark, path) == 200 - n_dead
    emb.unpersist()


@pytest.mark.soak
def test_compact_ann_codes_crash_window_serves_old_version(spark, tmp_path):
    """r12 (VERDICT r11 task #1): the pointer-swap crash window — a
    compaction killed AFTER writing codes_v{N+1} but BEFORE appending
    the pointer row must leave reads serving the OLD version plus
    tombstones (identical live set), and a re-run must converge.  Also
    pins the layout invariants: no os.rename-style mixed states exist,
    GC removes superseded versions only after the pointer moves, and
    save_ann_model at a reused path starts from a clean slate."""
    import os

    from singer_spark.operators import similarity as sim
    from singer_spark.sinks import write_dataset

    emb = _clustered_emb(spark, n=120).persist()
    q = emb.filter(F.col("vec_id") < 6)
    C, CB = sim.ivfpq_train_model(emb, n_clusters=8, m=8, kc=16,
                                  iters_coarse=1, iters_pq=1)
    path = str(tmp_path / "idx")
    sim.save_ann_model(spark, path, "ivfpq", centroids=C, codebooks=CB,
                       codes=sim.ivfpq_encode(emb, (C, CB)))
    dead = emb.filter(F.col("vec_id") % 4 == 1)
    n_dead = dead.count()
    sim.delete_ann_codes(spark, path, dead)

    def rows(df):
        return sorted((r.query_id, r.neighbor_id, r.rank)
                      for r in df.collect())

    want = rows(sim.ivfpq_ann_topk(emb.filter(F.col("vec_id") % 4 != 1),
                                   q, 5, nprobe=3, model=(C, CB)))

    # simulate the crashed compaction: perform exactly its codes write
    # (live rows -> codes_v1) and then "die" before the pointer append
    codes, tombs, v, _ = sim._codes_state(spark, path)
    assert v == 0
    live = codes.join(tombs.distinct(), tombs.columns[0], "left_anti")
    write_dataset(live, f"{path}/codes_v1")
    assert os.path.isdir(f"{path}/codes_v1")

    # reads resolve the pointer FIRST: still version 0 + tombstones —
    # the half-finished codes_v1 is invisible
    _, _, v_seen, dir_seen = sim._codes_state(spark, path)
    assert v_seen == 0 and dir_seen.endswith("codes_v0")
    served = sim.load_ann_model(spark, path)["codes"]
    assert served.count() == 120 - n_dead
    assert rows(sim.ivfpq_ann_topk(emb, q, 5, nprobe=3, model=(C, CB),
                                   encoded=served)
                .localCheckpoint(eager=True)) == want

    # re-running the compaction converges: codes_v1 is overwritten,
    # the pointer flips, GC sweeps codes_v0 and the inert tombstones
    assert sim.compact_ann_codes(spark, path) == 120 - n_dead
    _, tombs2, v2, dir2 = sim._codes_state(spark, path)
    assert v2 == 1 and dir2.endswith("codes_v1")
    assert not os.path.isdir(f"{path}/codes_v0")
    assert not os.path.isdir(f"{path}/tombstones")
    assert rows(sim.ivfpq_ann_topk(emb, q, 5, nprobe=3, model=(C, CB),
                                   encoded=sim.load_ann_model(
                                       spark, path)["codes"])) == want

    # deletes AFTER the compaction stamp the new version and apply
    sim.delete_ann_codes(spark, path, emb.filter(F.col("vec_id") == 0))
    assert sim.load_ann_model(spark, path)["codes"].count() \
        == 120 - n_dead - 1

    # save_ann_model at the SAME path resets pointer + tombstones: the
    # fresh index serves the full corpus (no stale state leaks in)
    sim.save_ann_model(spark, path, "ivfpq", centroids=C, codebooks=CB,
                       codes=sim.ivfpq_encode(emb, (C, CB)))
    assert sim.load_ann_model(spark, path)["codes"].count() == 120
    emb.unpersist()


@pytest.mark.soak
def test_ann_index_stream_churn_equals_uninterrupted(spark, tmp_path):
    """r13 (VERDICT r12 task #5): streaming ANN maintenance — chunked
    arrivals under kill/restart churn (exact-epoch retry, the
    codes-appended-log-missing crash window, a checkpoint reset that
    redelivers EVERYTHING under a new run id) must end with the index
    row-for-row equal to one uninterrupted append, and probes identical.
    Then a real availableNow file-source stream (the production wiring)
    survives a restart plus a checkpoint reset the same way."""
    from singer_spark.operators import similarity as sim

    emb = _clustered_emb(spark, n=160).persist()
    base = emb.filter(F.col("vec_id") < 40)
    chunk = [emb.filter((F.col("vec_id") >= 40 + 40 * i)
                        & (F.col("vec_id") < 80 + 40 * i)) for i in range(3)]
    C, CB = sim.ivfpq_train_model(emb, n_clusters=8, m=8, kc=16,
                                  iters_coarse=1, iters_pq=1)
    pa, pb = str(tmp_path / "churned"), str(tmp_path / "oneshot")
    for p in (pa, pb):
        sim.save_ann_model(spark, p, "ivfpq", centroids=C, codebooks=CB,
                           codes=sim.ivfpq_encode(base, (C, CB)))
    # the uninterrupted run: one append of all three chunks
    sim.append_ann_codes(spark, pb, emb.filter(F.col("vec_id") >= 40))

    # churned run, driven batch by batch with a pinned run id
    on_a = sim._ann_append_on_batch(pa, str(tmp_path / "ck"),
                                    run_id_fn=lambda: "runA")
    on_a(chunk[0], 0)
    on_a(chunk[0], 0)                      # exact retry: log fast path
    # crash window: codes appended, "died" before the log row — the
    # replay's anti-join must append nothing and just commit the log
    sim.append_ann_codes(spark, pa, chunk[1], dedupe_ids=True)
    on_a(chunk[1], 1)
    # ops event: checkpoint reset -> new run id, epochs restart at 0,
    # and the source redelivers EVERYTHING plus the new chunk
    on_b = sim._ann_append_on_batch(pa, str(tmp_path / "ck2"),
                                    run_id_fn=lambda: "runB")
    on_b(chunk[0].unionByName(chunk[1]).unionByName(chunk[2]), 0)

    def table(p):
        return sorted((r.vec_id, r.cell, tuple(r.codes)) for r in
                      sim.load_ann_model(spark, p)["codes"].collect())

    assert table(pa) == table(pb) and len(table(pa)) == 160

    def rows(df):
        return sorted((r.query_id, r.neighbor_id, r.rank)
                      for r in df.collect())

    q = emb.filter(F.col("vec_id") < 6)
    got = rows(sim.ivfpq_ann_topk(emb, q, 5, nprobe=3, model=(C, CB),
                                  encoded=sim.load_ann_model(spark, pa)["codes"])
               .localCheckpoint(eager=True))
    assert got == rows(sim.ivfpq_ann_topk(
        emb, q, 5, nprobe=3, model=(C, CB),
        encoded=sim.load_ann_model(spark, pb)["codes"])
        .localCheckpoint(eager=True))

    # the production wiring: a file-source availableNow loop with a
    # restart between arrivals and a checkpoint reset at the end
    import shutil

    pc = str(tmp_path / "streamed")
    sim.save_ann_model(spark, pc, "ivfpq", centroids=C, codebooks=CB,
                       codes=sim.ivfpq_encode(base, (C, CB)))
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck_s")
    schema = "vec_id bigint, embedding array<double>"

    def run_cycle():
        # compact_every=2: one forced mid-churn compaction (file-merge
        # rewrite + pointer flip) must be invisible to the final state
        qy = (sim.ann_index_stream(
            spark.readStream.schema(schema).parquet(src), pc, ck,
            compact_every=2)
            .trigger(availableNow=True).start())
        qy.awaitTermination(120)
        qy.stop()

    chunk[0].select("vec_id", "embedding").coalesce(1) \
        .write.mode("append").parquet(src)
    run_cycle()
    chunk[1].select("vec_id", "embedding").coalesce(1) \
        .write.mode("append").parquet(src)
    run_cycle()                            # restart, same checkpoint
    shutil.rmtree(ck)                      # checkpoint reset: replay all
    chunk[2].select("vec_id", "embedding").coalesce(1) \
        .write.mode("append").parquet(src)
    run_cycle()
    assert table(pc) == table(pb)
    # the cadence compaction actually ran: the pointer moved past v0
    _, _, v_now, _ = sim._codes_state(spark, pc)
    assert v_now >= 1
    emb.unpersist()


@pytest.mark.soak
def test_ann_index_stream_cdc_deletes(spark, tmp_path):
    """r13: op_col turns the streaming appender into a CDC consumer —
    deletes tombstone at id cost after the batch's appends, an
    in-stream compaction folds them, and redelivery of a mixed
    add+delete batch (exact retry AND a checkpoint-reset replay under a
    new run id, after the tombstones were already folded away) changes
    nothing."""
    from singer_spark.operators import similarity as sim

    emb = _clustered_emb(spark, n=60).persist()
    C, CB = sim.ivfpq_train_model(emb, n_clusters=8, m=8, kc=16,
                                  iters_coarse=1, iters_pq=1)
    path = str(tmp_path / "idx")
    sim.save_ann_model(spark, path, "ivfpq", centroids=C, codebooks=CB,
                       codes=sim.ivfpq_encode(
                           emb.filter(F.col("vec_id") < 20), (C, CB)))

    def cdc(adds, dels):
        a = emb.filter(F.col("vec_id").isin(adds)) \
            .select("vec_id", "embedding", F.lit("add").alias("op"))
        d = emb.filter(F.col("vec_id").isin(dels)) \
            .select("vec_id", "embedding", F.lit("delete").alias("op"))
        return a.unionByName(d)

    def served():
        return {r.vec_id for r in sim.load_ann_model(spark, path)["codes"]
                .select("vec_id").collect()}

    on_a = sim._ann_append_on_batch(path, str(tmp_path / "ck"),
                                    op_col="op", compact_every=2,
                                    run_id_fn=lambda: "runA")
    b1 = cdc(list(range(20, 40)), [])
    b2 = cdc(list(range(40, 50)), [5, 25])
    on_a(b1, 0)
    on_a(b2, 1)          # also fires the in-stream compaction (epoch 1)
    want = set(range(50)) - {5, 25}
    assert served() == want
    on_a(b2, 1)          # exact retry: log fast path
    assert served() == want
    # the compaction folded and retired the tombstones
    import os

    assert not os.path.isdir(f"{path}/tombstones")

    # checkpoint reset: a new run redelivers b2 (its adds are absorbed
    # by the anti-join, its deletes re-tombstone already-absent ids —
    # harmless) plus genuinely new arrivals
    b3 = cdc(list(range(50, 60)), [])
    on_b = sim._ann_append_on_batch(path, str(tmp_path / "ck2"),
                                    op_col="op",
                                    run_id_fn=lambda: "runB")
    on_b(b2.unionByName(b3), 0)
    assert served() == set(range(60)) - {5, 25}
    # add+delete of one id in ONE batch nets to deleted (the re-add of
    # 5 is also still masked by its live tombstone — the documented
    # resurrection caveat)
    on_b(cdc([5], [41]).unionByName(cdc([], [5])), 1)
    assert served() == set(range(60)) - {5, 25, 41}
    emb.unpersist()


@pytest.mark.soak
def test_compact_ann_codes_raced_delete_survives(spark, tmp_path, monkeypatch):
    """r13 (VERDICT r12 "What's wrong #1"): a delete_ann_codes landing
    INSIDE the compaction — after the fold's snapshot read, before the
    pointer append — must never be lost.  The verify-before-publish step
    re-stamps the missed tombstone to the new version, so the deleted id
    never serves after the flip, survives a subsequent GC, and the next
    compaction folds it physically."""
    from singer_spark.operators import similarity as sim

    emb = _clustered_emb(spark, n=150).persist()
    C, CB = sim.ivfpq_train_model(emb, n_clusters=8, m=8, kc=16,
                                  iters_coarse=1, iters_pq=1)
    path = str(tmp_path / "idx")
    sim.save_ann_model(spark, path, "ivfpq", centroids=C, codebooks=CB,
                       codes=sim.ivfpq_encode(emb, (C, CB)))
    sim.delete_ann_codes(spark, path, emb.filter(F.col("vec_id") < 10))

    raced = emb.filter(F.col("vec_id") == 77)
    fired = []

    def inject():
        # the racing delete: runs after codes_v1 is fully written,
        # before the tombstone re-read / pointer append
        sim.delete_ann_codes(spark, path, raced)
        fired.append(True)

    monkeypatch.setattr(sim, "_COMPACT_ANN_BARRIER", inject)
    sim.compact_ann_codes(spark, path)
    monkeypatch.setattr(sim, "_COMPACT_ANN_BARRIER", None)
    assert fired

    # the raced delete is ACTIVE immediately after the flip: id 77 does
    # not serve, even though the new snapshot physically contains it
    _, _, v, _ = sim._codes_state(spark, path)
    assert v == 1
    served = sim.load_ann_model(spark, path)["codes"]
    ids = {r.vec_id for r in served.select("vec_id").collect()}
    assert 77 not in ids and 10 in ids and len(ids) == 150 - 10 - 1

    # GC must not erase the evidence: the re-stamped row keeps the
    # tombstone table alive, and the id still never serves
    sim.gc_ann_versions(spark, path)
    import os

    assert os.path.isdir(f"{path}/tombstones")
    ids = {r.vec_id for r in
           sim.load_ann_model(spark, path)["codes"].select("vec_id").collect()}
    assert 77 not in ids

    # the next compaction folds the raced delete physically and the
    # tombstone table retires for good
    assert sim.compact_ann_codes(spark, path) == 150 - 10 - 1
    assert not os.path.isdir(f"{path}/tombstones")
    ids = {r.vec_id for r in
           sim.load_ann_model(spark, path)["codes"].select("vec_id").collect()}
    assert 77 not in ids
    emb.unpersist()


@pytest.mark.soak
def test_gc_refuses_and_reactivates_unfolded_tombstones(spark, tmp_path):
    """r13: the residual race window — a delete that resolved the
    pointer BEFORE a flip but appended its tombstone AFTER the verify
    read carries a stale version stamp, which the read filter drops
    (the vector silently serves).  gc_ann_versions must refuse to
    delete that table and instead re-stamp the still-serving id to the
    current version, re-activating the delete."""
    from singer_spark.operators import similarity as sim

    emb = _clustered_emb(spark, n=80).persist()
    C, CB = sim.ivfpq_train_model(emb, n_clusters=8, m=8, kc=16,
                                  iters_coarse=1, iters_pq=1)
    path = str(tmp_path / "idx")
    sim.save_ann_model(spark, path, "ivfpq", centroids=C, codebooks=CB,
                       codes=sim.ivfpq_encode(emb, (C, CB)))
    sim.delete_ann_codes(spark, path, emb.filter(F.col("vec_id") == 3))
    assert sim.compact_ann_codes(spark, path) == 79  # now at v=1, no tombs

    # simulate the stale-stamped tombstone (delete read pointer at v=0,
    # appended after the verify read): id 42 stamped version 0
    spark.createDataFrame([(42, 0)], "vec_id bigint, version bigint") \
        .write.mode("append").parquet(f"{path}/tombstones")
    # the bug being pinned: the read filter (version >= 1) drops it
    ids = {r.vec_id for r in
           sim.load_ann_model(spark, path)["codes"].select("vec_id").collect()}
    assert 42 in ids  # silently serving — exactly what GC must repair

    gone = sim.gc_ann_versions(spark, path)
    assert "tombstones" not in gone  # refused: row not provably folded
    import os

    assert os.path.isdir(f"{path}/tombstones")
    ids = {r.vec_id for r in
           sim.load_ann_model(spark, path)["codes"].select("vec_id").collect()}
    assert 42 not in ids  # re-stamped to current version: delete applies

    # a tombstone for an id that never served (or was already folded) is
    # provably inert: the NEXT compaction folds 42 out and GC retires it
    assert sim.compact_ann_codes(spark, path) == 78
    assert not os.path.isdir(f"{path}/tombstones")
    emb.unpersist()


@pytest.mark.soak
def test_compact_ann_codes_keep_versions_for_readers(spark, tmp_path):
    """r13 (VERDICT r12 "What's wrong #3"): keep_versions > 1 retains
    prior snapshots through a compaction so a reader that resolved the
    pointer pre-flip finishes its scan; gc=False defers GC entirely;
    the default (gc=True, keep_versions=1) sweeps as before."""
    import os

    from singer_spark.operators import similarity as sim

    emb = _clustered_emb(spark, n=90).persist()
    C, CB = sim.ivfpq_train_model(emb, n_clusters=8, m=8, kc=16,
                                  iters_coarse=1, iters_pq=1)
    path = str(tmp_path / "idx")
    sim.save_ann_model(spark, path, "ivfpq", centroids=C, codebooks=CB,
                       codes=sim.ivfpq_encode(emb, (C, CB)))
    # a long-running reader resolves the CURRENT snapshot (v0) lazily —
    # its file listing is pinned now, the scan happens after the flip
    reader = sim.load_ann_model(spark, path)["codes"]

    sim.delete_ann_codes(spark, path, emb.filter(F.col("vec_id") < 5))
    assert sim.compact_ann_codes(spark, path, keep_versions=2) == 85
    assert os.path.isdir(f"{path}/codes_v0")  # retained for the reader
    assert reader.count() == 90  # old snapshot still scannable

    # gc=False: a second cycle leaves everything for the cadence GC
    sim.delete_ann_codes(spark, path, emb.filter(F.col("vec_id") == 10))
    assert sim.compact_ann_codes(spark, path, gc=False) == 84
    assert os.path.isdir(f"{path}/codes_v1")
    # cadence GC with keep_versions=1 sweeps all superseded versions
    gone = sim.gc_ann_versions(spark, path)
    assert {"codes_v0", "codes_v1", "tombstones"} <= set(gone)
    assert sim.load_ann_model(spark, path)["codes"].count() == 84
    emb.unpersist()


@pytest.mark.soak
def test_migrate_ann_layout_upgrades_legacy_index(spark, tmp_path):
    """A pre-r12 index (bare codes/ dir, versionless tombstones) loads
    read-only with the tombstones applied; compaction refuses with the
    migration hint; migrate_ann_layout folds the tombstones into
    codes_v0 and the maintenance ops work from then on."""
    import os

    from singer_spark.operators import similarity as sim

    emb = _clustered_emb(spark, n=100).persist()
    C, CB = sim.ivfpq_train_model(emb, n_clusters=8, m=8, kc=16,
                                  iters_coarse=1, iters_pq=1)
    path = str(tmp_path / "legacy")
    sim.save_ann_model(spark, path, "ivfpq", centroids=C, codebooks=CB)
    # hand-build the legacy layout: bare codes dir + versionless tombs
    enc = sim.ivfpq_encode(emb, (C, CB))
    enc.write.parquet(f"{path}/codes")
    spark.createDataFrame([(i,) for i in range(0, 100, 10)],
                          "vec_id bigint") \
        .write.parquet(f"{path}/tombstones")
    # meta said has_codes=False (saved codes-less); flip it true keeping
    # the real shapes so load rebuilds C/CB correctly
    m0 = spark.read.parquet(f"{path}/meta.parquet").collect()[0]
    spark.createDataFrame([(m0.kind, m0.n_clusters, m0.dim, m0.m, m0.kc,
                            m0.sub, True)],
                          "kind string, n_clusters int, dim int, m int, "
                          "kc int, sub int, has_codes boolean") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta.parquet")

    assert sim.load_ann_model(spark, path)["codes"].count() == 90
    with pytest.raises(ValueError, match="pre-versioned"):
        sim.compact_ann_codes(spark, path)

    sim.migrate_ann_layout(spark, path)
    assert os.path.isdir(f"{path}/codes_v0")
    assert not os.path.isdir(f"{path}/codes")
    assert not os.path.isdir(f"{path}/tombstones")
    assert sim.load_ann_model(spark, path)["codes"].count() == 90
    # migrate is idempotent; maintenance works post-migration
    sim.migrate_ann_layout(spark, path)
    sim.delete_ann_codes(spark, path, emb.filter(F.col("vec_id") == 1))
    assert sim.compact_ann_codes(spark, path) == 89
    emb.unpersist()


def test_ivfpq_rerank_recovers_quantization_loss(spark):
    """r12 two-stage retrieval: reranked recall@k >= raw ADC recall per
    query (theorem), the exact re-scores match l2_topk's micro values
    pair for pair, and with the pool widened to the corpus + all cells
    probed the reranked list EQUALS l2_topk row for row.  On the
    planted-near-dup fixture with a coarse code budget the rerank also
    strictly improves aggregate recall — the operator's whole point."""
    from singer_spark.operators import similarity as sim

    emb = _clustered_emb(spark, n=240).persist()
    q = emb.filter(F.col("vec_id") < 6)
    n = emb.count()
    C, CB = sim.ivfpq_train_model(emb, n_clusters=8, m=4, kc=8,
                                  iters_coarse=1, iters_pq=1)
    exact = sim.l2_topk(emb, q, 5).collect()
    ex_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    ex_d2 = {(r.query_id, r.neighbor_id): r.d2_micro for r in exact}

    adc = sim.ivfpq_ann_topk(emb, q, 5, nprobe=2, model=(C, CB)).collect()
    rer = sim.ivfpq_rerank_topk(emb, q, 5, rerank=40, nprobe=2,
                                model=(C, CB)).collect()

    def hits(rows):
        out: dict = {}
        for r in rows:
            out[r.query_id] = out.get(r.query_id, 0) \
                + ((r.query_id, r.neighbor_id) in ex_pairs)
        return out

    h_adc, h_rer = hits(adc), hits(rer)
    for qid in h_rer:
        assert h_rer[qid] >= h_adc.get(qid, 0)          # monotone theorem
    assert sum(h_rer.values()) > sum(h_adc.values())    # and it HELPS here
    # exact re-scores are l2_topk's micro values, pair for pair
    for r in rer:
        if (r.query_id, r.neighbor_id) in ex_d2:
            assert r.d2_micro == ex_d2[(r.query_id, r.neighbor_id)]

    full = sim.ivfpq_rerank_topk(emb, q, 5, rerank=n, nprobe=8,
                                 model=(C, CB)).collect()
    assert sorted((r.query_id, r.neighbor_id, r.rank, r.d2_micro)
                  for r in full) \
        == sorted((r.query_id, r.neighbor_id, r.rank, r.d2_micro)
                  for r in exact)
    emb.unpersist()


def test_ivfpq_trained_beats_seeded_and_matches_model_shape(spark):
    """ivfpq_train_model returns a (C, CB) pair whose trained search
    finds planted near-duplicates (the dedup regime: each query gets 5
    planted copies at 20x smaller perturbation than the cluster noise,
    so exact top-5 IS the planted set) with recall@5 >= 0.5 and at
    least matches the seeded model."""
    from singer_spark.functions import md5_int
    from singer_spark.operators.similarity import (
        ivfpq_ann_topk,
        ivfpq_train_model,
        l2_topk,
    )

    base = _clustered_emb(spark, n=300)
    qvecs = base.filter(F.col("vec_id") < 10)
    copies = (qvecs.crossJoin(
        spark.range(5).select(F.col("id").alias("c")))
        .select((300 + F.col("vec_id") * 5 + F.col("c")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + (md5_int(F.concat(
                        F.col("vec_id").cast("string"), F.lit("~"),
                        F.col("c").cast("string"), F.lit("~"),
                        i.cast("string"))) % 100) / 10000.0)
                .alias("embedding")))
    emb = base.unionByName(copies).persist()
    q = emb.filter(F.col("vec_id") < 10)
    exact = set((r.query_id, r.neighbor_id)
                for r in l2_topk(emb, q, 5).collect())
    C, CB = ivfpq_train_model(emb, n_clusters=8, m=8, kc=16,
                              iters_coarse=2, iters_pq=2)
    assert C.shape == (8, 64) and CB.shape == (8, 16, 8)

    def recall(model):
        got = set((r.query_id, r.neighbor_id)
                  for r in ivfpq_ann_topk(emb, q, 5, n_clusters=8,
                                          nprobe=4, m=8, kc=16,
                                          model=model).collect())
        return len(got & exact) / len(exact)

    trained, seeded = recall((C, CB)), recall(None)
    emb.unpersist()
    assert trained >= 0.5
    assert trained >= seeded - 1e-9


def test_leakage_safe_split_never_straddles_pairs(spark):
    """The defining invariant: every near-dup pair lands in ONE split (a
    plain per-doc hash split provably straddles some pair on this
    construction), singletons get exactly train_val_split's assignment,
    and split proportions follow the bucket thresholds."""
    from singer_spark.operators.dedup import leakage_safe_split
    from singer_spark.operators.text_analysis import train_val_split

    docs = _docs_df(spark, [(i, f"doc {i}", "s") for i in range(200)])
    # 50 two-doc components pairing far-apart ids — a per-doc hash split
    # at 5/5/90 separates many of these pairs
    pairs = spark.createDataFrame([(i, 199 - i) for i in range(50)],
                                  "id_a bigint, id_b bigint")

    safe = {r.doc_id: (r.cluster, r.split)
            for r in leakage_safe_split(docs, pairs).collect()}
    assert len(safe) == 200
    for i in range(50):
        assert safe[i][0] == safe[199 - i][0] == i
        assert safe[i][1] == safe[199 - i][1]          # never straddles

    plain = {r.doc_id: r.split for r in train_val_split(
        docs.select("doc_id")).collect()}
    # the plain split DOES straddle at least one planted pair here —
    # otherwise this test wouldn't demonstrate the leak being closed
    assert any(plain[i] != plain[199 - i] for i in range(50))
    # singletons (100..149): canonical id is their own id, so the
    # cluster-hash assignment coincides with the per-doc hash split
    for i in range(100, 150):
        assert safe[i][1] == plain[i]

    splits = {s for _, s in safe.values()}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_embedding_outliers_flags_planted_vector(spark):
    from singer_spark.operators.similarity import embedding_outliers

    # two tight clusters around seeded centroids 0/1 + one planted vector
    # assigned to cluster 0 but pointing far off its axis
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    for i in range(2, 12):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))        # cluster 0 tight
        rows.append((100 + i, [0.01 * i, 1.0, 0.0, 0.0]))  # cluster 1 tight
    rows.append((999, [0.6, 0.0, 0.8, 0.0]))  # cluster 0, cos ≈ 0.6 ≪ others
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r.vec_id: r for r in
           embedding_outliers(emb, n_clusters=2, z_threshold=2.0).collect()}
    assert out[999].cluster == 0
    assert out[999].is_outlier and out[999].zscore < -2.0
    flagged = [v for v, r in out.items() if r.is_outlier]
    assert flagged == [999]


def test_ngram_novelty_planted_overlap(spark):
    from singer_spark.operators.text_analysis import ngram_novelty

    train = _docs_df(spark, [(0, "a b c d e f g h", "s")])
    evald = _docs_df(spark, [
        (1, "a b c d e f g h", "s"),       # fully covered → novelty 0
        (2, "q w e r t y u i", "s"),       # fully novel → novelty 1
        (3, "a b c d x y z w", "s"),       # partial overlap
    ])
    got = {r.doc_id: r for r in ngram_novelty(evald, train, k=4).collect()}
    assert got[1].novelty == 0.0 and got[1].n_seen == got[1].n_grams
    assert got[2].novelty == 1.0 and got[2].n_seen == 0
    assert 0.0 < got[3].novelty < 1.0


def test_readability_orders_by_syllable_density(spark):
    from singer_spark.operators.text_analysis import readability

    docs = _docs_df(spark, [
        (1, "the cat sat on the mat. it was fun.", "s"),
        (2, "internationalization necessitates disambiguation methodologies", "s"),
    ])
    got = {r.doc_id: r for r in readability(docs).collect()}
    assert got[1].flesch > got[2].flesch      # simple words read easier
    assert got[1].n_sentences == 2 and got[2].n_sentences == 1
    assert got[2].n_syllables > got[2].n_words * 3


def test_compression_ratio_orders_by_entropy(spark):
    from singer_spark.operators.text_analysis import compression_ratio

    import random
    rng = random.Random(3)
    noise = " ".join("".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                             for _ in range(8)) for _ in range(40))
    docs = _docs_df(spark, [
        (1, "spam " * 200, "s"),      # highly repetitive → tiny ratio
        (2, noise, "s"),              # high-entropy → ratio near 1
        (3, "", "s"),                 # empty → NULL ratio
    ])
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert got[1].ratio < 0.1 < got[2].ratio
    assert got[3].ratio is None and got[3].raw_bytes == 0
    assert got[1].compressed_bytes < got[1].raw_bytes


def test_wordpiece_greedy_segmentation(spark):
    from singer_spark.operators.text_analysis import (
        wordpiece_encode,
        wordpiece_reference,
    )

    vocab = {"un", "##able", "##break", "break", "able", "a", "##b", "##l",
             "##e", "x", "[UNK]"}
    # greedy longest-match: "unbreakable" → un ##break ##able
    assert wordpiece_reference("unbreakable", vocab) == ["un", "##break", "##able"]
    # whole word beats pieces when present
    assert wordpiece_reference("break", vocab) == ["break"]
    # unmatchable position → whole word becomes UNK
    assert wordpiece_reference("zzz", vocab) == ["[UNK]"]
    # continuation fallback: "able" → able (word-initial), "xable" → x ##able
    assert wordpiece_reference("xable", vocab) == ["x", "##able"]

    docs = _docs_df(spark, [
        (1, "unbreakable break", "s"),
        (2, "zzz xable", "s"),
        (3, "", "s"),
    ])
    got = {r.doc_id: (r.n_pieces, r.pieces)
           for r in wordpiece_encode(docs, vocab).collect()}
    assert got[1] == (4, "un ##break ##able break")
    assert got[2] == (3, "[UNK] x ##able")
    assert got[3] == (0, "")


def test_wordpiece_literal_hash_word_and_null_text(spark):
    """Review-fix regressions: a word LITERALLY starting with '##' must
    match continuation pieces at word start (trie parity with the
    reference), and NULL text yields NULL pieces, matching the
    NULL-propagating oracle UDF."""
    from singer_spark.operators.text_analysis import (
        WORDPIECE_DEMO_WORDS,
        demo_vocab,
        wordpiece_encode,
        wordpiece_reference,
    )

    vocab = demo_vocab(WORDPIECE_DEMO_WORDS)
    ref = wordpiece_reference("##heading", vocab)
    assert ref[0].startswith("##")  # the reference matches continuations
    docs = spark.createDataFrame([(1, "##heading"), (2, None)],
                                 "doc_id bigint, text string")
    got = {r.doc_id: r for r in wordpiece_encode(docs, vocab).collect()}
    assert got[1].pieces == " ".join(ref)
    assert got[2].pieces is None and got[2].n_pieces is None


def test_compression_ratio_null_text(spark):
    from singer_spark.operators.text_analysis import compression_ratio

    docs = spark.createDataFrame([(1, None), (2, "hello hello hello")],
                                 "doc_id bigint, text string")
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert got[1].compressed_bytes is None and got[1].ratio is None
    assert got[2].compressed_bytes > 0


def test_wordpiece_crosscheck_agreement_and_edges(spark):
    """The self-verifying form: trie walk and shrinking-window reference
    agree on normal, [UNK]-forcing, '##'-literal, empty, whitespace-only,
    and NULL text; n_words counts \\S+ runs (NULL for NULL text)."""
    from singer_spark.operators.text_analysis import (
        WORDPIECE_DEMO_WORDS,
        demo_vocab,
        wordpiece_crosscheck,
    )

    vocab = demo_vocab(WORDPIECE_DEMO_WORDS)
    docs = spark.createDataFrame(
        [(1, "spark query77 joining"), (2, "ZZZ!!! unmatchable"),
         (3, "##heading mid"), (4, ""), (5, "   "), (6, None)],
        "doc_id bigint, text string")
    got = {r.doc_id: r for r in wordpiece_crosscheck(docs, vocab).collect()}
    assert all(got[i].impls_agree for i in range(1, 7))
    assert got[1].n_words == 3 and got[2].n_words == 2 and got[3].n_words == 2
    assert got[4].n_words == 0 and got[5].n_words == 0
    assert got[6].n_words is None


def test_compression_selfcheck_invariants(spark):
    """Round-trip and RFC-bound booleans hold for empty, repetitive,
    high-entropy, and NULL text; raw_bytes is the UTF-8 byte length."""
    from singer_spark.operators.text_analysis import compression_selfcheck

    docs = spark.createDataFrame(
        [(1, ""), (2, "abc " * 500), (3, "k9!x Qz@7 #mP2 " * 40),
         (4, None), (5, "héllo wörld")],
        "doc_id bigint, text string")
    got = {r.doc_id: r for r in compression_selfcheck(docs).collect()}
    assert all(got[i].bound_ok and got[i].roundtrip_ok for i in range(1, 6))
    assert got[1].raw_bytes == 0
    assert got[2].raw_bytes == 2000
    assert got[4].raw_bytes is None
    assert got[5].raw_bytes == len("héllo wörld".encode("utf-8"))


def test_chunk_documents_overlap_and_tail(spark):
    from singer_spark.operators.text_analysis import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = _docs_df(spark, [(1, text, "s"), (2, "a b", "s")])
    got = sorted(
        ((r.doc_id, r.chunk_idx, r.start_token, r.n_tokens, r.chunk)
         for r in chunk_documents(docs, window=4, overlap=2).collect()))
    # doc 1: stride 2 → starts 0,2,4,6 (ceil((10-2)/2)=4 chunks)
    d1 = [g for g in got if g[0] == 1]
    assert [g[2] for g in d1] == [0, 2, 4, 6]
    assert d1[0][4] == "w0 w1 w2 w3"
    assert d1[1][4] == "w2 w3 w4 w5"           # 2-token overlap
    assert d1[-1][4] == "w6 w7 w8 w9" and d1[-1][3] == 4
    # every token appears in at least one chunk
    covered = set()
    for _, _, start, n, _ in d1:
        covered.update(range(start, start + n))
    assert covered == set(range(10))
    # short doc: one partial chunk
    d2 = [g for g in got if g[0] == 2]
    assert d2 == [(2, 0, 0, 2, "a b")]


def test_hard_negatives_excludes_same_label_and_probes_agree(spark, sf_dir):
    from singer_spark.operators.similarity import hard_negatives

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = hard_negatives(emb, queries, k=5).collect()
    labels = {r.vec_id: r.label for r in queries.collect()}
    assert len(exact) == 5 * queries.count()
    for r in exact:
        assert r.negative_label != labels[r.query_id]
        assert r.negative_id != r.query_id
    # IVF mode returns a subset ranking with decent agreement vs exact
    ivf = hard_negatives(emb, queries, k=5, n_clusters=8, nprobe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.negative_id)
    hits = sum(1 for r in ivf if r.negative_id in exact_sets.get(r.query_id, set()))
    assert hits / len(exact) >= 0.5  # recall@5 with nprobe=4 of 8 clusters


def test_hash_embed_unit_norm_and_determinism(spark):
    import math

    from singer_spark.operators.text_analysis import hash_embed

    docs = _docs_df(spark, [
        (0, "alpha beta alpha", "s"),
        (1, "alpha beta alpha", "s"),   # identical text → identical vector
        (3, "", "s"),                   # empty → zero vector
    ])
    got = {r.doc_id: list(r.embedding) for r in hash_embed(docs, dim=8).collect()}
    assert got[0] == got[1]
    assert len(got[0]) == 8
    assert abs(math.sqrt(sum(x * x for x in got[0])) - 1.0) < 1e-4
    assert got[3] == [0.0] * 8
    # cosine of identical docs is exactly 1 → semantic dedup finds them
    from singer_spark.operators.similarity import semantic_dedup

    emb = hash_embed(docs, dim=8).filter(F.col("doc_id") < 2)
    keep = {r.doc_id: r.keep for r in
            semantic_dedup(emb, n_clusters=1, threshold=0.999,
                           id_col="doc_id").collect()}
    assert keep == {0: True, 1: False}


def test_event_anomalies_flags_spike_hour(spark, tmp_path):
    import pandas as pd

    from singer_spark.queries import event_hourly_anomalies

    rows = []
    eid = 0
    for h in range(24):  # one event per hour baseline...
        rows.append((eid, f"2024-01-01 {h:02d}:15:00", 1, "click", 1.0, "{}"))
        eid += 1
    for _ in range(40):  # ...and a 40× spike in hour 12
        rows.append((eid, "2024-01-01 12:30:00", 2, "click", 1.0, "{}"))
        eid += 1
        rows.append((eid, f"2024-01-01 05:00:00", 3, "steady", 1.0, "{}"))
        eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    src = str(tmp_path / "anom")
    spark.createDataFrame(
        pdf, "event_id bigint, ts timestamp, user_id bigint, "
             "event_type string, value double, props string"
    ).write.parquet(f"{src}/events.parquet")
    got = event_hourly_anomalies(spark, src).collect()
    flagged = {(r.event_type, r.hour) for r in got if r.is_anomaly}
    assert ("click", "2024-01-01 12:00:00") in flagged
    assert all(et == "click" for et, _ in flagged)
    # single-hour type: stddev 0 → zscore 0, never flagged
    steady = [r for r in got if r.event_type == "steady"]
    assert len(steady) == 1 and steady[0].zscore == 0.0


def test_tfidf_idf_downweights_ubiquitous_terms(spark):
    from singer_spark.operators.text_analysis import tfidf_top_terms

    # "common" appears in every source (df == S → idf = ln((S+1)/(S+1)) = 0);
    # each source also has a frequent distinctive term
    docs = _docs_df(spark, [
        (1, "common common common alpha alpha", "s1"),
        (2, "common common common beta beta", "s2"),
        (3, "common common common gamma gamma", "s3"),
    ])
    got = {(r.source, r.term): r.score for r in tfidf_top_terms(docs, k=1).collect()}
    assert set(got) == {("s1", "alpha"), ("s2", "beta"), ("s3", "gamma")}
    assert all(v > 0 for v in got.values())


def test_decontaminate_spans_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from singer_spark.operators.text_analysis import decontaminate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    out = decontaminate_spans(docs, bench, k=8)
    joined = out.join(docs.select(F.col("doc_id").alias("id"), "text"), "id")

    # a benchmark doc with >= 8 tokens is fully covered by its own windows
    full = joined.where((F.col("id") % 50 == 0) & (F.col("n_tokens") >= 8))
    assert full.where(F.col("n_removed") != F.col("n_tokens")).count() == 0
    assert full.where(F.col("clean_text") != "").count() == 0

    # untouched docs come back verbatim
    clean = joined.where(F.col("n_removed") == 0)
    assert clean.count() > 0
    assert clean.where(F.col("clean_text") != F.col("text")).count() == 0

    # never negative, never exceeding the doc
    assert out.where((F.col("n_removed") < 0)
                     | (F.col("n_removed") > F.col("n_tokens"))).count() == 0


def test_cross_source_overlap_doc_and_kgram(spark):
    from singer_spark.operators.dedup import cross_source_overlap

    boiler = "terms of service apply to all users here"
    rows = [(1, f"{boiler} alpha beta", "A"),
            (2, f"{boiler} gamma delta", "B"),
            (3, "completely different text with no shared grams", "C"),
            (4, f"{boiler} alpha beta", "B")]  # exact dup of doc 1 in B
    docs = _docs_df(spark, rows)

    # doc mode: only the byte-identical pair registers
    doc_rows = {(r.source_a, r.source_b): r.shared for r in
                cross_source_overlap(docs, unit="doc").collect()}
    assert doc_rows == {("A", "B"): 1}

    # kgram mode: the shared boilerplate registers between A and B (and
    # B's exact copy of doc 1 adds A's unique tail grams too); C shares
    # nothing with anyone
    kg = {(r.source_a, r.source_b): r for r in
          cross_source_overlap(docs, unit="kgram", k=4).collect()}
    assert ("A", "B") in kg and kg[("A", "B")].shared > 0
    assert kg[("A", "B")].jaccard > 0
    assert not any("C" in pair for pair in kg)
    # A's doc has 10 tokens -> 7 distinct 4-grams, all present in B via
    # the exact copy: containment is total, so shared == n_a
    assert kg[("A", "B")].shared == kg[("A", "B")].n_a == 7

    # NULL text must not register as a shared content unit: two sources
    # that each contain only a NULL-text doc share nothing
    nulls = _docs_df(spark, [(10, None, "X"), (11, None, "Y")])
    assert cross_source_overlap(nulls, unit="doc").collect() == []
    assert cross_source_overlap(nulls, unit="kgram").collect() == []


def test_label_centroid_sim_geometry(spark):
    from singer_spark.operators.similarity import label_centroid_sim

    # label 0: vectors around e1; label 1: around e2 (orthogonal);
    # label 2: same direction as label 0 (cos 1 with it)
    rows = [(1, [2.0, 0.0], 0), (2, [4.0, 0.0], 0),
            (3, [0.0, 1.0], 1), (4, [0.0, 3.0], 1),
            (5, [5.0, 0.0], 2)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int")
    got = {(r.label_a, r.label_b): r.cos
           for r in label_centroid_sim(emb).collect()}
    assert got[(0, 1)] == 0.0
    assert got[(0, 2)] == 1.0
    assert got[(1, 2)] == 0.0


def test_minhash_recall_report_detects_weak_banding(spark):
    from singer_spark.operators.dedup import minhash_recall_report

    # 40 near-dup pairs at moderate jaccard (~0.53: one token of 16
    # swapped changes 4 of 13 distinct 4-grams) — marginal pairs where
    # the banding probability matters
    rows = []
    for i in range(40):
        base = [f"w{i}_{j}" for j in range(16)]
        mod = list(base)
        mod[8] = f"x{i}"
        rows.append((2 * i, " ".join(base), "s"))
        rows.append((2 * i + 1, " ".join(mod), "s"))
    docs = _docs_df(spark, rows)

    strong = minhash_recall_report(docs, threshold=0.3, num_hashes=8,
                                   bands=4).collect()[0]
    weak = minhash_recall_report(docs, threshold=0.3, num_hashes=8,
                                 bands=1).collect()[0]
    assert strong.n_exact == weak.n_exact == 40
    # no hot posting lists in this corpus (every df <= 2), so the LSH
    # pairs are a strict subset of the blocked-exact baseline here; on a
    # boilerplate-flooded corpus n_lsh can exceed n_common (see the
    # baseline caveat in minhash_recall_report's docstring)
    assert strong.n_lsh == strong.n_common
    assert weak.n_lsh == weak.n_common
    # more bands => strictly better or equal recall, and the single-band
    # setting must show real loss on these marginal pairs (the audit's
    # whole point)
    assert strong.recall >= weak.recall
    assert weak.recall < 1.0
    assert strong.recall > 0.5


def _naive_span_dedup(docs, k, min_run):
    """Brute-force reference for dedup_spans: positions covered by any
    shared window (owner = min id keeps its copy) union into maximal
    contiguous intervals; intervals >= min_run tokens are cut."""
    toks = {i: t.split(" ") for i, t in docs}
    grams: dict = {}
    for i, ts in sorted(toks.items()):
        for s in range(len(ts) - k + 1):
            grams.setdefault(" ".join(ts[s:s + k]), []).append((i, s))
    owner = {g: min(i for i, _ in v) for g, v in grams.items()
             if len({i for i, _ in v}) > 1}
    cov: dict = {}
    for g, occs in grams.items():
        o = owner.get(g)
        if o is None:
            continue
        for i, s in occs:
            if i > o:
                cov.setdefault(i, set()).update(range(s, s + k))
    out = {}
    for i, ts in toks.items():
        islands = []
        for p in sorted(cov.get(i, ())):
            if islands and p == islands[-1][1] + 1:
                islands[-1][1] = p
            else:
                islands.append([p, p])
        cut: set = set()
        for lo, hi in islands:
            if hi - lo + 1 >= min_run:
                cut.update(range(lo, hi + 1))
        kept = [t for j, t in enumerate(ts) if j not in cut]
        out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


@pytest.mark.soak
def test_dedup_spans_property_random_corpora(spark):
    """Property sweep for the span family (the r9 flagship): on
    randomized tiny-alphabet corpora (dense shared windows, overlap
    runs, exact-duplicate docs) dedup_spans must equal the brute-force
    positional reference at both min_run settings, and the INCREMENTAL
    form over an id-ordered split must equal the uninterrupted batch
    run's rows for the second half (streamed == uninterrupted at the
    operator level).  Deterministic seeds, a few Spark calls per corpus
    — the bpe_learn derandomized-hypothesis pattern."""
    import random

    from singer_spark.operators.dedup import (
        dedup_spans,
        dedup_spans_incremental,
        span_grams,
    )

    words = ["aa", "bb", "cc", "dd"]
    for seed in range(6):
        rng = random.Random(seed)
        rows = []
        for i in range(rng.randint(6, 9)):
            n = rng.choice([0, 2, 5, 9, 14, 20, 24])
            rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
        rows.append((50, rows[0][1]))   # exact duplicate of doc 0
        rows.append((51, rows[1][1] + " zz " + rows[1][1]))  # self-repeat
        docs = spark.createDataFrame(
            [(i, t, "s") for i, t in rows],
            "doc_id bigint, text string, source string")
        for min_run in (3, 6):
            got = {r.id: (r.clean_text, r.n_tokens, r.n_removed)
                   for r in dedup_spans(docs, k=3, min_run=min_run).collect()}
            want = _naive_span_dedup(rows, 3, min_run)
            assert got == want, (seed, min_run)

        # incremental == uninterrupted on an id-ordered split
        lo = [(i, t) for i, t in rows if i < 5]
        hi = [(i, t) for i, t in rows if i >= 5]
        if not lo or not hi:
            continue
        d_lo = docs.where(F.col("doc_id") < 5)
        d_hi = docs.where(F.col("doc_id") >= 5)
        inc = {r.id: (r.clean_text, r.n_tokens, r.n_removed)
               for r in dedup_spans_incremental(
                   d_hi, span_grams(d_lo, k=3), k=3, min_run=6).collect()}
        full = {r.id: (r.clean_text, r.n_tokens, r.n_removed)
                for r in dedup_spans(docs, k=3, min_run=6).collect()
                if r.id >= 5}
        assert inc == full, seed


def test_bpe_learn_property_random_corpora(spark):
    """Property sweep: on randomized small-alphabet corpora (where pair
    ties and overlap runs are dense), the Spark merge table equals the
    reference algorithm exactly.  Deterministic seeds, one Spark call per
    corpus — a derandomized hypothesis stand-in sized for suite time."""
    import random
    from collections import Counter

    from singer_spark.operators.text_analysis import bpe_learn_merges

    for seed in range(6):
        rng = random.Random(seed)
        alphabet = "ab" if seed % 2 == 0 else "abc"
        texts = [" ".join("".join(rng.choice(alphabet)
                                  for _ in range(rng.randint(1, 6)))
                          for _ in range(rng.randint(1, 12)))
                 for _ in range(5)]
        docs = _docs_df(spark, [(i, t, "s") for i, t in enumerate(texts)])
        freqs = Counter(w for t in texts for w in t.lower().split(" ") if w)
        want = _bpe_reference(freqs, 6)
        got = [(r.step, r.left_sym, r.right_sym, r.merged, r.pair_freq)
               for r in bpe_learn_merges(docs, n_merges=6).collect()]
        assert got == want, f"seed {seed}: {got} != {want}"


def test_repetition_signals_hand_computed(spark):
    """Gopher repetition screens against hand-computed fractions: the
    most-frequent-2-gram occurrence chars over doc chars, the overlap
    cap at 1.0, exact dup-5-gram position coverage (overlaps counted
    once), and zero-support edges (empty / NULL / single-token)."""
    from singer_spark.operators.text_analysis import repetition_signals

    docs = spark.createDataFrame([
        (1, "a b a b a b c"),
        (2, "p q r s t x p q r s t y"),
        (3, ""), (4, None), (5, "one"),
    ], "doc_id bigint, text string")
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}

    # doc 1: "a b" occurs 3x, 3 chars each, 13 chars total
    assert got[1].top2_frac == round(3 * 3 / 13, 4)
    # "a b a b" occurs twice (overlapping) -> raw 14/13, capped at 1
    assert got[1].top4_frac == 1.0
    assert got[1].dup5_frac == 0.0  # no 5-gram repeats

    # doc 2: "p q r s t" at positions 1 and 7 -> covers 10 of 12 tokens
    assert got[2].dup5_frac == round(10 / 12, 4)
    assert got[2].dup6_frac == 0.0

    for d in (3, 4, 5):
        assert got[d].top2_frac == 0.0 and got[d].dup5_frac == 0.0


def test_semantic_decontaminate_catches_paraphrase_kgram_misses(spark):
    """The operator's reason to exist: a token-level REORDERING of an
    eval item shares no 8-gram with it (exact decontaminate misses it)
    but has cosine 1.0 in hash-embed space (same token multiset) — the
    semantic screen flags it.  An unrelated doc stays clean, and the
    nearest-benchmark argmax is reported."""
    from singer_spark.operators.text_analysis import (
        decontaminate,
        semantic_decontaminate,
    )

    eval_item = " ".join(f"q{i}" for i in range(12))
    reordered = " ".join(f"q{i}" for i in reversed(range(12)))
    unrelated = " ".join(f"z{i}" for i in range(12))
    docs = _docs_df(spark, [(1, reordered, "s"), (2, unrelated, "s"),
                            (3, eval_item, "s")])
    bench = _docs_df(spark, [(100, eval_item, "b")])

    exact = {r.id: r.contaminated
             for r in decontaminate(docs, bench, k=8).collect()}
    sem = {r.id: r for r in
           semantic_decontaminate(docs, bench, threshold=0.95).collect()}

    assert exact[1] is False          # 8-gram gate misses the reorder
    assert sem[1].contaminated        # the cosine gate catches it
    assert sem[1].max_bench_cosine == 1.0
    assert sem[1].nearest_bench_id == 100
    assert not sem[2].contaminated    # unrelated stays clean
    assert sem[3].contaminated and exact[3]  # verbatim caught by both


def test_bpe_learn_local_matches_distributed(spark, sf_dir):
    """The driver-local trainer must reproduce the distributed loop's
    merge table EXACTLY — same argmax (count desc, pair-string asc with
    the \\x03 separator), same scan-left merge, same stop condition — on
    the adversarial fixture (overlap runs, ties, cascades) and on the
    real sf0.001 documents table."""
    from singer_spark.operators.text_analysis import (
        bpe_learn_merges,
        bpe_learn_merges_local,
    )

    texts = ["low low low lower lowest", "aaaa aaaa aa a", "zz yy zz yy",
             "newer newest new b", "ab ab ba ba", "", None, "x"]
    docs = _docs_df(spark, [(i, t, "s") for i, t in enumerate(texts)])

    def rows(df):
        return [tuple(r) for r in df.orderBy("step").collect()]

    assert rows(bpe_learn_merges_local(docs, n_merges=15)) == \
        rows(bpe_learn_merges(docs, n_merges=15))

    real = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert rows(bpe_learn_merges_local(real, n_merges=12)) == \
        rows(bpe_learn_merges(real, n_merges=12))

    # the caps exist for production vocab bounding and stay exact when
    # they don't bind (non-binding: sf0.001 vocab is ~2k words; NOTE a
    # huge max_vocab is itself O(max_vocab) memory — TakeOrdered heaps)
    assert rows(bpe_learn_merges_local(real, n_merges=6, min_freq=1,
                                       max_vocab=50_000)) == \
        rows(bpe_learn_merges(real, n_merges=6))


def test_dsir_weights_match_bruteforce_and_prefer_target(spark):
    """dsir_log_weights == brute-force hashed-ngram importance weights
    (same md5 bucketing, same Jeffreys smoothing, same parenthesization)
    on a constructed corpus, and documents from the target's domain
    score higher than off-domain ones; dsir_sample's Gumbel cut is
    deterministic and k-sized."""
    import hashlib
    import math
    from collections import Counter

    from singer_spark.operators.text_analysis import (
        dsir_log_weights,
        dsir_sample,
    )

    tgt_texts = [f"alpha beta gamma t{i}" for i in range(6)]
    raw_rows = [(i, t, "tgt") for i, t in enumerate(tgt_texts)]
    raw_rows += [(100 + i, f"delta epsilon zeta r{i}", "other")
                 for i in range(6)]
    raw_rows += [(200, "", "other"), (201, None, "other")]
    docs = _docs_df(spark, raw_rows)
    target = docs.where(F.col("source") == "tgt")

    B, a = 64, 0.5

    def md5i(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def grams(text):
        if text is None:
            return []
        t0 = text.split(" ")
        uni = [x for x in t0 if x != ""]
        big = ([" ".join(t0[i:i + 2]) for i in range(len(t0) - 1)]
               if len(t0) >= 2 else [" ".join(t0)])
        return uni + big

    raw_c, tgt_c, per_doc = Counter(), Counter(), {}
    for i, t, src in raw_rows:
        bs = [md5i(g) % B for g in grams(t)]
        per_doc[i] = Counter(bs)
        raw_c.update(bs)
        if src == "tgt":
            tgt_c.update(bs)
    rT, tT = sum(raw_c.values()), sum(tgt_c.values())
    expected = {}
    for i, cnts in per_doc.items():
        expected[i] = sum(
            c * (math.log((tgt_c.get(b, 0) + a) / (tT + a * B))
                 - math.log((raw_c[b] + a) / (rT + a * B)))
            for b, c in cnts.items())

    got = {r.doc_id: (r.log_weight, r.n_grams)
           for r in dsir_log_weights(docs, target, n_buckets=B,
                                     smoothing=a).collect()}
    assert set(got) == {i for i, _, _ in raw_rows}
    for i, (lw, ng) in got.items():
        assert abs(lw - expected[i]) < 1e-9, i
        assert ng == sum(per_doc[i].values())
    # on-domain docs outscore off-domain ones
    assert min(got[i][0] for i in range(6)) > \
        max(got[i][0] for i in (100, 101, 102, 103, 104, 105))
    # no-gram docs: weight exactly 0
    assert got[201] == (0.0, 0)

    sel = dsir_sample(docs, target, k=5, n_buckets=B).collect()
    assert len(sel) == 5
    keys = [r.gumbel_key for r in sel]
    assert keys == sorted(keys, reverse=True)
    again = dsir_sample(docs, target, k=5, n_buckets=B).collect()
    assert [(r.doc_id, r.gumbel_key) for r in sel] == \
        [(r.doc_id, r.gumbel_key) for r in again]


def test_cluster_balanced_sample_budgets_and_determinism(spark):
    """Budgets follow the integer count^alpha rule exactly; alpha=0
    flattens budgets across clusters; picks are the md5-rank prefix of
    each cluster and identical across runs."""
    import hashlib
    import math

    from singer_spark.operators.similarity import cluster_balanced_sample

    # two dense clusters of very different size around orthogonal axes
    rows = []
    for i in range(40):   # cluster around e0
        v = [10.0, float(i % 3) * 0.1, 0.0, 0.0]
        rows.append((i, v))
    for i in range(10):   # cluster around e1
        v = [0.0, 10.0, float(i % 3) * 0.1, 0.0]
        rows.append((100 + i, v))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    out = cluster_balanced_sample(emb, k=20, n_clusters=2, iters=2,
                                  alpha=0.5).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
    sizes = {c: len(v) for c, v in by_cluster.items()}
    # integer budget rule: w_c = floor(cnt^0.5*1e6+0.5), b = max(1, 20*w//W)
    w40 = math.floor(math.sqrt(40) * 1e6 + 0.5)
    w10 = math.floor(math.sqrt(10) * 1e6 + 0.5)
    W = w40 + w10
    assert sorted(sizes.values()) == sorted(
        [max(1, 20 * w40 // W), max(1, 20 * w10 // W)])
    for c, rws in by_cluster.items():
        assert [r.pick_rank for r in sorted(rws, key=lambda r: r.pick_rank)] \
            == list(range(1, len(rws) + 1))
        assert all(r.budget >= len(rws) for r in rws)

    # picks are the md5-order prefix of the cluster membership
    def md5i(vid):
        return int(hashlib.md5(f"{vid}|cbs".encode()).hexdigest()[:15], 16)

    big_cluster = max(by_cluster.values(), key=len)
    member_ids = [i for i in range(40)]  # 40-strong cluster is ids 0..39
    expect_prefix = sorted(member_ids, key=lambda i: (md5i(i), i))[
        :len(big_cluster)]
    assert sorted(r.vec_id for r in big_cluster) == sorted(expect_prefix)

    again = cluster_balanced_sample(emb, k=20, n_clusters=2, iters=2,
                                    alpha=0.5).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))

    # alpha=0: both clusters get equal budgets despite the 4x size gap
    flat = cluster_balanced_sample(emb, k=10, n_clusters=2, iters=2,
                                   alpha=0.0).collect()
    fsizes = {}
    for r in flat:
        fsizes[r.cluster] = fsizes.get(r.cluster, 0) + 1
    assert len(set(fsizes.values())) == 1


def test_dedup_spans_keeps_first_copy_and_unique_text(spark):
    """Shared 8-gram spans survive ONLY in the lowest-id doc; unique
    text is untouched; spans shared within a doc only (no second doc)
    are kept; NULL text passes through NULL."""
    from singer_spark.operators.dedup import dedup_spans

    boiler = " ".join(f"b{i}" for i in range(10))     # 10-token boilerplate
    uniq = {i: " ".join(f"u{i}x{j}" for j in range(6)) for i in range(4)}
    rows = [
        (1, f"{boiler} {uniq[0]}", "s"),              # owner: keeps all
        (2, f"{uniq[1]} {boiler}", "s"),              # loses the boiler span
        (3, f"{uniq[2]} {boiler} {uniq[3]}", "s"),    # loses the middle
        (4, "short only", "s"),                       # < k tokens: untouched
        (5, None, "s"),
        (6, f"{boiler} {boiler}", "s"),               # repeated + shared
    ]
    docs = _docs_df(spark, rows)
    out = {r.id: r for r in dedup_spans(docs, k=8).collect()}

    assert out[1].clean_text == f"{boiler} {uniq[0]}"
    assert out[1].n_removed == 0
    # doc 2: every boiler token is covered by some shared 8-gram window
    assert out[2].clean_text == uniq[1]
    assert out[2].n_removed == 10
    assert out[3].clean_text == f"{uniq[2]} {uniq[3]}"
    assert out[3].n_removed == 10
    assert out[4].clean_text == "short only" and out[4].n_removed == 0
    assert out[5].clean_text is None and out[5].n_removed is None
    # doc 6 is not the owner (doc 1 is): both copies cut
    assert out[6].n_removed == 20 and out[6].clean_text == ""

    # within-doc-only repetition with no second doc: kept (cross-doc op)
    solo = _docs_df(spark, [(1, f"{boiler} {boiler}", "s")])
    r = dedup_spans(solo, k=8).collect()[0]
    assert r.n_removed == 0 and r.clean_text == f"{boiler} {boiler}"


def test_dedup_spans_min_run_threshold(spark):
    """min_run stitches overlapping shared windows into maximal runs and
    cuts only runs >= min_run tokens: a 10-token shared boilerplate run
    is cut at min_run=10 but kept at min_run=11; an isolated shared
    8-gram survives any min_run > 8; min_run=k equals the default."""
    import pytest as _pytest

    from singer_spark.operators.dedup import dedup_spans

    boiler = " ".join(f"b{i}" for i in range(10))         # 10-token run
    phrase = " ".join(f"p{i}" for i in range(8))          # exactly one 8-gram
    rows = [
        (1, f"{boiler} one two {phrase}", "s"),           # owner of both
        (2, f"x0 x1 x2 {boiler} y0 y1", "s"),             # shares the run
        (3, f"z0 z1 {phrase} z2 z3", "s"),                # shares the 8-gram
    ]
    docs = _docs_df(spark, rows)

    at10 = {r.id: r for r in dedup_spans(docs, k=8, min_run=10).collect()}
    assert at10[2].clean_text == "x0 x1 x2 y0 y1"         # run cut
    assert at10[2].n_removed == 10
    assert at10[3].n_removed == 0                          # 8 < 10: kept
    assert at10[3].clean_text == f"z0 z1 {phrase} z2 z3"

    at11 = {r.id: r for r in dedup_spans(docs, k=8, min_run=11).collect()}
    assert at11[2].n_removed == 0                          # 10 < 11: kept

    # min_run = k reproduces the default exactly
    d1 = sorted(map(tuple, dedup_spans(docs, k=8).collect()))
    d2 = sorted(map(tuple, dedup_spans(docs, k=8, min_run=8).collect()))
    assert d1 == d2
    assert at10[1].n_removed == 0                          # owner untouched

    with _pytest.raises(ValueError):
        dedup_spans(docs, k=8, min_run=4)


def test_lsh_tuning_report_s_curve_properties(spark):
    """The tuning table's rows are the exact S-curve facts: every
    divisor split of n_perm appears, s50 satisfies the MMDS identity
    b * s50^r == 1, more bands shift the threshold left (more
    permissive), and the error areas are consistent with the curve's
    shape."""
    from singer_spark.operators.dedup import lsh_tuning_report

    rep = {(r.b, r.r): r for r in
           lsh_tuning_report(spark, n_perm=64, threshold=0.5).collect()}
    assert set(rep) == {(b, 64 // b) for b in range(1, 65) if 64 % b == 0}
    for (b, r), row in rep.items():
        # (1/b)^(1/r): the MMDS steep-rise threshold approximation
        assert abs(b * row.s50 ** r - 1.0) < 1e-4
        assert 0 <= row.fp_area and 0 <= row.fn_area
        assert abs(row.total_err - (row.fp_area + row.fn_area)) < 2e-6
        # brute-force the areas on the same grid
        fp = sum((1 - (1 - (i / 100.0) ** r) ** b) * 0.01
                 for i in range(1, 50))
        fn = sum((1 - (1 - (1 - (i / 100.0) ** r) ** b)) * 0.01
                 for i in range(50, 100))
        assert abs(row.fp_area - fp) < 1e-5 and abs(row.fn_area - fn) < 1e-5
    # bands up -> crossover down
    s50s = [rep[(b, 64 // b)].s50 for b in (1, 4, 16, 64)]
    assert s50s == sorted(s50s, reverse=True)
    # the classic b=16,r=4 region should beat the degenerate ends at t=0.5
    assert rep[(16, 4)].total_err < rep[(1, 64)].total_err
    assert rep[(16, 4)].total_err < rep[(64, 1)].total_err


def test_optimal_bands_matches_tuning_report_argmin(spark):
    """VERDICT r9 task #6: the local `optimal_bands` twin must pick
    exactly the lsh_tuning_report row minimizing total_err (lowest b on
    ties), and `minhash_lsh_pairs`' auto default must equal the
    oracle-pinned explicit (bands=4) output at the registry's
    (num_hashes=8, threshold=0.5) setting."""
    from singer_spark.operators.dedup import (
        lsh_tuning_report,
        minhash_lsh_pairs,
        optimal_bands,
    )

    for n_perm, t in ((64, 0.5), (64, 0.8), (8, 0.5), (8, 0.6), (16, 0.7)):
        rows = lsh_tuning_report(spark, n_perm=n_perm, threshold=t).collect()
        best = min(rows, key=lambda r: (r.total_err, r.b))
        assert optimal_bands(n_perm, t) == (best.b, best.r), (n_perm, t)
    # the registry setting resolves to the same split the pinned entries
    # pass explicitly — auto default changes nothing oracle-checked
    assert optimal_bands(8, 0.5) == (4, 2)

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta " +
          ("iota kappa" if i % 2 else "iota kappa2"), "s")
         for i in range(8)], "doc_id bigint, text string, source string")
    auto = sorted((r.id_a, r.id_b) for r in
                  minhash_lsh_pairs(docs, threshold=0.5).collect())
    explicit = sorted((r.id_a, r.id_b) for r in
                      minhash_lsh_pairs(docs, bands=4,
                                        threshold=0.5).collect())
    assert auto == explicit


def test_bpe_local_loop_matches_naive_recount():
    """Property test for the incremental pair statistics + lazy max-heap:
    on random small vocabularies the factored driver loop must equal a
    naive reference that recounts every pair from scratch each step
    (argmax by count desc then pair-string asc with the \\x03 separator,
    scan-left non-overlapping merge)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from singer_spark.operators.text_analysis import _bpe_local_loop

    def naive(vocab, n_merges):
        words = {i: tuple(w) for i, (w, _) in enumerate(vocab)}
        freqs = [f for _, f in vocab]
        out = []
        for step in range(1, n_merges + 1):
            cnt = Counter()
            for i, s in words.items():
                for p in zip(s, s[1:]):
                    cnt[p] += freqs[i]
            live = [(c, p) for p, c in cnt.items() if c > 0]
            if not live:
                break
            best = min(live, key=lambda cp: (-cp[0],
                                             cp[1][0] + "\x03" + cp[1][1]))
            (c, (a, b)) = best
            out.append((step, a, b, a + b, c))
            for i, s in words.items():
                ns, j = [], 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                        ns.append(a + b)
                        j += 2
                    else:
                        ns.append(s[j])
                        j += 1
                words[i] = tuple(ns)
        return out

    word = st.text(alphabet="abc", min_size=1, max_size=8)
    vocab_s = st.lists(
        st.tuples(word, st.integers(min_value=1, max_value=9)),
        min_size=1, max_size=12, unique_by=lambda t: t[0])

    @settings(max_examples=200, deadline=None)
    @given(vocab_s, st.integers(min_value=1, max_value=10))
    def check(vocab, n):
        assert _bpe_local_loop(vocab, n) == naive(vocab, n)

    check()


def test_dedup_spans_incremental_history_and_bloom_parity(spark):
    """Increment windows seen in history are cut even with no duplicate
    inside the increment; intra-increment duplicates keep their owner
    copy; the Bloom-prefiltered path is bit-identical to the exact one;
    state maintenance via span_grams round-trips."""
    from singer_spark.operators.dedup import (
        dedup_spans_incremental,
        span_grams,
    )

    boiler = " ".join(f"h{i}" for i in range(9))
    hist = _docs_df(spark, [(1, f"{boiler} old tail", "s")])
    seen = span_grams(hist, k=8)

    intra = " ".join(f"d{i}" for i in range(8))
    inc = _docs_df(spark, [
        (10, f"{boiler} fresh u1 u2", "s"),      # history hit
        (11, f"n0 n1 {intra}", "s"),             # owner of intra dup
        (12, f"{intra} m0 m1", "s"),             # loses it
        (13, "totally unique text here now", "s"),
    ])
    exact = {r.id: r for r in dedup_spans_incremental(inc, seen, k=8)
             .collect()}
    assert exact[10].n_removed == 9 and exact[10].clean_text == "fresh u1 u2"
    assert exact[11].n_removed == 0
    assert exact[12].n_removed == 8 and exact[12].clean_text == "m0 m1"
    assert exact[13].n_removed == 0

    bloomed = {r.id: r for r in dedup_spans_incremental(
        inc, seen, k=8, num_bits=1 << 16).collect()}
    assert {i: tuple(r) for i, r in exact.items()} == \
        {i: tuple(r) for i, r in bloomed.items()}

    # appending the increment's grams makes its text history for the next
    # increment: a verbatim re-submission is fully cut
    seen2 = seen.unionByName(span_grams(inc, k=8)).distinct()
    resub = _docs_df(spark, [(20, f"{intra} m0 m1", "s")])
    again = dedup_spans_incremental(resub, seen2, k=8).collect()[0]
    assert again.n_removed == again.n_tokens and again.clean_text == ""


def test_dedup_spans_randomized_bruteforce_parity(spark):
    """30 seeded random corpora (tiny alphabet → dense shared windows,
    seam-heavy) against a brute-force reference of the full pipeline:
    owner rule, island stitching, min_run filter, coverage rebuild.
    Corpora ride in ONE DataFrame (tokens prefixed with the corpus id so
    digests can't collide across corpora) — two Spark actions total."""
    import random

    from singer_spark.operators.dedup import dedup_spans

    rng = random.Random(909)
    k = 3
    corpora = {}
    rows = []
    for c in range(30):
        docs = {}
        for d in range(rng.randint(2, 5)):
            L = rng.randint(0, 14)
            docs[d] = [f"c{c}w{rng.randint(0, 3)}" for _ in range(L)]
            rows.append((c * 100 + d, " ".join(docs[d]), "s"))
        corpora[c] = docs

    def brute(docs, min_run):
        # the engine tokenizer is split(text, " ") UNfiltered: empty text
        # is one empty token (n_tokens 1), matching the SQL twin
        docs = {d: " ".join(t).split(" ") for d, t in docs.items()}
        grams = {}
        for d, toks in docs.items():
            for s in range(len(toks) - k + 1):
                grams.setdefault(tuple(toks[s:s + k]), []).append((d, s + 1))
        hits = {}
        for g, occ in grams.items():
            ds = {d for d, _ in occ}
            if len(ds) < 2:
                continue
            owner = min(ds)
            for d, s in occ:
                if d > owner:
                    hits.setdefault(d, set()).add(s)
        out = {}
        for d, toks in docs.items():
            starts = sorted(hits.get(d, ()))
            ivls, cur = [], None
            for s in starts:
                lo, hi = s, s + k - 1
                if cur and lo <= cur[1] + 1:
                    cur[1] = max(cur[1], hi)
                else:
                    cur = [lo, hi]
                    ivls.append(cur)
            ivls = [iv for iv in ivls if iv[1] - iv[0] + 1 >= min_run]
            kept = [t for j, t in enumerate(toks, start=1)
                    if not any(lo <= j <= hi for lo, hi in ivls)]
            out[d] = (" ".join(kept), len(toks), len(toks) - len(kept))
        return out

    df = _docs_df(spark, rows)
    for min_run in (3, 5):
        got = {r.id: (r.clean_text, r.n_tokens, r.n_removed)
               for r in dedup_spans(df, k=k, min_run=min_run).collect()}
        for c, docs in corpora.items():
            want = brute(docs, min_run)
            for d, exp in want.items():
                assert got[c * 100 + d] == exp, (c, d, min_run)


def test_dsir_column_target_equals_dataframe_target(spark):
    """The single-scan Column-predicate fast path must produce exactly
    the weights of the two-scan DataFrame-target path."""
    from singer_spark.operators.text_analysis import dsir_log_weights

    rows = [(i, f"alpha beta t{i}" if i < 5 else f"delta eps r{i}",
             "tgt" if i < 5 else "other") for i in range(10)]
    docs = _docs_df(spark, rows)
    via_df = {r.doc_id: (r.log_weight, r.n_grams)
              for r in dsir_log_weights(
                  docs, docs.where(F.col("source") == "tgt"),
                  n_buckets=64).collect()}
    via_col = {r.doc_id: (r.log_weight, r.n_grams)
               for r in dsir_log_weights(
                   docs, F.col("source") == "tgt",
                   n_buckets=64).collect()}
    assert via_df == via_col


def test_dedup_spans_report_is_the_min_run_integral(spark):
    """The report's cut_tokens_at_min_run row m must equal the tokens
    dedup_spans(min_run=m) actually removes, for every run length
    present — the decision-table contract."""
    from singer_spark.operators.dedup import dedup_spans, dedup_spans_report

    boiler = " ".join(f"b{i}" for i in range(14))   # one 14-token run
    short = " ".join(f"s{i}" for i in range(9))     # one 9-token run
    docs = _docs_df(spark, [
        (1, f"{boiler} {short}", "s"),
        (2, f"u0 u1 {boiler} u2", "s"),
        (3, f"{short} v0 v1 v2", "s"),
    ])
    rep = {r.run_len: r for r in dedup_spans_report(docs, k=8).collect()}
    assert set(rep) == {9, 14}
    assert rep[14].n_runs == 1 and rep[9].n_runs == 1
    for m in (9, 14):
        removed = (dedup_spans(docs, k=8, min_run=m)
                   .agg(F.sum("n_removed")).collect()[0][0])
        assert removed == rep[m].cut_tokens_at_min_run, m


def test_dedup_clusters_unionfind_equals_propagation(spark):
    """The driver union-find fast path must label exactly like the
    distributed min-label loop, including chain components whose
    diameter exceeds one hop and isolated singletons."""
    from singer_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 12)],
                                 "doc_id bigint")
    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (9, 1),          # chain with min inside: -> 1
         (7, 8),                          # simple pair -> 7
         (10, 11), (11, 2),               # chain ending at 2 -> 2
         (4, 999), (999, 6),              # FOREIGN node 999 (not in docs):
         (0, 7)],                         # must NOT bridge 4-6; 0 not in
        "id_a bigint, id_b bigint")       # docs must not become a label
    fast = {r.doc_id: r.cluster
            for r in dedup_clusters(docs, pairs).collect()}
    loop = {r.doc_id: r.cluster
            for r in dedup_clusters(docs, pairs,
                                    driver_edge_threshold=0).collect()}
    assert fast == loop
    assert fast[5] == fast[3] == fast[9] == fast[1] == 1
    assert fast[7] == fast[8] == 7
    assert fast[10] == fast[11] == fast[2] == 2
    assert fast[4] == 4 and fast[6] == 6


# ---------------------------------------------------------------------------
# nb_quality_scores — model-based quality filtering (CCNet/GPT-3 stage)
# ---------------------------------------------------------------------------
def _nb_reference(rows, seed_srcs, alpha=0.5, max_vocab=50_000,
                  threshold=0.0):
    """Brute-force multinomial-NB replay of nb_quality_scores' spec:
    whitespace tokens, (count DESC, token ASC) vocab cap + one OOV
    bucket, Laplace cell log-ratios, smoothed doc-count prior."""
    # single-space split with empty-token filter — the operator's exact
    # tokenization (str.split() would diverge on tab/newline text)
    toks = {d: ([w for w in t.split(" ") if w] if t else [])
            for d, t, s in rows}
    seed = {d: (s in seed_srcs) for d, t, s in rows}
    cp, ca = {}, {}
    for d, t, s in rows:
        for w in toks[d]:
            ca[w] = ca.get(w, 0) + 1
            if seed[d]:
                cp[w] = cp.get(w, 0) + 1
    vocab = sorted(ca, key=lambda w: (-ca[w], w))[:max_vocab]
    V, vs = len(vocab), set(vocab)
    Tp = sum(len(toks[d]) for d in toks if seed[d])
    Ta = sum(len(toks[d]) for d in toks)
    vp = sum(cp.get(w, 0) for w in vocab)
    va = sum(ca[w] for w in vocab)
    np_, nd = sum(seed.values()), len(rows)

    def lw(c_pos, c_all):
        den = alpha * (V + 1)
        return (math.log((c_pos + alpha) / (Tp + den))
                - math.log(((c_all - c_pos) + alpha) / ((Ta - Tp) + den)))

    oov = lw(Tp - vp, Ta - va)
    prior = math.log((np_ + alpha) / ((nd - np_) + alpha))
    out = {}
    for d in toks:
        s = prior + sum(lw(cp.get(w, 0), ca[w]) if w in vs else oov
                        for w in toks[d])
        llr = math.floor(s * 1e6 + 0.5) / 1e6
        out[d] = (len(toks[d]), llr, int(llr > threshold))
    return out


@pytest.mark.parametrize("max_vocab", [2, 6, 50_000])
def test_nb_quality_matches_bruteforce(spark, max_vocab):
    from singer_spark.operators.text_analysis import nb_quality_scores

    rows = [
        (0, "good prose flows with careful structure and care", "hq"),
        (1, "good structure and careful prose with flows", "hq"),
        (2, "careful good prose structure flows", "hq"),
        (3, "buy now click here buy buy click spam", "web"),
        (4, "click spam buy now now now", "web"),
        (5, "good prose with careful structure", "web"),  # seed-like text
        (6, "zzz qqq xxx unseen junk tokens", "web"),
        (7, None, "web"),                                  # NULL text
        (8, "", "web"),                                    # empty text
    ]
    docs = _docs_df(spark, rows)
    got = {r["doc_id"]: (r["n_tokens"], r["llr"], r["keep"])
           for r in nb_quality_scores(docs, F.col("source") == "hq",
                                      max_vocab=max_vocab).collect()}
    want = _nb_reference(rows, {"hq"}, max_vocab=max_vocab)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], (d, got[d], want[d])
        assert got[d][1] == pytest.approx(want[d][1], abs=1.5e-6)
        assert got[d][2] == want[d][2]


def test_nb_quality_discriminates_and_handles_null(spark):
    from singer_spark.operators.text_analysis import nb_quality_scores

    rows = ([(i, "careful structured prose with citations and argument",
              "hq") for i in range(5)]
            + [(10 + i, "click buy spam now free winner claim prize",
                "web") for i in range(5)]
            + [(20, "careful structured prose with argument", "web"),
               (21, None, "web")])
    docs = _docs_df(spark, rows)
    out = {r["doc_id"]: r for r in
           nb_quality_scores(docs, F.col("source") == "hq").collect()}
    # seed-vocab doc from the WRONG source still scores seed-like
    assert out[20]["llr"] > 0 and out[20]["keep"] == 1
    for i in range(10, 15):
        assert out[10 + (i - 10)]["llr"] < 0
    # NULL text scores exactly the smoothed doc-count prior
    prior = math.log((5 + 0.5) / (7 + 0.5))
    assert out[21]["n_tokens"] == 0
    assert out[21]["llr"] == pytest.approx(
        math.floor(prior * 1e6 + 0.5) / 1e6, abs=1e-9)


# ---------------------------------------------------------------------------
# unigram-LM tokenizer — Viterbi vs exhaustive enumeration + plumbing
# ---------------------------------------------------------------------------
def _enumerate_best(word, vocab, max_word_len=16):
    """Exhaustive reference: try every boundary subset, score with the
    operator's integer costs, pick the minimum (cost, n_pieces,
    boundary-list) — the last key realizes 'longest final piece wins
    ties' because a SMALLER start index for the last piece sorts first
    when compared right-to-left... enumerated explicitly instead: among
    tied (cost, n), pick via the same backward-greedy rule the DP uses.
    To stay rule-exact we replay the DP semantics: compare candidate
    segmentations by (cost, n_pieces, reversed start positions of
    pieces from the END, ascending)."""
    from singer_spark.operators.text_analysis import (
        UNIGRAM_UNK, UNIGRAM_UNK_CHAR_COST, UNIGRAM_UNK_WORD_COST)
    n = len(word)
    if n == 0:
        return [], 0
    if n > max_word_len:
        return [UNIGRAM_UNK], UNIGRAM_UNK_WORD_COST
    best = None
    for mask in range(1 << (n - 1)):
        bounds = [0] + [i for i in range(1, n) if mask >> (i - 1) & 1] + [n]
        pieces = [word[bounds[k]:bounds[k + 1]]
                  for k in range(len(bounds) - 1)]
        cost = 0
        ok = True
        for p in pieces:
            c = vocab.get(p)
            if c is None:
                if len(p) != 1:
                    ok = False
                    break
                c = UNIGRAM_UNK_CHAR_COST
            cost += c
        if not ok:
            continue
        # tie key: starts of pieces from the END, ascending — at each
        # backward step the DP prefers the smallest start (longest piece)
        starts_from_end = bounds[-2::-1]
        key = (cost, len(pieces), starts_from_end)
        if best is None or key < best[0]:
            best = (key, pieces, cost)
    return best[1], best[2]


def test_unigram_viterbi_matches_exhaustive():
    import random

    from singer_spark.operators.text_analysis import unigram_reference

    rng = random.Random(42)
    alpha = "abcd"
    for trial in range(300):
        n = rng.randint(1, 9)
        word = "".join(rng.choice(alpha) for _ in range(n))
        vocab = {}
        # random vocab: every single char at random cost, random multis
        for ch in alpha[:3]:  # leave 'd' OOV sometimes
            vocab[ch] = rng.randint(1, 40) * 250_000
        for _ in range(rng.randint(0, 12)):
            ln = rng.randint(2, 4)
            i = rng.randint(0, max(0, n - ln))
            vocab[word[i:i + ln]] = rng.randint(1, 40) * 250_000
        got = unigram_reference(word, vocab)
        want = _enumerate_best(word, vocab)
        assert got == (want[0], want[1]), (word, vocab, got, want)


def test_unigram_unk_paths():
    from singer_spark.operators.text_analysis import (
        UNIGRAM_UNK, UNIGRAM_UNK_CHAR_COST, UNIGRAM_UNK_WORD_COST,
        unigram_reference)

    # word over the length cap -> single <unk>
    assert unigram_reference("x" * 17, {"x": 1}) == (
        [UNIGRAM_UNK], UNIGRAM_UNK_WORD_COST)
    # char absent from vocab -> per-char fallback cost
    pieces, cost = unigram_reference("zz", {"a": 5})
    assert pieces == ["z", "z"] and cost == 2 * UNIGRAM_UNK_CHAR_COST


def test_unigram_vocab_and_encode_end_to_end(spark):
    from singer_spark.operators.text_analysis import (unigram_encode,
                                                      unigram_vocab)

    rows = [(0, "banana banana band", "a"), (1, "ban and bananas", "a"),
            (2, None, "a"), (3, "", "a")]
    docs = _docs_df(spark, rows)
    vocab = unigram_vocab(docs, max_multi=10, max_piece_len=4)
    vd = dict(vocab)
    # coverage: every character that appears is a single-char piece
    for ch in set("bananabandbananasand"):
        assert ch in vd
    # the cap holds and frequent substrings cost less than rare ones
    assert sum(1 for p, _ in vocab if len(p) > 1) <= 10
    # more weight -> lower cost: 'an' (5 occurrences) vs 'and' (2)
    assert vd["an"] < vd["and"]
    out = {r["doc_id"]: r for r in
           unigram_encode(docs, vocab).collect()}
    assert out[0]["n_words"] == 3
    assert out[0]["n_pieces"] >= 3 and out[0]["total_cost"] > 0
    # pieces reassemble the exact text
    assert out[0]["pieces"].replace(" ", "") == "bananabananaband"
    assert out[2]["pieces"] is None and out[2]["n_words"] is None
    assert out[3]["n_words"] == 0 and out[3]["pieces"] == ""


def test_corpus_diversity_distinct_n_and_entropy(spark):
    from singer_spark.operators.text_analysis import corpus_diversity

    rows = [(0, "a a a a", "mono"),          # 1 distinct unigram
            (1, "a b c d", "poly"),          # all distinct
            (2, "xy", "tiny"),               # shorter than k=2,3
            (3, None, "tiny")]
    docs = _docs_df(spark, rows)
    out = {(r["source"], r["k"]): r
           for r in corpus_diversity(docs).collect()}
    assert out[("mono", 1)]["n_grams"] == 4
    assert out[("mono", 1)]["n_distinct"] == 1
    assert out[("mono", 1)]["entropy"] == 0.0
    assert out[("poly", 1)]["distinct_ratio"] == 1.0
    assert out[("poly", 1)]["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    # a 1-word source has no bigrams/trigrams at all
    assert ("tiny", 2) not in out and ("tiny", 3) not in out
    assert out[("mono", 2)]["n_grams"] == 3     # "a a" x3, 1 distinct
    assert out[("mono", 2)]["n_distinct"] == 1


# ---------------------------------------------------------------------------
# pack_bins — histogram-FFD bin packing vs the per-item reference
# ---------------------------------------------------------------------------
def test_ffd_histogram_solve_matches_per_item_reference():
    """The histogram solver's closed-form runs must reproduce per-item
    first-fit-decreasing EXACTLY — 200 random corpora incl. oversize
    items, duplicate-heavy lengths, and singleton tails."""
    import random

    from singer_spark.operators.packing import (ffd_histogram_solve,
                                                ffd_reference)

    rng = random.Random(7)
    for trial in range(200):
        max_len = rng.choice([16, 32, 100])
        n = rng.randint(1, 60)
        lengths = [(i, rng.choice(
            [rng.randint(1, max_len),
             rng.randint(1, 8),
             rng.randint(max_len // 2, max_len + 20)]))
            for i in range(n)]
        want = ffd_reference(lengths, max_len)
        runs, n_bins = ffd_histogram_solve(
            [(ln, sum(1 for _, x in lengths if x == ln))
             for ln in {x for _, x in lengths}], max_len)
        # expand runs into {id: bin} using the id-ascending rank rule
        by_len: dict = {}
        for did, ln in sorted(lengths):
            by_len.setdefault(ln, []).append(did)
        got = {}
        for (L, rank_start, bin_start, slots, n_ranks) in runs:
            ids = by_len[L]
            for r in range(rank_start, rank_start + n_ranks):
                got[ids[r]] = bin_start + (r - rank_start) // slots
        assert got == want, (max_len, lengths)
        assert n_bins == len(set(want.values()))


def test_pack_bins_spark_matches_reference_and_audit(spark):
    from singer_spark.operators.packing import (ffd_reference, pack_bins,
                                                pack_bins_audit)

    rows = [(i, " ".join(["t"] * ln), "s")
            for i, ln in enumerate([5, 9, 3, 3, 8, 1, 14, 2, 7, 7, 30])]
    rows.append((98, None, "s"))      # NULL text: excluded
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")
    out = {r["doc_id"]: r for r in pack_bins(docs, max_len=10).collect()}
    want = ffd_reference(
        [(i, ln) for i, ln in
         enumerate([5, 9, 3, 3, 8, 1, 14, 2, 7, 7, 30])], 10)
    assert {d: r["bin_id"] for d, r in out.items()} == want
    assert out[6]["oversize"] and out[10]["oversize"]
    assert 98 not in out
    audit = pack_bins_audit(docs, max_len=10).collect()[0]
    assert audit["n_docs"] == 11 and audit["n_oversize"] == 2
    assert audit["docs_conserved"] and audit["all_bins_fit"]
    assert audit["anyfit_bound_ok"]


def test_corpus_diversity_approx_bound_and_prod_arm(spark, sf_dir):
    from singer_spark.operators.text_analysis import (
        corpus_diversity, corpus_diversity_approx)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    audit = corpus_diversity_approx(docs).collect()
    assert audit and all(r["est_ok"] for r in audit)
    exact = {(r["source"], r["k"]): r["n_distinct"]
             for r in corpus_diversity(docs).collect()}
    prod = corpus_diversity_approx(docs, audit=False).collect()
    assert {(r["source"], r["k"]) for r in prod} == set(exact)
    for r in prod:  # production arm inside the same +-4 rsd envelope
        e = exact[(r["source"], r["k"])]
        assert abs(r["n_distinct_est"] - e) <= max(4 * 0.05 * e, 2)


def test_cluster_silhouette_separates_tight_from_noise(spark):
    from singer_spark.operators.similarity import cluster_silhouette

    emb = _clustered_emb(spark, n=400, n_clusters=8, dim=64)
    rows = cluster_silhouette(emb, n_clusters=8, iters=2).collect()
    assert rows and sum(r["n_vecs"] for r in rows) == 400
    # a genuinely clustered corpus scores clearly positive on average
    total = sum(r["mean_silhouette"] * r["n_vecs"] for r in rows) / 400
    assert total > 0.2, total
    with pytest.raises(ValueError):
        cluster_silhouette(emb, n_clusters=1)


def test_cluster_silhouette_noncontiguous_centroid_ids(spark):
    """Caller-supplied centroid tables may carry non-contiguous cluster
    ids ({0, 2, 5}): the reported cluster must be the actual id, not the
    argmax row index into the sorted matrix."""
    from singer_spark.operators.similarity import cluster_silhouette

    emb = _clustered_emb(spark, n=120, n_clusters=3, dim=16)
    from singer_spark.operators.similarity import ivf_train_centroids

    cents = ivf_train_centroids(emb, n_clusters=3, iters=1)
    dense = cluster_silhouette(emb, centroids=cents).collect()
    remapped = cents.selectExpr(
        "CASE cluster WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 5 END AS cluster",
        "centroid")
    sparse = cluster_silhouette(emb, centroids=remapped).collect()
    relabel = {0: 0, 1: 2, 2: 5}
    assert {(relabel[r["cluster"]], r["n_vecs"], r["mean_silhouette"])
            for r in dense} \
        == {(r["cluster"], r["n_vecs"], r["mean_silhouette"])
            for r in sparse}
    assert {r["cluster"] for r in sparse} <= {0, 2, 5}
    # ivf_build_assignments carries the same contract: reported cluster
    # ids are the table's actual ids, and the remap only relabels
    from singer_spark.operators.similarity import ivf_build_assignments

    a_dense = {r["vec_id"]: r["cluster"] for r in
               ivf_build_assignments(emb, centroids=cents).collect()}
    a_sparse = {r["vec_id"]: r["cluster"] for r in
                ivf_build_assignments(emb, centroids=remapped).collect()}
    assert {v: relabel[c] for v, c in a_dense.items()} == a_sparse


def test_blocklist_screen_empty_blocklist_keeps_everything(spark):
    from singer_spark.operators.text_analysis import blocklist_screen

    rows = [(0, "anything at all", "s"), (1, None, "s")]
    out = {r["doc_id"]: r
           for r in blocklist_screen(_docs_df(spark, rows), []).collect()}
    assert out[0]["n_blocked"] == 0 and out[0]["keep"] == 1
    assert out[0]["blocked_frac"] == 0.0
    assert out[1]["keep"] is None  # NULL text convention survives


def test_blocklist_screen_counts_and_null_paths(spark):
    from singer_spark.operators.text_analysis import blocklist_screen

    rows = [(0, "Bad word BAD again fine", "s"),
            (1, "all clean here", "s"),
            (2, "", "s"), (3, None, "s")]
    docs = _docs_df(spark, rows)
    out = {r["doc_id"]: r
           for r in blocklist_screen(docs, ["bad"]).collect()}
    assert out[0]["n_blocked"] == 2 and out[0]["keep"] == 0  # case-folded
    assert out[0]["blocked_frac"] == pytest.approx(2 / 5, abs=1e-6)
    assert out[1]["n_blocked"] == 0 and out[1]["keep"] == 1
    assert out[2]["n_tokens"] == 0 and out[2]["blocked_frac"] == 0.0
    assert out[2]["keep"] == 1
    assert out[3]["n_tokens"] is None and out[3]["keep"] is None


def test_unigram_em_converge_monotone_on_random_corpora(spark):
    """r11 (VERDICT r10 task #6): the per-round total corpus cost is
    monotone non-increasing on random corpora — the E-step is the exact
    argmin under current integer costs, the M-step's Laplace estimate
    minimizes the augmented objective, so cost can plateau but never
    climb.  Also pins the report shape: n_words constant, round ids
    contiguous from 0."""
    import random

    from singer_spark.operators.text_analysis import (unigram_em_converge,
                                                      unigram_vocab)

    rng = random.Random(411)
    alphabet = "abcdef"
    for trial in range(6):
        rows = []
        for d in range(12):
            words = ["".join(rng.choice(alphabet)
                             for _ in range(rng.randint(1, 9)))
                     for _ in range(rng.randint(3, 15))]
            rows.append((d, " ".join(words), "s"))
        docs = _docs_df(spark, rows)
        vocab = unigram_vocab(docs, max_multi=40, max_piece_len=4)
        rep = sorted(unigram_em_converge(docs, vocab, rounds=3).collect(),
                     key=lambda r: r["round"])
        assert [r["round"] for r in rep] == [0, 1, 2, 3]
        assert len({r["n_words"] for r in rep}) == 1  # same corpus
        costs = [r["total_cost"] for r in rep]
        for prev, cur in zip(costs, costs[1:]):
            assert cur <= prev, (trial, costs)
    with pytest.raises(ValueError):
        unigram_em_converge(docs, vocab, rounds=0)


def test_unigram_soft_reference_matches_lattice_enumeration():
    """r12 (VERDICT r11 task #2): the quantized forward-backward must
    reproduce the exact lattice sums — marginal NLL within the DP's
    accumulated half-micro-nat cell quantization, edge posteriors
    within a micro-count — against 2^(n-1) brute-force enumeration on
    random words/vocabs (the Viterbi exhaustive test's soft twin)."""
    import math
    import random

    from singer_spark.operators.text_analysis import (
        UNIGRAM_UNK_CHAR_COST,
        unigram_soft_reference,
    )

    rng = random.Random(77)
    alpha_chars = "abcd"
    for _trial in range(200):
        n = rng.randint(1, 8)
        word = "".join(rng.choice(alpha_chars) for _ in range(n))
        vocab = {}
        for ch in alpha_chars[:3]:
            vocab[ch] = rng.randint(1, 40) * 250_000
        for _ in range(rng.randint(0, 10)):
            ln = rng.randint(2, 4)
            i = rng.randint(0, max(0, n - ln))
            vocab[word[i:i + ln]] = rng.randint(1, 40) * 250_000
        L = max(len(p) for p in vocab)

        def cost(p):
            c = vocab.get(p)
            if c is None and len(p) == 1:
                c = UNIGRAM_UNK_CHAR_COST
            return c

        tot = 0.0
        exp_cnt: dict = {}
        for mask in range(1 << (n - 1)):
            cuts = [0] + [i + 1 for i in range(n - 1)
                          if mask >> i & 1] + [n]
            pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
            cs = [cost(p) for p in pieces if len(p) <= L]
            if len(cs) != len(pieces) or any(c is None for c in cs):
                continue
            prob = math.exp(-sum(cs) / 1e6)
            tot += prob
            for p in pieces:
                exp_cnt[p] = exp_cnt.get(p, 0.0) + prob
        nll, edges = unigram_soft_reference(word, vocab)
        # cell quantization: <= 0.5 micro-nat per DP cell, ~2n cells
        assert abs(nll - (-math.log(tot) * 1e6)) <= n + 2, (word, vocab)
        agg: dict = {}
        for p, q in edges:
            agg[p] = agg.get(p, 0) + q
        for p in set(agg) | set(exp_cnt):
            want = exp_cnt.get(p, 0.0) / tot
            assert abs(agg.get(p, 0) / 1e6 - want) <= (n + 2) / 1e6, \
                (word, vocab, p)


def test_unigram_soft_unk_and_converge_mode(spark):
    """Soft-EM corpus surface: over-length words take the pinned <unk>
    NLL with no expected counts; unigram_em_converge(mode='soft')
    reports a monotone non-increasing TRUE marginal NLL; and the
    trained soft model achieves corpus marginal likelihood >= the
    hard-EM model from the same seed (soft EM optimizes the marginal
    directly — the judge's pin) on random corpora."""
    import random

    from singer_spark.operators.text_analysis import (
        UNIGRAM_UNK_WORD_COST,
        unigram_em_converge,
        unigram_em_refine,
        unigram_em_soft,
        unigram_marginal_nll,
        unigram_soft_reference,
        unigram_vocab,
    )

    assert unigram_soft_reference("x" * 17, {"x": 1}) == (
        UNIGRAM_UNK_WORD_COST, [])

    rng = random.Random(1209)
    for _trial in range(3):
        rows = []
        for d in range(10):
            words = ["".join(rng.choice("abcde")
                             for _ in range(rng.randint(1, 8)))
                     for _ in range(rng.randint(3, 12))]
            rows.append((d, " ".join(words), "s"))
        docs = _docs_df(spark, rows)
        seed = unigram_vocab(docs, max_multi=30, max_piece_len=4)
        rep = sorted(unigram_em_converge(docs, seed, rounds=2,
                                         mode="soft").collect(),
                     key=lambda r: r["round"])
        assert [r["round"] for r in rep] == [0, 1, 2]
        assert len({r["n_words"] for r in rep}) == 1
        nlls = [r["total_nll"] for r in rep]
        for prev, cur in zip(nlls, nlls[1:]):
            # EM ascent up to integer-grid quantization slack
            assert cur <= prev + len(rows) * 4, (nlls,)
        # soft-trained model beats (or ties) hard-trained on the TRUE
        # marginal corpus likelihood, same seed, same rounds
        soft_v = hard_v = seed
        for _ in range(2):
            soft_v = unigram_em_soft(docs, soft_v)
            hard_v = unigram_em_refine(docs, hard_v)
        s_nll = unigram_marginal_nll(docs, soft_v)
        h_nll = unigram_marginal_nll(docs, hard_v)
        assert s_nll <= h_nll, (s_nll, h_nll)
    with pytest.raises(ValueError, match="mode"):
        unigram_em_converge(docs, seed, rounds=1, mode="fuzzy")


def test_unigram_prune_matches_bruteforce(spark):
    """r11: the pruning step — all singles survive, top
    ceil(keep_ratio·n_multi) multis by (usage desc, piece) survive,
    costs re-derive over the pruned set — against a pure-Python replay
    of the spec."""
    import math

    from singer_spark.operators.text_analysis import (unigram_prune,
                                                      unigram_reference,
                                                      unigram_vocab)

    rows = [(0, "banana banana band bananas", "a"),
            (1, "ban and bananas and band", "a"),
            (2, None, "a")]
    docs = _docs_df(spark, rows)
    vocab = unigram_vocab(docs, max_multi=12, max_piece_len=4)
    got = unigram_prune(docs, vocab, keep_ratio=0.5)

    wf: dict = {}
    for _, t, _s in rows:
        for w in (t or "").split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    vd = dict(vocab)
    counts: dict = {}
    for w, f in wf.items():
        if len(w) > 16:
            continue
        for p in unigram_reference(w, vd)[0]:
            if p in vd:
                counts[p] = counts.get(p, 0) + f
    singles = [p for p, _ in vocab if len(p) == 1]
    multis = [p for p, _ in vocab if len(p) > 1]
    k = math.ceil(0.5 * len(multis))
    kept = singles + sorted(multis, key=lambda p: (-counts.get(p, 0), p))[:k]
    V = len(kept)
    T = sum(counts.get(p, 0) for p in kept)
    want = sorted(
        (p, int(math.floor(-math.log((counts.get(p, 0) + 0.5)
                                     / (T + 0.5 * V)) * 1e6 + 0.5)))
        for p in kept)
    assert got == want
    assert set(singles) <= {p for p, _ in got}  # coverage preserved
    assert len([p for p, _ in got if len(p) > 1]) == k
    with pytest.raises(ValueError):
        unigram_prune(docs, vocab, keep_ratio=0.0)


def test_source_reweight_matches_bruteforce_and_bounds(spark):
    """r11 DoReMi-style reweighting: weights match a pure-Python replay
    of the spec (per-source mean LM loss -> quantized excess ->
    exp(eta*excess) over uniform prior -> uniform smoothing), the
    hardest source gets the largest weight, every weight respects the
    smoothing floor c/k, and weights sum to ~1."""
    import math

    from singer_spark.operators.text_analysis import (ngram_lm_score,
                                                      source_reweight)

    fluent = ("the cat sat on the mat and the dog sat on the mat and "
              "the cat sat on the mat again")
    rows = ([(i, fluent, "easy") for i in range(6)]
            + [(10 + i, " ".join(f"zx{i}q{j}" for j in range(12)), "hard")
               for i in range(6)]
            + [(30, None, "hard")])
    docs = _docs_df(spark, rows)
    out = {r.source: r for r in
           source_reweight(docs, eta=1.0, smoothing=0.2).collect()}

    lm = {r.doc_id: r.lm_score
          for r in ngram_lm_score(docs).collect() if r.lm_score is not None}
    src = {d: s for d, _t, s in rows}
    by = {}
    for d, v in lm.items():
        by.setdefault(src[d], []).append(v)

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    ref = q6(sum(lm.values()) / len(lm))
    means = {s: q6(sum(v) / len(v)) for s, v in by.items()}
    exc = {s: q6(max(m - ref, 0.0)) for s, m in means.items()}
    raw = {s: math.exp(exc[s]) for s in exc}
    Z, k = sum(raw.values()), len(raw)
    want = {s: q6(0.8 * raw[s] / Z + 0.2 / k) for s in raw}
    for s in want:
        assert out[s].weight == want[s], (s, out[s].weight, want[s])
        assert out[s].weight >= 0.2 / k - 1e-9  # smoothing floor
    assert out["hard"].weight > out["easy"].weight  # hard domain upweighted
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-5
    assert out["hard"].n_docs == 7 and out["hard"].n_scored == 6  # NULL doc


def test_source_reweight_converge_replay_and_simplex(spark):
    """r12 (VERDICT r11 task #4): the iterated DoReMi trajectory must
    equal a pure-Python replay of the spec (round r: salted-hash
    token-budget sample at round r-1's weights -> per-source excess
    over the sample -> multiplicative quantized EG update), and every
    round's weights must sit on the simplex (sum ~1, >= c/k floor)
    with the hardest domain monotonically upweighted."""
    import hashlib
    import math

    from singer_spark.operators.text_analysis import (
        ngram_lm_score,
        source_reweight_converge,
    )

    fluent = ("the cat sat on the mat and the dog sat on the mat and "
              "the cat sat on the mat again")
    rows = ([(i, fluent + f" tail{i}", "easy") for i in range(8)]
            + [(20 + i, " ".join(f"zx{i}q{j}" for j in range(14)), "hard")
               for i in range(8)]
            + [(50, None, "hard")])
    docs = _docs_df(spark, rows)
    eta, c, tf, rounds = 1.0, 0.2, 0.5, 3
    got = source_reweight_converge(docs, rounds=rounds, eta=eta,
                                   smoothing=c, token_frac=tf).collect()
    by_round: dict = {}
    for r in got:
        by_round.setdefault(r.round, {})[r.source] = r
    assert sorted(by_round) == [1, 2, 3]

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def md5i(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    lm = {r.doc_id: r.lm_score for r in ngram_lm_score(docs).collect()}
    src = {d: s for d, _t, s in rows}
    ntok = {d: len(t.split(" ")) for d, t, _s in rows if t is not None}
    sources = sorted({s for _d, _t, s in rows})
    k = len(sources)
    w = {s: q6(1.0 / k) for s in sources}
    for rnd in range(1, rounds + 1):
        total = sum(ntok.values())
        wsum = sum(w.values())
        sampled = []
        for s in sources:
            ds = sorted((d for d in ntok if src[d] == s),
                        key=lambda d: (md5i(f"doremi:{rnd}:{d}"), d))
            cum, allot = 0, tf * total * w[s] / wsum
            for d in ds:
                if cum < allot:
                    sampled.append(d)
                cum += ntok[d]
        scored = [d for d in sampled if lm[d] is not None]
        ref = q6(sum(lm[d] for d in scored) / len(scored))
        means = {}
        for s in sources:
            sc = [lm[d] for d in scored if src[d] == s]
            means[s] = q6(sum(sc) / len(sc)) if sc else None
        exc = {s: q6(max((means[s] if means[s] is not None else ref)
                         - ref, 0.0)) for s in sources}
        raw = {s: w[s] * math.exp(eta * exc[s]) for s in sources}
        Z = sum(raw.values())
        w_next = {s: q6((1 - c) * raw[s] / Z + c / k) for s in sources}
        for s in sources:
            r = by_round[rnd][s]
            assert r.weight_prev == w[s], (rnd, s)
            assert r.excess == exc[s], (rnd, s, r.excess, exc[s])
            assert r.weight == w_next[s], (rnd, s, r.weight, w_next[s])
            assert r.n_sampled == sum(1 for d in sampled if src[d] == s)
            assert r.weight >= c / k - 1e-9     # smoothing floor
        assert abs(sum(r.weight for r in by_round[rnd].values()) - 1.0) \
            < 1e-5                              # simplex
        w = w_next
    # the hard domain is upweighted and never loses ground to easy
    ws = [by_round[r]["hard"].weight for r in range(1, rounds + 1)]
    assert ws[0] > by_round[1]["easy"].weight
    assert all(b >= a - 1e-9 for a, b in zip(ws, ws[1:]))


def test_unigram_loss_reference_matches_banned_enumeration():
    """r13 (VERDICT r12 task #4): the per-piece loss kernel — for every
    multi-char candidate, NLL-without-piece minus NLL must match the
    brute-force lattice enumeration with that piece's segmentations
    excluded, on random words/vocabs; losses are non-negative up to
    cell quantization and a piece absent from the word never appears."""
    import math
    import random

    from singer_spark.operators.text_analysis import (
        UNIGRAM_UNK_CHAR_COST,
        unigram_loss_reference,
    )

    rng = random.Random(99)
    for _trial in range(150):
        n = rng.randint(2, 8)
        word = "".join(rng.choice("abcd") for _ in range(n))
        vocab = {}
        for ch in "abc":
            vocab[ch] = rng.randint(1, 40) * 250_000
        for _ in range(rng.randint(0, 8)):
            ln = rng.randint(2, 4)
            i = rng.randint(0, max(0, n - ln))
            vocab[word[i:i + ln]] = rng.randint(1, 40) * 250_000
        L = max(len(p) for p in vocab)

        def cost(p):
            c = vocab.get(p)
            if c is None and len(p) == 1:
                c = UNIGRAM_UNK_CHAR_COST
            return c

        def brute_nll(banned):
            tot = 0.0
            for mask in range(1 << (n - 1)):
                cuts = [0] + [i + 1 for i in range(n - 1)
                              if mask >> i & 1] + [n]
                pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
                if any(len(p) > L or cost(p) is None or p == banned
                       for p in pieces):
                    continue
                tot += math.exp(-sum(cost(p) for p in pieces) / 1e6)
            return -math.log(tot) * 1e6

        out = unigram_loss_reference(word, vocab)
        cands = {word[i:j] for i in range(n)
                 for j in range(i + 2, min(i + L, n) + 1)
                 if word[i:j] in vocab}
        assert {p for p, _ in out} == cands
        base = brute_nll(None)
        for p, lo in out:
            assert lo >= -(2 * n + 4), (word, vocab, p, lo)
            want = brute_nll(p) - base
            assert abs(lo - want) <= 2 * (n + 2), (word, vocab, p)
    # over-long / empty words: no lattice, no candidates
    assert unigram_loss_reference("x" * 17, {"x": 1, "xx": 1}) == []
    assert unigram_loss_reference("", {"x": 1}) == []


def test_unigram_prune_loss_rank_beats_usage_rank(spark):
    """r13: the loss-ranked prune keeps the piece whose removal is
    EXPENSIVE even though the Viterbi rarely uses it, and drops the
    frequently-used piece with a near-free alternative — the exact case
    the usage approximation gets wrong — and at equal vocab size, after
    the EM step that follows every prune in the Kudo §3.2 alternation
    (re-segmenting under the survivors — without it the kept pieces
    inherit stale zero counts from the pre-prune segmentation), the
    loss-pruned model's corpus marginal NLL is strictly better."""
    from singer_spark.operators.text_analysis import (
        unigram_em_refine,
        unigram_marginal_nll,
        unigram_prune,
    )

    # "ab" x10: near-tie alternative a+b (removal loss ~ln2 per word,
    # top usage).  "xyz" x8: singles are 12x pricier (removal loss ~34
    # nats per word, second-place usage).  Usage keeps ab; loss keeps
    # xyz.
    rows = [(i, "ab", "s") for i in range(10)] + \
           [(100 + i, "xyz", "s") for i in range(8)]
    docs = _docs_df(spark, rows)
    vocab = [("a", 500_100), ("b", 500_100), ("x", 12_000_000),
             ("y", 12_000_000), ("z", 12_000_000),
             ("ab", 1_000_000), ("xyz", 2_000_000)]

    by_usage = unigram_prune(docs, vocab, keep_ratio=0.5, rank="usage")
    by_loss = unigram_prune(docs, vocab, keep_ratio=0.5, rank="loss")
    assert {p for p, _ in by_usage if len(p) > 1} == {"ab"}
    assert {p for p, _ in by_loss if len(p) > 1} == {"xyz"}
    nll_loss = unigram_marginal_nll(
        docs, unigram_em_refine(docs, by_loss))
    nll_usage = unigram_marginal_nll(
        docs, unigram_em_refine(docs, by_usage))
    assert nll_loss < nll_usage, (nll_loss, nll_usage)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="rank"):
        unigram_prune(docs, vocab, keep_ratio=0.5, rank="entropy")


def test_unigram_train_to_size_lands_exactly(spark):
    """r13: the shrink-to-target outer loop — each cycle keeps
    max(target, ceil(shrink*n)) multis so the final shrink lands
    EXACTLY on target (never overshoots past it), extra rounds keep the
    size (idempotent once reached), singles always survive, and the
    loop IS refine+prune(keep_multi) composed by hand (structural
    identity — the unigram_train discipline)."""
    import math
    import random

    from singer_spark.operators.text_analysis import (
        unigram_em_refine,
        unigram_prune,
        unigram_train_to_size,
        unigram_vocab,
    )

    rng = random.Random(4242)
    rows = []
    for d in range(12):
        words = ["".join(rng.choice("abcde")
                         for _ in range(rng.randint(2, 8)))
                 for _ in range(rng.randint(5, 15))]
        rows.append((d, " ".join(words), "s"))
    docs = _docs_df(spark, rows)

    got = unigram_train_to_size(docs, target_multi=10, shrink=0.6,
                                rounds=3, max_multi=40, max_piece_len=4)
    n_multi = sum(1 for p, _ in got if len(p) > 1)
    assert n_multi == 10
    singles_seed = {p for p, _ in unigram_vocab(
        docs, max_multi=40, max_piece_len=4) if len(p) == 1}
    assert {p for p, _ in got if len(p) == 1} == singles_seed

    # structural identity: the loop is refine -> prune(keep_multi) x3
    vocab = unigram_vocab(docs, max_multi=40, max_piece_len=4)
    for _ in range(3):
        vocab = unigram_em_refine(docs, vocab)
        n = sum(1 for p, _ in vocab if len(p) > 1)
        keep = max(10, math.ceil(0.6 * n))
        vocab = unigram_prune(docs, vocab, keep_multi=min(keep, n))
    assert vocab == got

    # idempotent once at target: an extra round keeps the SIZE
    more = unigram_train_to_size(docs, target_multi=10, shrink=0.6,
                                 rounds=4, max_multi=40, max_piece_len=4)
    assert sum(1 for p, _ in more if len(p) > 1) == 10
    # loss-ranked shrinks run end to end too
    lossy = unigram_train_to_size(docs, target_multi=10, shrink=0.6,
                                  rounds=3, max_multi=40,
                                  max_piece_len=4, prune_rank="loss")
    assert sum(1 for p, _ in lossy if len(p) > 1) == 10

    import pytest as _pytest

    with _pytest.raises(ValueError, match="shrink"):
        unigram_train_to_size(docs, target_multi=10, shrink=1.5)


def test_unigram_train_is_the_pinned_composition(spark):
    """r11: unigram_train must BE seed -> em_rounds x refine -> prune —
    a structural identity pin so the convenience trainer can never
    drift from the oracle-checked stages it composes."""
    from singer_spark.operators.text_analysis import (unigram_em_refine,
                                                      unigram_prune,
                                                      unigram_train,
                                                      unigram_vocab)

    rows = [(0, "banana banana band bananas", "a"),
            (1, "ban and bananas and band", "a")]
    docs = _docs_df(spark, rows)
    got = unigram_train(docs, max_multi=12, max_piece_len=4,
                        em_rounds=2, keep_ratio=0.5)
    v = unigram_vocab(docs, max_multi=12, max_piece_len=4)
    v = unigram_em_refine(docs, v)
    v = unigram_em_refine(docs, v)
    want = unigram_prune(docs, v, keep_ratio=0.5)
    assert got == want
    # coverage: every single char of the corpus is in the trained vocab
    chars = {c for _, t, _s in rows for c in t.replace(" ", "")}
    assert chars <= {p for p, _ in got if len(p) == 1}

    # r12: the soft trainer is the same pinned composition with the
    # soft E-step swapped in (prune stays usage-ranked — the shrink
    # rule is mode-independent)
    from singer_spark.operators.text_analysis import unigram_em_soft

    got_soft = unigram_train(docs, max_multi=12, max_piece_len=4,
                             em_rounds=1, keep_ratio=0.5, em_mode="soft")
    vs = unigram_vocab(docs, max_multi=12, max_piece_len=4)
    vs = unigram_em_soft(docs, vs)
    want_soft = unigram_prune(docs, vs, keep_ratio=0.5)
    assert got_soft == want_soft
    with pytest.raises(ValueError, match="mode"):
        unigram_train(docs, em_mode="fuzzy")


def test_vocab_save_load_roundtrip_segments_identically(spark, tmp_path):
    """r11: the trained vocabulary persists and reloads EXACTLY (integer
    costs round-trip parquet), so encoding under the reloaded table is
    bit-identical to encoding under the in-memory one."""
    from singer_spark.operators.text_analysis import (load_vocab,
                                                      save_vocab,
                                                      unigram_encode,
                                                      unigram_train)

    rows = [(0, "banana banana band bananas", "a"),
            (1, "ban and bananas and band", "a")]
    docs = _docs_df(spark, rows)
    trained = unigram_train(docs, max_multi=12, max_piece_len=4,
                            em_rounds=1, keep_ratio=0.5)
    save_vocab(spark, trained, str(tmp_path / "vocab"))
    reloaded = load_vocab(spark, str(tmp_path / "vocab"))
    assert reloaded == sorted(trained)
    want = {(r.doc_id, r.n_pieces, r.total_cost)
            for r in unigram_encode(docs, trained).collect()}
    got = {(r.doc_id, r.n_pieces, r.total_cost)
           for r in unigram_encode(docs, reloaded).collect()}
    assert got == want


def test_unigram_em_refine_matches_bruteforce(spark):
    from singer_spark.operators.text_analysis import (unigram_em_refine,
                                                      unigram_reference,
                                                      unigram_vocab)

    rows = [(0, "banana banana band bananas", "a"),
            (1, "ban and bananas and band", "a"),
            (2, None, "a")]
    docs = _docs_df(spark, rows)
    vocab = unigram_vocab(docs, max_multi=12, max_piece_len=4)
    got = dict(unigram_em_refine(docs, vocab))

    # brute-force replay of the spec
    wf: dict = {}
    for _, t, _s in rows:
        for w in (t or "").split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    vd = dict(vocab)
    counts: dict = {}
    for w, f in wf.items():
        if len(w) > 16:
            continue
        for p in unigram_reference(w, vd)[0]:
            if p in vd:
                counts[p] = counts.get(p, 0) + f
    T, V = sum(counts.values()), len(vocab)
    want = {p: math.floor(-math.log((counts.get(p, 0) + 0.5)
                                    / (T + 0.5 * V)) * 1e6 + 0.5)
            for p, _ in vocab}
    assert got == want
    # self-consistency: a piece the Viterbi actually uses ends up
    # cheaper than one it never picks
    used = [p for p in got if counts.get(p, 0) > 0]
    unused = [p for p in got if counts.get(p, 0) == 0]
    if used and unused:
        assert max(got[p] for p in used) < min(got[p] for p in unused)


def test_nb_model_lifecycle_matches_fused_path(spark, tmp_path):
    """train -> save -> load -> apply is float-identical to the fused
    nb_quality_scores plan (same arithmetic, parquet-exact doubles)."""
    from singer_spark.operators.text_analysis import (
        load_nb_model, nb_quality_apply, nb_quality_model,
        nb_quality_scores, save_nb_model)

    rows = [
        (0, "good prose flows with careful structure and care", "hq"),
        (1, "good structure and careful prose with flows", "hq"),
        (2, "buy now click here buy buy click spam", "web"),
        (3, "click spam buy now now now", "web"),
        (4, "good prose with careful structure", "web"),
        (5, None, "web"), (6, "", "web"),
    ]
    docs = _docs_df(spark, rows)
    seed = F.col("source") == "hq"
    fused = {r["doc_id"]: r for r in
             nb_quality_scores(docs, seed, max_vocab=6).collect()}
    model = nb_quality_model(docs, seed, max_vocab=6)
    path = str(tmp_path / "nbmodel")
    save_nb_model(model, path)
    loaded = load_nb_model(spark, path)
    applied = {r["doc_id"]: r for r in
               nb_quality_apply(docs, loaded).collect()}
    assert set(applied) == set(fused)
    for d in fused:
        assert applied[d]["n_tokens"] == fused[d]["n_tokens"]
        assert applied[d]["llr"] == fused[d]["llr"], d
        assert applied[d]["keep"] == fused[d]["keep"]
