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
