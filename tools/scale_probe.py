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

Usage: python tools/scale_probe.py [sf_dir] [max_k] [scan|pairs|markov]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


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

    return (spark.range(n_docs).repartition(32)
            .mapInPandas(gen, "doc_id bigint, text string"))


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
    }


def _spans(docs: DataFrame) -> DataFrame:
    from singer_spark.operators.text_analysis import decontaminate_spans

    return decontaminate_spans(docs, docs.filter(F.col("doc_id") % 50 == 0))


def _hh(docs: DataFrame) -> DataFrame:
    from singer_spark.operators.diagnostics import heavy_hitters

    toks = (docs.select(F.explode(F.split("text", r"\s+")).alias("token"))
            .where(F.col("token") != ""))
    return heavy_hitters(toks, "token", min_share=0.02)


def main(sf_dir: str = "/root/testdata/sf0.1", max_k: int = 4,
         mode: str = "scan") -> None:
    from singer_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as _pd  # noqa: F401

    spark.range(64).repartition(32).mapInPandas(
        lambda it: (p for p in it), "id bigint").count()

    # ×4 steps: at sf0.1 the corpus is ~1.5 MB of text, and below ~10 MB
    # fixed per-job overhead (scheduling, Arrow worker fan-out) swamps the
    # data-dependent cost — the curve only shows at 16×-64×
    ks = [1]
    while ks[-1] * 4 <= max_k:
        ks.append(ks[-1] * 4)
    if mode == "markov":
        make_docs = lambda sp, _sf, k: markov_docs(sp, 5000 * k)  # noqa: E731
        make_ops = pair_ops
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
        for name, build in make_ops(docs).items():
            ts = []
            for _ in range(3):
                t0 = time.time()
                build().write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            if make_ops is pair_ops:
                pairs.setdefault(name, {})[k] = build().count()
            results.setdefault(name, {})[k] = statistics.median(ts)
        docs.unpersist()
        spark.catalog.clearCache()
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
    args = sys.argv[1:4]
    main(*(int(a) if i == 1 else a for i, a in enumerate(args)))
