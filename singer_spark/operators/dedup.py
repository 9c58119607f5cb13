"""Deduplication operators for large-scale text corpora.

Designed for the 100 TB regime:

- exact dedup        one hash-shuffle on a 16-byte digest (not the full text)
- n-gram Jaccard     set-similarity join blocked on shared shingles —
                     candidate generation is |pairs sharing a shingle|,
                     not O(n²); shingle width tunes selectivity
- MinHash + LSH      constant-size signatures (k hashes) per doc, banded
                     into buckets; the only wide shuffle is on band keys
- SimHash            one 48-bit signature per doc; candidates via banded
                     12-bit chunks; verify = popcount(xor) — cheap
- embedding near-dup cosine > threshold via the similarity module

Every hash is the cross-engine-reproducible md5-based 60-bit hash
(singer_spark.functions.md5_int) so results verify bit-for-bit against an
ANSI-SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from singer_spark.functions import fan_out, md5_int, qround


def tokens_col(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def shingles_col(text_col: str = "text", k: int = 4):
    """Distinct k-word shingles. slice() is 1-based; a doc shorter than k
    words yields its full text as the single shingle."""
    toks = tokens_col(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )


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
def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 4, threshold: float = 0.8) -> DataFrame:
    """All pairs with Jaccard(shingle sets) >= threshold.

    Candidate generation joins on the shingle itself (classic blocking): a
    pair is compared once per shared shingle and reduced by groupBy, so cost
    scales with true overlap, not n².  Wider k → fewer, more selective
    blocks.  Output: (id_a, id_b, jaccard)."""
    sh = fan_out(docs).select(F.col(id_col).alias("id"),
                              F.explode(shingles_col(text_col, k)).alias("s"))
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        shared.join(na, "id_a").join(nb, "id_b")
        .withColumn("jaccard", qround(jac, 4))
        .filter(jac >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


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
                       k: int = 4, num_hashes: int = 8) -> DataFrame:
    """k-shingle → `num_hashes` min-hash values per doc.  One explode + one
    groupBy with map-side partial mins; signature size is constant per doc,
    so downstream state is O(n·num_hashes) regardless of document size."""
    if num_hashes > len(MINHASH_A):
        raise ValueError(f"at most {len(MINHASH_A)} hash functions supported")
    sh = fan_out(docs).select(F.col(id_col).alias("id"),
                              F.explode(shingles_col(text_col, k)).alias("s"))
    base = (md5_int(F.col("s")) % MINHASH_P).alias("h")
    hashed = sh.select("id", base)
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i])) % MINHASH_P).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 4, num_hashes: int = 8, bands: int = 4,
                      threshold: float = 0.6) -> DataFrame:
    """LSH-banded candidate generation + exact Jaccard verification.

    `num_hashes` minhashes split into `bands` bands (rows = num_hashes/bands);
    docs sharing any band bucket become candidates (probability
    1-(1-j^rows)^bands — the S-curve).  Only candidates pay the verification
    join.  Output: (id_a, id_b, jaccard >= threshold)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, k, num_hashes)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws("_", *[F.col(f"h{bi * rows_per_band + r}") for r in range(rows_per_band)]).alias("key"),
        )
        for bi in range(bands)
    ]
    buckets = sigs.select("id", F.explode(F.array(*band_cols)).alias("b")) \
                  .select("id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    l, r = buckets.alias("l"), buckets.alias("r")
    candidates = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.key") == F.col("r.key"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    # exact verification restricted to candidates
    sh = fan_out(docs).select(F.col(id_col).alias("id"),
                              F.explode(shingles_col(text_col, k)).alias("s"))
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        candidates.join(a, F.col("a.id") == F.col("id_a"))
        .join(b, (F.col("b.id") == F.col("id_b")) & (F.col("a.s") == F.col("b.s")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        shared.join(na, "id_a").join(nb, "id_b")
        .withColumn("jaccard", qround(jac, 4))
        .filter(jac >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_col(text_col: str = "text", bits: int = 48):
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
                       bits: int = 48) -> DataFrame:
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
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = set(t.split(" "))
            hs = np.fromiter(
                (int(hashlib.md5(x.encode("utf-8")).hexdigest()[:15], 16) & ((1 << 60) - 1)
                 for x in toks), dtype=np.int64, count=len(toks))
            hs %= (mask + 1)
            ones = ((hs[:, None] >> jbits) & 1).sum(axis=0)
            out[i] = int((((2 * ones > len(hs)).astype(np.int64)) << jbits).sum())
        return pd.Series(out)

    return fan_out(docs).select(F.col(id_col).alias("id"),
                                sig_udf(F.col(text_col)).alias("sig"))


def simhash_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, bits: int = 48) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidates via the pigeonhole trick: split the signature into 4 chunks;
    any pair within hamming 3 must agree on >= 1 chunk, so join on
    (chunk_idx, chunk_value) — a bounded-fanout equi-join, no n²."""
    sigs = simhash_signatures(docs, text_col, id_col, bits)
    chunk_bits = bits // 4
    mask = (1 << chunk_bits) - 1
    chunks = sigs.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     F.shiftright("sig", c * chunk_bits).bitwiseAND(F.lit(mask)).alias("v"))
            for c in range(4)
        ])).alias("ch"),
    ).select("id", "sig", F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))
    l, r = chunks.alias("l"), chunks.alias("r")
    ham = F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig")))
    return (
        l.join(r, (F.col("l.c") == F.col("r.c")) & (F.col("l.v") == F.col("r.v"))
               & (F.col("l.id") < F.col("r.id")))
        .filter(ham <= max_hamming)
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                ham.alias("hamming"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Cluster assignment (pairs → canonical doc)
# ---------------------------------------------------------------------------
def dedup_clusters(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   max_iters: int = 50) -> DataFrame:
    """Connected components over near-dup pairs: every doc gets the minimum
    doc id of its component as `cluster` (the canonical survivor), singletons
    map to themselves.

    Iterative min-label propagation: each round, a node takes the min of its
    own label and its neighbors' labels; converges in O(component diameter)
    rounds (tiny for dedup graphs, which are dense cliques of copies).
    Per round: one equi-join + groupBy-min — all shuffles on ids only.
    `localCheckpoint` truncates the growing lineage so plans stay constant
    size at any iteration count."""
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).union(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
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
