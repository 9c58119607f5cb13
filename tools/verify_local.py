"""Local stand-in for the driver's correctness gate.

Runs every `queries()[name]` on Spark and the matching `oracle_sql()[name]`
on DuckDB over the same sf directory, then compares:

- row count
- sorted column names
- exact cell values (order-insensitive: both sides sorted by all columns)

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
       python tools/verify_local.py --second-oracle [sf_dir]   # byte-exact
       UDF-side cross-checks of the self-verifying hash/zlib/wordpiece
       values (opt-in; the driver gate pins them via booleans only)
       python tools/verify_local.py --json OUT.json [sf_dir]   # write a
       CORRECTNESS-shaped JSON covering EVERY queries() key (the driver's
       own file caps at 50 entries; this records the full surface)
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


# ---------------------------------------------------------------------------
# DuckDB Python UDFs for the OPT-IN byte-exact second oracle
# (`--second-oracle`, SECOND_ORACLES below).  The main gate no longer
# uses them — every query is self-verifying with a plain-SQL driver
# oracle (crc32/murmur via in-query agreement booleans since early r7;
# wordpiece/zlib since late r7) — but the main gate's accuracy booleans
# are computed by the engine under test itself (ADVICE r7 #1), so the
# flag re-derives the raw hashes/sizes/piece strings UDF-side and
# compares them cell-for-cell.  `spark_murmur3` here is a DELIBERATE
# second copy of singer_spark.functions.spark_murmur3_py: the
# oracle-side implementation stays independent of the package under
# test.
# ---------------------------------------------------------------------------
def _rotl32(x: int, r: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def spark_murmur3(data: bytes, seed: int = 42) -> int:
    """Murmur3_x86_32 exactly as Spark's `hash()` computes it for strings
    (UTF-8 bytes, seed 42): little-endian 4-byte words, then each TRAILING
    byte mixed individually as a signed int — Spark's hashUnsafeBytes tail
    handling, which differs from the canonical murmur3 tail.  Validated
    cell-for-cell against `F.hash` (test_transforms.py)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & 0xFFFFFFFF
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        k1 = int.from_bytes(data[i:i + 4], "little")
        k1 = _rotl32((k1 * c1) & 0xFFFFFFFF, 15)
        h1 ^= (k1 * c2) & 0xFFFFFFFF
        h1 = (_rotl32(h1, 13) * 5 + 0xE6546B64) & 0xFFFFFFFF
    for i in range(aligned, n):
        b = data[i] - 256 if data[i] >= 128 else data[i]
        k1 = _rotl32((b * c1) & 0xFFFFFFFF, 15)
        h1 ^= (k1 * c2) & 0xFFFFFFFF
        h1 = (_rotl32(h1, 13) * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    h1 &= 0xFFFFFFFF
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _register_udfs(con) -> None:
    import zlib

    from singer_spark.operators.text_analysis import (
        WORDPIECE_DEMO_WORDS,
        demo_vocab,
        wordpiece_reference,
    )

    con.create_function("crc32_py", lambda s: zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF,
                        ["VARCHAR"], "BIGINT")
    con.create_function("murmur3_spark", lambda s: spark_murmur3(s.encode("utf-8")),
                        ["VARCHAR"], "INTEGER")

    # WordPiece reference: the shrinking-window form of the public greedy
    # algorithm — an implementation INDEPENDENT of the Spark operator's
    # trie walk; only the vocabulary constant is shared.
    wp_vocab = demo_vocab(WORDPIECE_DEMO_WORDS)

    def wp_encode(text: str) -> str:
        return " ".join(p for w in text.split()
                        for p in wordpiece_reference(w, wp_vocab))

    con.create_function("wp_encode", wp_encode, ["VARCHAR"], "VARCHAR")
    con.create_function("wp_count",
                        lambda s: len(wp_encode(s).split()),
                        ["VARCHAR"], "INTEGER")
    con.create_function("zlib_size",
                        lambda s: len(zlib.compress(s.encode("utf-8"), 6)),
                        ["VARCHAR"], "BIGINT")


# Tolerance-checked oracles for approximate operators: exact SQL answer on
# DuckDB, Spark result accepted within rel_tol per cell (HLL++ at rsd=0.02
# is within ±6% with overwhelming probability; 10% leaves slack without
# hiding a broken sketch).  Recorded as hash_match=True rows with the
# tolerance noted, never as exact matches.
APPROX_ORACLES = {
    # EMPTY since round 7: every sketch/UDF-only query is now
    # SELF-VERIFYING (exact answer + guarantee booleans computed
    # in-Spark) with a plain-SQL oracle in `oracle_sql()`, so the DRIVER
    # value-checks all of them (VERDICT r6 #1).  approx_distinct_users /
    # approx_percentiles_value converted early-r7; audience_overlap_kmv,
    # join_size_estimate, rolling_active_users_hll followed.  The table
    # and its tolerance comparator stay for future genuinely randomized
    # operators (none today — every current sketch is seed-fixed).
}

# Oracles runnable only where Python UDFs can be registered (here).
# EMPTY since round 7: t8_crc32 / p2 / p3 embed the independent
# cross-implementation (JVM hash vs Arrow-side Python) and emit agreement
# booleans; wordpiece_tokenize runs its trie walk against the independent
# shrinking-window reference in-query; text_compression_ratio certifies
# its zlib sizes via in-query round-trip + the RFC 1950/51 bound.  The
# byte-exact zlib / piece-string equalities those rows used to pin are
# covered by the operator tests (tests/test_training_ops.py).
LOCAL_ORACLES = {}


def run_second_oracles(sf_dir: str) -> int:
    """`--second-oracle`: byte-exact UDF-side cross-checks of the values
    the self-verifying queries only pin via agreement booleans.  Each
    check computes the raw hash/size/piece string on Spark AND via the
    independent DuckDB Python UDF and compares cell-for-cell — the
    belt-and-braces pass the driver's UDF-less DuckDB cannot run.
    Returns the number of failed checks."""
    from pyspark.sql import functions as F

    import __spark_entry__  # noqa: F401 (sys.path side effects only)
    from singer_spark.session import get_spark

    spark = get_spark("verify_second_oracle")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def wp_spark():
        from singer_spark.operators.text_analysis import (
            WORDPIECE_DEMO_WORDS,
            demo_vocab,
            wordpiece_encode,
        )

        return wordpiece_encode(docs, demo_vocab(WORDPIECE_DEMO_WORDS)) \
            .select("doc_id", "pieces")

    def zlib_spark():
        from singer_spark.operators.text_analysis import compression_ratio

        return compression_ratio(docs).select(
            "doc_id", F.col("compressed_bytes").alias("z"))

    checks = {
        "crc32_bytes": (
            lambda: docs.select(
                "doc_id",
                F.crc32(F.encode("text", "utf-8")).alias("h")),
            "SELECT doc_id, crc32_py(text) AS h FROM documents"),
        "murmur3_spark_hash": (
            lambda: docs.select("doc_id", F.hash("text").alias("h")),
            "SELECT doc_id, murmur3_spark(text) AS h FROM documents"),
        "wordpiece_pieces": (
            wp_spark,
            "SELECT doc_id, wp_encode(text) AS pieces FROM documents"),
        "zlib_compressed_size": (
            zlib_spark,
            "SELECT doc_id, zlib_size(text) AS z FROM documents"),
    }
    n_fail = 0
    for name, (build, sql) in checks.items():
        t0 = time.time()
        problems = compare(name, build().toPandas(), duck_run(sql, sf_dir))
        sec = time.time() - t0
        if problems:
            n_fail += 1
            print(f"FAIL  second-oracle {name}: {problems[:3]}")
        else:
            print(f"OK    second-oracle {name} (byte-exact) [{sec:.1f}s]")
    return n_fail


def duck_run(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    _register_udfs(con)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.sql(sql).df()


def normalize(df, float_round=9):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf, odf) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        return [f"rowcount spark={len(sdf)} oracle={len(odf)}"]
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c].values, o[c].values
        for i in range(len(sv)):
            a, b = sv[i], ov[i]
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if fa != fb and not (math.isnan(fa) and math.isnan(fb)):
                    problems.append(f"col {c} row {i}: spark={a!r} oracle={b!r} (float diff {abs(fa-fb):.3e})")
                    if len(problems) > 4:
                        return problems
            elif str(a) != str(b):
                problems.append(f"col {c} row {i}: spark={a!r} oracle={b!r}")
                if len(problems) > 4:
                    return problems
    return problems


def compare_approx(sdf, odf, rel_tol: float) -> list[str]:
    """Key columns (strings) must match exactly; numeric columns within
    rel_tol of the oracle's exact value.  Rows align on the key columns."""
    problems = []
    if len(sdf) != len(odf):
        return [f"rowcount spark={len(sdf)} oracle={len(odf)}"]
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    keys = sorted(c for c in sdf.columns if sdf[c].dtype == object)
    s = sdf.sort_values(keys).reset_index(drop=True)
    o = odf.sort_values(keys).reset_index(drop=True)
    for c in sorted(sdf.columns):
        for i in range(len(s)):
            a, b = s[c].iloc[i], o[c].iloc[i]
            if c in keys:
                if str(a) != str(b):
                    problems.append(f"key {c} row {i}: {a!r} != {b!r}")
            elif abs(float(a) - float(b)) > rel_tol * max(1.0, abs(float(b))):
                problems.append(
                    f"col {c} row {i}: spark={a} oracle={b} beyond ±{rel_tol:.0%}")
            if len(problems) > 4:
                return problems
    return problems


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--second-oracle":
        sf = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
        n_fail = run_second_oracles(sf)
        print(f"\n{n_fail} second-oracle checks failed")
        return 1 if n_fail else 0
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    import __spark_entry__ as entry_mod
    from singer_spark.session import get_spark

    spark = get_spark("verify_local")
    qs = entry_mod.queries()
    oracles = {**entry_mod.oracle_sql(), **LOCAL_ORACLES}
    failed, no_oracle = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            results[name] = {"rows_match": False, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None, "err": f"spark: {str(e)[:200]}"}
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name in APPROX_ORACLES:
            sql, rel_tol = APPROX_ORACLES[name]
            try:
                odf = duck_run(sql, sf_dir)
            except Exception as e:
                failed.append(name)
                results[name] = {"rows_match": None, "schema_match": None,
                                 "hash_match": None, "spark_rows": len(sdf),
                                 "oracle_rows": None, "err": f"oracle: {str(e)[:200]}"}
                print(f"FAIL  {name}: oracle error: {str(e)[:300]}")
                continue
            problems = compare_approx(sdf, odf, rel_tol)
            ok = not problems
            results[name] = {"rows_match": len(sdf) == len(odf),
                             "schema_match": sorted(sdf.columns) == sorted(odf.columns),
                             "hash_match": ok, "spark_rows": len(sdf),
                             "oracle_rows": len(odf),
                             "err": None if ok else "; ".join(problems[:3]),
                             "approx_rel_tol": rel_tol}
            if problems:
                failed.append(name)
                print(f"FAIL  {name}: " + "; ".join(problems[:5]))
            else:
                print(f"OK~   {name}: {len(sdf)} rows within ±{rel_tol:.0%} "
                      f"[{time.time()-t0:.1f}s]")
            continue
        if name not in oracles:
            no_oracle.append(name)
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(sdf),
                             "oracle_rows": None, "err": "no_oracle"}
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = duck_run(oracles[name], sf_dir)
        except Exception as e:
            failed.append(name)
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(sdf),
                             "oracle_rows": None, "err": f"oracle: {str(e)[:200]}"}
            print(f"FAIL  {name}: oracle error: {str(e)[:300]}")
            continue
        problems = compare(name, sdf, odf)
        ok = not problems
        results[name] = {"rows_match": len(sdf) == len(odf),
                         "schema_match": sorted(sdf.columns) == sorted(odf.columns),
                         "hash_match": ok, "spark_rows": len(sdf),
                         "oracle_rows": len(odf),
                         "err": None if ok else "; ".join(problems[:3])}
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems[:5]))
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failed)} failed, {len(no_oracle)} rows-only, "
          f"{len([k for k in qs if not only or k in only]) - len(failed) - len(no_oracle)} value-matched")
    if failed:
        print("failed:", ", ".join(failed))
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_out} ({len(results)} entries)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
