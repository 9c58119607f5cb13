"""Distribution diagnostics for join/agg keys.

The pre-flight check of the skew workflow: every big join or aggregation
shuffles on its keys, and ONE hot key serializes its whole sort-group onto
one task no matter how many executors exist (AQE splits oversized
partitions, but cannot split a single key's group).  The report below is
what decides between a plain join, `operators.joins.salted_join`, or a
broadcast — measured, not guessed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from singer_spark.functions import qround


def key_skew_report(df: DataFrame, key_cols: list[str] | str,
                    top_n: int = 20) -> DataFrame:
    """Top-N keys by row count with their share of the table and their
    ratio to the mean per-key count — the two numbers that size a salting
    decision (a key at ratio r needs ~ceil(r) salt buckets to level its
    sort-group with the average task).

    Plan shape at 100 TB: one partial-agg shuffle keyed on the key columns
    (map-side combine collapses rows to one partial count per key per
    task); the totals reduce from the already-aggregated key frame, and
    only key-count rows — never data rows — reach the final top-N sort.

    Output: (key, n, share, ratio_to_avg) ordered by n desc, key asc."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    key_expr = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    counts = (df.select(key_expr.alias("key"))
              .groupBy("key").agg(F.count("*").alias("n")))
    totals = counts.agg(F.sum("n").alias("_total"),
                        F.avg("n").alias("_avg"))
    return (counts.crossJoin(F.broadcast(totals))
            .select("key", "n",
                    qround(F.col("n") / F.col("_total"), 6).alias("share"),
                    qround(F.col("n") / F.col("_avg"), 4).alias("ratio_to_avg"))
            .orderBy(F.col("n").desc(), F.col("key").asc())
            .limit(top_n))


def mg_partition_kernel(m: int):
    """The shared Misra-Gries per-partition pass (used by the batch
    pruning here and the streaming summary in streaming/stateful.py):
    a bounded summary of at most m counters, O(m) state, single pass.

    Vectorized as chunked pre-combine + summary merge — NOT a per-token
    Python loop (bounding per-record driver/executor work is the same
    discipline the reference applies to its per-message read path,
    cf. reader/ThriftLogFileReader.java:152-157): each Arrow batch
    collapses to exact (item, count) pairs via `value_counts` (C-speed),
    which merge into the running summary by the mergeable-summaries rule
    (Agarwal et al., PODS'12): sum counts per item, and when the table
    exceeds m entries subtract the (m+1)-th largest count from everyone
    and drop the non-positives.  Each prune removes >= thr*(m+1) total
    weight, so the cumulative undercount per item stays <= n_p/(m+1) —
    the same bound as element-at-a-time MG, so the heavy-hitter superset
    guarantee (see :func:`heavy_hitters`) is unchanged.

    Yields one (item, cnt) frame per partition; counts are MG lower
    bounds."""
    import pandas as pd

    def mg_partition(batches):
        counters = None  # pandas Series: item -> MG lower-bound count
        for pdf in batches:
            vc = pdf["item"].value_counts()
            counters = vc if counters is None else \
                counters.add(vc, fill_value=0)
            if len(counters) > m:
                thr = counters.nlargest(m + 1).iloc[-1]
                counters = counters[counters > thr] - thr
        if counters is None:
            counters = pd.Series(dtype="int64")
        yield pd.DataFrame({"item": counters.index.astype(object),
                            "cnt": counters.to_numpy(dtype="int64")})

    return mg_partition


def heavy_hitters(df: DataFrame, item_col: str, min_share: float = 0.01,
                  capacity: int | None = None) -> DataFrame:
    """EXACT frequent items above a support threshold, found without
    shuffling the long tail: a per-partition Misra-Gries summary nominates
    candidates, a broadcast semi-pass counts ONLY those, and the guarantee
    makes the pruned answer identical to the full groupBy.

    Why not `groupBy(item).count().where(share >= s)`?  At corpus scale
    the item column (tokens, URLs, user agents) has billions of distinct
    values; the plain plan shuffles one row per DISTINCT item — the long
    tail dominates the exchange even with map-side combine.  Misra-Gries
    with capacity m = ceil(1/s) keeps m counters per PARTITION, so the
    shuffle carries at most m * n_partitions candidate rows.

    Exactness: if an item's global count is >= s * N, its local count must
    exceed n_p / (m + 1) in at least one partition (otherwise summing the
    per-partition bounds gives global <= N / (m + 1) < s * N), and
    Misra-Gries with m counters keeps every item whose local count exceeds
    n_p / (m + 1).  The candidate set is therefore a provable superset of
    the true heavy hitters; the exact recount + threshold filter removes
    false positives, so the output matches the full aggregation exactly.

    Output: (item, n, share) for items with share >= min_share, ordered by
    n desc, item asc."""
    import pandas as pd

    m = capacity or max(1, int(1.0 / min_share))
    items = df.select(F.col(item_col).cast("string").alias("item")) \
              .where(F.col(item_col).isNotNull())

    # The exact total rides the SAME Misra-Gries pass instead of its own
    # corpus scan: each partition appends one NULL-item sentinel row
    # carrying its exact row count (items are isNotNull-filtered above,
    # so NULL cannot collide with a real item).  The bounded summary is
    # persisted because candidates and totals both read it — 3 passes
    # over the item stream (MG, count(*), recount) become 2 (MG+total,
    # recount).
    inner = mg_partition_kernel(m)

    def mg_and_total(batches):
        n = 0

        def counted(bs):
            nonlocal n
            for pdf in bs:
                n += len(pdf)
                yield pdf

        yield from inner(counted(batches))
        yield pd.DataFrame({"item": pd.Series([None], dtype=object),
                            "cnt": pd.Series([n], dtype="int64")})

    from singer_spark.functions import maybe_persist

    summary = maybe_persist(
        items.mapInPandas(mg_and_total, "item string, cnt long"), True)
    candidates = (summary.where(F.col("item").isNotNull())
                  .select("item").distinct())
    totals = (summary.where(F.col("item").isNull())
              .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("_total")))
    return (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item").agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(totals))
        .where(F.col("n") >= F.col("_total") * F.lit(min_share))
        .select("item", "n", qround(F.col("n") / F.col("_total"), 6).alias("share"))
        .orderBy(F.desc("n"), "item")
    )


def profile_columns(df: DataFrame, cols: list[str] | None = None,
                    round_digits: int = 4) -> DataFrame:
    """One-pass column profile — the pre-ingest sanity report every
    pipeline run wants: per column, row/null counts, distinct count,
    min/max/mean/stddev for numerics.

    ONE aggregation job computes every statistic for every column
    simultaneously (a single partial-agg exchange whose payload is a few
    scalars per column), then the wide row unpivots driver-side into the
    (column, stat...) report — never one job per column, which at 100 TB
    would re-scan the table len(cols) times.  count_distinct is exact
    (adds its own expand; swap in approx_count_distinct for trillions of
    distincts).  Output: (col_name, n_rows, n_nulls, n_distinct, min_value,
    max_value, mean_value, stddev_value) — numeric stats NULL for
    non-numeric columns."""
    numeric_types = {"tinyint", "smallint", "int", "bigint",
                     "float", "double", "decimal"}
    dtypes = dict(df.dtypes)
    cols = cols or list(df.columns)

    aggs = [F.count("*").alias("_n")]
    for c in cols:
        is_num = dtypes[c].split("(")[0] in numeric_types
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            (qround(F.min(c).cast("double"), round_digits) if is_num
             else F.lit(None).cast("double")).alias(f"{c}__min"),
            (qround(F.max(c).cast("double"), round_digits) if is_num
             else F.lit(None).cast("double")).alias(f"{c}__max"),
            (qround(F.avg(F.col(c).cast("double")), round_digits) if is_num
             else F.lit(None).cast("double")).alias(f"{c}__mean"),
            (qround(F.stddev_samp(F.col(c).cast("double")), round_digits) if is_num
             else F.lit(None).cast("double")).alias(f"{c}__std"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
            F.col(f"{c}__mean").alias("mean_value"),
            F.col(f"{c}__std").alias("stddev_value"),
        ) for c in cols
    ])
    return (wide.select(F.explode(per_col).alias("p"))
            .select("p.*").orderBy("col_name"))


def check_expectations(df: DataFrame, rules: list[tuple],
                       unique_cols: list[str] | None = None,
                       min_pass_rate: float = 1.0) -> DataFrame:
    """Declarative data-quality gate: evaluate row-level expectations and
    uniqueness constraints in ONE aggregation job — the
    expectations-suite pattern (cf. Great Expectations / dbt tests) as a
    Spark plan instead of N table scans.

    `rules` is a list of (name, Column) where the Column is a boolean
    predicate a passing row satisfies; NULL predicate results count as
    violations (SQL three-valued logic would silently pass them).
    `unique_cols` adds a uniqueness expectation per column (distinct
    count == row count — computed in the same job).

    Every rule compiles to a conditional count in a single agg, so the
    table is scanned once regardless of suite size; the verdict unpivots
    driver-side.  Output: (rule, n_rows, n_violations, pass_rate,
    passed) ordered by rule."""
    aggs = [F.count("*").alias("_n")]
    for name, cond in rules:
        aggs.append(F.sum((~F.coalesce(cond, F.lit(False))).cast("bigint"))
                    .alias(f"_viol_{name}"))
    for c in (unique_cols or []):
        aggs.append((F.count(c) - F.count_distinct(F.col(c)))
                    .alias(f"_viol_unique_{c}"))
    wide = df.agg(*aggs)
    names = [n for n, _ in rules] + [f"unique_{c}" for c in (unique_cols or [])]
    per_rule = F.array(*[
        F.struct(F.lit(n).alias("rule"),
                 F.col("_n").alias("n_rows"),
                 F.col(f"_viol_{n}").alias("n_violations"))
        for n in names
    ])
    rate = F.when(F.col("n_rows") > 0,
                  (F.col("n_rows") - F.col("n_violations")) / F.col("n_rows")) \
            .otherwise(F.lit(1.0))
    # the verdict compares the UNROUNDED rate: at n_rows >= 2M a single
    # violation rounds to pass_rate 1.000000, and a gate that passes on
    # the rounded display value would wave bad data through
    return (wide.select(F.explode(per_rule).alias("r")).select("r.*")
            .select("rule", "n_rows", "n_violations",
                    qround(rate, 6).alias("pass_rate"),
                    (rate >= min_pass_rate).alias("passed"))
            .orderBy("rule"))
