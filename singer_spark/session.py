"""SparkSession factory with scale-oriented defaults.

Tested on local[N]; the conf is chosen so the same code runs unchanged on a
1000-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) so shuffle partition
  counts self-tune at any scale factor.
- Arrow enabled for the few pandas-UDF paths (thrift codec, multimodal
  stubs) — batch transfer, never row-at-a-time.
- Broadcast threshold left at default 10 MB; dimension tables (region,
  nation, supplier at any SF; customer/part at test SFs) broadcast
  automatically, and query code additionally hints `broadcast()` where the
  dimension is guaranteed small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "singer_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) * 2 if cpus.isdigit() else 64, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Cached/persisted frames store with AQE-coalesced partitioning
        # instead of the static shuffle-partition count (r13, guide §2.2
        # "fewer, larger partitions"): the engine's iterated operators
        # (unigram trainer word frame, DoReMi scored corpus, gate
        # frames, posting lists) persist small-by-construction frames
        # and re-read them once per pass — without this every pass
        # launches shuffle.partitions near-empty tasks per consumer.
        # Scale-adaptive by definition: AQE sizes partitions by bytes
        # (advisoryPartitionSizeInBytes), so a 100 TB cached frame keeps
        # its parallelism; measured interleaved A/B at sf0.1: -26% on
        # the persist-heavy query set, no query slower.  Parameterised
        # (r14) so the flag can be A/B'd per-JVM and tuned per
        # deployment without a code change; default stays on.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "false" if os.environ.get("SPARK_GRAFT_CACHE_AQE", "1")
                in ("0", "false") else "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # TESTDATA events.parquet carries TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type, so read as raw int64 nanos and convert
        # explicitly (read_events) — same truncation DuckDB applies ns→us.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None) -> dict:
    """Load the TESTDATA parquet tables and register temp views.

    At cluster scale these reads are partitioned parquet scans; Catalyst
    pushes filters/projections down into them (verify via
    ``df.explain('formatted')`` → PushedFilters / ReadSchema).
    """
    all_names = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    out = {}
    for name in names or all_names:
        df = read_events(spark, sf_dir) if name == "events" \
            else spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_events(spark: SparkSession, sf_dir: str) -> "DataFrame":
    """events.parquet with `ts` normalized to a microsecond TimestampType.

    The on-disk type has varied across TESTDATA generations — TIMESTAMP
    (NANOS) (loads as int64 under nanosAsLong), TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (loads as TIMESTAMP_NTZ), or a plain UTC
    timestamp — so every shape is normalized here.  Nanos convert via
    integer `div` (a double division would lose bits above 2^53, and the
    truncation matches DuckDB's ns→us coercion exactly); NTZ casts to
    TimestampType, which is wall-clock-preserving in any single session
    timezone, so date_format/date_trunc/unix_timestamp downstream agree
    with the oracle's naive-timestamp arithmetic.

    The conf is set here (runtime SQL conf) and not only in get_spark so
    the engine also works under a caller-provided SparkSession — e.g. the
    verification driver's."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
