"""Kafka partitioner library — reference parity for SURVEY.md §2.5 (P1-P10).

Every reference partitioner implements
``KafkaMessagePartitioner.partition(key, partitions) -> int``
(writer/KafkaMessagePartitioner.java) and is selected by class name
(common.thrift:22, writer/KafkaWriter.java:155-164).

Here each is a pure column expression producing the `partition` column the
Spark Kafka sink consumes — evaluated JVM-side per row, no shuffle (the
partition id rides along to the sink; Kafka does the physical routing).
A class-name registry mirrors the reference's reflection-based plugin
loading (the UDF surface of the system, SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from singer_spark.functions import md5_int


# P1 — DefaultPartitioner: uniform random per message.
# Reference: writer/partitioners/DefaultPartitioner.java:29-33.
def default_partitioner(key: Column, num_partitions: int) -> Column:
    return F.floor(F.rand() * num_partitions).cast("int")


# P2 — Crc32ByteArrayPartitioner: abs(crc32(key)) % n, random on null key.
# Reference: writer/partitioners/Crc32ByteArrayPartitioner.java:53-70.
def crc32_partitioner(key: Column, num_partitions: int) -> Column:
    hashed = F.pmod(F.crc32(key.cast("binary")), F.lit(num_partitions)).cast("int")
    return F.when(key.isNull(), F.floor(F.rand() * num_partitions).cast("int")).otherwise(hashed)


# P3 — MurmurByteArrayPartitioner: abs(murmur3(key)) % n.
# Reference: writer/partitioners/MurmurByteArrayPartitioner.java:40-53.
# Spark's hash() is Murmur3_x86_32 — the same hash family.
def murmur_partitioner(key: Column, num_partitions: int) -> Column:
    return F.pmod(F.hash(key), F.lit(num_partitions)).cast("int")


# P4 — StringKeyMd5Partitioner: md5(utf8(key)) % n.
# Reference: writer/StringKeyMd5Partitioner.java:39+.
# Uses the top 60 bits of the digest as a non-negative integer.
def md5_partitioner(key: Column, num_partitions: int) -> Column:
    return F.pmod(md5_int(key), F.lit(num_partitions)).cast("int")


# P5 — SimpleRoundRobinPartitioner: counter % n.
# Reference: writer/partitioners/SimpleRoundRobinPartitioner.java:44-50.
# Distributed counter semantics: a global row_number is a sort+shuffle, so
# the scalable default is a per-task counter over monotonically increasing
# ids — same uniform balance guarantee without a shuffle.
def round_robin_partitioner(key: Column, num_partitions: int) -> Column:
    return F.pmod(F.monotonically_increasing_id(), F.lit(num_partitions)).cast("int")


def round_robin_ordered(order_by: Column, num_partitions: int) -> Column:
    """Deterministic round-robin (exact counter parity) — requires a total
    order (single-task global Window), so only for bounded batches / tests;
    callers must gate the input through `functions.assert_bounded`, and the
    streaming/production path uses :func:`round_robin_partitioner` (this
    function is deliberately NOT in PARTITIONER_REGISTRY)."""
    rn = F.row_number().over(Window.orderBy(order_by)) - 1
    return F.pmod(rn, F.lit(num_partitions)).cast("int")


# P6 — SinglePartitionPartitioner: one random partition pinned for the
# writer's lifetime (compression win, see LocalityAwareSinglePartition).
# Reference: writer/partitioners/SinglePartitionPartitioner.java:36-43.
def single_partition_partitioner(key: Column, num_partitions: int, pinned: int | None = None) -> Column:
    import random

    chosen = pinned if pinned is not None else random.randrange(num_partitions)
    return F.lit(int(chosen)).cast("int")


# P7 — FixedPartitionsPartitioner: spread among a fixed-size subset of the
# partitions.  Reference: writer/partitioners/FixedPartitionsPartitioner.java:
# 37-55 (random subset, random member).  `deterministic=True` picks the
# member by keyed hash instead of rand() — reproducible across task retries
# (same reasoning as transforms.sample_messages).
def fixed_partitions_partitioner(key: Column, num_partitions: int, subset_size: int = 2,
                                 subset: list[int] | None = None,
                                 deterministic: bool = False) -> Column:
    import random

    if subset is None:
        subset = sorted(random.sample(range(num_partitions), min(subset_size, num_partitions)))
    arr = F.array(*[F.lit(int(p)) for p in subset])
    if deterministic:
        idx = (md5_int(key) % len(subset) + 1).cast("int")
    else:
        idx = (F.floor(F.rand() * len(subset)) + 1).cast("int")
    return F.element_at(arr, idx).cast("int")


# P8-P10 — LocalityAware*Partitioner: restrict to partitions whose leader is
# in the local rack; refresh periodically; fall back to all partitions.
# Reference: writer/partitioners/LocalityAwarePartitioner.java:29-80,
# LocalityAwareRandomPartitioner.java:41-49,
# LocalityAwareSinglePartitionPartitioner.java:45-57.
# Spark has no broker-metadata feed; the driver fetches partition→rack
# leadership out of band (e.g. kafka-python AdminClient) and passes the
# local-partition list here; it is broadcast with the plan as a literal
# array — the same "refresh by rebuilding" model as the reference's timer.
def locality_aware_random_partitioner(key: Column, num_partitions: int,
                                      local_partitions: list[int] | None) -> Column:
    if not local_partitions:  # fallback-to-all, LocalityAwarePartitioner.java:67-71
        return default_partitioner(key, num_partitions)
    arr = F.array(*[F.lit(int(p)) for p in local_partitions])
    return F.element_at(arr, (F.floor(F.rand() * len(local_partitions)) + 1).cast("int")).cast("int")


def locality_aware_single_partition_partitioner(key: Column, num_partitions: int,
                                                local_partitions: list[int] | None,
                                                pinned_index: int | None = None) -> Column:
    import random

    if not local_partitions:
        return single_partition_partitioner(key, num_partitions)
    idx = pinned_index if pinned_index is not None else random.randrange(len(local_partitions))
    return F.lit(int(local_partitions[idx])).cast("int")


# ---------------------------------------------------------------------------
# Locality metadata feed (P8-P10) — the driver-side half the reference gets
# from its broker-metadata refresh timer
# (writer/partitioners/LocalityAwarePartitioner.java:29-80): fetch
# partition→leader-rack leadership, keep only partitions whose leader shares
# the agent's rack, refresh on an interval, and FALL BACK TO ALL partitions
# when the fetch fails or nothing is rack-local (.java:67-71).  The result
# feeds `locality_aware_*_partitioner(local_partitions=...)`, baked into the
# plan as literals — "refresh by rebuilding", exactly the reference's model.
# ---------------------------------------------------------------------------
class LocalityProvider:
    """``fetch_leader_racks() -> {partition_id: rack}`` is injected: in
    production a kafka AdminClient call (:func:`kafka_leader_rack_fetcher`),
    in tests a fake.  ``local_partitions()`` returns the rack-local partition
    ids, or None to signal fallback-to-all."""

    def __init__(self, fetch_leader_racks, local_rack: str,
                 refresh_seconds: float = 300.0, clock=None) -> None:
        import time

        self.fetch_leader_racks = fetch_leader_racks
        self.local_rack = local_rack
        self.refresh_seconds = refresh_seconds
        self.clock = clock or time.time
        self._fetched_at: float | None = None
        self._local: list[int] | None = None

    def local_partitions(self) -> list[int] | None:
        now = self.clock()
        if self._fetched_at is None or now - self._fetched_at >= self.refresh_seconds:
            try:
                racks = dict(self.fetch_leader_racks())
                local = sorted(int(p) for p, r in racks.items() if r == self.local_rack)
                self._local = local or None   # no rack-local leader → all
            except Exception:
                self._local = None            # metadata outage → all
            self._fetched_at = now
        return self._local


def kafka_leader_rack_fetcher(bootstrap_servers: str, topic: str):
    """Production ``fetch_leader_racks`` over kafka-python's AdminClient
    (import-gated — not installed in this container; inject a fake in
    tests).  Maps each partition to its leader broker's rack, the exact
    feed LocalityAwarePartitioner.java:29-80 refreshes."""

    def fetch() -> dict[int, str | None]:
        from kafka import KafkaAdminClient  # type: ignore

        admin = KafkaAdminClient(bootstrap_servers=bootstrap_servers)
        try:
            cluster = admin.describe_cluster()
            broker_rack = {b["node_id"]: b.get("rack") for b in cluster["brokers"]}
            (topic_md,) = admin.describe_topics([topic])
            return {p["partition"]: broker_rack.get(p["leader"])
                    for p in topic_md["partitions"]}
        finally:
            admin.close()

    return fetch


# ---------------------------------------------------------------------------
# Class-name registry — parity with the reference's reflection plugin point
# (writer/KafkaWriter.java:155-164 loads the configured class name).
# ---------------------------------------------------------------------------
PARTITIONER_REGISTRY: dict[str, Callable[..., Column]] = {
    "com.pinterest.singer.writer.partitioners.DefaultPartitioner": default_partitioner,
    "com.pinterest.singer.writer.partitioners.Crc32ByteArrayPartitioner": crc32_partitioner,
    "com.pinterest.singer.writer.partitioners.MurmurByteArrayPartitioner": murmur_partitioner,
    "com.pinterest.singer.writer.StringKeyMd5Partitioner": md5_partitioner,
    "com.pinterest.singer.writer.partitioners.SimpleRoundRobinPartitioner": round_robin_partitioner,
    "com.pinterest.singer.writer.partitioners.SinglePartitionPartitioner": single_partition_partitioner,
    "com.pinterest.singer.writer.partitioners.FixedPartitionsPartitioner": fixed_partitions_partitioner,
    "com.pinterest.singer.writer.partitioners.LocalityAwareRandomPartitioner": locality_aware_random_partitioner,
    "com.pinterest.singer.writer.partitioners.LocalityAwareSinglePartitionPartitioner": locality_aware_single_partition_partitioner,
    # short aliases for new configs
    "default": default_partitioner,
    "crc32": crc32_partitioner,
    "murmur": murmur_partitioner,
    "md5": md5_partitioner,
    "round_robin": round_robin_partitioner,
    "single": single_partition_partitioner,
    "fixed": fixed_partitions_partitioner,
    "locality_random": locality_aware_random_partitioner,
    "locality_single": locality_aware_single_partition_partitioner,
}


def get_partitioner(name: str) -> Callable[..., Column]:
    if name not in PARTITIONER_REGISTRY:
        raise KeyError(f"unknown partitioner: {name}")
    return PARTITIONER_REGISTRY[name]
