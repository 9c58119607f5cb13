"""Kafka direct sink (W1/W3 twin) tests with a protocol-level fake producer
— models the reference's SingerEndToEndTest (write N framed-thrift messages
as log files, run the agent, assert delivered == N and audit count == N;
SingerEndToEndTest.java:26-118) plus key/value/headers/partition routing
checks, without a broker (no Kafka in this container)."""

from __future__ import annotations

import glob
import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from singer_spark.audit import AuditCollector
from singer_spark.config import LogConfig, ReaderConfig, WriterConfig
from singer_spark.engine import PipelineManager
from singer_spark.sinks import kafka_direct_sink, kafka_write_batch
from tests.test_pipeline_e2e import write_thrift_log


def make_fake_producer_factory(out_dir: str, fail: bool = False):
    """Picklable-by-value fake implementing the kafka-python producer
    protocol: send(topic, value=, key=, headers=, partition=) -> future,
    flush().  Delivered records append as JSON lines on flush — only
    flushed messages are visible (protocol check)."""

    class FakeFuture:
        def __init__(self, ok: bool):
            self._ok = ok
            self.exception = None if ok else "NotLeaderForPartition"

        def failed(self) -> bool:
            return not self._ok

    class FakeProducer:
        def __init__(self):
            self.pending = []

        def send(self, topic, value=None, key=None, headers=None, partition=None):
            self.pending.append({
                "topic": topic,
                "key": key.decode("utf-8") if key is not None else None,
                "value": value.decode("utf-8"),
                "headers": {k: v.decode("utf-8") for k, v in (headers or [])},
                "partition": partition,
            })
            return FakeFuture(ok=not fail)

        def flush(self):
            path = os.path.join(out_dir, f"flush-{uuid.uuid4().hex}.jsonl")
            with open(path, "w") as f:
                for rec in self.pending:
                    f.write(json.dumps(rec) + "\n")

        def close(self):
            pass

    def factory(bootstrap_servers: str, configs: dict) -> FakeProducer:
        assert bootstrap_servers
        return FakeProducer()

    return factory


def _read_delivered(out_dir: str) -> list[dict]:
    rows = []
    for path in glob.glob(os.path.join(out_dir, "flush-*.jsonl")):
        with open(path) as f:
            rows.extend(json.loads(line) for line in f)
    return rows


def test_kafka_write_batch_routes_key_value_headers_partition(spark, tmp_path):
    out_dir = str(tmp_path / "kafka_out")
    os.makedirs(out_dir)
    df = spark.range(20).select(
        F.col("id").cast("string").alias("key"),
        F.concat(F.lit("payload-"), F.col("id")).alias("value"),
        F.create_map(F.lit("hostname"), F.lit("host-01").cast("binary")).alias("headers"),
        (F.col("id") % 4).cast("int").alias("partition"),
    )
    kafka_write_batch(df, "broker:9092", "topic-a",
                      producer_factory=make_fake_producer_factory(out_dir))
    delivered = _read_delivered(out_dir)
    assert len(delivered) == 20
    rec = next(r for r in delivered if r["key"] == "7")
    assert rec == {"topic": "topic-a", "key": "7", "value": "payload-7",
                   "headers": {"hostname": "host-01"}, "partition": 3}


def test_kafka_failed_sends_fail_the_task(spark, tmp_path):
    out_dir = str(tmp_path / "kafka_fail")
    os.makedirs(out_dir)
    df = spark.range(3).select(F.col("id").cast("string").alias("value")).coalesce(1)
    with pytest.raises(Exception) as exc_info:
        kafka_write_batch(df, "broker:9092", "t",
                          producer_factory=make_fake_producer_factory(out_dir, fail=True))
    assert "sends failed" in str(exc_info.value)


def test_kafka_e2e_thrift_logs_to_topic_with_audit(spark, tmp_path):
    """The SingerEndToEndTest shape: N framed-thrift messages on disk →
    engine pipeline (decode → transforms → partitioner → kafka sink) →
    every message lands with its key/partition and audit count == N."""
    log_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "topic")
    os.makedirs(out_dir)
    n = write_thrift_log(log_dir, n=40)

    cfg = LogConfig(
        name="kafka_e2e", log_dir=log_dir, log_stream_regex="*.log",
        reader=ReaderConfig(type="thrift"),
        writer=WriterConfig(type="kafka_direct", topic="logs.app",
                            bootstrap_servers="broker:9092",
                            partitioner="crc32", num_partitions=8,
                            audit_topic="audit.kafka_e2e"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    audit = AuditCollector()
    mgr = PipelineManager(spark,
                          kafka_producer_factory=make_fake_producer_factory(out_dir))
    q = mgr.start_log(cfg, audit_sink=audit)
    q.processAllAvailable()
    mgr.stop_all()

    delivered = _read_delivered(out_dir)
    assert len(delivered) == n
    assert {r["value"] for r in delivered} == {f"payload-{i}" for i in range(n)}
    assert all(r["topic"] == "logs.app" for r in delivered)
    assert all(0 <= r["partition"] < 8 for r in delivered)
    # count-after-successful-write accounting (W9/B5)
    assert audit.total("audit.kafka_e2e") == n


def test_kafka_streaming_sink_without_audit(spark, tmp_path):
    out_dir = str(tmp_path / "stream_topic")
    os.makedirs(out_dir)
    src = str(tmp_path / "src")
    spark.range(30).select(F.concat(F.lit("m"), F.col("id")).alias("value")) \
        .coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("value string").parquet(src)
    q = kafka_direct_sink(stream, "broker:9092", "topic-s", str(tmp_path / "ck"),
                          producer_factory=make_fake_producer_factory(out_dir)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(_read_delivered(out_dir)) == 30


# ---------------------------------------------------------------------------
# W2 — transactional (committable) writes.
# ---------------------------------------------------------------------------
def make_txn_producer_factory(out_dir: str, fail: bool = False):
    """Fake producer recording the transaction protocol: messages become
    visible only on commit_transaction; abort discards them (events logged
    as JSONL so executor-side calls are observable)."""

    class FakeFuture:
        def __init__(self, ok: bool):
            self.exception = None if ok else "NotLeaderForPartition"

        def failed(self) -> bool:
            return self.exception is not None

    class TxnProducer:
        def __init__(self):
            self.pending = []
            self.events = []

        def _log(self, *evt):
            self.events.append(evt)

        def init_transactions(self):
            self._log("init")

        def begin_transaction(self):
            self._log("begin")

        def send(self, topic, value=None, key=None, headers=None, partition=None):
            self.pending.append(value.decode("utf-8"))
            return FakeFuture(ok=not fail)

        def flush(self):
            self._log("flush")

        def commit_transaction(self):
            self._log("commit", list(self.pending))

        def abort_transaction(self):
            self._log("abort", len(self.pending))

        def close(self):
            path = os.path.join(out_dir, f"txn-{uuid.uuid4().hex}.jsonl")
            with open(path, "w") as f:
                for evt in self.events:
                    f.write(json.dumps(evt) + "\n")

    return lambda servers, configs: TxnProducer()


def _txn_events(out_dir):
    evts = []
    for p in glob.glob(os.path.join(out_dir, "txn-*.jsonl")):
        with open(p) as f:
            evts.append([json.loads(x) for x in f])
    return evts


def test_transactional_commit_wraps_each_task(spark, tmp_path):
    out_dir = str(tmp_path / "txn")
    os.makedirs(out_dir)
    df = spark.range(20).select(
        F.concat(F.lit("m"), F.col("id")).alias("value")).coalesce(2)
    kafka_write_batch(df, "b:9092", "t", make_txn_producer_factory(out_dir),
                      transactional=True)
    tasks = _txn_events(out_dir)
    delivered = []
    for events in tasks:
        if not events:
            continue  # empty partition: no sends, but protocol still ran
        kinds = [e[0] for e in events]
        assert kinds[:2] == ["init", "begin"] and kinds[-1] == "commit"
        assert "abort" not in kinds
        delivered += events[-1][1]
    assert sorted(delivered) == sorted(f"m{i}" for i in range(20))


def test_transactional_abort_on_failure(spark, tmp_path):
    out_dir = str(tmp_path / "txn_fail")
    os.makedirs(out_dir)
    df = spark.range(5).select(F.concat(F.lit("m"), F.col("id")).alias("value")).coalesce(1)
    with pytest.raises(Exception):
        kafka_write_batch(df, "b:9092", "t",
                          make_txn_producer_factory(out_dir, fail=True),
                          transactional=True)
    aborted = [e for events in _txn_events(out_dir) for e in events if e[0] == "abort"]
    committed = [e for events in _txn_events(out_dir) for e in events if e[0] == "commit"]
    assert aborted and not committed  # failed task aborted, nothing visible


# ---------------------------------------------------------------------------
# Live-broker smoke (flag-gated): set SINGER_SPARK_KAFKA_BOOTSTRAP to a real
# broker (e.g. "localhost:9092", kafka-python installed) and this runs the
# DIRECT producer path against it end-to-end — delivery callbacks, metadata
# timeouts, real client quirks the protocol fakes cannot exercise.  Unset
# (this sandbox), it skips cleanly.
# ---------------------------------------------------------------------------
@pytest.mark.skipif(
    not os.environ.get("SINGER_SPARK_KAFKA_BOOTSTRAP"),
    reason="no live broker: set SINGER_SPARK_KAFKA_BOOTSTRAP to run")
def test_kafka_direct_path_live_broker(spark):
    pytest.importorskip("kafka", reason="kafka-python not installed")
    from kafka import KafkaConsumer

    bootstrap = os.environ["SINGER_SPARK_KAFKA_BOOTSTRAP"]
    topic = f"singer_spark_smoke_{uuid.uuid4().hex[:8]}"
    df = spark.range(50).select(
        F.col("id").cast("string").cast("binary").alias("key"),
        F.concat(F.lit("live-"), F.col("id").cast("string"))
        .cast("binary").alias("value"))
    kafka_write_batch(df, bootstrap, topic)

    consumer = KafkaConsumer(
        topic, bootstrap_servers=bootstrap, auto_offset_reset="earliest",
        consumer_timeout_ms=15000)
    got = sorted(m.value.decode() for m in consumer)
    consumer.close()
    assert got == sorted(f"live-{i}" for i in range(50))
