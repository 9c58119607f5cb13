"""Heartbeat — reference parity for SURVEY.md §2.4 B6 / §2.8 O1.

The reference publishes a SingerStatus JSON blob (hostname, uptime, per-topic
write counts, latency, numLogStreams, numStuckLogStreams) to a heartbeat
topic every N seconds (common/SingerStatus.java:38-62,108-149,
heartbeat/HeartbeatGenerator.java:30-58).

Spark surfaces the same signals on StreamingQuery.lastProgress /
recentProgress; `build_status` folds them into one status dict and
`HeartbeatPublisher` ships it on an interval from the driver."""

from __future__ import annotations

import json
import socket
import threading
import time

from pyspark.sql import SparkSession


def build_status(spark: SparkSession, started_at: float,
                 hostname: str | None = None,
                 stuck_seconds: float = 300.0) -> dict:
    """One SingerStatus-shaped dict from all active streaming queries."""
    now = time.time()
    queries = spark.streams.active
    kafka_writes: dict[str, int] = {}
    latencies: list[float] = []
    stuck = 0
    for q in queries:
        p = q.lastProgress
        if not p:
            continue
        if isinstance(p, str):
            p = json.loads(p)
        name = q.name or p.get("name") or q.id
        num = int(p.get("numInputRows", 0) or 0)
        kafka_writes[str(name)] = kafka_writes.get(str(name), 0) + num
        dur = (p.get("durationMs") or {}).get("triggerExecution")
        if dur is not None:
            latencies.append(float(dur))
        ts = p.get("timestamp")
        if ts:
            try:
                # progress timestamps are UTC ISO strings; parse as UTC
                # explicitly (mktime would apply the host timezone and skew
                # batch_age by the UTC offset on non-UTC hosts)
                from datetime import datetime, timezone

                parsed = datetime.strptime(ts[:19], "%Y-%m-%dT%H:%M:%S")
                batch_age = now - parsed.replace(tzinfo=timezone.utc).timestamp()
                if batch_age > stuck_seconds and num == 0:
                    stuck += 1
            except ValueError:
                pass
    return {
        "hostName": hostname or socket.gethostname(),
        "jvmUptime": int((now - started_at) * 1000),
        "version": "singer_spark-0.1.0",
        "numLogStreams": len(queries),
        "numStuckLogStreams": stuck,
        "kafkaWrites": kafka_writes,
        "avgTriggerMs": (sum(latencies) / len(latencies)) if latencies else 0.0,
        "timestamp": int(now * 1000),
    }


class HeartbeatPublisher(threading.Thread):
    """Driver-side interval publisher (HeartbeatGenerator parity).  `emit`
    receives the JSON string — wire it to a Kafka producer, a file, or a
    collector in tests."""

    def __init__(self, spark: SparkSession, emit, interval_secs: int = 60) -> None:
        super().__init__(daemon=True)
        self.spark = spark
        self.emit = emit
        self.interval = interval_secs
        self.started_at = time.time()
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.wait(self.interval):
            self.emit(json.dumps(build_status(self.spark, self.started_at)))

    def stop(self) -> None:
        self._stop.set()
