"""Pipeline engine — reference parity for SURVEY.md §2.2 D1-D2 and §2.8 O2-O3.

DefaultLogMonitor + LogStreamManager collapse onto a driver-side registry of
StreamingQuery objects: `start_log` wires source → transforms → sink for one
LogConfig (one "SingerLog" = one streaming query), `drain` stops after
processing everything available (LogStreamManager.drainAndStopLogStreams,
monitor/LogStreamManager.java:657-682), and the decider gate reproduces
instance-level sampling (T10, monitor/DefaultLogMonitor.java:203-224).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from singer_spark import sinks, sources
from singer_spark.config import LogConfig, SingerConfig
from singer_spark.functions import md5_int
from singer_spark.partitioners import get_partitioner
from singer_spark.transforms import TransformConfig, apply_transforms


def build_source(spark: SparkSession, cfg: LogConfig, streaming: bool = True) -> DataFrame:
    r = cfg.reader
    if r.type == "thrift":
        fn = sources.thrift_stream if streaming else sources.thrift_batch
        kwargs = {"max_message_size": r.max_message_size}
        if streaming:
            kwargs["max_files_per_trigger"] = cfg.processor.batch_size
        return fn(spark, cfg.log_dir, glob=cfg.log_stream_regex, **kwargs)
    if r.message_start_regex:
        fn = sources.multiline_text_stream if streaming else sources.multiline_text_batch
        return fn(spark, cfg.log_dir, glob=cfg.log_stream_regex,
                  message_start_regex=r.message_start_regex)
    fn = sources.text_stream if streaming else sources.text_batch
    return fn(spark, cfg.log_dir, glob=cfg.log_stream_regex)


def build_transforms(df: DataFrame, cfg: LogConfig) -> DataFrame:
    r, t, p = cfg.reader, cfg.transformer, cfg.processor
    tc = TransformConfig(
        filter_regex=r.filter_message_regex,
        modifier_regex=t.regex if t.type == "regex" else None,
        modifier_template=t.modified_message_format,
        prepend_hostname=r.prepend_hostname,
        prepend_timestamp_format="yyyy-MM-dd HH:mm:ss" if r.prepend_timestamp else None,
        delimiter=r.prepend_field_delimiter,
        trim_newline=r.type == "text",
        sample_percent=p.sample_percent,
        max_message_bytes=r.max_message_size,
    )
    out = apply_transforms(df, tc, text_col="value")
    w = cfg.writer
    if w.type == "kafka" and w.partitioner:
        key = F.col("key") if "key" in out.columns else F.col("value")
        out = out.withColumn("partition", get_partitioner(w.partitioner)(key, w.num_partitions))
    return out


class PipelineManager:
    """The DefaultLogMonitor/LogStreamManager analog: owns the query registry."""

    def __init__(self, spark: SparkSession, config: SingerConfig | None = None,
                 checkpoint_root: str | None = None) -> None:
        self.spark = spark
        self.config = config or SingerConfig()
        self.checkpoint_root = checkpoint_root or tempfile.mkdtemp(prefix="singer_ckpt_")
        self.queries: dict[str, StreamingQuery] = {}
        self._draining = False

    # -- instance-level decider gate (T10) -------------------------------
    def _instance_enabled(self, cfg: LogConfig) -> bool:
        pct = self.config.instance_sample_percent
        if pct >= 100:
            return True
        # deterministic per (host, log) like the reference's host-hashed decider
        import socket
        basis = f"{socket.gethostname()}:{cfg.name}"
        row = self.spark.range(1).select((md5_int(F.lit(basis)) % 100).alias("h")).collect()
        return row[0]["h"] < pct

    def start_log(self, cfg: LogConfig, audit_sink=None) -> StreamingQuery | None:
        """Wire one LogConfig end-to-end and start its query."""
        if not self._instance_enabled(cfg):
            return None
        ckpt = cfg.checkpoint_dir or os.path.join(self.checkpoint_root, cfg.name)
        df = build_transforms(build_source(self.spark, cfg), cfg)
        w = cfg.writer
        if w.type == "kafka":
            writer = sinks.kafka_sink(df, w.bootstrap_servers, w.topic, ckpt,
                                      producer_configs=w.producer_configs,
                                      trigger_seconds=cfg.processor.processing_interval_secs)
        elif w.type in ("file", "s3", "parquet", "text"):
            writer = sinks.file_sink(df, w.path, ckpt, fmt=w.format,
                                     min_upload_seconds=w.min_upload_seconds)
        elif w.type == "memory":
            writer = sinks.memory_sink(df, cfg.name, ckpt)
        elif w.type == "noop":
            writer = sinks.noop_sink(df, ckpt)
        else:
            raise ValueError(f"unsupported writer type: {w.type}")
        if w.audit_topic and audit_sink is not None and w.type in ("file", "s3", "parquet", "text"):
            # audited file delivery: foreachBatch write + audit row (B5)
            path, fmt = w.path, w.format

            def write_batch(batch_df: DataFrame, batch_id: int) -> None:
                batch_df.write.mode("append").format(fmt).save(path)

            writer = sinks.with_audit(df, w.audit_topic, ckpt, write_batch, audit_sink)
        query = writer.queryName(cfg.name).start()
        self.queries[cfg.name] = query
        return query

    def start_all(self, audit_sink=None) -> None:
        for cfg in self.config.logs:
            self.start_log(cfg, audit_sink=audit_sink)

    # -- drain / stop (O3 admin `stop`) -----------------------------------
    def drain(self, timeout_secs: int = 120) -> None:
        """Process everything available, then stop — the reference's
        drainAndStopLogStreams."""
        self._draining = True
        for q in list(self.queries.values()):
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(timeout_secs)
        self._draining = False

    def is_draining(self) -> bool:
        return self._draining

    def stop_all(self) -> None:
        for q in list(self.queries.values()):
            q.stop()
        self.queries.clear()
