"""Pipeline engine — reference parity for SURVEY.md §2.2 D1-D2, §2.4 B3,
§2.8 O2-O3/O5.

DefaultLogMonitor + LogStreamManager collapse onto a driver-side registry of
StreamingQuery objects: `start_log` wires source → transforms → sink for one
LogConfig (one "SingerLog" = one streaming query), `drain` stops after
processing everything available (LogStreamManager.drainAndStopLogStreams,
monitor/LogStreamManager.java:657-682), and the decider gate reproduces
instance-level sampling (T10, monitor/DefaultLogMonitor.java:203-224).

`run_adaptive` is the reference's poll loop (B3): drain-everything-available
cycles with exponential backoff on empty cycles
(processor/DefaultLogStreamProcessor.java:365-402), log-retention cleanup
after each drained cycle (O5, DefaultLogStreamProcessor.java:252-255), and a
live decider check per cycle (O2, config/Decider.java:50-148).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from singer_spark import sinks, sources
from singer_spark.config import LogConfig, SingerConfig
from singer_spark.partitioners import get_partitioner
from singer_spark.transforms import TransformConfig, apply_transforms, inject_headers


def _percent_hash(basis: str) -> int:
    """Deterministic 0-99 bucket from md5 — the same 60-bit md5 integer the
    engine uses everywhere (functions.md5_int), computed driver-side."""
    return int(hashlib.md5(basis.encode("utf-8")).hexdigest()[:15], 16) % 100


class Decider:
    """Live-reloadable decider values (O2) — parity with the reference's
    watched decider JSON (config/Decider.java:50-148): a flat
    ``{"decider_name": percent}`` file, re-read whenever its mtime changes,
    so operators flip sampling at runtime without restarting the agent.
    A missing file means all-default (fail open, like the reference)."""

    def __init__(self, path: str | os.PathLike | None, default: int = 100) -> None:
        self.path = str(path) if path else None
        self.default = default
        self._mtime: float | None = None
        self._values: dict[str, int] = {}

    def _maybe_reload(self) -> None:
        if not self.path:
            return
        try:
            mtime = os.path.getmtime(self.path)
        except OSError:
            self._mtime, self._values = None, {}
            return
        if mtime != self._mtime:
            try:
                with open(self.path) as f:
                    raw = json.load(f)
                self._values = {str(k): int(v) for k, v in raw.items()}
                self._mtime = mtime
            except (ValueError, OSError):
                pass  # keep last good values — a half-written file must not flap

    def value(self, name: str) -> int:
        self._maybe_reload()
        return self._values.get(name, self.default)

    def is_enabled(self, name: str, basis: str) -> bool:
        """Deterministic percent gate: same (decider, basis) always lands in
        the same bucket, so flipping the file is the only state change."""
        return _percent_hash(basis) < self.value(name)


def enforce_retention(log_dir: str, retention_seconds: int,
                      glob: str = "*", now: float | None = None) -> list[str]:
    """O5: delete log files older than ``logRetentionInSeconds``
    (processor/DefaultLogStreamProcessor.java:252-255, config.thrift:270-274).

    Call it after a drained cycle (run_adaptive does): everything older than
    the cutoff has necessarily been processed, so deletion never races the
    reader.  A tailing agent that never deletes fills the disk.  Returns the
    deleted paths."""
    if retention_seconds is None or retention_seconds < 0:
        return []
    cutoff = (now if now is not None else time.time()) - retention_seconds
    removed: list[str] = []
    for p in sorted(Path(log_dir).glob(glob)):
        if p.is_file() and p.stat().st_mtime < cutoff:
            p.unlink()
            removed.append(str(p))
    return removed


def build_source(spark: SparkSession, cfg: LogConfig, streaming: bool = True) -> DataFrame:
    r = cfg.reader
    if r.type in ("tail", "tail_thrift"):
        # sub-file tailing (S7/S2): delivers appended lines (or framed-
        # thrift LogMessages, type 'tail_thrift') from GROWING files with
        # per-inode byte offsets — the file source below only sees a file
        # once it is fully listed
        from singer_spark.streaming.tail import tail_stream

        if not streaming:
            raise ValueError(f"reader type {r.type!r} is streaming-only")
        if r.type == "tail_thrift":
            return tail_stream(spark, cfg.log_dir, glob=cfg.log_stream_regex,
                               mode="thrift", max_message_size=r.max_message_size,
                               max_bytes_per_trigger=r.max_bytes_per_trigger)
        return tail_stream(spark, cfg.log_dir, glob=cfg.log_stream_regex,
                           max_bytes_per_trigger=r.max_bytes_per_trigger)
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
    if r.pod_metadata:
        # D8: log_dir is the pods root (<ns>_<pod>_<uid>/ convention);
        # namespace/name/uid columns parse from the path
        fn = sources.pod_text_stream if streaming else sources.pod_text_batch
        return fn(spark, cfg.log_dir, log_glob=cfg.log_stream_regex)
    fn = sources.text_stream if streaming else sources.text_batch
    return fn(spark, cfg.log_dir, glob=cfg.log_stream_regex)


def build_transforms(df: DataFrame, cfg: LogConfig,
                     pod_fetcher=None) -> DataFrame:
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
    if r.pod_metadata:
        # pod identity headers from the path columns; pod-SPEC fields
        # (labels/annotations) from the kubelet fetcher when configured.
        # Enrichment snapshots at plan build — a restart (config reload,
        # failure recovery) picks up fresh labels.
        from singer_spark.sources import (
            pod_headers,
            pod_spec_headers,
            with_pod_spec_metadata,
        )

        hdrs = dict(pod_headers())
        if pod_fetcher is not None and r.kube_metadata_fields:
            out = with_pod_spec_metadata(out, pod_fetcher)
            leaf_keys = tuple(p.strip().split(":")[-1]
                              for p in r.kube_metadata_fields.split(",")
                              if p.strip())
            hdrs.update(pod_spec_headers(leaf_keys))
        if "headers" in out.columns:
            kv = [x for k, v in hdrs.items()
                  for x in (F.lit(k), v.cast("binary"))]
            # first-wins merge (the reference's putIfAbsent semantics):
            # drop injected keys already present in the row's map — a
            # bare map_concat would THROW under the default
            # spark.sql.mapKeyDedupPolicy=EXCEPTION when a static cfg
            # header collides with a kube leaf key, killing the query
            inj = F.map_filter(
                F.create_map(*kv),
                lambda k, _v: ~F.array_contains(
                    F.map_keys(F.col("headers")), k))
            out = out.withColumn(
                "headers", F.map_concat("headers", inj))
        else:
            out = inject_headers(out, hdrs)
    w = cfg.writer
    part_name = w.partitioner
    if part_name is None and w.type in ("kafka", "kafka_direct"):
        part_name = "crc32"  # the reference's default Kafka partitioner
    if w.type in ("kafka", "kafka_direct", "pulsar") and part_name:
        import inspect

        key = F.col("key") if "key" in out.columns else F.col("value")
        fn = get_partitioner(part_name)
        kwargs = {}
        # locality-aware partitioners take the provider-fed local list
        # (config carries it; a LocalityProvider refreshes it on rebuild)
        if "local_partitions" in inspect.signature(fn).parameters:
            kwargs["local_partitions"] = w.local_partitions
        out = out.withColumn("partition", fn(key, w.num_partitions, **kwargs))
    return out


class PipelineManager:
    """The DefaultLogMonitor/LogStreamManager analog: owns the query registry."""

    def __init__(self, spark: SparkSession, config: SingerConfig | None = None,
                 checkpoint_root: str | None = None,
                 decider: Decider | None = None,
                 kafka_producer_factory=None,
                 pulsar_client_factory=None,
                 pod_fetcher=None,
                 properties_path: str | None = None,
                 conf_d: str | None = None) -> None:
        self.spark = spark
        self.config = config or SingerConfig()
        self.pod_fetcher = pod_fetcher
        # lazily-built kubelet fetchers, one per (pods_url, fields)
        self._pod_fetchers: dict[tuple, object] = {}
        self.checkpoint_root = checkpoint_root or tempfile.mkdtemp(prefix="singer_ckpt_")
        self.queries: dict[str, StreamingQuery] = {}
        self.decider = decider or Decider(None)
        self.kafka_producer_factory = kafka_producer_factory
        self.pulsar_client_factory = pulsar_client_factory
        self._draining = False
        # O4 live reload: watched config files (None → reload disabled)
        self.properties_path = str(properties_path) if properties_path else None
        self.conf_d = str(conf_d) if conf_d else None
        self._config_mtimes = self._snapshot_config_mtimes()
        # registry of the LogConfig/audit sink each query was started with,
        # so reload (O4) and failure restart (O6) can rebuild it
        self.log_configs: dict[str, LogConfig] = {}
        self._audit_sinks: dict[str, object] = {}
        # D7 MissingDirChecker: logs whose dir didn't exist at start time
        self.pending_dirs: dict[str, LogConfig] = {}
        # O6: per-query failure counters
        self.failures: dict[str, int] = {}

    # -- instance-level decider gate (T10/O2) ------------------------------
    def _instance_enabled(self, cfg: LogConfig) -> bool:
        import socket

        basis = f"{socket.gethostname()}:{cfg.name}"
        # live decider (per-log key) overrides the static config percent
        decider_key = f"singer_{cfg.name}_decider"
        if self.decider.path:
            return self.decider.is_enabled(decider_key, basis)
        pct = self.config.instance_sample_percent
        if pct >= 100:
            return True
        # deterministic per (host, log) like the reference's host-hashed decider
        return _percent_hash(basis) < pct

    def _pod_fetcher_for(self, cfg: LogConfig):
        """Kubelet fetcher for a pod-metadata log (D8): the injected one
        (tests pass a fake-server-backed instance) or one built lazily
        from the reader config's pods URL + field paths.  Lazy fetchers
        cache per (pods_url, fields) — a second LogConfig with a
        different URL or field set gets its OWN fetcher, never a silent
        reuse of the first log's."""
        r = cfg.reader
        if not r.pod_metadata:
            return None
        if self.pod_fetcher is not None:  # injected: shared by design
            return self.pod_fetcher
        if not r.kube_metadata_fields:
            return None
        from singer_spark.sources import PodMetadataFetcher

        fields = tuple(f.strip() for f in r.kube_metadata_fields.split(",")
                       if f.strip())
        key = (r.kube_pods_url, fields)
        if key not in self._pod_fetchers:
            self._pod_fetchers[key] = PodMetadataFetcher(
                pods_url=r.kube_pods_url, fields=fields)
        return self._pod_fetchers[key]

    def start_log(self, cfg: LogConfig, audit_sink=None) -> StreamingQuery | None:
        """Wire one LogConfig end-to-end and start its query.  A configured
        shadow destination (O8) starts a SECOND query on the same source
        with its own checkpoint — duplicate delivery to the shadow topic/
        path, unaudited, exactly the reference's shadow-serverset remap
        (config.thrift:524-532, SHADOW_MODE_ENABLED).

        A log whose directory doesn't exist yet is DEFERRED, not failed —
        it parks in `pending_dirs` and `check_missing_dirs` starts it when
        the dir appears (D7, monitor/MissingDirChecker.java:40-48: the
        SingerLog goes to singerLogsWithoutDir and a checker thread retries
        initializeLogStreams once the dir exists)."""
        if not self._instance_enabled(cfg):
            return None
        self.log_configs[cfg.name] = cfg
        self._audit_sinks[cfg.name] = audit_sink
        if not os.path.isdir(cfg.log_dir):
            self.pending_dirs[cfg.name] = cfg
            return None
        self.pending_dirs.pop(cfg.name, None)
        ckpt = cfg.checkpoint_dir or os.path.join(self.checkpoint_root, cfg.name)
        df = build_transforms(build_source(self.spark, cfg), cfg,
                              pod_fetcher=self._pod_fetcher_for(cfg))
        writer = self._build_writer(cfg, df, ckpt, audit_sink)
        query = writer.queryName(cfg.name).start()
        self.queries[cfg.name] = query
        shadow_cfg = self._shadow_config(cfg)
        if shadow_cfg is not None:
            sdf = build_transforms(build_source(self.spark, shadow_cfg), shadow_cfg,
                                   pod_fetcher=self._pod_fetcher_for(shadow_cfg))
            sckpt = os.path.join(self.checkpoint_root, shadow_cfg.name)
            swriter = self._build_writer(shadow_cfg, sdf, sckpt, None)
            self.queries[shadow_cfg.name] = swriter.queryName(shadow_cfg.name).start()
        return query

    @staticmethod
    def _shadow_config(cfg: LogConfig) -> LogConfig | None:
        import dataclasses

        w = cfg.writer
        if not (w.shadow_topic or w.shadow_path):
            return None
        return dataclasses.replace(
            cfg,
            name=f"{cfg.name}_shadow",
            checkpoint_dir=None,
            writer=dataclasses.replace(
                w,
                topic=w.shadow_topic or w.topic,
                path=w.shadow_path or w.path,
                audit_topic=None, shadow_topic=None, shadow_path=None,
            ),
        )

    @staticmethod
    def _hot_key_cap(cfg: LogConfig):
        """Per-micro-batch hot-key guard (processor.maxEventsPerKey): keep
        at most N messages per key per trigger — queries.cap_events_per_key
        on the message key (payload as the fallback key).  The order
        columns append the source-position columns (path/pos for text
        tails, file/offset for thrift frames) so ties on the payload break
        on a DISTINCT total order — ordering by the partition column alone
        would make every row tie and which rows survive nondeterministic
        (ADVICE r6).  None when the knob is off."""
        mk = cfg.processor.max_events_per_key
        if not mk:
            return None
        from singer_spark.queries import cap_events_per_key

        def cap(batch_df: DataFrame) -> DataFrame:
            key = "key" if "key" in batch_df.columns else "value"
            order_cols = ["value"] + [c for c in ("path", "pos", "file", "offset")
                                      if c in batch_df.columns]
            return cap_events_per_key(batch_df, key, order_cols, mk)

        return cap

    def _build_writer(self, cfg: LogConfig, df: DataFrame, ckpt: str, audit_sink=None):
        w = cfg.writer
        cap = self._hot_key_cap(cfg)
        if cap is not None and w.type in ("kafka", "memory", "noop"):
            # the cap is a per-micro-batch frame transform, so it needs a
            # foreachBatch hook; these direct writeStream sinks have none.
            # Fail at config time — a guard that silently doesn't guard is
            # worse than an error the operator sees on deploy.
            raise ValueError(
                f"processor.maxEventsPerKey is not supported with "
                f"writer.type={w.type}; use kafka_direct, file, or pulsar")
        if w.type == "kafka":
            writer = sinks.kafka_sink(df, w.bootstrap_servers, w.topic, ckpt,
                                      producer_configs=w.producer_configs,
                                      trigger_seconds=cfg.processor.processing_interval_secs)
        elif w.type == "kafka_direct":
            # connector-free Kafka path (W1 twin); audited variant counts
            # after each successful producer flush — the reference's
            # accounting point (writer/KafkaWriter.java:641-693)
            if w.audit_topic and audit_sink is not None:
                factory, configs = self.kafka_producer_factory, w.producer_configs

                def write_kafka_batch(batch_df: DataFrame, batch_id: int) -> None:
                    sinks.kafka_write_batch(batch_df, w.bootstrap_servers, w.topic,
                                            factory, configs,
                                            transactional=w.transaction_enabled)

                writer = sinks.with_audit(df, w.audit_topic, ckpt,
                                          write_kafka_batch, audit_sink,
                                          batch_transform=cap)
            else:
                writer = sinks.kafka_direct_sink(df, w.bootstrap_servers, w.topic, ckpt,
                                                 self.kafka_producer_factory,
                                                 w.producer_configs,
                                                 transactional=w.transaction_enabled,
                                                 batch_transform=cap)
        elif w.type in ("file", "s3", "parquet", "text"):
            if w.audit_topic and audit_sink is not None:
                # audited file delivery: foreachBatch write + audit row (B5),
                # keeping the writer config the plain path gets — byte-based
                # size rollover (maxFileSizeMB fidelity) and the
                # minUploadTime trigger.  Batches land in per-batch-id dirs
                # so a replay overwrites instead of duplicating
                # (effectively-once; see sinks.write_batch_idempotent)
                path, fmt, size_mb = w.path, w.format, w.max_file_size_mb

                def write_batch(batch_df: DataFrame, batch_id: int) -> None:
                    sinks.write_batch_idempotent(batch_df, path, batch_id, fmt, size_mb)

                writer = sinks.with_audit(df, w.audit_topic, ckpt, write_batch,
                                          audit_sink, batch_transform=cap)
                if w.min_upload_seconds:
                    writer = writer.trigger(processingTime=f"{w.min_upload_seconds} seconds")
            elif cap is not None:
                # capped unaudited file delivery routes through the same
                # idempotent per-batch-dir writer (foreachBatch hook)
                path, fmt, size_mb = w.path, w.format, w.max_file_size_mb

                def write_capped(batch_df: DataFrame, batch_id: int) -> None:
                    sinks.write_batch_idempotent(cap(batch_df), path,
                                                 batch_id, fmt, size_mb)

                writer = (df.writeStream.foreachBatch(write_capped)
                          .option("checkpointLocation", ckpt))
                if w.min_upload_seconds:
                    writer = writer.trigger(processingTime=f"{w.min_upload_seconds} seconds")
            else:
                writer = sinks.file_sink(df, w.path, ckpt, fmt=w.format,
                                         min_upload_seconds=w.min_upload_seconds)
        elif w.type == "pulsar":
            # W4/P11: the partitioner-computed `partition` column routes to
            # sub-topic producers inside pulsar_write_batch (the reference's
            # MessageRouter-wrapping-partitioner composition)
            writer = sinks.pulsar_sink(df, w.bootstrap_servers, w.topic, ckpt,
                                       client_factory=self.pulsar_client_factory,
                                       batch_transform=cap)
        elif w.type == "memory":
            writer = sinks.memory_sink(df, cfg.name, ckpt)
        elif w.type == "noop":
            writer = sinks.noop_sink(df, ckpt)
        else:
            raise ValueError(f"unsupported writer type: {w.type}")
        return writer

    def start_all(self, audit_sink=None) -> None:
        for cfg in self.config.logs:
            self.start_log(cfg, audit_sink=audit_sink)

    # -- adaptive poll loop (B3) + retention (O5) + live decider (O2) ------
    def run_cycle(self, cfg: LogConfig, audit_sink=None) -> int:
        """One drain-everything-available cycle (Trigger.AvailableNow against
        the log's checkpoint — resumes where the last cycle stopped).
        Returns the number of input rows processed."""
        ckpt = cfg.checkpoint_dir or os.path.join(self.checkpoint_root, cfg.name)
        df = build_transforms(build_source(self.spark, cfg), cfg,
                              pod_fetcher=self._pod_fetcher_for(cfg))
        writer = self._build_writer(cfg, df, ckpt, audit_sink).trigger(availableNow=True)
        query = writer.queryName(cfg.name).start()
        self.queries[cfg.name] = query
        query.awaitTermination()
        rows = 0
        for p in query.recentProgress:
            if isinstance(p, str):
                p = json.loads(p)
            rows += int(p.get("numInputRows", 0) or 0)
        return rows

    def run_adaptive(self, cfg: LogConfig, audit_sink=None, cycles: int = 1,
                     sleep_fn=time.sleep) -> list[dict]:
        """The reference's poll loop (B3,
        processor/DefaultLogStreamProcessor.java:365-402): each cycle drains
        everything available, then sleeps.  An EMPTY cycle doubles the sleep
        up to ``max_processing_interval_secs``; a cycle that saw data resets
        it to ``processing_interval_secs``.  After every drained cycle,
        retention (O5) deletes log files older than
        ``log_retention_seconds``, and the live decider (O2) is re-read — a
        disabled log skips processing but keeps polling at the backoff
        ceiling.  Returns per-cycle
        {rows, interval_secs, deleted, enabled} for observability/tests."""
        p = cfg.processor
        interval = p.processing_interval_secs
        history: list[dict] = []
        for _ in range(cycles):
            enabled = self._instance_enabled(cfg)
            failed = False
            try:
                rows = self.run_cycle(cfg, audit_sink) if enabled else 0
            except Exception:
                # O6: a failed cycle counts against num_failures_allowed;
                # within the allowance the NEXT cycle re-creates the query
                # from the same checkpoint (the failed micro-batch re-runs —
                # at-least-once), beyond it the error surfaces
                # (writer/KafkaWriter.java:598-602)
                self.failures[cfg.name] = self.failures.get(cfg.name, 0) + 1
                if not (self.config.restart_on_failures
                        and self.failures[cfg.name] <= self.config.num_failures_allowed):
                    raise
                self.queries.pop(cfg.name, None)
                failed, rows = True, 0
            if rows > 0:
                interval = p.processing_interval_secs   # reset on data
            else:
                interval = min(max(interval, 1) * 2, p.max_processing_interval_secs)
            # retention must only touch files THIS query's source glob covers:
            # a second LogConfig sharing log_dir with a different glob has its
            # own drain schedule, and deleting its files here would be silent
            # data loss (the drained-implies-processed invariant only holds
            # per-glob)
            # ... and never after a FAILED cycle — the drained-implies-
            # processed invariant doesn't hold for it
            deleted = (enforce_retention(cfg.log_dir, p.log_retention_seconds,
                                         glob=cfg.log_stream_regex)
                       if enabled and not failed else [])
            history.append({"rows": rows, "interval_secs": interval,
                            "deleted": deleted, "enabled": enabled,
                            "failed": failed})
            sleep_fn(interval)
        return history

    # -- O4 config live reload ---------------------------------------------
    def _snapshot_config_mtimes(self) -> dict[str, float]:
        """mtimes of singer.properties + every conf.d/*.properties — the
        cheap change probe (same mtime-gate pattern as Decider._maybe_reload;
        the reference polls and re-parses on an interval,
        config/SingerDirectoryWatcher.java:66-90)."""
        snap: dict[str, float] = {}
        paths = []
        if self.properties_path:
            paths.append(Path(self.properties_path))
        if self.conf_d:
            paths.extend(sorted(Path(self.conf_d).glob("*.properties")))
        for p in paths:
            try:
                snap[str(p)] = os.path.getmtime(p)
            except OSError:
                pass  # deleted between glob and stat — next poll sees truth
        return snap

    def poll_config_changes(self) -> dict[str, list[str]]:
        """Re-read the watched config if any file changed, then reconcile:
        restart queries whose LogConfig CHANGED (stop → rebuild from the
        same checkpoint, so delivery resumes exactly where it left off),
        start NEW logs, stop REMOVED ones.  Unchanged queries keep running —
        finer-grained than the reference, which exits the whole agent on any
        config change and relies on the supervisor to restart it
        (config/SingerDirectoryWatcher.java:72-90,
        config/DirectorySingerConfigurator.java).  Returns the actions taken.
        """
        from singer_spark.config import load_singer_config

        actions: dict[str, list[str]] = {"restarted": [], "started": [],
                                         "stopped": [], "failed": []}
        if not self.properties_path:
            return actions
        snap = self._snapshot_config_mtimes()
        if snap == self._config_mtimes:
            return actions
        try:
            new_config = load_singer_config(self.properties_path, self.conf_d)
        except (OSError, ValueError):
            return actions  # half-written config must not flap the agent
        self._config_mtimes = snap
        new_logs = {c.name: c for c in new_config.logs}
        old_logs = dict(self.log_configs)
        # preserve agent-level knobs parsed from singer.properties
        self.config = new_config

        def guarded_start(cfg, bucket: str) -> None:
            # one bad conf.d entry (typo'd writer type, unbuildable reader)
            # must not take down the healthy pipelines — record and move on
            try:
                self.start_log(cfg, audit_sink=self._audit_sinks.get(cfg.name))
                actions[bucket].append(cfg.name)
            except Exception as e:
                import sys

                sys.stderr.write(
                    f"singer_spark: config reload could not start {cfg.name}: {e}\n")
                actions["failed"].append(cfg.name)

        for name, cfg in new_logs.items():
            if name not in old_logs:
                guarded_start(cfg, "started")
            elif cfg != old_logs[name]:
                self._stop_query(name)
                guarded_start(cfg, "restarted")
        for name in old_logs:
            if name not in new_logs:
                self._stop_query(name)
                self.log_configs.pop(name, None)
                self.pending_dirs.pop(name, None)
                actions["stopped"].append(name)
        return actions

    def _stop_query(self, name: str, timeout_secs: int = 60) -> None:
        """Stop a query (and its shadow twin) if running."""
        for qname in (name, f"{name}_shadow"):
            q = self.queries.pop(qname, None)
            if q is not None and q.isActive:
                q.stop()
                q.awaitTermination(timeout_secs)

    # -- D7 MissingDirChecker ----------------------------------------------
    def check_missing_dirs(self) -> list[str]:
        """Start every parked log whose directory has appeared (D7,
        monitor/MissingDirChecker.java:40-48).  Returns the names started."""
        started = []
        for name, cfg in list(self.pending_dirs.items()):
            if os.path.isdir(cfg.log_dir):
                try:
                    q = self.start_log(cfg, audit_sink=self._audit_sinks.get(name))
                except Exception as e:  # isolate one broken log (see reload)
                    import sys

                    sys.stderr.write(
                        f"singer_spark: deferred start of {name} failed: {e}\n")
                    continue
                if q is not None:
                    started.append(name)
        return started

    # -- O6 restart-after-failure ------------------------------------------
    def supervise_once(self) -> dict[str, list[str]]:
        """Restart queries that terminated with an exception, from their own
        checkpoint (at-least-once: the failed micro-batch re-runs).  A query
        that has failed more than ``num_failures_allowed`` times stays down
        and is reported — the reference counterpart counts failures and
        triggers an agent-level restart beyond the allowance
        (writer/KafkaWriter.java:598-602, monitor/DefaultLogMonitor.java:
        499-507 daily/failure restart)."""
        actions: dict[str, list[str]] = {"restarted": [], "gave_up": [], "failed": []}
        if not self.config.restart_on_failures:
            return actions
        for name, q in list(self.queries.items()):
            if self.queries.get(name) is not q:
                continue  # replaced by an earlier restart in this same pass
            if q.isActive or q.exception() is None:
                continue
            base = name.removesuffix("_shadow")
            cfg = self.log_configs.get(base)
            if cfg is None:
                self.queries.pop(name, None)
                continue
            # failures count per LOG (a main+shadow pair dying together is
            # ONE failure, and the pair restarts as a unit)
            self.failures[base] = self.failures.get(base, 0) + 1
            self._stop_query(base)  # clears both registry entries
            if self.failures[base] > self.config.num_failures_allowed:
                actions["gave_up"].append(base)
                continue
            try:
                self.start_log(cfg, audit_sink=self._audit_sinks.get(base))
            except Exception as e:  # one broken log must not kill the loop
                import sys

                sys.stderr.write(f"singer_spark: restart of {base} failed: {e}\n")
                actions["failed"].append(base)
                continue
            actions["restarted"].append(base)
        return actions

    def run_watchers(self, stop_event, interval_secs: float | None = None,
                     sleep_fn=time.sleep) -> None:
        """One maintenance loop standing in for the reference's three daemon
        threads (SingerDirectoryWatcher + MissingDirChecker + restart
        monitor): poll config changes, start parked logs, restart failed
        queries — until `stop_event` is set.  Run it in a caller-owned
        thread; every step is also callable directly (tests do)."""
        interval = interval_secs or self.config.log_config_poll_interval_secs
        while not stop_event.is_set():
            self.poll_config_changes()
            self.check_missing_dirs()
            self.supervise_once()
            sleep_fn(interval)

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
