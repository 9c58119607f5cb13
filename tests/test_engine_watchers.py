"""O4 config live reload, D7 MissingDirChecker, O6 restart-after-failures.

Models the reference's daemon threads: SingerDirectoryWatcher re-parses the
config on an interval and restarts on change; MissingDirChecker parks logs
whose dir doesn't exist and starts them when it appears; SingerRestartConfig
counts failures and restarts within an allowance."""

from __future__ import annotations

import json
import os
import uuid

from singer_spark.config import (LogConfig, ProcessorConfig, SingerConfig,
                                 WriterConfig, load_singer_config)
from singer_spark.engine import PipelineManager


def _write_lines(path, lines):
    with open(path, "a") as f:
        f.writelines(x + "\n" for x in lines)


def _props(conf_dir, name, log_dir, out_dir, filter_regex=None):
    lines = [
        f"log_dir={log_dir}",
        "logStreamRegex=*.log",
        "reader.type=text",
        "writer.type=file",
        f"writer.path={out_dir}",
        "writer.format=parquet",
        "writer.minUploadSeconds=0",
    ]
    if filter_regex:
        lines.append(f"reader.filterMessageRegex={filter_regex}")
    p = os.path.join(conf_dir, f"{name}.properties")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def _bump_mtime(path):
    st = os.stat(path)
    os.utime(path, (st.st_atime, st.st_mtime + 2))


# ---------------------------------------------------------------------------
# O4 — live config reload
# ---------------------------------------------------------------------------
def test_config_reload_restarts_changed_query(spark, tmp_path):
    conf_d = str(tmp_path / "conf.d")
    log_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(conf_d)
    os.makedirs(log_dir)
    props = str(tmp_path / "singer.properties")
    with open(props, "w") as f:
        f.write("singer.heartbeatEnabled=false\n")
    conf = _props(conf_d, "app", log_dir, out_dir)

    cfg = load_singer_config(props, conf_d)
    mgr = PipelineManager(spark, config=cfg, properties_path=props, conf_d=conf_d,
                          checkpoint_root=str(tmp_path / "ckpt"))
    mgr.start_all()
    _write_lines(os.path.join(log_dir, "a.log"), ["keep 1", "drop 1", "keep 2"])
    mgr.queries["app"].processAllAvailable()
    assert spark.read.parquet(out_dir).count() == 3

    # no file change → no-op (mtime fast path)
    assert mgr.poll_config_changes() == {"restarted": [], "started": [],
                                         "stopped": [], "failed": []}
    old_query = mgr.queries["app"]

    # edit conf.d: add a filter; only the changed query restarts
    _props(conf_d, "app", log_dir, out_dir, filter_regex="keep")
    _bump_mtime(conf)
    actions = mgr.poll_config_changes()
    assert actions["restarted"] == ["app"] and not actions["stopped"]
    assert mgr.queries["app"] is not old_query
    assert mgr.log_configs["app"].reader.filter_message_regex == "keep"

    # the restarted query resumes from the same checkpoint: old rows are NOT
    # re-delivered, and the new filter applies to new data only (a new file —
    # the whole-file source tracks files; sub-file appends are the tail
    # reader's job)
    _write_lines(os.path.join(log_dir, "b.log"), ["keep 3", "drop 2"])
    mgr.queries["app"].processAllAvailable()
    mgr.drain()
    vals = {r["value"] for r in spark.read.parquet(out_dir).collect()}
    assert vals == {"keep 1", "drop 1", "keep 2", "keep 3"}


def test_config_reload_starts_new_and_stops_removed(spark, tmp_path):
    conf_d = str(tmp_path / "conf.d")
    os.makedirs(conf_d)
    props = str(tmp_path / "singer.properties")
    with open(props, "w") as f:
        f.write("singer.heartbeatEnabled=false\n")
    dirs = {}
    for name in ("one", "two"):
        dirs[name] = (str(tmp_path / f"{name}_in"), str(tmp_path / f"{name}_out"))
        os.makedirs(dirs[name][0])
    conf_one = _props(conf_d, "one", *dirs["one"])

    mgr = PipelineManager(spark, config=load_singer_config(props, conf_d),
                          properties_path=props, conf_d=conf_d,
                          checkpoint_root=str(tmp_path / "ckpt"))
    mgr.start_all()
    assert set(mgr.queries) == {"one"}

    # add `two`, drop `one`
    _props(conf_d, "two", *dirs["two"])
    os.remove(conf_one)
    actions = mgr.poll_config_changes()
    assert actions["started"] == ["two"] and actions["stopped"] == ["one"]
    assert set(mgr.queries) == {"two"} and "one" not in mgr.log_configs
    mgr.drain()


# ---------------------------------------------------------------------------
# D7 — MissingDirChecker
# ---------------------------------------------------------------------------
def test_missing_dir_starts_delivering_after_mkdir(spark, tmp_path):
    log_dir = str(tmp_path / "not_yet")
    out_dir = str(tmp_path / "out")
    cfg = LogConfig(
        name="late_dir", log_dir=log_dir, log_stream_regex="*.log",
        writer=WriterConfig(type="file", path=out_dir, format="parquet",
                            min_upload_seconds=0),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    mgr = PipelineManager(spark)
    assert mgr.start_log(cfg) is None
    assert "late_dir" in mgr.pending_dirs and "late_dir" not in mgr.queries
    assert mgr.check_missing_dirs() == []  # still absent

    os.makedirs(log_dir)
    _write_lines(os.path.join(log_dir, "a.log"), ["m 1", "m 2"])
    assert mgr.check_missing_dirs() == ["late_dir"]
    assert "late_dir" not in mgr.pending_dirs
    mgr.queries["late_dir"].processAllAvailable()
    mgr.drain()
    assert spark.read.parquet(out_dir).count() == 2


# ---------------------------------------------------------------------------
# O6 — restart after N failures
# ---------------------------------------------------------------------------
def make_flaky_producer_factory(out_dir: str, ok_marker: str):
    """Producer that raises until `ok_marker` exists — a broker outage that
    heals.  Delivered records land as JSONL on flush (executor-side)."""

    class FlakyProducer:
        def __init__(self):
            self.pending = []

        def send(self, topic, value=None, key=None, headers=None, partition=None):
            if not os.path.exists(ok_marker):
                raise RuntimeError("broker down")
            self.pending.append({"topic": topic, "value": value.decode("utf-8")})

        def flush(self):
            path = os.path.join(out_dir, f"flush-{uuid.uuid4().hex}.jsonl")
            with open(path, "w") as f:
                for rec in self.pending:
                    f.write(json.dumps(rec) + "\n")

        def close(self):
            pass

    return lambda servers, configs: FlakyProducer()


def _delivered(out_dir):
    recs = []
    for name in os.listdir(out_dir):
        if name.startswith("flush-"):
            with open(os.path.join(out_dir, name)) as f:
                recs += [json.loads(x) for x in f]
    return recs


def test_supervise_restarts_failed_streaming_query(spark, tmp_path):
    log_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "sent")
    os.makedirs(log_dir)
    os.makedirs(out_dir)
    marker = str(tmp_path / "broker_up")

    cfg = LogConfig(
        name="flaky", log_dir=log_dir, log_stream_regex="*.log",
        writer=WriterConfig(type="kafka_direct", topic="t",
                            bootstrap_servers="b:9092"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    mgr = PipelineManager(
        spark,
        config=SingerConfig(restart_on_failures=True, num_failures_allowed=3),
        kafka_producer_factory=make_flaky_producer_factory(out_dir, marker),
    )
    q = mgr.start_log(cfg)
    _write_lines(os.path.join(log_dir, "a.log"), ["m 1", "m 2"])
    try:
        q.processAllAvailable()
    except Exception:
        pass  # the sink failure terminates the query
    assert not q.isActive and q.exception() is not None

    open(marker, "w").close()  # broker heals
    actions = mgr.supervise_once()
    assert actions["restarted"] == ["flaky"] and mgr.failures["flaky"] == 1
    mgr.queries["flaky"].processAllAvailable()
    mgr.drain()
    # the failed micro-batch re-ran from the checkpoint: both rows delivered
    assert sorted(r["value"] for r in _delivered(out_dir)) == ["m 1", "m 2"]


def test_supervise_gives_up_beyond_allowance(spark, tmp_path):
    log_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "sent")
    os.makedirs(log_dir)
    os.makedirs(out_dir)

    cfg = LogConfig(
        name="dead", log_dir=log_dir, log_stream_regex="*.log",
        writer=WriterConfig(type="kafka_direct", topic="t",
                            bootstrap_servers="b:9092"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    mgr = PipelineManager(
        spark,
        config=SingerConfig(restart_on_failures=True, num_failures_allowed=0),
        kafka_producer_factory=make_flaky_producer_factory(
            out_dir, str(tmp_path / "never")),
    )
    q = mgr.start_log(cfg)
    _write_lines(os.path.join(log_dir, "a.log"), ["m 1"])
    try:
        q.processAllAvailable()
    except Exception:
        pass
    actions = mgr.supervise_once()
    assert actions == {"restarted": [], "gave_up": ["dead"], "failed": []}
    assert "dead" not in mgr.queries


def test_run_adaptive_counts_failures_and_recovers(spark, tmp_path):
    log_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "sent")
    os.makedirs(log_dir)
    os.makedirs(out_dir)
    marker = str(tmp_path / "broker_up")

    cfg = LogConfig(
        name="cycles", log_dir=log_dir, log_stream_regex="*.log",
        writer=WriterConfig(type="kafka_direct", topic="t",
                            bootstrap_servers="b:9092"),
        processor=ProcessorConfig(processing_interval_secs=1,
                                  max_processing_interval_secs=4),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    mgr = PipelineManager(
        spark,
        config=SingerConfig(restart_on_failures=True, num_failures_allowed=2),
        kafka_producer_factory=make_flaky_producer_factory(out_dir, marker),
    )
    _write_lines(os.path.join(log_dir, "a.log"), ["m 1", "m 2"])

    def heal_then_noop(_secs):
        open(marker, "w").close()

    hist = mgr.run_adaptive(cfg, cycles=2, sleep_fn=heal_then_noop)
    assert hist[0]["failed"] and hist[0]["rows"] == 0
    assert not hist[1]["failed"] and hist[1]["rows"] == 2
    assert sorted(r["value"] for r in _delivered(out_dir)) == ["m 1", "m 2"]
