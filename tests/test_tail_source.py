"""Sub-file tailing source (S7/S2): incremental delivery from GROWING files,
per-inode byte offsets, exactly-once across kill/restart — the reference
behaviors of reader/DefaultLogStreamReader.java:44-216 and
reader/ThriftReader.java:74-151 (seekable offset resume)."""

from __future__ import annotations

import os

from singer_spark.streaming.tail import tail_stream


def _append(path: str, data: str) -> None:
    with open(path, "a") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())


def _drain(spark, log_dir, ckpt, table, **kw):
    """One availableNow micro-batch cycle into a parquet sink, resuming from
    the checkpoint — the run_cycle pattern, so restarts are real restarts
    (the memory sink can't recover from a checkpoint)."""
    out = os.path.join(os.path.dirname(ckpt), f"{table}_out")
    q = (tail_stream(spark, log_dir, **kw).writeStream
         .format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    q.stop()
    return [(r.value, r.pos) for r in
            spark.read.parquet(out).orderBy("pos").collect()]


def test_tail_delivers_appends_and_holds_partial_lines(spark, tmp_path):
    d = str(tmp_path / "logs")
    os.makedirs(d)
    ckpt = str(tmp_path / "ckpt")
    log = f"{d}/app.log"
    _append(log, "line one\nline two\npart")  # open partial tail line

    got = _drain(spark, d, ckpt, "tail_t1")
    assert [v for v, _ in got] == ["line one", "line two"]  # partial held back

    # the writer finishes the line and appends more — ONLY the new frames
    # arrive, from the remembered byte offset
    _append(log, "ial done\nline four\n")
    got = _drain(spark, d, ckpt, "tail_t1")
    assert [v for v, _ in got] == ["line one", "line two", "partial done", "line four"]
    # offsets are the true file positions
    assert got[2][1] == len("line one\nline two\n")


def test_tail_exactly_once_across_restart(spark, tmp_path):
    d = str(tmp_path / "logs")
    os.makedirs(d)
    ckpt = str(tmp_path / "ckpt")
    _append(f"{d}/a.log", "m1\nm2\n")
    assert [v for v, _ in _drain(spark, d, ckpt, "tail_t2")] == ["m1", "m2"]

    # "kill": the query object is gone; a NEW query on the SAME checkpoint
    # must pick up only what arrived since — no duplicates, no loss
    _append(f"{d}/a.log", "m3\n")
    assert [v for v, _ in _drain(spark, d, ckpt, "tail_t2")] == ["m1", "m2", "m3"]
    # nothing new → empty batch, still no duplicates
    assert [v for v, _ in _drain(spark, d, ckpt, "tail_t2")] == ["m1", "m2", "m3"]


def test_tail_rotation_by_rename_keeps_offset(spark, tmp_path):
    d = str(tmp_path / "logs")
    os.makedirs(d)
    ckpt = str(tmp_path / "ckpt")
    _append(f"{d}/app.log", "old1\nold2\n")
    got = _drain(spark, d, ckpt, "tail_t3", glob="app.log*")
    assert [v for v, _ in got] == ["old1", "old2"]

    # rotate: rename keeps the inode → offset survives; writer appends to the
    # ROTATED file before switching, then a fresh app.log starts at 0
    os.rename(f"{d}/app.log", f"{d}/app.log.1")
    _append(f"{d}/app.log.1", "old3\n")
    _append(f"{d}/app.log", "new1\n")
    got = _drain(spark, d, ckpt, "tail_t3", glob="app.log*")
    vals = sorted(v for v, _ in got)
    assert vals == ["new1", "old1", "old2", "old3"]  # old3 once — not re-read


def test_tail_chunked_catchup_reads_each_line_once(spark, tmp_path):
    d = str(tmp_path / "logs")
    os.makedirs(d)
    lines = [f"message number {i:04d}" for i in range(200)]
    _append(f"{d}/big.log", "".join(l + "\n" for l in lines))
    # tiny chunks force many partitions with split-boundary line handling
    got = _drain(spark, d, str(tmp_path / "ckpt"), "tail_t4", chunk_bytes=97)
    assert [v for v, _ in got] == lines


def test_tail_reader_through_pipeline_manager(spark, tmp_path):
    """E2e through the engine: a LogConfig with reader type 'tail' delivers
    appended frames exactly once across drain cycles (each run_cycle is a
    fresh query restarted from the checkpoint — a real kill/restart)."""
    from singer_spark.config import LogConfig, ProcessorConfig, ReaderConfig, WriterConfig
    from singer_spark.engine import PipelineManager

    d = str(tmp_path / "logs")
    os.makedirs(d)
    out = str(tmp_path / "out")
    cfg = LogConfig(
        name="tailed", log_dir=d, log_stream_regex="*.log",
        reader=ReaderConfig(type="tail"),
        writer=WriterConfig(type="file", path=out, format="parquet",
                            min_upload_seconds=0),
        processor=ProcessorConfig(processing_interval_secs=1,
                                  max_processing_interval_secs=4),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    mgr = PipelineManager(spark)
    _append(f"{d}/app.log", "first\nsecond\nhalf")
    assert mgr.run_cycle(cfg) == 2  # the partial line is held back
    _append(f"{d}/app.log", "-done\n")
    assert mgr.run_cycle(cfg) == 1  # only the completed frame, exactly once
    vals = sorted(r.value for r in spark.read.parquet(out).collect())
    assert vals == ["first", "half-done", "second"]


def test_tail_truncated_file_is_reread(spark, tmp_path):
    d = str(tmp_path / "logs")
    os.makedirs(d)
    ckpt = str(tmp_path / "ckpt")
    _append(f"{d}/t.log", "a1\na2\n")
    assert [v for v, _ in _drain(spark, d, ckpt, "tail_t5")] == ["a1", "a2"]
    # truncate-and-reuse (copytruncate rotation): content restarts
    with open(f"{d}/t.log", "w") as f:
        f.write("b1\n")
    got = _drain(spark, d, ckpt, "tail_t5")
    assert sorted(v for v, _ in got) == ["a1", "a2", "b1"]  # b1 re-read from 0
