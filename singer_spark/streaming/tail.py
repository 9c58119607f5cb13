"""Sub-file tailing streaming source (S7/S2 completion).

The reference reads *growing* files incrementally — seek to a byte offset,
deliver what's there, remember the offset (reader/DefaultLogStreamReader.java
:44-216, reader/ThriftReader.java:74-151).  Spark's built-in file source
ingests a file only once it is listed, so an open, still-growing log's tail
would wait for rotation.  This module closes that gap with a
`pyspark.sql.datasource` streaming source:

- **Offsets are (inode → byte position) maps**, checkpointed by Spark like
  any other streaming offset, so a kill/restart resumes mid-file with no
  loss and no re-delivery, and a rotate-by-rename (same inode, new name
  still matching the glob) keeps its position — the reference's
  inode-tracked watermark (LogStream.java inode bookkeeping).
- **Only complete lines commit.**  `latestOffset` ends each file at the
  last newline (a bounded backward scan from EOF — O(64 KiB)/file/trigger,
  not O(appended bytes) driver I/O); a partial tail line stays pending
  until the writer finishes it.
- **Reads are distributed.**  A large appended range is split into
  ~`chunk_bytes` partitions with TextInputFormat semantics (a non-first
  chunk peeks one byte back to find its first line start; every chunk
  completes its last line past its end), so one multi-GB catch-up spreads
  over the cluster instead of one task.
- A file that *shrank* (truncate-and-reuse) is re-read from 0.
- Framed-thrift tailing would use the same offsets with
  `framing.scan_frame_chunks` boundaries instead of newlines; the text
  path is the reference's high-volume case and the one implemented here.

Returned schema: (value string, path string, pos bigint) — `pos` is the
line's start byte, so downstream ordering/audit can reconstruct file order.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

TAIL_SCHEMA = "value string, path string, pos bigint"
_SCAN_BACK = 65536


def _committed_end(path: str, size: int) -> int:
    """Largest offset <= size such that everything before it is complete
    lines: the position just after the last ``\\n``.  Backward chunked scan
    from EOF — stops at the first newline found, so steady-state cost is one
    small read regardless of how much was appended."""
    with open(path, "rb") as f:
        pos = size
        while pos > 0:
            lo = max(0, pos - _SCAN_BACK)
            f.seek(lo)
            buf = f.read(pos - lo)
            idx = buf.rfind(b"\n")
            if idx >= 0:
                return lo + idx + 1
            pos = lo
    return 0


class TailPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int, batch_start: int):
        self.path = path
        self.start = start
        self.end = end
        self.batch_start = batch_start  # first chunk of the batch starts exact


class TailStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.log_dir = options.get("path")
        if not self.log_dir:
            raise ValueError("singer_tail requires option 'path' (the log dir)")
        self.glob = options.get("glob", "*")
        self.chunk_bytes = int(options.get("chunk_bytes", 64 * 1024 * 1024))

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"files": {}}

    def latestOffset(self) -> dict:
        """Snapshot the directory: inode → (current path, committed end).
        Absolute, not delta — Spark diffs consecutive offsets itself, so a
        restart needs no reader-side state."""
        import fnmatch

        files: dict[str, dict] = {}
        try:
            names = os.listdir(self.log_dir)
        except FileNotFoundError:
            names = []
        for name in sorted(names):
            if not fnmatch.fnmatch(name, self.glob):
                continue
            p = os.path.join(self.log_dir, name)
            try:
                st = os.stat(p)
            except OSError:
                continue  # raced a delete/rotation — next trigger sees truth
            if not os.path.isfile(p):
                continue
            end = _committed_end(p, st.st_size) if st.st_size else 0
            files[str(st.st_ino)] = {"path": p, "off": end}
        return {"files": files}

    # -- planning ---------------------------------------------------------
    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts: list[InputPartition] = []
        prev = start.get("files", {})
        for ino, cur in end.get("files", {}).items():
            s = int(prev.get(ino, {}).get("off", 0))
            e = int(cur["off"])
            if e < s:
                s = 0  # truncated + reused: the old content is gone, re-read
            if e <= s:
                continue
            lo = s
            while lo < e:
                hi = min(lo + self.chunk_bytes, e)
                parts.append(TailPartition(cur["path"], lo, hi, s))
                lo = hi
        return parts

    # -- execution (runs on executors) --------------------------------------
    def read(self, partition: TailPartition) -> Iterator[tuple]:
        """TextInputFormat semantics over [start, end): a line belongs to the
        chunk containing its first byte.  A non-first chunk seeks one byte
        back — if that byte is a newline the chunk's first line starts
        exactly at `start`, otherwise skip the partial line (the previous
        chunk completes it past its own end)."""
        path, start, end = partition.path, partition.start, partition.end
        with open(path, "rb") as f:
            pos = start
            if start > partition.batch_start:
                f.seek(start - 1)
                if f.read(1) != b"\n":
                    skipped = f.readline()
                    pos = start + len(skipped)
                    if pos >= end:
                        return
            else:
                f.seek(start)
            while pos < end:
                line = f.readline()
                if not line:
                    break
                out = line[:-1] if line.endswith(b"\n") else line
                yield (out.decode("utf-8", errors="replace"), path, pos)
                pos += len(line)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing reader-side to GC


class TailDataSource(DataSource):
    """format("singer_tail"): tail growing log files with per-inode offsets."""

    @classmethod
    def name(cls) -> str:
        return "singer_tail"

    def schema(self) -> str:
        return TAIL_SCHEMA

    def streamReader(self, schema) -> TailStreamReader:
        return TailStreamReader(self.options)


def tail_stream(spark, log_dir: str, glob: str = "*",
                chunk_bytes: int = 64 * 1024 * 1024):
    """readStream over growing files in `log_dir` (registers the source)."""
    spark.dataSource.register(TailDataSource)
    return (
        spark.readStream.format("singer_tail")
        .option("path", log_dir)
        .option("glob", glob)
        .option("chunk_bytes", str(chunk_bytes))
        .load()
    )
