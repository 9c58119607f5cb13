"""Load generator + dumper for framed-thrift LogMessage files.

Parity with the reference tools (SURVEY.md §2.8 O9):
- `gen`  ≈ ThriftLogGenerator (tools/ThriftLogGenerator.java:60-175): write N
  messages across size-rotated files (app.log, app.log.1, ... — newest has
  the bare name, like logback rotation), with an optional messages/sec rate
  limit and JSON payloads shaped like the tutorial's LogWriter
  ({"timestamp": ..., "message": "..."}).
- `dump` ≈ ThriftLogDumper (tools/ThriftLogDumper.java:41+): decode a file
  and print (offset, key, timestamp, crc-ok, payload) per message.

Usage:
  python tools/loggen.py gen  <dir> --messages 10000 --max-file-bytes 1000000 [--rate 5000]
  python tools/loggen.py dump <file> [--max 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from singer_spark.framing import decode_frames, encode_log_message  # noqa: E402


def rotate(log_dir: str, base: str, keep: int) -> None:
    """logback-style rename rotation: base → base.1 → base.2 ..."""
    for i in range(keep - 1, 0, -1):
        src = os.path.join(log_dir, base if i == 1 else f"{base}.{i - 1}")
        dst = os.path.join(log_dir, f"{base}.{i}")
        if os.path.exists(src):
            os.replace(src, dst)


def generate(log_dir: str, base: str, n_messages: int, max_file_bytes: int,
             rate: float | None = None, keep: int = 10) -> int:
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, base)
    written = 0
    f = open(path, "ab")
    interval = (1.0 / rate) if rate else 0.0
    next_send = time.monotonic()
    try:
        for i in range(n_messages):
            if interval:
                now = time.monotonic()
                if now < next_send:
                    time.sleep(next_send - now)
                next_send += interval
            ts = time.time_ns()
            payload = json.dumps(
                {"timestamp": ts // 1_000_000, "message": f"singer-spark loggen message {i}"}
            ).encode("utf-8")
            frame = encode_log_message(payload, key=str(i).encode("ascii"),
                                       timestamp_nanos=ts, with_crc=True)
            if f.tell() + len(frame) > max_file_bytes and f.tell() > 0:
                f.close()
                rotate(log_dir, base, keep)
                f = open(path, "ab")
            f.write(frame)
            written += 1
    finally:
        f.close()
    return written


def dump(path: str, max_messages: int | None = None) -> int:
    with open(path, "rb") as f:
        blob = f.read()
    count = 0
    for key, msg, ts, crc, audit, offset in decode_frames(blob):
        crc_ok = crc is None or (zlib.crc32(msg) & 0xFFFFFFFF) == crc
        print(f"offset={offset} key={key!r} ts={ts} crc_ok={crc_ok} payload={msg[:120]!r}")
        count += 1
        if max_messages and count >= max_messages:
            break
    return count


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("log_dir")
    g.add_argument("--base", default="app.log")
    g.add_argument("--messages", type=int, default=10_000)
    g.add_argument("--max-file-bytes", type=int, default=1_000_000)
    g.add_argument("--rate", type=float, default=None, help="messages/sec cap")
    g.add_argument("--keep", type=int, default=10)
    d = sub.add_parser("dump")
    d.add_argument("file")
    d.add_argument("--max", type=int, default=None)
    args = p.parse_args()
    if args.cmd == "gen":
        n = generate(args.log_dir, args.base, args.messages, args.max_file_bytes,
                     args.rate, args.keep)
        print(f"wrote {n} messages to {args.log_dir}")
    else:
        n = dump(args.file, args.max)
        print(f"decoded {n} messages", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
