"""Agent CLI e2e: config dir → streams → drain — the SingerMain lifecycle
(SURVEY.md §3.1) driven through singer_spark.cli in backfill mode."""

from __future__ import annotations

import os

from singer_spark import cli


def test_cli_drain_and_exit_delivers_text_log(tmp_path, spark):
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    (log_dir / "app.log").write_text("".join(f"line {i}\n" for i in range(25)))
    out_dir = str(tmp_path / "out")

    conf = tmp_path / "etc"
    conf.mkdir()
    (conf / "singer.properties").write_text(
        "singer.heartbeatEnabled=false\n"
    )
    conf_d = conf / "conf.d"
    conf_d.mkdir()
    (conf_d / "app.properties").write_text(
        f"logDir={log_dir}\n"
        "logStreamRegex=app.log*\n"
        "reader.type=text\n"
        "writer.type=file\n"
        "writer.format=parquet\n"
        f"writer.path={out_dir}\n"
    )

    rc = cli.main([
        "--config-dir", str(conf),
        "--checkpoint-root", str(tmp_path / "ckpt"),
        "--drain-and-exit",
    ])
    assert rc == 0
    delivered = spark.read.parquet(out_dir)
    assert delivered.count() == 25
    values = {r.value for r in delivered.select("value").collect()}
    assert "line 0" in {v.decode() if isinstance(v, (bytes, bytearray)) else v for v in values}
