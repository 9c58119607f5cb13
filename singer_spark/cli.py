"""Agent entry point — the SingerMain analog (reference
singer/src/main/java/com/pinterest/singer/SingerMain.java:150-172).

Startup sequence (SURVEY.md §3.1): load `singer.properties` + `conf.d/*`
into SingerConfig, start one streaming query per log via PipelineManager,
start the heartbeat publisher, then run until SIGTERM/SIGINT — on which it
drains (process-all-then-stop, the admin `stop` semantics) and exits.

Usage:
  python -m singer_spark.cli --config-dir /etc/singer [--drain-and-exit]

`--drain-and-exit` processes everything currently on disk and stops — the
batch-like mode used by tests and backfills.
"""

from __future__ import annotations

import argparse
import signal
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-dir", required=True,
                   help="directory with singer.properties and conf.d/")
    p.add_argument("--checkpoint-root", default=None)
    p.add_argument("--drain-and-exit", action="store_true",
                   help="process available data, then stop (backfill mode)")
    p.add_argument("--heartbeat-interval", type=int, default=None,
                   help="override heartbeatIntervalInSeconds")
    p.add_argument("--admin-port", type=int, default=None,
                   help="start the admin HTTP endpoint (O3) on this loopback "
                        "port; 0 picks an ephemeral port (printed to stderr)")
    p.add_argument("--admin-socket", default=None, metavar="PATH",
                   help="serve the admin endpoint over an AF_UNIX socket at "
                        "PATH instead of TCP (the reference's "
                        "singer.admin.socket shape)")
    p.add_argument("--decider-file", default=None,
                   help="mtime-watched decider JSON (O2) gating per-log starts")
    p.add_argument("--metrics", action="store_true",
                   help="emit OpenTSDB put lines (O7) to stderr per micro-batch")
    args = p.parse_args(argv)

    from singer_spark.config import load_singer_config
    from singer_spark.engine import Decider, PipelineManager
    from singer_spark.heartbeat import HeartbeatPublisher
    from singer_spark.session import get_spark

    import os

    properties_path = os.path.join(args.config_dir, "singer.properties")
    conf_d = os.path.join(args.config_dir, "conf.d")
    cfg = load_singer_config(properties_path, conf_d)
    spark = get_spark("singer_spark_agent")
    manager = PipelineManager(spark, cfg, checkpoint_root=args.checkpoint_root,
                              decider=Decider(args.decider_file),
                              properties_path=properties_path, conf_d=conf_d)
    admin = None
    if args.admin_socket is not None:
        from singer_spark.admin import AdminServer

        admin = AdminServer(manager, socket_path=args.admin_socket).start()
        print(f"singer-spark agent: admin endpoint on unix socket "
              f"{args.admin_socket}", file=sys.stderr)
    elif args.admin_port is not None:
        from singer_spark.admin import AdminServer

        admin = AdminServer(manager, port=args.admin_port).start()
        print(f"singer-spark agent: admin endpoint on 127.0.0.1:{admin.port}",
              file=sys.stderr)
    metrics_listener = None
    if args.metrics:
        from singer_spark.metrics import MetricsListener

        metrics_listener = MetricsListener(emit=lambda line: print(line, file=sys.stderr))
        spark.streams.addListener(metrics_listener)
    manager.start_all()
    started = [n for n in manager.queries]
    print(f"singer-spark agent: started {len(started)} stream(s): {', '.join(started)}",
          file=sys.stderr)

    interval = args.heartbeat_interval or cfg.heartbeat_interval_secs or 60
    heartbeat = HeartbeatPublisher(
        spark, emit=lambda status: print(status, file=sys.stderr),
        interval_secs=interval)
    if cfg.heartbeat_enabled:
        heartbeat.start()

    def shutdown() -> None:
        manager.drain()
        heartbeat.stop()
        if admin is not None:
            admin.stop()
        if metrics_listener is not None:
            spark.streams.removeListener(metrics_listener)
        print("singer-spark agent: drained and stopped", file=sys.stderr)

    if args.drain_and_exit:
        shutdown()
        return 0

    stop_requested = {"flag": False}

    def on_signal(signum, frame):  # noqa: ARG001
        stop_requested["flag"] = True

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)
    # maintenance cadence: config reload (O4) + missing dirs (D7) + failure
    # restart (O6) every logConfigPollIntervalSecs; liveness log every second
    poll_every = max(1, cfg.log_config_poll_interval_secs)
    last_poll = 0.0
    try:
        while not stop_requested["flag"]:
            now = time.monotonic()
            if now - last_poll >= poll_every:
                last_poll = now
                for kind, names in manager.poll_config_changes().items():
                    if names:
                        print(f"singer-spark agent: config reload {kind}: "
                              f"{', '.join(names)}", file=sys.stderr)
                for n in manager.check_missing_dirs():
                    print(f"singer-spark agent: log dir appeared, started {n}",
                          file=sys.stderr)
                sup = manager.supervise_once()
                for n in sup["restarted"]:
                    print(f"singer-spark agent: restarted failed query {n}",
                          file=sys.stderr)
                for n in sup["gave_up"]:
                    print(f"singer-spark agent: query {n} exceeded "
                          f"numOfFailuesAllowed, staying down", file=sys.stderr)
            dead = [n for n, q in manager.queries.items() if not q.isActive]
            for n in dead:
                print(f"singer-spark agent: query {n} terminated: "
                      f"{manager.queries[n].exception()}", file=sys.stderr)
            time.sleep(1)
    finally:
        shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
