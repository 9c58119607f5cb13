"""Admin endpoint (O3) — parity with the reference's AdminServer
(admin/AdminServer.java:43-145): a tiny local listener operators hit to
drain or stop a running agent without killing the process.  The reference
accepts ``stop`` over a unix domain socket; this serves the same commands
(plus a status probe) as HTTP over EITHER transport — a 127.0.0.1 TCP
port (default) or an AF_UNIX socket (``socket_path=``, the reference's
``singer.admin.socket`` shape — filesystem-permission-scoped, no port).

  GET  /status  → {"queries": [names], "draining": bool}
  GET  /metrics → the heartbeat's SingerStatus dict on demand (per-query
                  latency percentiles, stuck counts, duplicatesSuspected)
  POST /drain   → process everything available on all queries, then stop
  POST /stop    → stop all queries immediately

Commands execute synchronously in the handler, so the HTTP response only
returns once the drain has completed — the same blocking contract the
reference's socket protocol gives a deploy script.
"""

from __future__ import annotations

import json
import os
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _UnixHTTPServer(ThreadingHTTPServer):
    """HTTP over an AF_UNIX stream socket (the docker-daemon pattern).

    Authorization matches the reference's AdminServer model
    (admin/AdminServer.java `allowedUids` via SO_PEERCRED): the socket
    file is created owner-only (0600 — a UDS connect requires write
    permission on the path), and an optional ``allowed_uids`` set is
    enforced per-connection against the kernel-reported peer uid, which
    a client cannot forge."""

    allowed_uids: frozenset | None = None

    address_family = socket.AF_UNIX

    def server_bind(self):
        # A socket file lingering from an unclean shutdown blocks bind —
        # but only unlink a STALE one.  UDS has no EADDRINUSE protection:
        # blindly unlinking would let a second agent configured with the
        # same path silently steal a live endpoint (and pointing the flag
        # at an arbitrary file would delete it).
        path = self.server_address
        try:
            st = os.stat(path)
        except (OSError, TypeError):
            st = None
        if st is not None:
            import stat as stat_mod

            if not stat_mod.S_ISSOCK(st.st_mode):
                raise OSError(f"admin socket path {path!r} exists and is "
                              "not a socket; refusing to unlink")
            probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            try:
                probe.settimeout(1.0)
                probe.connect(path)
            except OSError:
                os.unlink(path)  # stale: no listener behind it
            else:
                raise OSError(f"admin socket {path!r} already has a live "
                              "listener; refusing to steal it")
            finally:
                probe.close()
        # NOT HTTPServer.server_bind: that runs
        # `host, port = self.server_address[:2]` — on a UDS path string it
        # unpacks the first two CHARACTERS (getfqdn() on one character, a
        # possible DNS lookup; ValueError for 1-char paths).  Bind via the
        # socketserver layer and set the HTTP-layer names explicitly, with
        # an umask so the socket is never observable more open than 0600.
        import socketserver

        old_umask = os.umask(0o177)
        try:
            socketserver.TCPServer.server_bind(self)
        finally:
            os.umask(old_umask)
        os.chmod(path, 0o600)
        self.server_name = "localhost"
        self.server_port = 0

    def get_request(self):
        # AF_UNIX peers have no (host, port); BaseHTTPRequestHandler's
        # logging helpers index client_address[0], so fake a stable pair
        request, _addr = self.socket.accept()
        return request, ("unix", 0)

    def verify_request(self, request, client_address):
        # socketserver's per-connection gate: returning False makes the
        # server close the socket before any request bytes are read.  (Not
        # a loop inside get_request — that would leave serve_forever stuck
        # in accept() and deadlock shutdown().)
        if self.allowed_uids is None:
            return True
        import struct

        creds = request.getsockopt(socket.SOL_SOCKET, socket.SO_PEERCRED,
                                   struct.calcsize("3i"))
        _pid, uid, _gid = struct.unpack("3i", creds)
        return uid in self.allowed_uids


class AdminServer:
    """Wrap a PipelineManager (or anything with queries/drain/stop_all/
    is_draining) in a loopback control endpoint.  ``port=0`` binds an
    ephemeral port, exposed as ``.port`` for tests and for writing a
    port-file the way the reference writes its socket path.
    ``socket_path=`` serves the same HTTP protocol over an AF_UNIX
    socket instead (``.port`` is then None); the socket file is created
    0600 (owner-only), optionally restricted further to ``allowed_uids``
    via SO_PEERCRED (the reference's allowedUids model), and removed on
    ``stop()``."""

    def __init__(self, manager, host: str = "127.0.0.1", port: int = 0,
                 socket_path: str | None = None,
                 allowed_uids: set[int] | None = None) -> None:
        import time as time_mod

        mgr = manager
        started = time_mod.time()  # uptime base for /metrics

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 - http.server API
                if self.path == "/status":
                    self._send(200, {"queries": sorted(mgr.queries),
                                     "draining": mgr.is_draining()})
                elif self.path == "/metrics":
                    # the heartbeat's SingerStatus-shaped dict on demand
                    # (per-query latency percentiles, stuck counts,
                    # duplicatesSuspected) — the reference exposes its
                    # stats through the same admin surface deploy tooling
                    # polls (admin/AdminServer.java:43-145)
                    spark = getattr(mgr, "spark", None)
                    if spark is None:
                        self._send(404, {"error": "manager has no spark session"})
                    else:
                        from singer_spark.heartbeat import build_status

                        self._send(200, build_status(spark, started))
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self) -> None:  # noqa: N802 - http.server API
                if self.path == "/drain":
                    mgr.drain()
                    self._send(200, {"ok": True, "action": "drain"})
                elif self.path == "/stop":
                    mgr.stop_all()
                    self._send(200, {"ok": True, "action": "stop"})
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def log_message(self, *args) -> None:  # silence per-request noise
                pass

        self.socket_path = socket_path
        if socket_path is not None:
            self._server = _UnixHTTPServer(socket_path, Handler,
                                           bind_and_activate=False)
            self._server.allowed_uids = (
                frozenset(allowed_uids) if allowed_uids is not None else None)
            self._server.server_bind()
            self._server.server_activate()
            self.host, self.port = None, None
        else:
            self._server = ThreadingHTTPServer((host, port), Handler)
            self.host = host
            self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        name="singer-admin", daemon=True)

    def start(self) -> "AdminServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self.socket_path is not None:
            try:
                os.unlink(self.socket_path)
            except FileNotFoundError:
                pass
