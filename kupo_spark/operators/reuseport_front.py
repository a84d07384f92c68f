"""SO_REUSEPORT multi-process front for hot point lookups.

The txid point lookup (``GET /matches/*@{txid}``) is pinned at the
Python-HTTP-stack floor: the body is a pre-assembled cache hit (zero Spark
jobs), so the measured 5-9 ms under the 8-way oha protocol is pure
``http.server``-under-GIL contention — kupo's 0.7 ms sits on a compiled
Warp stack that parallelizes accept/parse/write across cores
(reference ``src/Kupo/App/Http.hs:457-471`` serves these straight from
SQLite's page cache).

The CPython analog of Warp's multicore accept loop is **one process per
core sharing the port via SO_REUSEPORT**: the kernel hash-balances
incoming connections across the workers' accept queues, so request
parsing and response writes run on N GILs instead of one.  Workers are
forked AFTER the serving tier pre-renders the hot bodies, inherit that
read-only dict by fork (copy-on-write, no IPC on the hot path), and never
touch Spark — any path outside the rendered set is proxied to the primary
``KupoHttpServer``, which owns the driver and the wide scans.

At 100 TB this is the deployment shape anyway: point lookups are
rendered-body probes that scale horizontally with stateless front
processes, while the Spark driver serves the scan/fold shapes; the front
is the sidecar between the two.
"""

from __future__ import annotations

import http.client
import http.server
import os
import signal
import socket
import socketserver
import time
import urllib.request
from urllib.parse import urlparse


class _ReusePortHTTPServer(socketserver.ThreadingMixIn, http.server.HTTPServer):
    daemon_threads = True

    def server_bind(self):
        self.socket.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.socket.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
        http.server.HTTPServer.server_bind(self)


class ReusePortFront:
    """N forked workers sharing one port via SO_REUSEPORT.

    ``routes`` maps exact request paths (as the client sends them) to
    ``(content_type, body_bytes, extra_headers)``; those are answered
    in-process with one ``send`` each.  Everything else is proxied to
    ``primary_url`` over a per-thread keep-alive connection.

    Forked children never touch Spark/py4j (fork-safety: the JVM gateway
    socket is inherited but unused; children exit via ``os._exit``).
    """

    def __init__(
        self,
        primary_url: str,
        routes: dict[str, tuple[str, bytes, list[tuple[str, str]]]],
        workers: int = 8,
    ):
        self.primary = urlparse(primary_url)
        self.routes = routes
        self.workers = workers
        self._pids: list[int] = []
        self.port: int | None = None
        self.url: str | None = None

    def start(self) -> "ReusePortFront":
        # reserve a port: bind with SO_REUSEPORT, read it, keep it open
        # until every worker has bound its own socket (their binds succeed
        # alongside ours), then close — after that instant the kernel only
        # hashes new connections to the workers' queues, so anything
        # connected post-start lands on a worker
        placeholder = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        placeholder.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
        placeholder.bind(("127.0.0.1", 0))
        self.port = placeholder.getsockname()[1]
        self.url = f"http://127.0.0.1:{self.port}"
        ready_r, ready_w = os.pipe()
        for _ in range(self.workers):
            pid = os.fork()
            if pid == 0:  # worker
                os.close(ready_r)
                try:
                    self._worker(ready_w)
                finally:
                    os._exit(0)
            self._pids.append(pid)
        os.close(ready_w)
        # one readiness byte per worker (sent after its bind+activate)
        got = 0
        while got < self.workers:
            got += len(os.read(ready_r, self.workers - got) or b"x")
        os.close(ready_r)
        placeholder.close()
        return self

    def _worker(self, ready_w: int) -> None:
        routes = self.routes
        primary = self.primary
        local = __import__("threading").local()

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"
            # one buffered write per response; without these the headers
            # flush as their own TCP segment and Nagle + delayed-ACK adds
            # a ~40 ms stall per keep-alive response (measured)
            wbufsize = 64 * 1024
            disable_nagle_algorithm = True

            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                hit = routes.get(self.path)
                if hit is not None:
                    ct, body, extra = hit
                    self.send_response(200)
                    self.send_header("Content-Type", ct)
                    self.send_header("Content-Length", str(len(body)))
                    self.send_header("Access-Control-Allow-Origin", "*")
                    self.send_header("X-Worker-Pid", str(os.getpid()))
                    for k, v in extra:
                        self.send_header(k, v)
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self._proxy("GET")

            def _proxy(self, method: str) -> None:
                conn = getattr(local, "conn", None)
                for attempt in (0, 1):
                    if conn is None:
                        conn = http.client.HTTPConnection(
                            primary.hostname, primary.port, timeout=120
                        )
                        local.conn = conn
                    try:
                        conn.request(method, self.path)
                        resp = conn.getresponse()
                        body = resp.read()
                        break
                    except Exception:
                        conn.close()
                        conn = local.conn = None
                        if attempt:
                            self.send_error(502)
                            return
                self.send_response(resp.status)
                for k, v in resp.getheaders():
                    if k.lower() not in ("transfer-encoding", "connection"):
                        self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = _ReusePortHTTPServer(("127.0.0.1", self.port), Handler)
        os.write(ready_w, b"r")
        os.close(ready_w)
        srv.serve_forever(poll_interval=0.5)

    def close(self) -> None:
        for pid in self._pids:
            try:
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        for pid in self._pids:
            try:
                os.waitpid(pid, 0)
            except ChildProcessError:
                pass
        self._pids = []

    def __enter__(self):
        return self if self._pids else self.start()

    def __exit__(self, *exc):
        self.close()


def front_for_points(server, paths_with_patterns, workers: int = 8) -> ReusePortFront:
    """Build a front over a live ``KupoHttpServer``: pre-render each
    (request_path, pattern) point body via the serving tier plus the
    snapshot's cache headers, then fork the workers."""
    serving = server.serving
    slot, h = serving.tip()
    extra = (
        [("X-Most-Recent-Checkpoint", str(slot)), ("ETag", h)]
        if slot is not None
        else [("X-Most-Recent-Checkpoint", "0")]
    )
    routes = {}
    for path, pattern in paths_with_patterns:
        body = serving.serve_json_body(pattern)
        if body is None:
            raise ValueError(f"{pattern!r} is not a point pattern")
        routes[path] = ("application/json;charset=utf-8", body, extra)
    return ReusePortFront(server.url, routes, workers=workers).start()
