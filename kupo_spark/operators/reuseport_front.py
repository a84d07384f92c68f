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

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        # in-flight REQUEST count — not connections (ADVICE r10): a
        # retiring worker must not exit while a handler is mid-response,
        # but the old per-connection count (process_request_thread spans
        # the whole keep-alive session) kept retired workers alive — and
        # serving — for the entire 20 s drain grace whenever a client held
        # a keep-alive connection open.  Requests track from dispatch to
        # response flush (Handler wraps each do_*), so an idle keep-alive
        # connection pins nothing and the drain converges the moment the
        # last actual response flushes.
        self.inflight = 0
        self._inflight_lock = __import__("threading").Lock()

    def track_request(self):
        import contextlib

        @contextlib.contextmanager
        def _track():
            with self._inflight_lock:
                self.inflight += 1
            try:
                yield
            finally:
                with self._inflight_lock:
                    self.inflight -= 1

        return _track()

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
        host: str = "127.0.0.1",
        port: int = 0,
        spawn_timeout_s: float = 20.0,
    ):
        self.primary = urlparse(primary_url)
        self.routes = routes
        self.workers = workers
        self.host = host
        self.spawn_timeout_s = spawn_timeout_s
        self._retiring: list[int] = []
        self._retiring_lock = __import__("threading").Lock()
        #: generation pids -> retire-ack pipe read end (see _spawn)
        self._gen_ack: dict[tuple, int] = {}
        self._pids: list[int] = []
        self.port: int | None = port or None
        self.url: str | None = None

    def start(self) -> "ReusePortFront":
        # reserve a port: bind with SO_REUSEPORT, read it, keep it open
        # until every worker has bound its own socket (their binds succeed
        # alongside ours), then close — after that instant the kernel only
        # hashes new connections to the workers' queues, so anything
        # connected post-start lands on a worker.  An explicit ``port``
        # (CLI deployment: the front IS the public listener) binds that
        # port instead of an ephemeral one.
        placeholder = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        placeholder.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
        placeholder.bind((self.host, self.port or 0))
        self.port = placeholder.getsockname()[1]
        self.url = f"http://{self.host}:{self.port}"
        self._pids = self._spawn(self.routes)
        placeholder.close()
        return self

    def _spawn(self, routes) -> list[int]:
        """Fork one worker generation serving ``routes``; returns its pids
        once every worker is bound + accepting (readiness pipe).  Each
        generation also carries a retire-ack pipe: a TERM'd worker writes
        one byte the moment its LISTENER is closed (before draining
        in-flight responses), so refresh() can wait for takeover without
        waiting for process exit."""
        ready_r, ready_w = os.pipe()
        ack_r, ack_w = os.pipe()
        pids: list[int] = []
        for _ in range(self.workers):
            pid = os.fork()
            if pid == 0:  # worker
                os.close(ready_r)
                os.close(ack_r)
                try:
                    self._worker(ready_w, routes, ack_w)
                finally:
                    os._exit(0)
            pids.append(pid)
        os.close(ready_w)
        os.close(ack_w)
        # one readiness byte per worker (sent after its bind+activate).
        # An EOF (empty read) before N bytes means at least one worker died
        # pre-bind (bind failure / exception in _worker closed its pipe end
        # without writing): that is a FAILED spawn, not readiness — kill the
        # partial generation and raise so the caller never retires a healthy
        # old generation on the strength of a dead new one.
        #
        # The wait is DEADLINE-BOUNDED: os.fork() from a multithreaded
        # primary (HTTP threads, py4j, the hot-route refresher) can leave a
        # child wedged on a lock some other thread held at fork time —
        # before it writes its byte or exits.  A blocking os.read would then
        # hang the caller forever (and _refresh_front runs synchronously
        # inside _swap_index, freezing follow-mode ingestion); a timed-out
        # spawn is treated exactly like a dead one: kill the partial
        # generation and raise, so the stale-but-served fallback applies to
        # hangs as well as deaths.
        import select

        got = 0
        deadline = time.time() + self.spawn_timeout_s
        try:
            while got < self.workers:
                remaining = deadline - time.time()
                readable = (
                    select.select([ready_r], [], [], remaining)[0]
                    if remaining > 0
                    else []
                )
                chunk = os.read(ready_r, self.workers - got) if readable else b""
                if not chunk:
                    self._kill(pids)
                    why = "pipe EOF" if readable else (
                        f"timeout after {self.spawn_timeout_s:.0f}s "
                        "(worker hung post-fork)"
                    )
                    raise RuntimeError(
                        f"front spawn failed: only {got}/{self.workers} "
                        f"workers signalled readiness before {why}"
                    )
                got += len(chunk)
        except BaseException:
            os.close(ack_r)
            raise
        finally:
            os.close(ready_r)
        self._gen_ack[tuple(pids)] = ack_r
        return pids

    @staticmethod
    def _kill(pids: list[int]) -> None:
        for pid in pids:
            try:
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        for pid in pids:
            try:
                os.waitpid(pid, 0)
            except ChildProcessError:
                pass

    def refresh(self, routes) -> "ReusePortFront":
        """Swap the rendered route set by rolling the worker generation —
        the index-swap story for the front: fork a NEW generation serving
        ``routes`` on the same port (SO_REUSEPORT lets both generations
        listen at once, so the port never goes un-served), then retire the
        old one with SIGTERM.  A TERM'd worker stops accepting, finishes
        the responses it is mid-writing (drain grace), and exits; its idle
        keep-alive connections close, and the client's reconnect can only
        land on a new-generation worker.  After ``refresh`` returns, every
        NEW connection sees the new snapshot's bodies.

        If the new generation fails to spawn (readiness EOF — see _spawn),
        the old generation keeps serving and the error propagates: a failed
        refresh must degrade to "stale bodies", never to "no workers".

        The old generation is retired ASYNCHRONOUSLY (a daemon reaper
        thread TERMs→drains→KILLs it): a swap triggered by a mutation
        PROXIED THROUGH THE FRONT would otherwise deadlock — the primary's
        handler runs _swap_index → _refresh_front → here, while the old
        worker relaying that very request is blocked waiting on the
        primary's response; a synchronous wait-then-SIGKILL killed the
        client's response with it.  refresh() returns as soon as the new
        generation is accepting; the old one finishes its in-flight
        responses (worker-side inflight drain) and exits."""
        old = self._pids
        new_pids = self._spawn(routes)  # raises on spawn failure; old intact
        self.routes = routes
        self._pids = new_pids
        for pid in old:
            try:
                os.kill(pid, signal.SIGTERM)
            except ProcessLookupError:
                pass
        # wait for the old LISTENERS to close (retire acks — one byte per
        # worker the instant it stops accepting; a worker's death counts
        # via EOF), so every post-refresh connection lands on the new
        # generation.  This wait cannot deadlock on the proxied-mutation
        # cycle: the ack is written BEFORE the worker drains in-flight
        # responses.  On timeout the stragglers are hard-killed — stale
        # listeners must not outlive the roll.
        import select

        ack_r = self._gen_ack.pop(tuple(old), None)
        if ack_r is not None:
            acks = 0
            deadline = time.time() + 10.0
            while acks < len(old):
                remaining = deadline - time.time()
                readable = (
                    select.select([ack_r], [], [], remaining)[0]
                    if remaining > 0
                    else []
                )
                chunk = os.read(ack_r, len(old) - acks) if readable else b""
                if not chunk:  # EOF (all dead) or timeout
                    if not readable:
                        self._kill(list(old))
                    break
                acks += len(chunk)
            os.close(ack_r)
        with self._retiring_lock:
            self._retiring.extend(old)
        threading = __import__("threading")
        threading.Thread(target=self._reap, args=(old,), daemon=True).start()
        return self

    def _reap(self, pids: list[int], grace_s: float = 30.0) -> None:
        """Collect a TERM'd generation: wait up to ``grace_s`` for the
        drain, then hard-kill stragglers.  Runs detached from refresh()."""
        deadline = time.time() + grace_s
        pending = list(pids)
        while pending and time.time() < deadline:
            for pid in list(pending):
                try:
                    done, _ = os.waitpid(pid, os.WNOHANG)
                except ChildProcessError:
                    done = pid
                if done:
                    pending.remove(pid)
            if pending:
                time.sleep(0.02)
        for pid in pending:  # drain grace exceeded — hard stop
            try:
                os.kill(pid, signal.SIGKILL)
                os.waitpid(pid, 0)
            except (ProcessLookupError, ChildProcessError):
                pass
        with self._retiring_lock:
            for pid in pids:
                if pid in self._retiring:
                    self._retiring.remove(pid)

    def _worker(self, ready_w: int, routes, ack_w: int | None = None) -> None:
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
                with self.server.track_request():
                    try:
                        self._do_get()
                    finally:
                        try:  # flush INSIDE the tracked span: the 64 KB
                            self.wfile.flush()  # buffer must hit the wire
                        except Exception:  # before inflight decrements
                            pass

            def _do_get(self):
                if stop.is_set():
                    # retired (ADVICE r10): the route table is the OLD
                    # generation's pre-swap snapshot — a request arriving
                    # on an existing keep-alive connection after SIGTERM
                    # must NOT read it (a DELETE-triggered swap already
                    # changed the truth).  Proxy to the primary (which
                    # serves the new index) and close the connection so
                    # the client's next request lands on a new-generation
                    # worker.
                    self.close_connection = True
                    self._proxy("GET")
                    return
                hit = routes.get(self.path)
                # rendered bodies are minted under the default Accept — a
                # client negotiating asset-quantity=string must reach the
                # primary, which re-renders under ITS Accept handling
                if hit is not None and "asset-quantity=string" not in (
                    self.headers.get("Accept") or ""
                ):
                    ct, body, extra = hit
                    etag = next(
                        (v for k, v in extra if k.lower() == "etag"), None
                    )
                    inm = self.headers.get("If-None-Match")
                    # cacheOr (Http.hs:461-471) at the front: a matching
                    # If-None-Match answers 304.  EXACT bytes only — the
                    # primary's _not_modified_or and the reference compare
                    # exact, so the front must too, or a quoted-ETag client
                    # would get 304 here but 200 on the proxy path for the
                    # identical request.
                    not_modified = (
                        inm is not None and etag is not None and inm == etag
                    )
                    self.send_response(304 if not_modified else 200)
                    self.send_header("Content-Type", ct)
                    self.send_header(
                        "Content-Length", "0" if not_modified else str(len(body))
                    )
                    self.send_header("Access-Control-Allow-Origin", "*")
                    self.send_header("X-Worker-Pid", str(os.getpid()))
                    for k, v in extra:
                        self.send_header(k, v)
                    self.end_headers()
                    if not not_modified:
                        self.wfile.write(body)
                    return
                self._proxy("GET")

            # the CLI front is the PUBLIC listener: every non-point route
            # and every mutation proxies to the primary (which owns Spark
            # and the write path), request bodies included
            def do_PUT(self):
                self._tracked_proxy("PUT")

            def do_POST(self):
                self._tracked_proxy("POST")

            def do_DELETE(self):
                self._tracked_proxy("DELETE")

            def do_OPTIONS(self):
                self._tracked_proxy("OPTIONS")

            def _tracked_proxy(self, method: str) -> None:
                with self.server.track_request():
                    try:
                        self._proxy(method)
                    finally:
                        try:
                            self.wfile.flush()
                        except Exception:
                            pass

            def _proxy(self, method: str) -> None:
                if stop.is_set():
                    # retired: answer this response, then force the client
                    # to reconnect (landing on the new generation)
                    self.close_connection = True
                clen = int(self.headers.get("Content-Length") or 0)
                payload = self.rfile.read(clen) if clen else None
                fwd_headers = {
                    k: v
                    for k, v in self.headers.items()
                    if k.lower() not in ("connection", "keep-alive", "host")
                }
                conn = getattr(local, "conn", None)
                for attempt in (0, 1):
                    if conn is None:
                        conn = http.client.HTTPConnection(
                            primary.hostname, primary.port, timeout=120
                        )
                        local.conn = conn
                    try:
                        conn.request(method, self.path, body=payload, headers=fwd_headers)
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
                    if k.lower() not in ("transfer-encoding", "connection", "content-length"):
                        self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                if self.close_connection:
                    # advertise what we are about to do (retired-worker
                    # responses close so the client reconnects onto the
                    # new generation)
                    self.send_header("Connection", "close")
                self.end_headers()
                self.wfile.write(body)

        import threading

        srv = _ReusePortHTTPServer(("127.0.0.1", self.port), Handler)
        # graceful retire (refresh(): generation roll): on SIGTERM stop
        # accepting and close the listen socket — queued-but-unaccepted
        # connections reset and the client retry lands on the NEW
        # generation — then give in-flight handler threads a short drain
        # before exiting (handler threads are daemons; responses mid-write
        # complete inside the grace, idle keep-alives close with the
        # process)
        stop = threading.Event()
        signal.signal(signal.SIGTERM, lambda *_: stop.set())
        loop = threading.Thread(
            target=srv.serve_forever, kwargs={"poll_interval": 0.2}, daemon=True
        )
        loop.start()
        os.write(ready_w, b"r")
        os.close(ready_w)
        stop.wait()
        srv.shutdown()
        srv.server_close()  # listener gone: new connections go to the new gen
        if ack_w is not None:
            try:  # retire ack: tells refresh() the takeover is complete
                os.write(ack_w, b"c")
            except OSError:
                pass
        # drain: an in-flight REQUEST may be relaying a response whose
        # upstream (the primary) only answers AFTER the generation roll
        # that retired us returns — a proxied mutation that triggered the
        # swap.  Exiting before that response flushes closes the client's
        # connection without a response; wait for inflight to hit zero.
        # inflight counts requests (not connections — ADVICE r10), any
        # request arriving post-stop bypasses the stale route table and
        # closes its connection, so idle keep-alives neither pin the
        # drain nor read pre-swap bodies.
        deadline = time.time() + 20.0
        while srv.inflight > 0 and time.time() < deadline:
            time.sleep(0.02)
        time.sleep(0.1)

    def close(self) -> None:
        with self._retiring_lock:
            stragglers = list(self._retiring)
            self._retiring = []
        self._kill(self._pids + stragglers)
        self._pids = []
        for fd in self._gen_ack.values():
            try:
                os.close(fd)
            except OSError:
                pass
        self._gen_ack.clear()

    def __enter__(self):
        return self if self._pids else self.start()

    def __exit__(self, *exc):
        self.close()


def render_point_routes(server, paths_with_patterns) -> dict:
    """Pre-render each (request_path, pattern) point body via the serving
    tier plus the snapshot's cache headers — the route set a front
    generation serves.  Call again after an index swap (``server.serving``
    is the new snapshot) and hand the result to :meth:`ReusePortFront.
    refresh` to roll the workers onto the new bodies."""
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
    return routes


def front_for_points(server, paths_with_patterns, workers: int = 8) -> ReusePortFront:
    """Build a front over a live ``KupoHttpServer``: pre-render the point
    routes, then fork the workers."""
    routes = render_point_routes(server, paths_with_patterns)
    return ReusePortFront(server.url, routes, workers=workers).start()
