"""oha-analog HTTP bench: 8 concurrent clients, 30 total requests per shape.

BASELINE.md's query numbers are HTTP request latencies measured with `oha`
against a warm kupo server — 8 concurrent clients, 30 total requests
(reference benchmarks/README.md:30-45).  bench.py's warm numbers measure the
single-stream DataFrame path; this measures the same BASELINE shapes through
`KupoHttpServer` under the reference's own protocol: concurrent clients,
full response bodies read (exercising `_stream_array` under load), avg/p50/
p95 reported beside kupo's table.

Importable (`bench.py` embeds an `http` section) or standalone::

    python tools/bench_http.py          # builds index at $SPARK_GRAFT_SF_DIR
"""

from __future__ import annotations

import http.client
import json
import queue
import threading
import time
from urllib.parse import urlparse

CLIENTS = 8
TOTAL = 30


def oha_measure(
    base_url: str, path: str, clients: int = CLIENTS, total: int = TOTAL
) -> dict:
    """Fire `total` GETs at base_url+path from `clients` concurrent threads
    (each with its own keep-alive connection, like oha), reading the full
    response body.  Returns avg/p50/p95 latency, bytes, and error count."""
    host = urlparse(base_url)
    work: queue.Queue[int] = queue.Queue()
    for i in range(total):
        work.put(i)
    lat: list[float] = []
    sizes: list[int] = []
    errors = [0]
    lock = threading.Lock()

    def client() -> None:
        conn = http.client.HTTPConnection(host.hostname, host.port, timeout=120)
        try:
            while True:
                try:
                    work.get_nowait()
                except queue.Empty:
                    return
                t0 = time.time()
                try:
                    conn.request("GET", path)
                    resp = conn.getresponse()
                    body = resp.read()
                    ok = resp.status == 200
                except Exception:
                    ok, body = False, b""
                    conn.close()
                    conn = http.client.HTTPConnection(
                        host.hostname, host.port, timeout=120
                    )
                dt = time.time() - t0
                with lock:
                    if ok:
                        lat.append(dt)
                        sizes.append(len(body))
                    else:
                        errors[0] += 1
        finally:
            conn.close()

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    lat.sort()
    n = len(lat)
    return {
        "avg": round(sum(lat) / n, 4) if n else None,
        "p50": round(lat[n // 2], 4) if n else None,
        "p95": round(lat[min(n - 1, int(n * 0.95))], 4) if n else None,
        "req_per_sec": round(total / wall, 1),
        "resp_bytes": round(sum(sizes) / n) if n else 0,
        "errors": errors[0],
        "clients": clients,
        "requests": total,
    }


def baseline_shapes(addr: str, deleg: str, policy: str, txid: str) -> dict:
    """The seven Run-A BASELINE shapes as HTTP paths (same filters bench.py
    uses on the DataFrame path — kupo param names, Http.hs:427-470)."""
    return {
        "exact_address": f"/matches/{addr}",
        "exact_address_range": f"/matches/{addr}?created_after=2000&created_before=6000",
        "delegation": f"/matches/*/{deleg}",
        "delegation_spent_after": f"/matches/*/{deleg}?spent&spent_after=5000",
        "policy": f"/matches/{policy}.*",
        "policy_range": f"/matches/{policy}.*?created_before=6000&spent_after=3000",
        "transaction_id": f"/matches/*@{txid}",
    }


def run_http_bench(spark, index, warm_first: bool = True) -> dict:
    """Start a KupoHttpServer over `index`, warm it, and measure every
    BASELINE shape oha-style.  Returns {shape: stats} + meta."""
    from kupo_spark import chainspec as cs
    from kupo_spark.operators.http_server import KupoHttpServer

    shapes = baseline_shapes(
        cs.address_of(42),
        cs.delegation_credential_of(5),
        cs.policy_id_of(3),
        cs.transaction_id_of(123),
    )
    out: dict = {"protocol": f"{CLIENTS} concurrent clients, {TOTAL} requests/shape"}
    with KupoHttpServer(spark, index) as srv:
        srv.serving.warm()
        if warm_first:  # kupo's oha runs hit a long-lived warm server
            for path in shapes.values():
                oha_measure(srv.url, path, clients=2, total=2)
        for name, path in shapes.items():
            out[name] = oha_measure(srv.url, path)
    return out


def main() -> None:
    import os
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    from kupo_spark.chaingen import load_blocks
    from kupo_spark.operators.indexer import build_index
    from kupo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kupo-http-bench")
    index = build_index(load_blocks(spark, sf_dir), patterns=("*",), cache=True)
    index.inputs.count()
    print(json.dumps(run_http_bench(spark, index), indent=1))


if __name__ == "__main__":
    main()
