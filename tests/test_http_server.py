"""End-to-end tests of the HTTP surface (``operators/http_server.py``)
against a live ``ThreadingHTTPServer`` — the repo analog of kupo's
``Test.Kupo.App.HttpSpec`` driving the WAI app.

Routes, status codes, guards, cache headers and content negotiation all
follow ``src/Kupo/App/Http.hs``; payload bodies are the byte-exact
``result_json`` strings already certified by ``test_golden_json.py``.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from kupo_spark import chainspec as cs
from kupo_spark.operators.fold_inputs import fold_inputs
from kupo_spark.operators.http_server import KupoHttpServer
from kupo_spark.operators.serve import result_json


def _get(url, headers=None, method="GET", body=None):
    req = urllib.request.Request(url, method=method, headers=headers or {}, data=body)
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, dict(r.headers), r.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


@pytest.fixture(scope="module")
def server(spark, index, blocks):
    srv = KupoHttpServer(spark, index, blocks=blocks, patterns=("*",)).start()
    yield srv
    srv.close()


# -- health / metrics -------------------------------------------------------


def test_health_json(server):
    status, headers, body = _get(
        f"{server.url}/health", headers={"Accept": "application/json"}
    )
    assert status == 200
    h = json.loads(body)
    assert h["connection_status"] == "connected"
    assert h["most_recent_checkpoint"] == 99
    assert headers["X-Most-Recent-Checkpoint"] == "99"


def test_health_prometheus_via_accept(server):
    status, headers, body = _get(
        f"{server.url}/health", headers={"Accept": "text/plain"}
    )
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")
    assert b"# TYPE kupo_most_recent_checkpoint gauge" in body


def test_metrics_is_prometheus_by_default(server):
    status, headers, body = _get(f"{server.url}/metrics")
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")
    assert b"kupo_inputs" in body


def test_health_rejects_subroutes_and_methods(server):
    assert _get(f"{server.url}/health/x")[0] == 404
    assert _get(f"{server.url}/health", method="DELETE")[0] == 405


# -- checkpoints ------------------------------------------------------------


def test_checkpoints_list(server, index):
    status, headers, body = _get(f"{server.url}/checkpoints")
    assert status == 200
    pts = json.loads(body)
    assert pts[0] == {"slot_no": 99, "header_hash": cs.md5_hex("blk99")}
    assert headers["ETag"] == cs.md5_hex("blk99")


def test_checkpoint_by_slot_strict_and_ancestor(server):
    s, _, body = _get(f"{server.url}/checkpoints/42?strict")
    assert s == 200 and json.loads(body)["slot_no"] == 42
    s, _, body = _get(f"{server.url}/checkpoints/98765")
    assert s == 200 and json.loads(body)["slot_no"] == 99
    s, _, body = _get(f"{server.url}/checkpoints/not-a-slot")
    assert s == 400 and "hint" in json.loads(body)


def test_etag_304_on_if_none_match(server):
    tag = cs.md5_hex("blk99")
    status, _, body = _get(
        f"{server.url}/checkpoints", headers={"If-None-Match": tag}
    )
    assert status == 304 and body == b""
    status, _, _ = _get(
        f"{server.url}/checkpoints", headers={"If-None-Match": "stale"}
    )
    assert status == 200


# -- matches ----------------------------------------------------------------


def test_matches_wildcard_streams_all_rows(server, index):
    status, headers, body = _get(f"{server.url}/matches?unspent")
    assert status == 200
    rows = json.loads(body)
    expected = fold_inputs(index, "*", status="unspent").count()
    assert len(rows) == expected
    # chain order: most_recent_first (descending created_at)
    slots = [r["created_at"]["slot_no"] for r in rows]
    assert slots == sorted(slots, reverse=True)


def test_matches_wide_repeat_is_preframed_and_wire_identical(server):
    """A repeated wide GET /matches is answered from the snapshot's framed
    cache — ONE pre-assembled write — and the replayed chunked body is
    byte-identical to the streamed first response (same chunk boundaries,
    same payload), so the optimization is invisible on the wire."""
    import socket

    host, port = server.url.split("//")[1].split(":")

    def raw_get(path):
        with socket.create_connection((host, int(port)), timeout=120) as s:
            s.sendall(
                f"GET {path} HTTP/1.1\r\nHost: {host}\r\n"
                "Connection: close\r\n\r\n".encode()
            )
            data = b""
            while True:
                b = s.recv(1 << 16)
                if not b:
                    break
                data += b
        head, _, body = data.partition(b"\r\n\r\n")
        return head, body

    head1, body1 = raw_get("/matches")
    assert b"Transfer-Encoding: chunked" in head1
    # the full delivery teed the framed bytes onto the snapshot's cache
    assert any(k[0] == "framed_body" for k in server.serving._row_cache.keys())
    head2, body2 = raw_get("/matches")
    assert b"Transfer-Encoding: chunked" in head2
    assert body2 == body1


def test_matches_rendered_addresses_flag(spark, index, blocks):
    """A server built with rendered_addresses=True serves wire-text
    addresses (addressToJson — kupo's always-on behavior); base-address
    rows render to bech32 and roundtrip to the stored row."""
    from kupo_spark.codecs import address_from_bech32

    srv = KupoHttpServer(
        spark, index, blocks=blocks, patterns=("*",), rendered_addresses=True
    ).start()
    try:
        from kupo_spark.codecs import address_to_text

        status, _, body = _get(f"{srv.url}/matches?unspent")
        assert status == 200
        served = {r["address"] for r in json.loads(body)}
        raw = {r["address"] for r in fold_inputs(index, "*", status="unspent").collect()}
        assert served == {address_to_text(a) for a in raw}
        # base-address rows (the bijective family) roundtrip to the store
        base = [a for a in served if a.startswith("addr") and address_from_bech32(a) in raw]
        assert base, "no base addresses rendered to bech32"
    finally:
        srv.close()


def test_matches_pattern_path_and_oldest_first(server, index):
    cred = cs.payment_credential_of(13)
    status, _, body = _get(f"{server.url}/matches/{cred}/*?order=oldest_first")
    assert status == 200
    rows = json.loads(body)
    assert len(rows) == fold_inputs(index, f"{cred}/*").count() > 0
    slots = [r["created_at"]["slot_no"] for r in rows]
    assert slots == sorted(slots)


def test_matches_bodies_are_the_certified_render(server, index):
    tx = cs.transaction_id_of(500)
    status, _, body = _get(f"{server.url}/matches/*@{tx}")
    assert status == 200
    got = {json.dumps(r, separators=(",", ":")) for r in json.loads(body)}
    want = {
        r["result"]
        for r in result_json(index, f"*@{tx}").collect()
    }
    # same payloads modulo key order (dict round-trip loses byte order;
    # byte-exactness itself is pinned by test_golden_json)
    assert {frozenset(json.loads(g)) for g in got} == {
        frozenset(json.loads(w)) for w in want
    }
    assert len(got) == len(want) > 0


def test_matches_quantity_string_negotiation(server):
    status, headers, body = _get(
        f"{server.url}/matches?unspent",
        headers={"Accept": "application/json;asset-quantity=string"},
    )
    assert status == 200
    assert "asset-quantity=string" in headers["Content-Type"]
    rows = json.loads(body)
    assert all(isinstance(r["value"]["coins"], str) for r in rows)


def test_matches_resolve_hashes_inlines(server):
    status, _, body = _get(f"{server.url}/matches?resolve_hashes&unspent")
    assert status == 200
    rows = json.loads(body)
    assert all("datum" in r and "script" in r for r in rows)
    assert any(r["datum"] is not None for r in rows)


def test_matches_param_errors(server):
    assert _get(f"{server.url}/matches?spent&unspent")[0] == 400
    assert _get(f"{server.url}/matches?order=sideways")[0] == 400
    assert _get(f"{server.url}/matches?asset_name=aa")[0] == 400
    assert _get(f"{server.url}/matches?output_index=1")[0] == 400
    assert _get(f"{server.url}/matches/?created_after=xyz")[0] == 400
    assert _get(f"{server.url}/matches/a/b/c")[0] == 404
    assert _get(f"{server.url}/matches/%F0%9F%A6%91")[0] == 400
    # malformed values of WELL-formed parameter combinations are 400s,
    # not 500s
    assert _get(f"{server.url}/matches?transaction_id=ab&output_index=xyz")[0] == 400


def test_put_patterns_malformed_slot_is_400(server):
    body = json.dumps(
        {"rollback_to": {"slot_no": "abc"}, "patterns": ["*"]}
    ).encode()
    status, _, _ = _get(
        f"{server.url}/patterns", method="PUT", body=body,
        headers={"Content-Type": "application/json"},
    )
    assert status == 400
    body = json.dumps({"rollback_to": {"slot_no": None}, "patterns": ["*"]}).encode()
    status, _, _ = _get(
        f"{server.url}/patterns", method="PUT", body=body,
        headers={"Content-Type": "application/json"},
    )
    assert status == 400


def test_matches_residual_filters(server, index):
    pol = cs.policy_id_of(3)
    status, _, body = _get(f"{server.url}/matches?policy_id={pol}")
    assert status == 200
    assert len(json.loads(body)) == fold_inputs(
        index, "*", filter_policy_id=pol
    ).count()


# -- datums / scripts -------------------------------------------------------


def test_datum_lookup(server):
    h = cs.datum_hash_of(17)
    status, _, body = _get(f"{server.url}/datums/{h}")
    assert status == 200
    assert json.loads(body)["datum"] is not None
    status, _, body = _get(f"{server.url}/datums/{'0' * 64}")
    assert status == 200 and json.loads(body) is None
    assert _get(f"{server.url}/datums/nothex!")[0] == 400
    assert _get(f"{server.url}/datums")[0] == 404


def test_script_lookup(server):
    h = cs.script_hash_of(12)
    status, _, body = _get(f"{server.url}/scripts/{h}")
    assert status == 200
    s = json.loads(body)
    assert set(s) == {"script", "language"} and s["language"] == "plutus:v2"
    status, _, body = _get(f"{server.url}/scripts/{'0' * 64}")
    assert status == 200 and json.loads(body) is None


# -- metadata ---------------------------------------------------------------


def test_metadata_by_slot(server, blocks):
    status, headers, body = _get(f"{server.url}/metadata/50")
    assert status == 200
    rows = json.loads(body)
    assert rows, "slot 50 should carry metadata"
    assert all({"hash", "raw", "schema"} <= set(r) for r in rows)
    assert headers["X-Block-Header-Hash"] == cs.md5_hex("blk50")
    # slot 0 → empty (Http.hs:768-770)
    status, _, body = _get(f"{server.url}/metadata/0")
    assert status == 200 and json.loads(body) == []


def test_metadata_transaction_filter(server):
    tid = cs.transaction_id_of(500)
    status, _, body = _get(f"{server.url}/metadata/50?transaction_id={tid}")
    assert status == 200
    assert len(json.loads(body)) == 1


# -- patterns (read side on the shared server) ------------------------------


def test_patterns_listing(server):
    status, _, body = _get(f"{server.url}/patterns")
    assert status == 200 and json.loads(body) == ["*"]
    # included: '*' includes any concrete pattern
    cred = cs.payment_credential_of(13)
    status, _, body = _get(f"{server.url}/patterns/{cred}/*")
    assert status == 200 and json.loads(body) == ["*"]


def test_unknown_route_and_v1_prefix(server):
    assert _get(f"{server.url}/nope")[0] == 404
    status, _, body = _get(f"{server.url}/v1/health", headers={"Accept": "application/json"})
    assert status == 200 and json.loads(body)["connection_status"] == "connected"


def test_options_cors(server):
    status, headers, _ = _get(f"{server.url}/health", method="OPTIONS")
    assert status == 200
    assert headers["Access-Control-Allow-Origin"] == "*"


# -- mutations (dedicated server: these swap the index) ---------------------


@pytest.fixture()
def mut_server(spark, index, blocks, tmp_path):
    cred = cs.payment_credential_of(13)
    srv = KupoHttpServer(
        spark,
        index,
        blocks=blocks,
        patterns=(f"{cred}/*",),
        store_path=str(tmp_path / "patterns.txt"),
        longest_rollback=50,  # chain tip is 99; make the safe zone testable
    ).start()
    yield srv
    srv.close()


def test_delete_matches_guard_and_apply(mut_server, index):
    # '*' overlaps the active pattern → refused (stillActivePattern)
    assert _get(f"{mut_server.url}/matches/*", method="DELETE")[0] == 400
    # a disjoint credential is deletable
    other = cs.payment_credential_of(14)
    n_before = fold_inputs(index, f"{other}/*").count()
    status, _, body = _get(f"{mut_server.url}/matches/{other}/*", method="DELETE")
    assert status == 200
    assert json.loads(body)["deleted"] == n_before > 0
    status, _, body = _get(f"{mut_server.url}/matches/{other}/*")
    assert status == 200 and json.loads(body) == []


def test_put_patterns_rollback_and_backfill(mut_server, spark, index, blocks):
    cred = cs.payment_credential_of(13)
    tip = 99
    point = tip - 3
    body = json.dumps(
        {"patterns": ["*"], "rollback_to": {"slot_no": point}}
    ).encode()
    status, _, resp = _get(
        f"{mut_server.url}/patterns",
        method="PUT",
        headers={"Content-Type": "application/json"},
        body=body,
    )
    assert status == 200
    assert json.loads(resp) == sorted(["*", f"{cred}/*"])
    # final state: old-pattern matches everywhere; new-pattern-only matches
    # strictly after the rollback point
    status, _, got = _get(f"{mut_server.url}/matches")
    rows = json.loads(got)
    old_refs = {
        f'{r["transaction_id"]}#{r["output_index"]}'
        for r in fold_inputs(index, f"{cred}/*").collect()
    }
    for r in rows:
        ref = f'{r["transaction_id"]}#{r["output_index"]}'
        if ref not in old_refs:
            assert r["created_at"]["slot_no"] > point, ref
    # every old match survived
    got_refs = {f'{r["transaction_id"]}#{r["output_index"]}' for r in rows}
    assert old_refs <= got_refs
    # and some genuinely new rows arrived from the backfill
    assert len(got_refs) > len(old_refs)


def test_put_patterns_rejects_bad_points(mut_server):
    for payload, key in [
        ({"patterns": ["*"], "rollback_to": {"slot_no": 98760}}, "unknown"),
        ({"patterns": ["*"], "rollback_to": {"slot_no": 1}}, "unsafe"),
        ({"patterns": ["*"]}, "malformed"),
        ({"patterns": ["!!"], "rollback_to": {"slot_no": 96}}, "pattern"),
    ]:
        status, _, _ = _get(
            f"{mut_server.url}/patterns",
            method="PUT",
            body=json.dumps(payload).encode(),
        )
        assert status == 400, key


def test_delete_pattern_unguarded(mut_server):
    cred = cs.payment_credential_of(13)
    status, _, body = _get(f"{mut_server.url}/patterns/{cred}/*", method="DELETE")
    assert status == 200 and json.loads(body)["deleted"] == 1
    status, _, body = _get(f"{mut_server.url}/patterns")
    assert json.loads(body) == []


# ---- keyset pagination (beyond-reference, VERDICT r6 #4) ------------------


def test_matches_paged_walk_equals_full_body(server):
    """?page_size=N walks the full result via X-Next-Cursor: pages
    concatenate to exactly the full (sorted) response, every page but the
    last has N rows, the last omits the cursor header, and each response
    carries the usual cache headers."""
    from kupo_spark import chainspec as cs

    deleg = cs.delegation_credential_of(5)
    status, headers, body = _get(f"{server.url}/matches/*/{deleg}?order=most_recent_first")
    assert status == 200
    full = json.loads(body)
    assert len(full) > 25

    walked, cursor, pages = [], None, 0
    while True:
        url = f"{server.url}/matches/*/{deleg}?page_size=10"
        if cursor:
            url += f"&cursor={cursor}"
        status, headers, body = _get(url)
        assert status == 200
        assert "X-Most-Recent-Checkpoint" in headers
        page = json.loads(body)
        walked.extend(page)
        pages += 1
        cursor = headers.get("X-Next-Cursor")
        if cursor is None:
            assert len(page) < 10 or walked == full[: len(walked)]
            break
        assert len(page) == 10
        assert pages < 1000
    assert walked == full


def test_matches_paged_respects_filters_and_order(server):
    """page_size composes with status flags and slot-range filters; the
    oldest_first walk is the reverse of most_recent_first."""
    from kupo_spark import chainspec as cs

    deleg = cs.delegation_credential_of(5)
    base = f"{server.url}/matches/*/{deleg}?unspent&created_after=100"
    _, _, body = _get(base + "&order=most_recent_first")
    full = json.loads(body)

    def walk(order):
        out, cursor = [], None
        while True:
            url = base + f"&order={order}&page_size=7"
            if cursor:
                url += f"&cursor={cursor}"
            s, h, b = _get(url)
            assert s == 200
            out.extend(json.loads(b))
            cursor = h.get("X-Next-Cursor")
            if cursor is None:
                return out

    assert walk("most_recent_first") == full
    assert walk("oldest_first") == full[::-1]


def test_matches_paged_rejects_bad_params(server):
    for bad in ("page_size=0", "page_size=x", "page_size=5&cursor=1.2",
                "page_size=5&cursor=a.b.c"):
        status, _, body = _get(f"{server.url}/matches/*?{bad}")
        assert status == 400, (bad, body)


def test_matches_page_size_clamped(server, monkeypatch):
    """ADVICE r7 (medium): ?page_size=1000000000 must not drive the paged
    path into a near-global sort + full-result driver materialization.
    Oversized requests are clamped to MAX_PAGE_SIZE; the walk still
    reaches every row via X-Next-Cursor."""
    import kupo_spark.operators.http_server as hs

    deleg = cs.delegation_credential_of(5)
    _, _, body = _get(f"{server.url}/matches/*/{deleg}")
    full = json.loads(body)
    assert len(full) > 8

    # shrink the ceiling so the clamp is observable on test-sized data
    monkeypatch.setattr(hs, "MAX_PAGE_SIZE", 5)
    s, h, b = _get(f"{server.url}/matches/*/{deleg}?page_size=1000000000")
    assert s == 200
    assert len(json.loads(b)) == 5  # clamped, not the asked-for billion
    walked, cursor = [], None
    while True:
        url = f"{server.url}/matches/*/{deleg}?page_size=1000000000"
        if cursor:
            url += f"&cursor={cursor}"
        s, h, b = _get(url)
        assert s == 200
        walked.extend(json.loads(b))
        cursor = h.get("X-Next-Cursor")
        if cursor is None:
            break
    assert walked == full


# -- front plumbing on the primary (no workers forked here) -----------------


def test_render_front_routes_pins_snapshot(server):
    """The hot-route render pins the serving snapshot with the same _refs
    protocol as _route: the 10s refresher runs concurrently with swaps, and
    an unpinned render lets a racing swap drain-close the snapshot mid-loop
    (its per-path exception guard then silently drops hot routes)."""
    # seed a hot point through the real request path
    _get(f"{server.url}/matches/*@{'ab' * 32}")
    snap = server.serving
    before = snap._refs
    inner_refs = {}

    orig_tip = snap.tip

    def spying_tip():
        inner_refs["during"] = snap._refs
        return orig_tip()

    snap.tip = spying_tip
    try:
        routes = server._render_front_routes()
    finally:
        snap.tip = orig_tip
    assert inner_refs["during"] == before + 1  # pinned while rendering
    assert snap._refs == before  # released after
    assert isinstance(routes, dict)


def test_render_front_routes_last_reader_closes_retired(spark, index, blocks):
    """If the snapshot is retired mid-render (swap raced us) and we are the
    last reader, the render path drains it exactly like _route's finally."""
    srv = KupoHttpServer(spark, index, blocks=blocks, patterns=("*",)).start()
    try:
        snap = srv.serving
        closed = []
        orig_close = snap.close
        snap.close = lambda: (closed.append(True), orig_close())

        orig_tip = snap.tip

        def retire_mid_render():
            snap._retired = True  # simulate the racing swap's retire
            return orig_tip()

        snap.tip = retire_mid_render
        try:
            srv._render_front_routes()
        finally:
            snap.tip = orig_tip
        assert closed, "last reader must drain the retired snapshot"
        snap._retired = False  # leave the fixture server usable
    finally:
        srv.close()


def test_hot_gen_rolls_are_rate_limited(spark, index, blocks):
    """Hot-path growth must not roll the worker generation more often than
    min_roll_interval: varied query strings bump _hot_gen on every new path
    and an unthrottled refresher would kill keep-alive connections on the
    public listener every refresh_interval, forever."""
    import time

    srv = KupoHttpServer(spark, index, blocks=blocks, patterns=("*",)).start()
    try:
        rolls = []
        srv._refresh_front = lambda: rolls.append(time.monotonic())
        # a front must appear attached for the refresher to matter; attach a
        # real tiny one so attach_front's plumbing runs end to end
        srv.attach_front(workers=1, refresh_interval=0.05, min_roll_interval=3600)
        srv._front_last_roll = time.monotonic()  # as if a roll just happened
        for i in range(5):  # adversarial: new "hot" path every step
            srv._record_hot_point(f"/matches/*@{'%02x' % i * 32}", None, {})
            time.sleep(0.06)
        assert rolls == [], "refresher rolled inside min_roll_interval"
        # interval elapsed -> one roll allowed.  NOT 0.0: monotonic() is
        # time-since-boot on Linux, so on a host up less than an hour
        # `monotonic() - 0.0 < 3600` and the roll never fires.
        srv._front_last_roll = time.monotonic() - 3601
        deadline = time.monotonic() + 5
        while not rolls and time.monotonic() < deadline:
            time.sleep(0.02)
        assert len(rolls) >= 1
    finally:
        srv.close()
