"""Gates on the committed benchmark artifacts (VERDICT r9 #1/#3): the
measurement layer must be unable to publish degraded-host numbers under
certified names or clobber composed sections with single-run samples.
No Spark — these exercise the tooling's compose/gate logic directly."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


def _mk_attempt(queries, pre=0.8, post=0.9, chunk=None, **extra):
    return {
        "measured_at": "2026-08-16T00:00:00Z",
        "chunk": chunk,
        "queries": queries,
        "rows": {},
        "host_calibration_pre": {"calib_memcopy_2gb_s": pre},
        "host_calibration_post": {"calib_memcopy_2gb_s": post},
        **extra,
    }


@pytest.fixture()
def scaling_env(tmp_path, monkeypatch):
    """Point bench_scaling's module-level paths at a sandbox."""
    import bench_scaling as bs

    monkeypatch.setattr(bs, "REPO", tmp_path)
    monkeypatch.setattr(bs, "OUT", tmp_path / "SCALING.json")
    (tmp_path / ".bench").mkdir()
    return bs, tmp_path


def _write_attempts(tmp_path, sf, attempts):
    p = tmp_path / ".bench" / f"scaling-attempts-sf{sf}.jsonl"
    p.write_text("".join(json.dumps(a) + "\n" for a in attempts))


def test_compose_min_takes_per_query_min_and_verifies(scaling_env):
    bs, tmp = scaling_env
    _write_attempts(
        tmp,
        "1",
        [
            _mk_attempt({"q_a": 5.0, "q_b": 1.0}),
            _mk_attempt({"q_a": 2.0, "q_b": 9.0}, chunk="shapes"),
        ],
    )
    bs.compose_min("1")
    doc = json.loads((tmp / "SCALING.json").read_text())
    q = doc["sfs"]["1"]["queries"]
    assert q == {"q_a": 2.0, "q_b": 1.0}
    agg = doc["sfs"]["1"]["aggregation"]
    assert agg["n_attempts"] == 2
    assert agg["query_spread"]["q_a"] == {"min": 2.0, "max": 5.0, "n": 2}
    bs.verify_invariants()  # self-consistent by construction


def test_later_single_run_cannot_clobber_composed_min(scaling_env):
    """The r9 disease: a post-compose --only run must never raise a
    committed value.  Under append+recompose, adding a WORSE attempt
    leaves the committed value at the spread min."""
    bs, tmp = scaling_env
    _write_attempts(tmp, "1", [_mk_attempt({"q_a": 2.0})])
    bs.compose_min("1")
    _write_attempts(
        tmp,
        "1",
        [_mk_attempt({"q_a": 2.0}), _mk_attempt({"q_a": 10.56}, chunk="shapes")],
    )
    bs.compose_min("1")
    doc = json.loads((tmp / "SCALING.json").read_text())
    assert doc["sfs"]["1"]["queries"]["q_a"] == 2.0
    assert doc["sfs"]["1"]["aggregation"]["query_spread"]["q_a"]["max"] == 10.56


def test_verify_invariants_rejects_hand_edited_value(scaling_env):
    bs, tmp = scaling_env
    _write_attempts(tmp, "1", [_mk_attempt({"q_a": 2.0})])
    bs.compose_min("1")
    doc = json.loads((tmp / "SCALING.json").read_text())
    doc["sfs"]["1"]["queries"]["q_a"] = 10.56  # simulate a clobber
    (tmp / "SCALING.json").write_text(json.dumps(doc))
    with pytest.raises(SystemExit, match="spread min"):
        bs.verify_invariants()


def test_verify_invariants_rejects_section_without_aggregation(scaling_env):
    bs, tmp = scaling_env
    (tmp / "SCALING.json").write_text(
        json.dumps({"sfs": {"1": {"queries": {"q_a": 1.0}, "rows": {}}}})
    )
    with pytest.raises(SystemExit, match="aggregation"):
        bs.verify_invariants()


def test_uncertified_ingest_published_as_upper_bounds(scaling_env):
    """An ingest attempt missing the post-write recount barrier can never
    wear certified names — and the family must not vanish either."""
    bs, tmp = scaling_env
    _write_attempts(
        tmp,
        "1",
        [
            _mk_attempt(
                {
                    "ingest_total": 48.7,
                    "ingest_phase_build": 26.6,
                    "ingest_phase_cache_recount": 3.2,
                    # no post-write recount -> uncertifiable
                    "q_a": 1.0,
                }
            )
        ],
    )
    bs.compose_min("1")
    doc = json.loads((tmp / "SCALING.json").read_text())
    q = doc["sfs"]["1"]["queries"]
    assert "ingest_total" not in q
    assert q["ingest_total_upper_bound"] == 48.7
    assert "ingest_missing_reason" in doc["sfs"]["1"]
    assert q["q_a"] == 1.0  # non-ingest families kept


def test_certified_ingest_keeps_certified_names(scaling_env):
    bs, tmp = scaling_env
    _write_attempts(
        tmp,
        "1",
        [
            _mk_attempt(
                {
                    "ingest_total": 45.9,
                    "ingest_phase_cache_recount": 3.6,
                    "ingest_phase_cache_recount_post_write": 3.1,
                }
            )
        ],
    )
    bs.compose_min("1")
    doc = json.loads((tmp / "SCALING.json").read_text())
    q = doc["sfs"]["1"]["queries"]
    assert q["ingest_total"] == 45.9
    assert not any(k.endswith("_upper_bound") for k in q)


def test_all_out_of_band_ingest_still_leaves_a_trace(scaling_env):
    """VERDICT r9 #3: even when every ingest attempt fails the calibration
    brackets, the composed section must carry flagged upper bounds, not
    silence."""
    bs, tmp = scaling_env
    _write_attempts(
        tmp,
        "10",
        [
            _mk_attempt({"q_a": 3.0}),  # keeps the section alive
            _mk_attempt({"ingest_total": 452.1}, pre=5.0, post=6.0),
        ],
    )
    bs.compose_min("10")
    doc = json.loads((tmp / "SCALING.json").read_text())
    q = doc["sfs"]["10"]["queries"]
    assert q["ingest_total_upper_bound"] == 452.1
    assert "degraded host" in doc["sfs"]["10"]["ingest_missing_reason"]


def test_shrinking_ratio_is_annotated(scaling_env):
    bs, tmp = scaling_env
    _write_attempts(tmp, "1", [_mk_attempt({"q_reb": 6.69})])
    _write_attempts(tmp, "10", [_mk_attempt({"q_reb": 4.19})])
    bs.compose_min("1")
    bs.compose_min("10")
    doc = json.loads((tmp / "SCALING.json").read_text())
    entry = doc["ratios"]["1->10"]["q_reb"]
    assert entry["time_ratio"] < 0.8
    assert "fixed-cost floor" in entry["note"]


def test_idle_disclosure_lands_in_aggregation(scaling_env):
    bs, tmp = scaling_env
    _write_attempts(
        tmp, "1", [_mk_attempt({"q_a": 1.0}, idle={"ingest_write_idle_s": 120.0})]
    )
    bs.compose_min("1")
    doc = json.loads((tmp / "SCALING.json").read_text())
    atts = doc["sfs"]["1"]["aggregation"]["attempts"]
    assert atts[0]["idle"] == {"ingest_write_idle_s": 120.0}


def test_http_floor_gate_quarantines_degraded_refresh(tmp_path, monkeypatch):
    """A refresh whose own pure-Python floor is out of band must not
    overwrite HTTP_BENCH.json."""
    import bench_http as bh

    stats = {
        "protocol": "t",
        "exact_address": {"avg": 0.05, "p95": 0.1},
        "http_stack_floor_1client": {"avg": 0.0028, "p95": 0.007},
    }
    out = tmp_path / "HTTP_BENCH.json"
    out.write_text("{}")
    with pytest.raises(SystemExit, match="floor-gate"):
        bh.write_report(stats, 0.1, out_path=out)
    assert out.read_text() == "{}"  # untouched
    reject = REPO / ".bench" / "http-bench-rejected.json"
    assert reject.exists()
    assert "quarantined" in json.loads(reject.read_text())["rejected"]


def test_http_floor_gate_passes_healthy_refresh(tmp_path):
    import bench_http as bh

    stats = {
        "protocol": "t",
        "exact_address": {"avg": 0.05, "p95": 0.1},
        "http_stack_floor_1client": {"avg": 0.0005, "p95": 0.001},
    }
    out = tmp_path / "HTTP_BENCH.json"
    report = bh.write_report(stats, 0.1, out_path=out)
    assert json.loads(out.read_text())["shapes"]["exact_address"]["avg"] == 0.05
    assert report["sf"] == 0.1
