"""S2/S3 hard-signal queries: protocol-source NDJSON fixtures round-tripped
through decode → index → fold must match their DuckDB oracles (the same
comparison the driver runs), and the committed fixtures must be byte-stable
under regeneration."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

from kupo_spark import oracle_sources
from kupo_spark.registry import _q_hydra_fold, _q_ogmios_fold

REPO = Path(__file__).resolve().parent.parent


def _norm(v):
    if v is None:
        return None
    return str(v)


def _compare(df, duck_sql):
    import duckdb

    cols = sorted(df.columns)
    spark_rows = sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.collect()
    )
    con = duckdb.connect()
    res = con.execute(duck_sql)
    dcols = [d[0] for d in res.description]
    assert sorted(dcols) == cols
    order = [dcols.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(row[i]) for i in order) for row in res.fetchall())
    con.close()
    assert spark_rows == duck_rows
    return len(spark_rows)


def test_ogmios_fold_matches_sql_oracle(spark):
    sql = (
        f"SELECT 'plain' AS arm, * FROM ({oracle_sources.ogmios_fold_sql()})\n"
        "UNION ALL\n"
        f"SELECT 'canonical' AS arm, * FROM "
        f"({oracle_sources.ogmios_canonical_fold_sql()})"
    )
    n = _compare(_q_ogmios_fold(spark, ""), sql)
    assert n > 50  # both arms, incl. the collateral-return paths


def test_hydra_fold_matches_golden_sidecar(spark):
    n = _compare(_q_hydra_fold(spark, ""), oracle_sources.hydra_fold_sql())
    assert n == 9


def test_ogmios_collateral_semantics_in_fixture(spark):
    """The fixture exercises the S8 corner: tx5 (collateral mode) keeps ONLY
    its return output at offset index 2, which tx7 then consumes; tx9
    (collateral, no return) contributes nothing and its phantom outputs
    cannot be spent."""
    rows = {r.output_reference: r for r in _q_ogmios_fold(spark, "").collect()}
    tx5 = [r for r in rows.values() if r.transaction_id.startswith(
        __import__("hashlib").md5(b"fxotx5").hexdigest())]
    assert len(tx5) == 1 and tx5[0].output_index == 2
    assert tx5[0].spent_by is not None  # consumed by tx7
    tx9 = [r for r in rows.values() if r.transaction_id.startswith(
        __import__("hashlib").md5(b"fxotx9").hexdigest())]
    assert tx9 == []


def test_fixtures_are_byte_stable(tmp_path):
    """Regenerating must reproduce the committed bytes exactly."""
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_source_fixtures.py"), str(tmp_path)],
        check=True,
        capture_output=True,
    )
    for name in (
        "ogmios_nextblock.ndjson",
        "hydra_serveroutput.ndjson",
        "hydra_expected.ndjson",
        "ogmios_segments/seg-000.jsonl",
        "ogmios_segments/seg-001.jsonl",
        "ogmios_segments/seg-002.jsonl",
    ):
        assert (tmp_path / name).read_bytes() == (
            REPO / "fixtures" / name
        ).read_bytes(), name
