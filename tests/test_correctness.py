"""DuckDB-oracle hash-equality for every declared query — the local analog
of the driver's t2 gate (and of kupo's pattern→SQL equality property,
reference test layer (b) at test/Test/Kupo/Data/DatabaseSpec.hs:216-226),
at sf0.001 for speed."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tools.check_correctness import rows_key


def _all_query_names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, SF_DIR)
    srows = [list(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    osql = e.oracle_sql().get(name)
    if osql is None:
        pytest.skip("rows-only query")
    res = duck.execute(osql)
    ocols = [d[0].lower() for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert rows_key(srows, scols) == rows_key(orows, ocols)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "output_reference" in df.columns
