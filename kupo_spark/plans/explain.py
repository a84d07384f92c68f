"""Physical-plan assertions — the Spark analog of kupo's EXPLAIN QUERY PLAN
golden tests (test/Test/Kupo/Data/DatabaseSpec.hs:359-700): every important
query shape must keep its intended physical properties (pushdown, pruning,
broadcast) across refactors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:  # noqa: BLE001 - fall back to capturing explain()
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str) -> str:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan is missing {missing}:\n{plan}")
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str) -> str:
    plan = formatted_plan(df)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(f"plan unexpectedly contains {present}:\n{plan}")
    return plan
