"""Physical-plan hygiene checks.

The 100 TB design rules that matter are invisible in results and only
visible in plans: did the filter reach the parquet scan (PushedFilters),
did the dim join broadcast (BroadcastHashJoin), did a rewrite
accidentally introduce a cartesian product. These helpers turn those
rules into assertions, so tests/test_plans.py enforces plan shape the
same way the oracle tests enforce values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a scan's PushedFilters list."""
    plan = formatted_plan(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    joined = "\n".join(pushed)
    missing = [f for f in fragments if f not in joined]
    assert not missing, (
        f"filters not pushed to scan: {missing}\nPushedFilters lines:\n{joined}"
    )


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, (
        f"expected >= {at_least} BroadcastHashJoin, found {n}\n{plan}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def assert_read_schema_only(df: DataFrame, table_hint: str, *cols: str) -> None:
    """Column pruning check: the scan's ReadSchema must contain exactly
    the expected columns (order-insensitive)."""
    plan = formatted_plan(df)
    # In formatted explain each scan block prints Location before
    # ReadSchema; pair them so the hint restricts which scan is checked
    # (the ReadSchema line itself never names the table).
    schemas = []
    location = ""
    for line in plan.splitlines():
        if "Location" in line:
            location = line
        elif "ReadSchema" in line and (not table_hint or table_hint in location):
            schemas.append(line)
    assert schemas, (
        f"no ReadSchema lines for scan matching {table_hint!r} in plan\n{plan}"
    )
    want = set(cols)
    for line in schemas:
        got = {
            frag.split(":")[0].strip()
            for frag in line.split("struct<", 1)[-1].rstrip(">").split(",")
            if frag
        }
        if got == want:
            return
    raise AssertionError(
        f"no scan reads exactly {sorted(want)};\n" + "\n".join(schemas)
    )
