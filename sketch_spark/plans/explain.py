"""Physical-plan inspection helpers.

Catalyst gives the scale-critical optimizations for free *if* the plan
is declared right (SURVEY.md §4.2); these helpers let tests assert that
they actually fired — pushed filters reach the parquet scan, the scan
reads only the projected columns (never ``html`` on the sketch path),
small sides broadcast.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> str:
    """Assert every fragment appears in the scan's PushedFilters."""
    plan = explain_str(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = " ; ".join(m)
    for frag in fragments:
        if frag not in pushed:
            raise AssertionError(
                f"filter {frag!r} not pushed to scan. PushedFilters: {pushed!r}\n{plan}"
            )
    return pushed


def assert_read_schema_only(df: DataFrame, allowed: set[str], forbidden: set[str] = frozenset()) -> str:
    """Assert the parquet ReadSchema is pruned to ``allowed`` columns."""
    plan = explain_str(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    for s in schemas:
        cols = {c.split(":")[0].strip() for c in s.split(",") if c.strip()}
        extra = cols - set(allowed)
        if extra:
            raise AssertionError(f"scan reads unexpected columns {extra}; plan:\n{plan}")
        bad = cols & set(forbidden)
        if bad:
            raise AssertionError(f"scan reads forbidden columns {bad}; plan:\n{plan}")
    return ";".join(schemas)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)
