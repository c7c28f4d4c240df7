"""Physical-plan auditing: assert the plans we *want*, not just the ones
that pass.

Every hot path in this engine has a plan contract (filters reach the
scan, small sides broadcast, codegen spans stay wide, no accidental
cartesian); these helpers make those contracts testable
(tests/test_plan_audit.py) and printable for BASELINE notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan nodes (parquet pushdown)."""
    plan = plan_string(df)
    return "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)


def read_schema(df: DataFrame) -> str:
    plan = plan_string(df)
    return "\n".join(l for l in plan.splitlines() if "ReadSchema" in l)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, "simple") or "BroadcastNestedLoopJoin" in plan_string(df, "simple")


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in plan_string(df, "simple")


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages in the plan (formatted mode
    tags member nodes with ``[codegen id : N]``)."""
    import re

    ids = set(re.findall(r"codegen id : (\d+)", plan_string(df, "formatted")))
    return len(ids)


def scan_column_count(df: DataFrame) -> int:
    """Number of columns actually read from parquet (column pruning
    check): parsed from ReadSchema."""
    rs = read_schema(df)
    if not rs:
        return -1
    inner = rs.split("ReadSchema:", 1)[1]
    return inner.count(":")
