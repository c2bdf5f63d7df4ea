"""Physical-plan introspection: the properties worth asserting before
trusting a plan at 100 TB. Used by tests/test_plans.py and handy
interactively (`print(audit(df))`)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_count(df: DataFrame) -> int:
    return plan_string(df).count("FileScan")


def exchange_count(df: DataFrame) -> int:
    return plan_string(df).count("Exchange")


def broadcast_join_count(df: DataFrame) -> int:
    return plan_string(df).count("BroadcastHashJoin")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True when `fragment` appears inside a PushedFilters list."""
    plan = plan_string(df)
    return any(fragment in seg[:500] for seg in plan.split("PushedFilters: [")[1:])


def has_cartesian(df: DataFrame) -> bool:
    plan = plan_string(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def audit(df: DataFrame) -> dict[str, object]:
    plan = plan_string(df)
    return {
        "scans": plan.count("FileScan"),
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "cartesian": "CartesianProduct" in plan,
        "python_stages": plan.count("ArrowEvalPython") + plan.count("BatchEvalPython"),
        "read_schemas": [
            seg[: seg.index(">") + 1] if ">" in seg[:400] else seg[:120]
            for seg in plan.split("ReadSchema: ")[1:]
        ],
    }
