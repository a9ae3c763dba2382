"""Plan-inspection helpers: programmatic access to the facts the
`.explain` review (PLANS.md) asserts — used by tests and by humans
iterating on operator plans."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_info(df: DataFrame) -> dict:
    """ReadSchema / PushedFilters of the (first) file scan in the plan."""
    plan = executed_plan(df)
    rs = re.search(r"ReadSchema: ([^\n]*)", plan)
    pf = re.search(r"PushedFilters: (\[[^\]]*\])", plan)
    return {
        "read_schema": rs.group(1).strip() if rs else None,
        "pushed_filters": pf.group(1) if pf else None,
        "has_python_map_in_arrow": "MapInArrow" in plan or "PythonMapInArrow" in plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan,
        "n_exchanges": plan.count("Exchange"),
    }


def read_columns(df: DataFrame) -> list[str]:
    info = scan_info(df)
    if not info["read_schema"]:
        return []
    return re.findall(r"(\w+):", info["read_schema"])
