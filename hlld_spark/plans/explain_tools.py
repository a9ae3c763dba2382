"""Plan-inspection helpers: programmatic access to the facts the
`.explain` review (PLANS.md) asserts — used by tests and by humans
iterating on operator plans."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """EXPLAIN FORMATTED text: numbered physical nodes + per-node detail
    blocks (Input/Output attribute lists) — lets tests assert which
    columns each Exchange actually carries."""
    from pyspark import SparkContext

    jvm = SparkContext._active_spark_context._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def exchange_inputs(df: DataFrame) -> list[str]:
    """The `Input [n]: [...]` attribute list of every Exchange node in the
    formatted plan (what each shuffle carries)."""
    txt = formatted_plan(df)
    ids = [m.group(1) for m in re.finditer(r"\((\d+)\) Exchange", txt)]
    out = []
    for i in ids:
        m = re.search(rf"\({i}\) Exchange\s*\nInput \[\d+\]: (\[[^\]]*\])", txt)
        if m:
            out.append(m.group(1))
    return out


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
