"""Plan auditing: turn ``df.explain()`` text into a structured verdict so
scale hazards are checkable in code, not by eyeballing plan dumps.

The engine's own test suite asserts plan shapes query by query
(tests/test_plans.py); this module packages the same checks as a runtime
utility — a user composing NEW pipelines on the engine's operators can
gate a deploy on ``audit_plan(df)["warnings"] == []`` the way the repo's
CI gates its registered queries. Every check is textual over the
formatted physical plan: stable across Spark 3.x/4.x, zero execution
cost (the plan is compiled, never run).

Checks encode the brief's 100 TB rules:
  - cartesian / broadcast-nested-loop joins   → quadratic blowup
  - exchange count                            → shuffle budget
  - pushed filters + read schema              → scan does the pruning
  - WholeStageCodegen coverage                → JVM-side, not interpreted
  - TakeOrderedAndProject                     → top-k without global sort
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def _formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_plan(df: DataFrame, max_exchanges: int | None = None) -> dict:
    """Structured audit of a DataFrame's compiled physical plan.

    Returns a dict with the raw measurements plus a ``warnings`` list of
    human-readable findings; an empty list means none of the hazard
    patterns appear. ``max_exchanges`` adds a budget check when the
    caller knows how many shuffles the pipeline SHOULD need."""
    plan = _formatted_plan(df)
    # "formatted" mode prints each operator TWICE — once in the tree
    # ("Exchange (4)") and once as a detail header ("(4) Exchange") — so
    # instance counts come from the detail headers only.
    ops = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    n_exchanges = sum(1 for o in ops if o == "Exchange")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    result = {
        "cartesian": "CartesianProduct" in plan,
        "broadcast_nested_loop": "BroadcastNestedLoopJoin" in plan,
        "n_exchanges": n_exchanges,
        "n_broadcast_joins": sum(1 for o in ops if o == "BroadcastHashJoin"),
        "n_sort_merge_joins": sum(1 for o in ops if o == "SortMergeJoin"),
        "n_codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schemas": read_schemas,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "uses_cache": "InMemoryTableScan" in plan,
        "plan": plan,
    }
    warnings = []
    if result["cartesian"]:
        warnings.append("CartesianProduct: quadratic pair expansion")
    if result["broadcast_nested_loop"]:
        warnings.append(
            "BroadcastNestedLoopJoin: non-equi join — verify one side is a "
            "bounded scalar/tiny relation, not data-sized"
        )
    if max_exchanges is not None and n_exchanges > max_exchanges:
        warnings.append(
            f"{n_exchanges} exchanges exceeds the declared budget of "
            f"{max_exchanges}"
        )
    full_scans = [s for s in read_schemas if s.count(",") >= 8]
    if full_scans and not result["uses_cache"]:
        warnings.append(
            "wide scan: a ReadSchema carries 9+ columns — check column "
            "pruning reaches the source"
        )
    result["warnings"] = warnings
    return result
