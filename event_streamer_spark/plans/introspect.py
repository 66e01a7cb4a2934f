"""Helpers to read Spark physical plans programmatically."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The ``explain`` output as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lines from the plan (one per scan)."""
    plan = explain_str(df)
    return [
        line.split("PushedFilters:", 1)[1].strip()
        for line in plan.splitlines()
        if "PushedFilters:" in line
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """All ReadSchema lines — verify column pruning reached the scan."""
    plan = explain_str(df)
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_str(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of distinct Exchange nodes in the tree section (shuffles +
    broadcasts; subtract broadcast exchanges for data shuffles only)."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange ", plan))
