"""Plan-quality assertions — the engine's self-checks that Catalyst is
doing what the 100 TB design assumes.

These parse ``df._jdf.queryExecution().explainString("formatted")`` (same
text as ``df.explain("formatted")``) so tests can assert:

- filters/column pruning reached the parquet scan (``PushedFilters`` /
  ``ReadSchema`` — a scan that reads all columns for a 2-column projection
  is wrong at any scale);
- small dimension joins were broadcast;
- expressions run inside WholeStageCodegen spans (JVM, not row-at-a-time).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_text(df)):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every file scan (column-pruning check)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan_text(df))


def broadcast_join_count(df: DataFrame) -> int:
    return plan_text(df).count("BroadcastHashJoin")


def shuffle_exchange_count(df: DataFrame) -> int:
    """Hash-partitioning Exchange operators in the plan.  Formatted mode
    puts the operator name and its ``Arguments: hashpartitioning(...)`` on
    separate lines (simple mode inlines them), so match both shapes."""
    text = plan_text(df)
    return text.count("Exchange hashpartitioning") + text.count(
        "Arguments: hashpartitioning"
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct codegen stages (formatted mode tags operators with
    ``[codegen id : N]``)."""
    ids = set(re.findall(r"codegen id : (\d+)", plan_text(df)))
    return len(ids)


def assert_column_pruned(df: DataFrame, banned_column: str) -> None:
    """Fail if a file scan still reads ``banned_column`` (e.g. ``content``
    after hashing — the single most expensive mistake at corpus scale)."""
    for schema in read_schemas(df):
        assert banned_column not in schema, (
            f"scan still reads '{banned_column}': {schema}"
        )
