"""Capture and parse ``df.explain`` output.

Why string-parsing: PySpark exposes no structured physical-plan API; the
formatted explain text is the stable public surface (it is what every Spark
operator reads when tuning). Helpers return simple Python values so tests
can assert plan shape — e.g. "this filter reached the parquet scan",
"this join broadcasts", "this pipeline has exactly N shuffles".
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (modes: simple, extended, codegen,
    cost, formatted)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans, flattened.
    Empty list means no filter reached any scan."""
    text = explain_text(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Per-scan list of column names actually read from the file (the
    column-pruning result): one inner list per ReadSchema in the plan."""
    text = explain_text(df, "formatted")
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        body = m.group(1)
        cols = [p.split(":")[0].strip() for p in body.split(",") if ":" in p]
        schemas.append(cols)
    return schemas


def partition_filters(df: DataFrame) -> list[str]:
    """All PartitionFilters entries across the plan's file scans — non-empty
    means partition pruning will skip directories at the source."""
    text = explain_text(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", text):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def scan_count(df: DataFrame) -> int:
    """Number of file scans in the physical plan (simple-mode tree: one
    line per operator)."""
    return len(
        re.findall(r"FileScan \w+|BatchScan \w+", explain_text(df, "simple"))
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may later
    coalesce partitions but not remove a planned exchange). Broadcast
    exchanges are excluded — they are the cheap kind. Counted on the
    simple-mode tree, where each operator appears exactly once."""
    text = explain_text(df, "simple")
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", text
        )
    )


def broadcast_join_count(df: DataFrame) -> int:
    """Number of BroadcastHashJoin / BroadcastNestedLoopJoin operators
    (simple-mode tree: one line per operator)."""
    return len(re.findall(r"Broadcast(?:Hash|NestedLoop)Join", explain_text(df, "simple")))


def global_window_count(df: DataFrame) -> int:
    """Number of UNPARTITIONED Window operators — the ones Spark executes on
    a single task ("No Partition Defined" warning; total serialization at
    scale). A partitioned Window line in the simple-mode tree has three
    top-level bracket groups (exprs, partition spec, order spec); a global
    one has two (no partition spec). Scale-safe plans assert this == 0."""
    count = 0
    for line in explain_text(df, "simple").splitlines():
        stripped = line.strip().lstrip("+-*( )0123456789")
        if not stripped.startswith("Window "):
            continue
        # Split on top-level "], [" separators to count bracket groups.
        depth, groups = 0, 1
        body = stripped[len("Window ") :]
        for i, ch in enumerate(body):
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0 and body[i : i + 3] == "], ":
                    groups += 1
        if groups < 3:
            count += 1
    return count


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans; fewer spans for the same plan
    means wider fused pipelines."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_text(df, "formatted"))))
