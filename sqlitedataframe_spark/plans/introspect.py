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
    scale). Scale-safe plans assert this == 0.

    A Window line in the simple-mode tree prints up to three top-level
    bracket groups: ``[exprs]``, ``[partition spec]``, ``[order spec]`` —
    empty specs are omitted, so both a global ordered window and a
    partitioned unordered one print TWO groups. Disambiguate by content:
    an order spec's entries carry ``ASC``/``DESC`` sort directions, a
    partition spec's never do.

    Parsing is shared with :func:`_window_bracket_groups`, whose prefix
    strip includes the ``:`` tree-bar that join branches prepend — the
    r11 inline version lstripped only ``+-*( )0123456789``, so every
    Window under a join branch was invisible and the count returned 0
    while Spark warned "No Partition Defined" (ADVICE r11 #1)."""
    count = 0
    for line in explain_text(df, "simple").splitlines():
        groups = _window_bracket_groups(line)
        if not groups:
            continue
        if len(groups) >= 3:
            continue  # exprs + partition + order: partitioned
        if len(groups) == 2:
            last = groups[-1]
            # [exprs], [partition]: partitioned (unordered) — safe.
            # [exprs], [order]: GLOBAL ordered window.
            if " ASC" in last or " DESC" in last:
                count += 1
            continue
        count += 1  # exprs only: global unordered window
    return count


#: Operators that consume their whole input again (a global sort feeding
#: one of these is a real serialization point, not result presentation).
_WIDE_OP = re.compile(
    r"SortMergeJoin|ShuffledHashJoin|Broadcast(?:Hash|NestedLoop)Join"
    r"|CartesianProduct|HashAggregate|ObjectHashAggregate|SortAggregate"
    r"|Window\b|Exchange hashpartitioning"
)
#: Nodes that serialize: a GLOBAL sort (`Sort [...], true`), a
#: planner-inserted range shuffle (ENSURE_REQUIREMENTS — the shuffle a
#: global orderBy plants), or a driver-side CollectLimit. An EXPLICIT
#: repartitionByRange (origin REPARTITION_BY_NUM/COL) is excluded: that is
#: a deliberate partition-parallel layout choice (zipWithIndex, range
#: bucketing), not an ordering the planner had to satisfy.
_GLOBAL_NODE = re.compile(
    r"Sort \[[^\]]*\], true"
    r"|Exchange rangepartitioning(?![^\n]*REPARTITION_BY)"
    r"|CollectLimit"
)


def upstream_global_sort_count(df: DataFrame) -> int:
    """Number of global-Sort / range-Exchange / CollectLimit nodes that FEED
    a wide operator (join/aggregate/window/shuffle) downstream — i.e. the
    serializing node has a wide ancestor in the plan tree. A global orderBy
    as the RESULT-PRESENTATION tail is fine (the driver reads it anyway);
    the same node upstream of more distributed work is a scale bug this
    guard makes visible (VERDICT r4 #8). Ancestors are recovered from the
    simple-mode tree's indentation: a line's ancestors are the most recent
    lines at each smaller depth."""
    return _upstream_global_sort_count_text(explain_text(df, "simple"))


def _upstream_global_sort_count_text(text: str) -> int:
    """Core of :func:`upstream_global_sort_count` over a simple-mode plan
    string (separable so the detector itself is unit-testable — Catalyst's
    EliminateSorts/TakeOrderedAndProject rewrites make the flagged shapes
    unconstructible from the DataFrame API, which is exactly why only a
    plan REGRESSION would ever trip this guard)."""
    count = 0
    depth_stack: list[tuple[int, str]] = []  # (depth, line) of open ancestors
    for line in text.splitlines():
        m = re.search(r"[A-Za-z(]", line)
        if m is None:
            continue
        depth = m.start()
        while depth_stack and depth_stack[-1][0] >= depth:
            depth_stack.pop()
        if _GLOBAL_NODE.search(line) and any(
            _WIDE_OP.search(anc) for _, anc in depth_stack
        ):
            count += 1
        depth_stack.append((depth, line))
    return count


def _window_bracket_groups(line: str) -> list[str]:
    """Top-level ``[...]`` groups of a plan-tree ``Window`` line (shared by
    the physical and logical window parsers)."""
    stripped = line.strip().lstrip("+-*:( )0123456789")
    if not stripped.startswith("Window "):
        return []
    body = stripped[len("Window ") :]
    depth, start, groups = 0, None, []
    for i, ch in enumerate(body):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(body[start : i + 1])
                start = None
    return groups


def foldable_partition_window_count(df: DataFrame) -> int:
    """Number of Window operators in the ANALYZED logical plan whose
    partition spec is non-empty but contains NO attribute reference —
    i.e. every key is a literal Catalyst will constant-fold away, turning
    the window into a single-task GLOBAL window at execution (the r9
    ``partitionBy(lit(0))`` retrieval-rank bug, caught then only by a
    manual audit-diff read).

    Why the analyzed plan: by physical-plan time the foldable keys are
    already GONE (the window prints as plain global and is merely
    counted by :func:`global_window_count`, which historically was a
    reportable number, not an error). The analyzed plan still shows the
    author's literal key (e.g. ``[0]``), so this rule catches the exact
    API misuse before optimization can disguise intent. Attribute
    references always print as ``name#id`` in the analyzed tree, so a
    partition group without ``#`` can only hold literals/foldables.
    """
    text = explain_text(df, "extended")
    try:
        ana = text.split("== Analyzed Logical Plan ==")[1].split(
            "== Optimized"
        )[0]
    except IndexError:
        return 0
    count = 0
    for line in ana.splitlines():
        groups = _window_bracket_groups(line)
        if len(groups) < 2:
            continue  # no partition spec: plain global, not this rule
        if len(groups) == 2:
            # [exprs],[partition] vs [exprs],[order]: order entries carry
            # sort directions, partition entries never do
            part = groups[1]
            if " ASC" in part or " DESC" in part:
                continue
        else:
            part = groups[1]
        inner = part.strip("[] ")
        if inner and "#" not in inner:
            count += 1
    return count


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans; fewer spans for the same plan
    means wider fused pipelines."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_text(df, "formatted"))))
