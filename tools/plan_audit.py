"""Mechanical plan audit across the ENTIRE suite registry.

For every query in ``__spark_entry__.queries()`` this builds the DataFrame
(no execution beyond what plan construction needs) and records the
physical-plan properties that matter at 100 TB:

- scan / exchange / broadcast-join counts
- nested-loop or cartesian joins (always a red flag on fact-sized inputs)
- single-partition global windows (serialization bottleneck)
- Python row-at-a-time UDF evaluation (BatchEvalPython — the slow path;
  Arrow-vectorized stages show as ArrowEvalPython/MapInPandas instead)

Output: one JSON object per query in ``PLANS_AUDIT.json`` plus a summary
line. Queries that RUN work at plan-build time (the source round-trips
write temp files; iterative operators like connected components execute
rounds) are still audited — their final returned plan is what's inspected.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlitedataframe_spark.plans import (  # noqa: E402
    broadcast_join_count,
    exchange_count,
    explain_text,
    foldable_partition_window_count,
    global_window_count,
    scan_count,
    upstream_global_sort_count,
)


def decimal_output_cols(schema, prefix="") -> list:
    """Output columns typed as DecimalType at ANY scale, recursively
    through arrays/structs — banned from hashed output by the r12 suite
    convention. Evidence chain: the r10 agg_decimal_ledger probe proved
    the driver's normalizer reds fractional-scale Decimals on
    bit-identical cells (VERDICT r10 #1), and the r11 integer-scale
    DECIMAL(38,0) re-emit was STILL driver-red while the BIGINT>2^53 and
    full-precision-double probes stayed green (VERDICT r11 #1) — the
    Decimal TYPE itself diverges in the driver hash. Exact wide integers
    ship as VARCHAR digits or hi/lo BIGINT limbs instead (probe pair
    profile_wide_varchar / profile_wide_limbs). An ERROR like foldable
    windows, never a flag."""
    from pyspark.sql.types import ArrayType, DecimalType, StructType

    out = []
    if isinstance(schema, StructType):
        for f in schema.fields:
            out += decimal_output_cols(f.dataType, prefix + f.name)
    elif isinstance(schema, DecimalType):
        out.append(prefix)
    elif isinstance(schema, ArrayType):
        out += decimal_output_cols(schema.elementType, prefix + "[]")
    return out


def audit_one(df) -> dict:
    plan = explain_text(df)
    return {
        "decimal_output_cols": decimal_output_cols(df.schema),
        "scans": scan_count(df),
        "exchanges": exchange_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "nested_loop_or_cartesian": (
            "NestedLoop" in plan or "Cartesian" in plan
        ),
        "global_windows": global_window_count(df),
        # partitionBy key set made entirely of literals: Catalyst folds it
        # to a GLOBAL window (the r9 retrieval-rank bug). An ERROR, never
        # an adjudicatable flag — there is no benign reading of it.
        "foldable_partition_windows": foldable_partition_window_count(df),
        "python_row_udf": "BatchEvalPython" in plan,
        # global Sort / range Exchange / CollectLimit feeding a WIDE
        # downstream operator (presentation-tail orderBys don't count):
        # would be invisible in the other rows (VERDICT r4 #8)
        "upstream_global_sorts": upstream_global_sort_count(df),
    }


def main() -> None:
    from sqlitedataframe_spark.session import get_spark
    from sqlitedataframe_spark.suite import load_all

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = get_spark("plan-audit")
    out: dict[str, dict] = {}
    flagged: list[str] = []
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        try:
            row = audit_one(q.spark_fn(spark, sf_dir))
        except Exception as e:  # audit must not die on one bad query
            row = {"error": f"{type(e).__name__}: {e}"[:200]}
        finally:
            try:  # eager_cache frames are per-query state; don't accumulate
                from sqlitedataframe_spark.operators.util import release_caches

                release_caches()
            except Exception:
                pass
        out[name] = row
        if (
            row.get("nested_loop_or_cartesian")
            or row.get("python_row_udf")
            or row.get("upstream_global_sorts")
        ):
            flagged.append(name)
        bad = " FLAG" if name in flagged else ""
        print(f"{name}: {row}{bad}", file=sys.stderr)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "PLANS_AUDIT.json") if not only else "/dev/stdout"
    payload = {
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "flagged_nested_loop_or_row_udf": flagged,
        "queries": out,
    }
    if only:
        print(json.dumps(payload, indent=1))
    else:
        with open(path, "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps({
            "n_queries": len(out),
            "flagged": flagged,
            "detail": "PLANS_AUDIT.json",
        }))
    # structural gate: every flag must carry an adjudication reason in the
    # in-repo allowlist — a NEW cartesian/row-UDF fails loudly, not in prose
    from sqlitedataframe_spark.plans.flags import BENIGN_NESTED_LOOP

    unadjudicated = sorted(set(flagged) - set(BENIGN_NESTED_LOOP))
    if unadjudicated:
        print(f"UNADJUDICATED FLAGS: {unadjudicated}", file=sys.stderr)
        sys.exit(1)
    # r12 convention gate: no query may emit a Decimal-typed output column
    # at ANY scale (driver-normalizer hazard class, VERDICT r10 #1 + r11 #1)
    decs = sorted(n for n, r in out.items() if r.get("decimal_output_cols"))
    if decs:
        print(f"DECIMAL-TYPED OUTPUT: {decs}", file=sys.stderr)
        sys.exit(1)
    # HARD ERRORS (no adjudication path): a window over a constant-foldable
    # partition key set, or any plain global window — both serialize the
    # whole input through one task at scale (VERDICT r9 task #5).
    errors = sorted(
        name
        for name, row in out.items()
        if row.get("foldable_partition_windows") or row.get("global_windows")
    )
    if errors:
        print(f"GLOBAL/FOLDABLE WINDOW ERRORS: {errors}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
