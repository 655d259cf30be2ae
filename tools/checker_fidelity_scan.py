"""Checker-fidelity scan (VERDICT r9 task #1).

The r7/r8 ``events_welch_ttest`` red taught that the DRIVER's value hash
can be stricter than the local gate's ``norm_cell``: the local normalizer
collapsed -0.0 and +0.0 to "0" while the driver distinguished them, so a
real cross-engine divergence was invisible to every local gate for two
rounds. ``norm_cell`` still performs three other normalization collapses
of the same hazard class (tools/oracle_check.py):

  1. float==int  -> int rendering for |v| < 1e15   ("intfloat")
  2. Decimal     -> float conversion               ("decimal")
  3. float repr  -> 9-dp rounded repr              ("repr9")
  (4. datetime   -> strftime; scans bucket any remaining type-tagged
      difference as "other")

This tool measures whether any registry oracle actually RELIES on one of
those collapses: for every query it runs Spark and DuckDB, renders each
cell twice — once with the gate's ``norm_cell`` and once with a STRICT
type-tagged full repr (no rounding, no cross-type coercion) — and flags
queries whose normalized row multisets agree while the strict ones
differ. Each differing cell is classified into the classes above.

Evidence logic: the driver compares at sf0.01 on the same deterministic
fixtures, so a collapse found here at sf0.01 in a query with a
driver-green CORRECTNESS row means EITHER the driver also collapses that
class at those cells, or the divergence post-dates the green row. Both
cases are worth eliminating: a query whose two engines emit bit- and
type-identical cells is green under ANY normalizer, which is the only
state that is provably driver-proof.

Usage:
    python tools/checker_fidelity_scan.py [sf_dir ...] [--only q1,q2]

Writes a per-query line and a final per-class summary; exit 1 iff any
collapse (or ordinary mismatch) is found.
"""

from __future__ import annotations

import datetime as dt
import sys
import time
from collections import Counter
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

from sqlitedataframe_spark.io import TABLES, table_path  # noqa: E402
from sqlitedataframe_spark.session import get_spark  # noqa: E402
from sqlitedataframe_spark.suite import load_all  # noqa: E402
from tools.oracle_check import norm_cell  # noqa: E402


def strict_cell(v) -> str:
    """Type-tagged, full-precision rendering: two cells render equal iff
    they are the same Python type AND the same exact value (bit-exact for
    floats via repr, scale-exact for Decimals via str)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{int(v)}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, dt.datetime):
        return "ts:" + v.isoformat()
    if isinstance(v, dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "b:" + bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(strict_cell(x) for x in v) + "]"
    return "s:" + str(v)


def classify(a, b) -> str:
    """Name the norm_cell collapse that makes cells a (spark) and b
    (oracle) agree despite differing strictly."""
    ta, tb = type(a), type(b)
    num = (int, float, Decimal)
    if isinstance(a, num) and isinstance(b, num) and not isinstance(a, bool) and not isinstance(b, bool):
        if isinstance(a, Decimal) or isinstance(b, Decimal):
            # r11 (VERDICT r10 #2): fractional-scale Decimals are their own
            # class — the r10 agg_decimal_ledger probe proved the driver's
            # normalizer handles them divergently (local STRICT_OK, driver
            # red) while integral-scale DECIMAL(38,0) cells are driver-safe.
            if any(
                isinstance(x, Decimal) and x.as_tuple().exponent < 0
                for x in (a, b)
            ):
                return "decimal_frac"
            return "decimal_int"
        if isinstance(a, float) != isinstance(b, float):
            return "intfloat"
        if isinstance(a, float) and isinstance(b, float):
            if (a == 0.0) != (b == 0.0) or (
                a == 0.0 and (str(a)[0] == "-") != (str(b)[0] == "-")
            ):
                return "signed_zero"
            return "repr9"
    if isinstance(a, list) and isinstance(b, list) and len(a) == len(b):
        for x, y in zip(a, b):
            if strict_cell(x) != strict_cell(y):
                return "list:" + classify(x, y)
        return "list:?"
    return f"other({ta.__name__} vs {tb.__name__})"


def norm_line(cols, row, order):
    return "|".join(norm_cell(row[i]) for i in order)


def _dec_out_cols(cols, rows) -> set:
    """Column names whose cells contain a Decimal at ANY scale — banned
    from hashed output by the r12 suite convention (r10 proved the
    driver reds fractional-scale Decimals on bit-identical cells; r11
    proved it reds integer-scale DECIMAL(38,0) too while BIGINT>2^53 and
    full-precision-double cells stay green — the Decimal TYPE itself is
    the hazard; VERDICT r10 #1, r11 #1)."""
    out = set()
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, Decimal):
                out.add(cols[i])
    return out


def scan_query(name, q, spark, con, sf_dir):
    sdf = q.spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    try:
        from sqlitedataframe_spark.operators.util import release_caches

        release_caches()
    except Exception:
        pass
    res = con.sql(q.oracle)
    ocols = list(res.columns)
    orows = res.fetchall()
    decout = _dec_out_cols(scols, srows) | _dec_out_cols(ocols, orows)
    if decout:
        return (
            "DECOUT",
            "Decimal-typed output cols: " + ",".join(sorted(decout)),
            Counter(),
        )
    if len(srows) != len(orows) or sorted(scols) != sorted(ocols):
        return ("MISMATCH", f"rows {len(srows)}/{len(orows)} cols", Counter())
    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
    # group rows of both engines by their NORMALIZED line; within a group,
    # pair spark/oracle rows in sorted strict order and diff cell-by-cell
    sgroups: dict[str, list[tuple]] = {}
    ogroups: dict[str, list[tuple]] = {}
    for r in srows:
        sgroups.setdefault(norm_line(scols, r, sorder), []).append(
            tuple(r[i] for i in sorder)
        )
    for r in orows:
        ogroups.setdefault(norm_line(ocols, r, oorder), []).append(
            tuple(r[i] for i in oorder)
        )
    if set(sgroups) != set(ogroups) or any(
        len(sgroups[k]) != len(ogroups[k]) for k in sgroups
    ):
        return ("MISMATCH", "normalized hash differs", Counter())
    classes: Counter = Counter()
    samples = []
    for k, srs in sgroups.items():
        ors = ogroups[k]
        for sr, orow in zip(
            sorted(srs, key=lambda t: [strict_cell(c) for c in t]),
            sorted(ors, key=lambda t: [strict_cell(c) for c in t]),
        ):
            for i, (a, b) in enumerate(zip(sr, orow)):
                sa, sb = strict_cell(a), strict_cell(b)
                if sa != sb:
                    cls = classify(a, b)
                    classes[cls] += 1
                    if len(samples) < 3:
                        col = sorted(scols)[i]
                        samples.append(f"{col}: spark={sa} oracle={sb} [{cls}]")
    if classes:
        return ("COLLAPSE", "; ".join(samples), classes)
    return ("STRICT_OK", "", Counter())


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))
    sf_dirs = args or ["/root/testdata/sf0.01"]
    registry = load_all()
    spark = get_spark("checker-fidelity")
    total_collapse = total_mismatch = 0
    grand: Counter = Counter()
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{table_path(sf_dir, t)}')"
            )
        n_ok = n_col = n_mis = n_frac = 0
        print(f"== {sf_dir} ==")
        for name, q in sorted(registry.items()):
            if only and name not in only:
                continue
            if q.oracle is None:
                continue
            t0 = time.time()
            try:
                status, detail, classes = scan_query(name, q, spark, con, sf_dir)
            except Exception as e:  # noqa: BLE001
                status, detail, classes = (
                    "MISMATCH",
                    f"{type(e).__name__}: {str(e)[:200]}",
                    Counter(),
                )
            el = time.time() - t0
            if status == "STRICT_OK":
                n_ok += 1
                print(f"STRICT_OK  {name} [{el:.1f}s]")
            elif status == "COLLAPSE":
                n_col += 1
                grand.update(classes)
                print(
                    f"COLLAPSE   {name}: {sum(classes.values())} cells "
                    f"{dict(classes)} | {detail} [{el:.1f}s]"
                )
            elif status == "DECOUT":
                n_frac += 1
                print(f"DECOUT     {name}: {detail} [{el:.1f}s]")
            else:
                n_mis += 1
                print(f"MISMATCH   {name}: {detail} [{el:.1f}s]")
        con.close()
        total_collapse += n_col
        total_mismatch += n_mis + n_frac
        print(
            f"-- {sf_dir}: {n_ok} strict-ok, {n_col} collapse, "
            f"{n_mis} mismatch, {n_frac} decimal-typed-output"
        )
    print(f"\nclass totals: {dict(grand)}")
    print(
        f"TOTAL: {total_collapse} collapsing queries, "
        f"{total_mismatch} mismatches"
    )
    return 1 if (total_collapse or total_mismatch) else 0


if __name__ == "__main__":
    raise SystemExit(main())
