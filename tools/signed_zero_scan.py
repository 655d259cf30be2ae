"""Suite-wide signed-zero defense (VERDICT r8 task #3): run EVERY registry
oracle in DuckDB at a given sf and flag any cell that is IEEE -0.0.

Why: the driver's value hash distinguishes -0.0 from +0.0. DuckDB's ROUND
of a tiny negative (e.g. a t-statistic of -6.6e-6) yields -0.0 while
Spark's BigDecimal-based ROUND yields +0.0 — so any oracle that can emit a
-0.0 cell is a latent driver hash-red even when every value is numerically
equal (this kept events_welch_ttest red for rounds 7 and 8). The fix
convention is `ROUND(...) + 0.0` on BOTH sides (IEEE: -0.0 + 0.0 = +0.0).

This scan is cheap (DuckDB only; no Spark session) and is part of the
close gate. The Spark side is defended by tools/oracle_check.py whose
norm_cell is now signed-zero-strict, so a Spark-side -0.0 vs oracle +0.0
would fail the sf0.1 gate.

Usage:
    python tools/signed_zero_scan.py [sf_dir ...]

Exit code 1 if any -0.0 cell is found anywhere in any oracle's output.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from sqlitedataframe_spark.io import TABLES, table_path  # noqa: E402
from sqlitedataframe_spark.suite import load_all  # noqa: E402


def _neg_zero_cells(v) -> int:
    """Count -0.0 occurrences in a cell (descends into lists)."""
    if isinstance(v, float):
        return 1 if (v == 0.0 and math.copysign(1.0, v) < 0) else 0
    if isinstance(v, (list, tuple)):
        return sum(_neg_zero_cells(x) for x in v)
    return 0


def scan_sf(sf_dir: str) -> int:
    registry = load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    n_flagged = n_ok = n_noracle = n_err = 0
    for name, q in sorted(registry.items()):
        if q.oracle is None:
            n_noracle += 1
            continue
        t0 = time.time()
        try:
            rows = con.sql(q.oracle).fetchall()
        except Exception as e:  # oracle must at least execute
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:200]}")
            n_err += 1
            continue
        hits = sum(_neg_zero_cells(c) for r in rows for c in r)
        if hits:
            print(f"NEGZERO {name}: {hits} -0.0 cell(s) [{time.time()-t0:.1f}s]")
            n_flagged += 1
        else:
            n_ok += 1
    print(
        f"[{sf_dir}] {n_ok} clean, {n_flagged} with -0.0 cells, "
        f"{n_noracle} no-oracle, {n_err} errors"
    )
    return 1 if (n_flagged or n_err) else 0


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    rc = 0
    for sf_dir in sf_dirs:
        rc |= scan_sf(sf_dir)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
