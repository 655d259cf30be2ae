"""Oracle-parity ROBUSTNESS sweep (VERDICT r7 task #2): re-run suite
queries under perturbed Spark runtime configs and verify the value hash
stays identical to the DuckDB oracle under every layout.

Why: a query can pass the single-config gate while a DIFFERENT
partition/CPU layout (the driver's container) changes the partial-sum
order of a raw float aggregate by one ulp and flips a ROUND at a decimal
boundary — exactly how `events_welch_ttest` went driver-red in r7 while
passing 4/4 local re-runs. This sweep makes that class of drift a CI
failure instead of a driver surprise.

Usage:
    python tools/parity_sweep.py [sf_dir] [query ...]   # explicit list
    python tools/parity_sweep.py [sf_dir] --triage      # auto-select the
        float-ROUND-exposed queries (oracle ROUNDs over SUM/AVG/STDDEV of
        non-integer expressions) and sweep those
    python tools/parity_sweep.py [sf_dir] --all         # whole registry

Each query runs once per PERTURBATION below; all four value hashes (3
perturbed + the session default) must equal the oracle's. Configs are
runtime-settable (no JVM restart): shuffle partition count moves the
reduce-side merge order; maxPartitionBytes/openCostInBytes move the scan
split layout and therefore the map-side partial order.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, ".")

from sqlitedataframe_spark.io import TABLES, table_path  # noqa: E402
from sqlitedataframe_spark.session import get_spark  # noqa: E402
from sqlitedataframe_spark.suite import load_all  # noqa: E402
from tools.oracle_check import value_hash  # noqa: E402

#: Runtime-conf perturbations. Named so the report reads like the layout.
PERTURBATIONS: dict[str, dict[str, str]] = {
    "default": {},
    "p1_serial": {
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.files.maxPartitionBytes": "1g",
        "spark.sql.files.openCostInBytes": "0",
    },
    "p7_odd": {
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "262144",
    },
    "p200_wide": {
        "spark.sql.shuffle.partitions": "200",
        "spark.sql.files.maxPartitionBytes": "1m",
        "spark.sql.files.openCostInBytes": "0",
    },
}

#: Oracle-text heuristic for welch-class exposure: a ROUND over an
#: aggregate of something floating (explicit DOUBLE cast, a division, or
#: a float literal) — integer-cents/HUGEINT recipes don't match because
#: their aggregates run over exact integers and ROUND comes after pure
#: integer->double casts.
_FLOAT_AGG = re.compile(
    r"ROUND\s*\([^()]*(?:SUM|AVG|STDDEV|VAR_SAMP|CORR|COVAR)[a-z_]*\s*\(",
    re.IGNORECASE,
)

#: The original welch shape the direct regex misses: a float SUM computed
#: in a CTE (SUM over an explicit DOUBLE cast or a division) whose alias
#: feeds a ROUND later. Dataflow isn't trackable by regex, so any oracle
#: with BOTH a float SUM anywhere AND a ROUND anywhere is selected.
_FLOAT_SUM = re.compile(
    r"SUM\s*\(\s*[^()]*(?:DOUBLE|/)", re.IGNORECASE
)
_ANY_ROUND = re.compile(r"\bROUND\s*\(", re.IGNORECASE)


#: Queries that historically drifted in the driver environment; always
#: swept so a regression in their drift-proofing is caught even after the
#: fix removed the float sum the triage regex keys on.
_PINNED = ("events_welch_ttest",)


def triage(registry) -> list[str]:
    """Names whose oracle ROUNDs a float aggregate — directly, or via a
    CTE alias (float SUM + ROUND both present) — plus the pinned
    historically-drifted set."""
    out = []
    for name, q in sorted(registry.items()):
        if not q.oracle:
            continue
        if name in _PINNED or _FLOAT_AGG.search(q.oracle) or (
            _FLOAT_SUM.search(q.oracle) and _ANY_ROUND.search(q.oracle)
        ):
            out.append(name)
    return out


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if args and not args[0].startswith("--") and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    registry = load_all()
    if "--all" in args:
        names = sorted(registry)
    elif "--triage" in args:
        names = triage(registry)
        print(f"triage selected {len(names)} float-ROUND-exposed queries")
    else:
        names = [a for a in args if not a.startswith("--")]
    names = [n for n in names if registry[n].oracle is not None]

    spark = get_spark("parity-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )

    base_conf = {
        k: spark.conf.get(k, None)
        for p in PERTURBATIONS.values()
        for k in p
    }
    unstable: dict[str, dict[str, str]] = {}
    n_ok = 0
    for name in names:
        q = registry[name]
        res = con.sql(q.oracle)
        ohash = value_hash(list(res.columns), res.fetchall())
        hashes: dict[str, str] = {}
        t0 = time.time()
        try:
            for pname, confs in PERTURBATIONS.items():
                for k, v in confs.items():
                    spark.conf.set(k, v)
                try:
                    sdf = q.spark_fn(spark, sf_dir)
                    hashes[pname] = value_hash(
                        sdf.columns, [tuple(r) for r in sdf.collect()]
                    )
                except Exception as e:  # an error under ANY layout is a fail
                    hashes[pname] = f"ERROR:{type(e).__name__}:{str(e)[:120]}"
                finally:
                    for k in confs:
                        if base_conf.get(k) is not None:
                            spark.conf.set(k, base_conf[k])
                        else:
                            spark.conf.unset(k)
        finally:
            try:
                from sqlitedataframe_spark.operators.util import release_caches

                release_caches()
            except Exception:
                pass
        bad = {p: h for p, h in hashes.items() if h != ohash}
        if bad:
            unstable[name] = bad
            print(f"DRIFT {name}: {sorted(bad)} diverge [{time.time()-t0:.1f}s]")
        else:
            n_ok += 1
            print(
                f"STABLE {name}: {len(PERTURBATIONS)} layouts == oracle "
                f"[{time.time()-t0:.1f}s]"
            )
    print(
        f"\n{n_ok} stable across {len(PERTURBATIONS)} layouts, "
        f"{len(unstable)} unstable"
    )
    if unstable:
        print(json.dumps(unstable, indent=2)[:4000])
    return 1 if unstable else 0


if __name__ == "__main__":
    raise SystemExit(main())
