"""Dump .explain("formatted") for named suite queries to plans/<round>/.

Usage:
    [SPARK_GRAFT_PLANS_ROUND=r13] python tools/dump_plans.py <suffix> [query ...]

Writes plans/<round>/<query>_<suffix>.txt for each query (suffix:
before/after; round defaults to r13). Planning only — no query is executed
(except any driver-side model state an operator materializes while BUILDING
its plan, e.g. k-means seed collects).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from sqlitedataframe_spark.session import get_spark  # noqa: E402
from sqlitedataframe_spark.suite import load_all  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)
    reg = load_all()
    spark = get_spark("dump_plans")
    for name in names:
        try:
            df = reg[name].spark_fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    # release anything an operator pinned while building plans
    try:
        from sqlitedataframe_spark.operators.util import release_caches

        release_caches()
    except Exception:
        pass


if __name__ == "__main__":
    main()
