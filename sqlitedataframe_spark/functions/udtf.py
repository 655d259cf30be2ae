"""Python UDTFs (Spark 4) — the table-function tier of the UDF surface
(SURVEY §2 Tier B "UDF / UDAF / UDTF" row; the reference's codec protocol is
scalar-only, so this is a native capability extension).

``json_each`` mirrors SQLite's json_each table function: one output row per
top-level key of a JSON object — the lateral-explode shape. Implemented as a
UDTF rather than from_json+explode to exercise the real table-function
plumbing (class-based UDTF, analyze-free static schema, lateral join use).
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="key: string, value: string")
class JsonEachUDTF:
    """SQLite ``json_each(obj)``: yields (key, value-as-text) per top-level
    entry; non-object / malformed JSON yields nothing (matching json_each's
    behavior of erroring only on totally invalid input — we choose the
    permissive variant for pipeline robustness)."""

    def eval(self, obj: str):
        if obj is None:
            return
        try:
            parsed = json.loads(obj)
        except (ValueError, TypeError):
            return
        if isinstance(parsed, dict):
            for k, v in parsed.items():
                yield str(k), json.dumps(v) if not isinstance(v, str) else v
        elif isinstance(parsed, list):
            for i, v in enumerate(parsed):
                yield str(i), json.dumps(v) if not isinstance(v, str) else v


def register_udtfs(spark) -> None:
    """Register the UDTFs for SQL use (``SELECT ... FROM json_each(...)``)."""
    spark.udtf.register("json_each", JsonEachUDTF)
