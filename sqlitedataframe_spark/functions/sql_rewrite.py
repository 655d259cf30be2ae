"""String-level SQLite-dialect → Spark SQL rewriting.

The reference's second entry point accepts an arbitrary SQLite SQL string
(DataFrame.init(connection:statement:), SQLiteDataFrame.swift:295-304).
Spark SQL covers nearly the whole dialect already; this module rewrites the
handful of SQLite-specific spellings so such strings run unchanged on
``spark.sql`` — a thin, documented token rewrite, NOT a parser (SURVEY §4:
"a small translation layer ... at the string level, not a custom parser").

Rewrites (conservative — only unambiguous patterns are touched):
- ``expr GLOB 'pat'``        → ``expr RLIKE '<anchored regex>'``
- ``julianday(x)``           → fractional Julian-day expression
- ``unixepoch(x)``           → ``unix_timestamp(x)``
- ``strftime('%...', x)``    → ``date_format(x, '<translated>')``
                               (``%s`` → ``unix_timestamp(x)``)
- ``group_concat(x)`` / ``group_concat(x, 's')``
                             → ``array_join(array_sort(collect_list(x)),s)``
                               (sorted for deterministic distributed output)
- ``printf(fmt, ...)``       → ``format_string(fmt, ...)``
- ``ifnull/instr/hex/abs/…`` need no rewrite (same-named in Spark).

Anything else passes through untouched and gets Spark SQL's (richer)
semantics; true incompatibilities (e.g. SQLite's dynamic typing) surface as
normal analysis errors.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from sqlitedataframe_spark.functions.dialect import _STRFTIME_MAP, glob_to_rlike

#: literal single-quoted SQL string (with '' escapes)
_STR = r"'(?:[^']|'')*'"


def _split_args(arglist: str) -> list[str]:
    """Split a function-call argument list on top-level commas (respects
    nested parens and string literals)."""
    out, depth, cur, i = [], 0, [], 0
    while i < len(arglist):
        ch = arglist[i]
        if ch == "'":
            m = re.match(_STR, arglist[i:])
            cur.append(m.group(0))
            i += m.end()
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur).strip())
    return out


def _rewrite_call(sql: str, fname: str, render) -> str:
    """Replace every ``fname(args)`` call with ``render(args_list)``,
    scanning balanced parens so nested calls survive."""
    pat = re.compile(rf"\b{fname}\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        start, i, depth = m.start(), m.end(), 1
        while i < len(sql) and depth:
            ch = sql[i]
            if ch == "'":
                sm = re.match(_STR, sql[i:])
                i += sm.end()
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        inner = sql[m.end() : i - 1]
        sql = sql[:start] + render(_split_args(inner)) + sql[i:]


def _render_julianday(args: list[str]) -> str:
    (x,) = args
    return f"(unix_micros(cast({x} as timestamp)) / 86400000000.0 + 2440587.5)"


def _render_unixepoch(args: list[str]) -> str:
    (x,) = args
    return f"unix_timestamp({x})"


def _render_strftime(args: list[str]) -> str:
    fmt, x = args[0], args[1]
    if not (fmt.startswith("'") and fmt.endswith("'")):
        raise ValueError("strftime format must be a string literal")
    body = fmt[1:-1].replace("''", "'")  # un-escape the SQL literal
    if body == "%s":
        return f"unix_timestamp({x})"
    out, i = [], 0
    while i < len(body):
        if body[i] == "%" and i + 1 < len(body):
            d = body[i : i + 2]
            if d not in _STRFTIME_MAP:
                raise ValueError(f"unsupported strftime directive {d!r}")
            out.append(_STRFTIME_MAP[d])
            i += 2
        else:
            ch = body[i]
            if ch == "'":
                out.append("''")  # Java pattern: literal quote is ''
            elif ch.isalpha():
                out.append(f"'{ch}'")  # Java pattern: quote literal letters
            else:
                out.append(ch)
            i += 1
    # Re-escape for splicing into a single-quoted SQL literal: a pattern
    # like yyyy'T'HH must read date_format(x, 'yyyy''T''HH').
    pattern_sql = "".join(out).replace("'", "''")
    return f"date_format({x}, '{pattern_sql}')"


def _render_group_concat(args: list[str]) -> str:
    x = args[0]
    sep = args[1] if len(args) > 1 else "','"
    return f"array_join(array_sort(collect_list({x})), {sep})"


def _render_printf(args: list[str]) -> str:
    return f"format_string({', '.join(args)})"


def _rewrite_glob(sql: str) -> str:
    # <operand> GLOB '<pattern>' — operand is an identifier/qualified name
    # or a parenthesized expression immediately before GLOB.
    pat = re.compile(
        rf"(?P<lhs>[A-Za-z_][\w.]*|\))\s+GLOB\s+(?P<pat>{_STR})", re.IGNORECASE
    )

    def sub(m: re.Match) -> str:
        glob = m.group("pat")[1:-1].replace("''", "'")
        regex = glob_to_rlike(glob).replace("\\", "\\\\").replace("'", "''")
        return f"{m.group('lhs')} RLIKE '{regex}'"

    return pat.sub(sub, sql)


def translate_sqlite_sql(statement: str) -> str:
    """SQLite-dialect SQL string → Spark SQL string."""
    sql = _rewrite_glob(statement)
    sql = _rewrite_call(sql, "julianday", _render_julianday)
    sql = _rewrite_call(sql, "unixepoch", _render_unixepoch)
    sql = _rewrite_call(sql, "strftime", _render_strftime)
    sql = _rewrite_call(sql, "group_concat", _render_group_concat)
    sql = _rewrite_call(sql, "printf", _render_printf)
    return sql


def sqlite_sql(spark: SparkSession, statement: str) -> DataFrame:
    """Run a SQLite-dialect SQL string on Spark — the native replacement for
    the reference's pass-through entry point (A2)."""
    return spark.sql(translate_sqlite_sql(statement))
