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
- ``iif(a, b, c)``           → ``if(a, b, c)``
- ``min/max(a, b, ...)``     → ``least/greatest`` with an any-NULL guard
                               (SQLite scalar form; 1-arg aggregates kept)
- ``total(x)``               → ``coalesce(sum(cast(x as double)), 0.0)``
- ``char(c1, c2, ...)``      → ``concat(chr(c1), chr(c2), ...)``
- ``unicode(x)``             → ``ascii(x)``
- ``likely/unlikely/likelihood`` → planner hints; pass the value through
- ``date/datetime/time(x, 'modifier'...)``
                             → ``date_format`` over ``timestampadd`` /
                               ``date_trunc`` folds ('+N days', '-N months',
                               'start of day/month/year', fractional
                               seconds)
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


def _in_string_literal(sql: str, pos: int) -> bool:
    """True when ``pos`` falls inside a single-quoted SQL string literal."""
    i = 0
    while i < pos:
        if sql[i] == "'":
            m = re.match(_STR, sql[i:])
            if m is None:  # unterminated literal: everything after is inside
                return True
            if i + m.end() > pos:
                return True
            i += m.end()
        else:
            i += 1
    return False


#: type-name context: ``CAST(x AS CHAR(10))`` etc. must not be rewritten
_TYPE_CONTEXT = re.compile(r"(?i)\bas\s*$")


def _rewrite_call(sql: str, fname: str, render) -> str:
    """Replace every ``fname(args)`` call with ``render(args_list)``,
    scanning balanced parens so nested calls survive. A render may return
    ``None`` to leave that call unchanged (e.g. aggregate ``min(x)`` vs
    scalar ``min(x, y)``); the search resumes after it either way.
    Matches inside string literals and in type-name position (directly
    after ``AS``, i.e. ``CAST(x AS CHAR(10))``) are never rewritten."""
    pat = re.compile(rf"\b{fname}\s*\(", re.IGNORECASE)
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            return sql
        if _in_string_literal(sql, m.start()) or _TYPE_CONTEXT.search(
            sql, 0, m.start()
        ):
            pos = m.end()
            continue
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
        repl = render(_split_args(inner))
        if repl is None:
            pos = i
            continue
        # resume at the replacement start: same-name calls nested inside the
        # argument text (now part of repl) still get rewritten — safe because
        # no render emits its own function name
        sql = sql[:start] + repl + sql[i:]
        pos = start


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


def _render_iif(args: list[str]) -> str:
    a, b, c = args
    return f"if({a}, {b}, {c})"


def _render_scalar_minmax(spark_fn: str):
    # SQLite min/max with 2+ args is the SCALAR form; 1-arg stays the
    # aggregate and must be left alone (render None). SQLite returns NULL
    # if ANY argument is NULL, whereas Spark least/greatest skip NULLs —
    # wrap with an explicit any-null guard for faithful semantics.
    def render(args: list[str]) -> str | None:
        if len(args) < 2:
            return None
        null_guard = " or ".join(f"(({a}) is null)" for a in args)
        return f"if({null_guard}, null, {spark_fn}({', '.join(args)}))"

    return render


_render_scalar_min = _render_scalar_minmax("least")
_render_scalar_max = _render_scalar_minmax("greatest")


def _render_total(args: list[str]) -> str:
    # SQLite total(): SUM over doubles that yields 0.0 (never NULL) on
    # empty/all-NULL input.
    (x,) = args
    return f"coalesce(sum(cast({x} as double)), cast(0.0 as double))"


def _render_char(args: list[str]) -> str:
    # SQLite char(c1, c2, ...) concatenates code points; Spark chr is 1-arg.
    return f"concat({', '.join(f'chr({a})' for a in args)})"


def _render_unicode(args: list[str]) -> str:
    (x,) = args
    return f"ascii({x})"


def _render_hint_passthrough(args: list[str]) -> str:
    # likely/unlikely/likelihood are planner hints; value is the first arg.
    return f"({args[0]})"


#: SQLite date-modifier units → Spark timestampadd units.
_DATE_UNITS = {
    "year": "YEAR", "years": "YEAR",
    "month": "MONTH", "months": "MONTH",
    "day": "DAY", "days": "DAY",
    "hour": "HOUR", "hours": "HOUR",
    "minute": "MINUTE", "minutes": "MINUTE",
    "second": "SECOND", "seconds": "SECOND",
}

_MOD_SHIFT = re.compile(r"^([+-]?\d+(?:\.\d+)?)\s+([a-z]+)$")


def _apply_date_modifiers(expr: str, mods: list[str]) -> str | None:
    """Fold SQLite date modifiers ('+3 days', 'start of month', ...) over a
    timestamp expression, left to right (SQLite applies them in order).
    Returns None for modifiers outside the supported subset (non-literal,
    'localtime'/'utc'/'weekday N', ...) — the caller then leaves the call
    untouched, per the module contract ("anything else passes through;
    incompatibilities surface as normal analysis errors")."""
    for raw in mods:
        if not (raw.startswith("'") and raw.endswith("'")):
            return None
        mod = raw[1:-1].replace("''", "'").strip().lower()
        m = _MOD_SHIFT.match(mod)
        if m:
            n, unit = m.group(1), m.group(2)
            if unit not in _DATE_UNITS:
                return None
            if "." in n:
                # fractional shifts only make sense for seconds (SQLite
                # allows e.g. '+1.5 seconds'); scale to micros
                if _DATE_UNITS[unit] != "SECOND":
                    return None
                micros = int(round(float(n) * 1_000_000))
                expr = f"timestampadd(MICROSECOND, {micros}, {expr})"
            else:
                expr = f"timestampadd({_DATE_UNITS[unit]}, {n}, {expr})"
        elif mod == "start of day":
            expr = f"date_trunc('DAY', {expr})"
        elif mod == "start of month":
            expr = f"date_trunc('MONTH', {expr})"
        elif mod == "start of year":
            expr = f"date_trunc('YEAR', {expr})"
        else:
            return None
    return expr


def _render_date_fn(out_fmt: str):
    def render(args: list[str]) -> str | None:
        if not args:
            return None
        # date('now') / datetime('now', ...): SQLite's current-moment form
        base = (
            "current_timestamp()"
            if args[0].strip().lower() == "'now'"
            else f"cast({args[0]} as timestamp)"
        )
        shifted = _apply_date_modifiers(base, args[1:])
        if shifted is None:
            return None
        return f"date_format({shifted}, '{out_fmt}')"

    return render


_render_date = _render_date_fn("yyyy-MM-dd")
_render_datetime = _render_date_fn("yyyy-MM-dd HH:mm:ss")
_render_time = _render_date_fn("HH:mm:ss")


def _rewrite_glob(sql: str) -> str:
    # <operand> GLOB '<pattern>' — operand is an identifier/qualified name
    # or a parenthesized expression immediately before GLOB.
    pat = re.compile(
        rf"(?P<lhs>[A-Za-z_][\w.]*|\))\s+GLOB\s+(?P<pat>{_STR})", re.IGNORECASE
    )

    def sub(m: re.Match) -> str:
        if _in_string_literal(sql, m.start()):
            return m.group(0)
        glob = m.group("pat")[1:-1].replace("''", "'")
        regex = glob_to_rlike(glob).replace("\\", "\\\\").replace("'", "''")
        return f"{m.group('lhs')} RLIKE '{regex}'"

    return pat.sub(sub, sql)


#: SQLite storage-class names Spark's type parser rejects or narrows →
#: their Spark spelling. Found by the differential fuzz (r6): CAST(x AS
#: TEXT) is everyday SQLite and parse-errored before this. INTEGER maps to
#: BIGINT (SQLite integers are 64-bit; Spark's INTEGER is 32). NUMERIC has
#: no dynamic Spark analogue — DOUBLE is the documented approximation
#: (SQLite returns an int when the value is integral, Spark won't).
_CAST_TYPE_MAP = {
    "TEXT": "STRING",
    "CLOB": "STRING",
    "INTEGER": "BIGINT",
    "INT": "BIGINT",
    "REAL": "DOUBLE",
    "BLOB": "BINARY",
    "NUMERIC": "DOUBLE",
}


def _cast_close_parens(sql: str) -> set[int]:
    """Positions of ``)`` characters that close a ``CAST(...)`` call.

    One linear scan with a paren stack, skipping string literals and
    quoted identifiers: a close paren qualifies iff its matching opener
    is immediately preceded (whitespace allowed) by the bare word CAST.
    This is what lets ``_rewrite_cast_types`` rewrite ``AS TEXT)`` only
    inside a CAST — an alias named ``text`` at the end of a
    parenthesized subquery (``(SELECT 1 AS text)``) closes a paren whose
    opener is NOT a CAST call, so it survives (ADVICE r6)."""
    stack: list[int] = []
    out: set[int] = set()
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch == '"':
            i += 1
            while i < n and sql[i] != '"':
                i += 1
        elif ch == "(":
            stack.append(i)
        elif ch == ")":
            if stack:
                o = stack.pop()
                j = o - 1
                while j >= 0 and sql[j].isspace():
                    j -= 1
                if (
                    j >= 3
                    and sql[j - 3 : j + 1].upper() == "CAST"
                    and (j < 4 or not (sql[j - 4].isalnum() or sql[j - 4] == "_"))
                ):
                    out.add(i)
        i += 1
    return out


def _rewrite_cast_types(sql: str) -> str:
    # only the `AS <type> )` tail whose `)` closes a CAST( at matching
    # paren depth — aliases named e.g. `text`, including at the end of a
    # parenthesized subquery, survive (ADVICE r6).
    pat = re.compile(
        r"\bAS\s+(" + "|".join(_CAST_TYPE_MAP) + r")\s*\)", re.IGNORECASE
    )
    cast_closes = _cast_close_parens(sql)

    def sub(m: re.Match) -> str:
        if _in_string_literal(sql, m.start()):
            return m.group(0)
        if m.end() - 1 not in cast_closes:
            return m.group(0)
        return f"AS {_CAST_TYPE_MAP[m.group(1).upper()]})"

    return pat.sub(sub, sql)


def translate_sqlite_sql(statement: str) -> str:
    """SQLite-dialect SQL string → Spark SQL string."""
    sql = _rewrite_glob(statement)
    sql = _rewrite_cast_types(sql)
    sql = _rewrite_call(sql, "julianday", _render_julianday)
    sql = _rewrite_call(sql, "unixepoch", _render_unixepoch)
    sql = _rewrite_call(sql, "strftime", _render_strftime)
    sql = _rewrite_call(sql, "group_concat", _render_group_concat)
    sql = _rewrite_call(sql, "printf", _render_printf)
    sql = _rewrite_call(sql, "iif", _render_iif)
    sql = _rewrite_call(sql, "min", _render_scalar_min)
    sql = _rewrite_call(sql, "max", _render_scalar_max)
    sql = _rewrite_call(sql, "total", _render_total)
    sql = _rewrite_call(sql, "char", _render_char)
    sql = _rewrite_call(sql, "unicode", _render_unicode)
    for hint in ("likelihood", "likely", "unlikely"):
        sql = _rewrite_call(sql, hint, _render_hint_passthrough)
    # datetime/time/date: longest name first so `datetime(` is not half-
    # matched as `time(`... it isn't (the \b + literal name anchors each),
    # but date must not re-match the date_format() output of datetime —
    # date_format survives because \bdate\s*\( requires '(' right after
    # 'date'.
    sql = _rewrite_call(sql, "datetime", _render_datetime)
    sql = _rewrite_call(sql, "time", _render_time)
    sql = _rewrite_call(sql, "date", _render_date)
    return sql


def sqlite_sql(spark: SparkSession, statement: str) -> DataFrame:
    """Run a SQLite-dialect SQL string on Spark — the native replacement for
    the reference's pass-through entry point (A2)."""
    return spark.sql(translate_sqlite_sql(statement))
