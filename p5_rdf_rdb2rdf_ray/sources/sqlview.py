"""Streaming planner for the simple-SQL subset of ``rr:sqlQuery``.

The reference pushes a logical table's SQL to the RDBMS
[R: R2RML.pm :: logicalTable / W3C-R2RML §5.2]. At 100 TB a view must
stream, not materialize on the driver — this module recognizes the
common shape

    SELECT col[, col…] | * FROM table [WHERE col OP literal [AND …]]
    OP ∈  = != <> < <= > >=

and compiles it to a column-pruned, filter-pushed ``read_parquet``
(parquet row-group predicate pushdown via a pyarrow expression).
Anything richer (joins, expressions, GROUP BY) falls back to the DuckDB
materialization path in ``catalog._load_sql`` — correct but
driver-sized, as documented there.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_IDENT = r'(?:"[^"]+"|[A-Za-z_][A-Za-z_0-9]*)'
_LITERAL = r"(?:'(?:[^']|'')*'|-?\d+(?:\.\d+)?)"
_COND = rf"({_IDENT})\s*(=|!=|<>|<=|>=|<|>)\s*({_LITERAL})"
_SQL = re.compile(
    rf"^\s*SELECT\s+(?P<cols>\*|{_IDENT}(?:\s*,\s*{_IDENT})*)\s+"
    rf"FROM\s+(?P<table>{_IDENT})\s*"
    rf"(?:WHERE\s+(?P<where>{_COND}(?:\s+AND\s+{_COND})*))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COND_RE = re.compile(_COND, re.IGNORECASE)


@dataclass
class SimpleSelect:
    table: str
    columns: list[str] | None              # None = '*'
    conds: list[tuple[str, str, object]]   # (col, op, value)


def _unquote_ident(s: str) -> str:
    return s[1:-1] if s.startswith('"') else s


def _parse_literal(s: str):
    if s.startswith("'"):
        return s[1:-1].replace("''", "'")
    return float(s) if "." in s else int(s)


def parse_simple_select(sql: str) -> SimpleSelect | None:
    """→ a :class:`SimpleSelect` plan, or None if the SQL is outside the
    streaming subset (caller falls back to DuckDB)."""
    m = _SQL.match(sql)
    if m is None:
        return None
    cols_raw = m.group("cols").strip()
    columns = (
        None
        if cols_raw == "*"
        else [_unquote_ident(c.strip()) for c in cols_raw.split(",")]
    )
    conds: list[tuple[str, str, object]] = []
    if m.group("where"):
        for c, op, lit in _COND_RE.findall(m.group("where")):
            conds.append((_unquote_ident(c), op, _parse_literal(lit)))
    return SimpleSelect(
        table=_unquote_ident(m.group("table")), columns=columns, conds=conds
    )


def resolve_plan(plan: SimpleSelect, schema) -> SimpleSelect | None:
    """Validate a parsed plan against the table's Arrow ``schema`` before
    the streaming read — SQL semantics DuckDB would coerce silently must
    not become pyarrow scan-time type errors (or silent misses):

    - identifiers resolve case-insensitively (exact match wins);
    - comparison literals are cast to the column type (``intcol = '5'``,
      integral floats on int columns, ints on float columns);
    - anything that doesn't line up (non-integral float on an int
      column, unparseable string on a numeric column, non-scalar column
      types) returns None → the caller falls back to DuckDB, which keeps
      the always-DuckDB semantics of earlier releases.
    """
    import pyarrow as pa

    by_lower: dict[str, str | None] = {}
    for name in schema.names:
        low = name.lower()
        # two columns differing only in case → ambiguous, exact-only
        by_lower[low] = None if low in by_lower else name

    def resolve(ident: str) -> str | None:
        if ident in schema.names:
            return ident
        return by_lower.get(ident.lower())

    columns = None
    if plan.columns is not None:
        columns = [resolve(c) for c in plan.columns]
        if any(c is None for c in columns):
            return None
    conds: list[tuple[str, str, object]] = []
    for col, op, val in plan.conds:
        rcol = resolve(col)
        if rcol is None:
            return None
        t = schema.field(rcol).type
        if pa.types.is_integer(t):
            try:
                f = float(val)
            except (TypeError, ValueError):
                return None
            if not f.is_integer():
                return None  # DuckDB compares numerically; don't guess
            val = int(f)
        elif pa.types.is_floating(t) or pa.types.is_decimal(t):
            try:
                val = float(val)
            except (TypeError, ValueError):
                return None
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            if not isinstance(val, str):
                val = str(val)
        else:
            return None  # bool/temporal/nested: DuckDB path
        conds.append((rcol, op, val))
    return SimpleSelect(table=plan.table, columns=columns, conds=conds)


def to_arrow_filter(conds: list[tuple[str, str, object]]):
    """Conjunctive comparisons → one pyarrow dataset expression (row-group
    predicate pushdown at the read), or None when unfiltered."""
    import pyarrow.compute as pc

    expr = None
    for col, op, val in conds:
        f = pc.field(col)
        e = {
            "=": f == val,
            "!=": f != val,
            "<>": f != val,
            "<": f < val,
            "<=": f <= val,
            ">": f > val,
            ">=": f >= val,
        }[op]
        expr = e if expr is None else expr & e
    return expr
