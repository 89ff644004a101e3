"""SPARQL 1.1 text front-end: a query STRING → the engine's existing
BGP algebra (``get_pattern`` / ``get_pattern_store`` / union planner /
grouped aggregates / CONSTRUCT / ASK / DESCRIBE).

[R: DirectMapping/Store.pm — the reference Store delegates query-string
parsing to RDF::Query and only implements get_statements/get_pattern;
this module is the analogous front-end over OUR programmatic surface,
so a user can run the textual queries they run today. — recalled]

The parser is a hand-written tokenizer + recursive descent over the
SPARQL 1.1 grammar subset whose ALGEBRA the engine already implements
(everything exercised by the registry): SELECT (DISTINCT, projection,
aggregates + GROUP BY/HAVING) / ASK / CONSTRUCT / DESCRIBE; WHERE with
triple patterns (``;`` / ``,`` abbreviations, ``a``), property paths
(``/ | ^ + * ? !(…)``), FILTER comparisons (``&&``-conjoined), FILTER
EXISTS / NOT EXISTS, OPTIONAL, MINUS, top-level UNION, VALUES, BIND (CONCAT,
STRLEN, UCASE, LCASE, SUBSTR, REPLACE, IF, COALESCE, IRI, STR, STRBEFORE,
STRAFTER, ABS, CEIL, FLOOR, ROUND, ENCODE_FOR_URI, arithmetic); FILTER term
tests isIRI/isBlank/isLiteral/isNumeric (§17.4.2 over term kinds);
solution modifiers ORDER BY / LIMIT / OFFSET; PREFIX declarations.
Anything outside the subset fails loud with the offending token —
never a silent wrong answer.

Semantics notes (documented deviations, all inherited from the
engine's set-semantic solution model):

- Solutions are DISTINCT over the full variable set (the engine's BGP
  surface returns set semantics; the underlying graphs are
  duplicate-free). ``SELECT DISTINCT`` additionally re-dedups after
  projection; a plain projected SELECT keeps one row per distinct FULL
  solution.
- Literal patterns match by lexical form + literal-kind (datatype- and
  language-insensitive), matching ``store_statements`` /
  ``get_statements`` obj_literal semantics.
- Aggregate SUM/AVG/MIN/MAX evaluate NUMERICALLY over the lexical
  forms (non-numeric bindings become NULL and drop, SPARQL type-error
  style); COUNT and GROUP_CONCAT are exact over lexicals.

Execution is *dispatch only* — every distributed decision (pushdown,
star fusion, broadcast-vs-shuffle joins, path doubling, top-k merges)
lives in the planners this module calls; the parser adds zero new
scan/shuffle machinery, so textual queries scale exactly as the
programmatic ones do.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_KEYWORDS = {
    "prefix", "base", "select", "distinct", "reduced", "where", "filter",
    "optional", "union", "minus", "values", "bind", "as", "group", "by",
    "having", "order", "asc", "desc", "limit", "offset", "ask",
    "construct", "describe", "not", "exists", "undef", "count", "sum",
    "min", "max", "avg", "sample", "group_concat", "separator", "if",
    "coalesce", "iri", "uri", "concat", "strlen", "ucase", "lcase",
    "substr", "replace", "a", "true", "false", "insert", "delete",
    "data", "regex", "contains", "strstarts", "strends", "graph",
    "in", "bound", "str", "strbefore", "strafter", "abs", "ceil",
    "floor", "round", "encode_for_uri", "isiri", "isuri", "isblank",
    "isliteral", "isnumeric", "clear", "drop", "named", "default", "all",
    "with", "year", "month", "day", "hours", "minutes", "seconds", "tz",
    "md5", "sha1", "sha256", "lang", "langmatches", "datatype",
    "sameterm",
}

_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}

# functions that start a BIND-grammar expression — a FILTER whose first
# token is one of these is a computed-left comparison, not a string test
_EXPR_FN_KWS = {
    "concat", "strlen", "ucase", "lcase", "coalesce", "str", "strbefore",
    "strafter", "abs", "ceil", "floor", "round", "encode_for_uri",
    "substr", "replace", "if", "iri", "uri",
}


@dataclass
class _Tok:
    kind: str  # IRI VAR STRING NUMBER PNAME KW PUNCT EOF
    val: object
    pos: int


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "<":
            # IRIREF iff a '>' arrives before any whitespace; else '<'
            # is the comparison operator (FILTER context)
            j = i + 1
            while j < n and not text[j].isspace() and text[j] != ">":
                j += 1
            if j < n and text[j] == ">":
                toks.append(_Tok("IRI", text[i + 1 : j], i))
                i = j + 1
                continue
            if text[i : i + 2] == "<=":
                toks.append(_Tok("PUNCT", "<=", i))
                i += 2
            else:
                toks.append(_Tok("PUNCT", "<", i))
                i += 1
            continue
        if c in "?$":
            m = re.match(r"[?$]([A-Za-z_][A-Za-z0-9_]*)", text[i:])
            if m:
                if m.group(1).startswith("__"):
                    # the engine reserves the ``__`` namespace for
                    # internal columns (``__k_…`` kinds, ``__bn_…``
                    # blank-node variables)
                    raise ValueError(
                        f"variable names starting with '__' are "
                        f"reserved (char {i})"
                    )
                toks.append(_Tok("VAR", m.group(1), i))
                i += m.end()
            else:
                toks.append(_Tok("PUNCT", "?", i))
                i += 1
            continue
        if c in "\"'":
            q = c
            j = i + 1
            buf: list[str] = []
            while j < n and text[j] != q:
                if text[j] == "\\":
                    if j + 1 >= n:
                        raise ValueError(f"unterminated escape at {j}")
                    e = text[j + 1]
                    if e == "u":
                        h = text[j + 2 : j + 6]
                        # exactly 4 hex digits — int(h, 16) alone also
                        # accepts whitespace/signs/underscores
                        if not re.fullmatch(r"[0-9A-Fa-f]{4}", h):
                            raise ValueError(
                                f"bad \\u escape {h!r} at {j}"
                            )
                        buf.append(chr(int(h, 16)))
                        j += 6
                        continue
                    if e not in _ESCAPES:
                        raise ValueError(f"bad escape \\{e} at {j}")
                    buf.append(_ESCAPES[e])
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise ValueError(f"unterminated string starting at {i}")
            i = j + 1
            # optional @lang / ^^datatype suffix (parsed, then dropped —
            # the engine's literal matching is lexical+kind)
            if i < n and text[i] == "@":
                m = re.match(r"@[A-Za-z]+(-[A-Za-z0-9]+)*", text[i:])
                if not m:
                    raise ValueError(f"bad language tag after @ at {i}")
                i += m.end()
            elif text[i : i + 2] == "^^":
                i += 2
                if i < n and text[i] == "<":
                    end = text.find(">", i)
                    if end < 0:
                        raise ValueError(
                            f"unterminated datatype IRI at {i}"
                        )
                    i = end + 1
                else:
                    m = re.match(r"[A-Za-z_][\w.-]*:[A-Za-z_][\w.-]*", text[i:])
                    if not m:
                        raise ValueError(f"bad datatype after ^^ at {i}")
                    i += m.end()
            toks.append(_Tok("STRING", "".join(buf), i))
            continue
        m = re.match(r"[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?", text[i:])
        if m and (c.isdigit() or (c in "+-." and len(m.group(0)) > 1)):
            s = m.group(0)
            toks.append(
                _Tok(
                    "NUMBER",
                    float(s) if ("." in s or "e" in s or "E" in s) else int(s),
                    i,
                )
            )
            i += m.end()
            continue
        m = re.match(r"([A-Za-z_][\w-]*)?:([A-Za-z_][\w.-]*)?", text[i:])
        if m and ":" in m.group(0):
            toks.append(_Tok("PNAME", (m.group(1) or "", m.group(2) or ""), i))
            i += m.end()
            continue
        m = re.match(r"[A-Za-z_][\w]*", text[i:])
        if m:
            w = m.group(0)
            toks.append(
                _Tok(
                    "KW" if w.lower() in _KEYWORDS else "IDENT",
                    w.lower() if w.lower() in _KEYWORDS else w,
                    i,
                )
            )
            i += m.end()
            continue
        for op in ("&&", "||", "!=", "<=", ">="):
            if text.startswith(op, i):
                toks.append(_Tok("PUNCT", op, i))
                i += len(op)
                break
        else:
            if c in "{}()[].;,*/|^+-?!=<>":
                toks.append(_Tok("PUNCT", c, i))
                i += 1
            else:
                raise ValueError(f"SPARQL syntax: unexpected {c!r} at {i}")
    toks.append(_Tok("EOF", None, n))
    return toks


@dataclass
class WhereClause:
    patterns: list = field(default_factory=list)
    paths: list = field(default_factory=list)
    filters: list = field(default_factory=list)
    optional: list | None = None
    minus: list | None = None
    not_exists: list | None = None
    exists: list | None = None
    values: tuple | None = None
    bind: list = field(default_factory=list)
    subqueries: list = field(default_factory=list)  # nested ParsedQuery


@dataclass
class ParsedQuery:
    form: str  # SELECT ASK CONSTRUCT DESCRIBE
    graph: str | None = None  # GRAPH <iri> scope wrapping the WHERE body
    graph_var: str | None = None  # GRAPH ?var scope (bare variable name)
    distinct: bool = False
    project: list[str] | None = None  # None = *
    aggregates: dict | None = None  # alias -> ("count*"|fn, var, extra)
    agg_exprs: dict = field(default_factory=dict)  # hidden var -> expr AST
    group_by: list[str] = field(default_factory=list)
    having: list = field(default_factory=list)  # (alias, op, number)
    where: WhereClause | None = None
    union_groups: list[WhereClause] | None = None
    order_by: list = field(default_factory=list)
    limit: int | None = None
    offset: int = 0
    construct_templates: list = field(default_factory=list)
    describe_nodes: list = field(default_factory=list)
    describe_vars: list = field(default_factory=list)


def _pattern_vars_into(o, out: dict) -> None:
    """Collect variable NAMES from pattern / path / expression tuple
    ASTs into ``out`` (an ordered dict used as a set). ``?name``
    strings are variables; ``("lit", value)`` payloads are CONSTANTS
    and are never entered — a literal that merely spells ``?x`` is not
    a variable. (Inside raw expression ASTs a bare string constant
    starting with ``?`` cannot be told apart and collects
    conservatively; every consumer uses the result for fail-loud scope
    checks or schema defaults, where the false positive errs strict,
    never wrong.)"""
    if isinstance(o, str):
        if o.startswith("?"):
            out.setdefault(o[1:])
    elif isinstance(o, tuple) and len(o) == 2 and o[0] == "lit":
        return
    elif isinstance(o, (list, tuple)):
        for x in o:
            _pattern_vars_into(x, out)


def _filter_vars_into(f, out: dict) -> None:
    """Variables a FILTER AST reads — SHAPE-AWARE, unlike a generic
    ``?``-prefix walk: in a comparison atom ``(left, op, right)`` the
    right side is a variable only in its ``("var", name)`` form; bare
    string right sides (regex patterns, literal constants) are skipped
    even when they spell ``?x``."""
    if isinstance(f, list):
        for x in f:
            _filter_vars_into(x, out)
        return
    if not isinstance(f, tuple):
        return
    if len(f) == 2 and f[0] in ("and", "or", "not"):
        for x in f[1]:
            _filter_vars_into(x, out)
        return
    if len(f) == 3:
        left, _op, right = f
        _pattern_vars_into(left, out)
        if (
            isinstance(right, tuple)
            and len(right) == 2
            and right[0] == "var"
        ):
            out.setdefault(right[1])
        return
    _pattern_vars_into(f, out)  # unknown shape: conservative


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self._anon = 0  # fresh-label counter for [ … ] blank nodes

    def _signed_num(self, t: _Tok) -> bool:
        """True when a NUMBER token carries an EXPLICIT sign in the
        source (`+1` / `-1`): the tokenizer folds the sign into the
        value, which is how §19.8's NumericLiteralPositive/Negative
        reach AdditiveExpression — `?v+10` lexes as VAR NUMBER(10)
        with a '+' at the token's start."""
        return (
            t.kind == "NUMBER"
            and isinstance(t.val, (int, float))
            and self.text[t.pos] in "+-"
        )

    # -- token helpers ---------------------------------------------------
    def peek(self, k: int = 0) -> _Tok:
        return self.toks[min(self.pos + k, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.pos]
        if t.kind != "EOF":
            self.pos += 1
        return t

    def expect(self, kind: str, val=None) -> _Tok:
        t = self.next()
        if t.kind != kind or (val is not None and t.val != val):
            raise ValueError(
                f"SPARQL syntax: expected {val or kind} at char {t.pos}, "
                f"got {t.kind}:{t.val!r}"
            )
        return t

    def at_punct(self, v: str) -> bool:
        t = self.peek()
        return t.kind == "PUNCT" and t.val == v

    def at_kw(self, v: str) -> bool:
        t = self.peek()
        return t.kind == "KW" and t.val == v

    def eat_kw(self, v: str) -> bool:
        if self.at_kw(v):
            self.next()
            return True
        return False

    # -- terms -----------------------------------------------------------
    def expand(self, tok: _Tok) -> str:
        pfx, local = tok.val
        if pfx not in self.prefixes:
            raise ValueError(f"undeclared prefix {pfx!r}: at char {tok.pos}")
        return self.prefixes[pfx] + local

    def term(self, *, as_subject: bool = False, wc=None, bnodes=False):
        """One RDF term. ``bnodes=True`` (triple-pattern context only)
        additionally accepts blank nodes, which SPARQL §4.1.4 scopes as
        NON-DISTINGUISHED variables: ``_:label`` maps to the reserved
        variable ``?__bn_l_<label>`` (same label = same variable within
        the query), ``[]`` / ``[ po-list ]`` to a fresh one; a bracketed
        property list parses its triples straight into ``wc``. The
        ``__bn_`` columns join like any variable and are excluded from
        ``SELECT *`` projection (see ``_project``)."""
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return "?" + t.val
        if t.kind == "IRI":
            self.next()
            return t.val
        if t.kind == "PNAME":
            if t.val[0] == "_":
                if not bnodes:
                    raise ValueError(
                        f"blank nodes are not allowed here (char {t.pos})"
                    )
                self.next()
                return "?__bn_l_" + t.val[1]
            self.next()
            return self.expand(t)
        if t.kind == "PUNCT" and t.val == "[" and bnodes:
            self.next()
            self._anon += 1
            v = f"?__bn_a{self._anon}"
            if not self.at_punct("]"):
                self._property_list(v, wc)
            self.expect("PUNCT", "]")
            return v
        if t.kind == "STRING":
            self.next()
            return ("lit", t.val)
        if t.kind == "NUMBER":
            self.next()
            return ("lit", t.val)
        if t.kind == "KW" and t.val in ("true", "false"):
            self.next()
            return ("lit", t.val)
        raise ValueError(
            f"SPARQL syntax: unsupported term {t.kind}:{t.val!r} at char "
            f"{t.pos}"
        )

    # -- property paths --------------------------------------------------
    def path(self):
        """Parse a verb as a §9.1 path AST; ``("pred", iri)`` means the
        verb was a plain predicate (ordinary triple pattern)."""
        left = self.path_seq()
        while self.at_punct("|"):
            self.next()
            left = ("alt", left, self.path_seq())
        return left

    def path_seq(self):
        left = self.path_step()
        while self.at_punct("/"):
            self.next()
            left = ("seq", left, self.path_step())
        return left

    def path_step(self):
        if self.at_punct("^"):
            self.next()
            prim = ("inv", self.path_primary())
        else:
            prim = self.path_primary()
        t = self.peek()
        if t.kind == "PUNCT" and t.val in ("+", "*", "?"):
            self.next()
            prim = ({"+": "plus", "*": "star", "?": "opt"}[t.val], prim)
        return prim

    def path_primary(self):
        if self.at_punct("("):
            self.next()
            inner = self.path()
            self.expect("PUNCT", ")")
            return inner
        if self.at_punct("!"):
            self.next()
            iris = []
            if self.at_punct("("):
                self.next()
                iris.append(self.path_iri())
                while self.at_punct("|"):
                    self.next()
                    iris.append(self.path_iri())
                self.expect("PUNCT", ")")
            else:
                iris.append(self.path_iri())
            return ("nps", iris)
        if self.at_kw("a"):
            self.next()
            return ("pred", RDF_TYPE)
        return ("pred", self.path_iri())

    def path_iri(self) -> str:
        t = self.next()
        if t.kind == "IRI":
            return t.val
        if t.kind == "PNAME":
            return self.expand(t)
        raise ValueError(
            f"SPARQL syntax: expected IRI in path at char {t.pos}, got "
            f"{t.kind}:{t.val!r}"
        )

    # -- expressions (FILTER / BIND) --------------------------------------
    def expr(self):
        return self.expr_additive()

    def expr_additive(self):
        left = self.expr_mult()
        while True:
            t = self.peek()
            if t.kind == "PUNCT" and t.val in ("+", "-"):
                op = self.next().val
                left = (op, left, self.expr_mult())
                continue
            if self._signed_num(t):
                # §19.8 AdditiveExpression's NumericLiteralPositive/
                # Negative branch: `?v-10` tokenizes as VAR NUMBER(-10)
                # and `?v+10` as VAR NUMBER(+10) — the signed value IS
                # the addend
                self.next()
                left = ("+", left, t.val)
                continue
            return left

    def expr_mult(self):
        left = self.expr_primary()
        while self.peek().kind == "PUNCT" and self.peek().val in ("*", "/"):
            op = self.next().val
            left = (op, left, self.expr_primary())
        return left

    def expr_primary(self):
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return "?" + t.val
        if t.kind in ("STRING", "NUMBER"):
            self.next()
            if (
                t.kind == "STRING"
                and isinstance(t.val, str)
                and t.val.startswith("?")
            ):
                # a plain "?…" string in the programmatic expression AST
                # means a VARIABLE — wrap the constant so e.g.
                # CONCAT(?nm, "?x") can't silently read a column
                return ("str-const", t.val)
            return t.val
        if t.kind == "PUNCT" and t.val == "(":
            self.next()
            e = self.expr()
            self.expect("PUNCT", ")")
            return e
        if t.kind == "KW" and t.val in (
            "concat", "strlen", "ucase", "lcase", "coalesce", "str",
            "strbefore", "strafter", "abs", "ceil", "floor", "round",
            "encode_for_uri", "year", "month", "day", "hours", "minutes",
            "seconds", "tz", "md5", "sha1", "sha256",
        ):
            self.next()
            self.expect("PUNCT", "(")
            args = [self.expr()]
            while self.at_punct(","):
                self.next()
                args.append(self.expr())
            self.expect("PUNCT", ")")
            return (t.val, *args)
        if t.kind == "KW" and t.val in ("iri", "uri"):
            self.next()
            self.expect("PUNCT", "(")
            a = self.expr()
            self.expect("PUNCT", ")")
            return ("iri", a)
        if t.kind == "KW" and t.val == "substr":
            self.next()
            self.expect("PUNCT", "(")
            s = self.expr()
            self.expect("PUNCT", ",")
            start = self.expect("NUMBER").val
            length = None
            if self.at_punct(","):
                self.next()
                length = self.expect("NUMBER").val
            self.expect("PUNCT", ")")
            return (
                ("substr", s, start)
                if length is None
                else ("substr", s, start, length)
            )
        if t.kind == "KW" and t.val == "replace":
            self.next()
            self.expect("PUNCT", "(")
            s = self.expr()
            self.expect("PUNCT", ",")
            pat = self.expect("STRING").val
            self.expect("PUNCT", ",")
            repl = self.expect("STRING").val
            self.expect("PUNCT", ")")
            return ("replace", s, pat, repl)
        if t.kind == "KW" and t.val == "if":
            self.next()
            self.expect("PUNCT", "(")
            cvar, cop, cval = self.comparison()
            self.expect("PUNCT", ",")
            then_e = self.expr()
            self.expect("PUNCT", ",")
            else_e = self.expr()
            self.expect("PUNCT", ")")
            return ("if", (cvar, cop, cval), then_e, else_e)
        raise ValueError(
            f"SPARQL syntax: unsupported expression {t.kind}:{t.val!r} at "
            f"char {t.pos}"
        )

    _STR_FILTER_FNS = {
        "regex": "regex", "contains": "contains",
        "strstarts": "strstarts", "strends": "strends",
    }

    # -- boolean FILTER expressions (SPARQL §17: || below &&) -------------
    def filter_expr(self) -> tuple:
        """ConditionalOrExpression: ``&&`` binds tighter than ``||``.
        Returns an atom (``(?var, op, const)``), or ``("and", [..])`` /
        ``("or", [..])`` groups in the binding-filter algebra's shape
        (:func:`engine.bgp_algebra._filter_mask`)."""
        left = self.filter_and()
        if not self.at_punct("||"):
            return left
        parts = [left]
        while self.at_punct("||"):
            self.next()
            parts.append(self.filter_and())
        return ("or", parts)

    def filter_and(self) -> tuple:
        left = self.filter_unit()
        if not self.at_punct("&&"):
            return left
        parts = [left]
        while self.at_punct("&&"):
            self.next()
            parts.append(self.filter_unit())
        return ("and", parts)

    def filter_unit(self) -> tuple:
        # a "(" here is boolean grouping: comparisons themselves start
        # with a VAR or a string-test keyword, never a paren
        if self.at_punct("!"):
            self.next()
            return ("not", [self.filter_unit()])
        if self.at_punct("("):
            self.next()
            e = self.filter_expr()
            self.expect("PUNCT", ")")
            return e
        return self.comparison()

    def comparison(self) -> tuple:
        """``?var OP (constant | ?var)`` — the engine's binding-filter
        shape — or a string-test call ``REGEX(?var, "pat"[, "flags"])``
        / ``CONTAINS`` / ``STRSTARTS`` / ``STRENDS`` (SPARQL §17.4.3;
        REGEX flags i/s/m compile to an RE2 inline group, q quotes the
        pattern), ``BOUND(?var)``, or ``?var [NOT] IN (consts…)``
        (§17.4.1.9/.10 — lowered to the or/and boolean algebra)."""
        t0 = self.peek()
        if t0.kind == "KW" and t0.val in self._STR_FILTER_FNS:
            fn = self.next().val
            self.expect("PUNCT", "(")
            var = self.expect("VAR").val
            self.expect("PUNCT", ",")
            if self.peek().kind == "VAR":
                # §17.4.3 with a VARIABLE second argument, e.g.
                # CONTAINS(?text, ?name) — row-pairwise in the binding
                # filter. REGEX stays constant-pattern (a per-row
                # pattern would compile a regex per row — loud).
                other = self.next().val
                if fn == "regex":
                    raise ValueError(
                        "REGEX with a variable pattern is unsupported"
                        " (per-row regex compile); use CONTAINS/"
                        "STRSTARTS/STRENDS for variable arguments"
                    )
                self.expect("PUNCT", ")")
                return (
                    "?" + var, self._STR_FILTER_FNS[fn], ("var", other)
                )
            pat = self.expect("STRING").val
            if fn == "regex" and self.at_punct(","):
                # §17.4.3.14 REGEX flags argument (XPath fn:matches):
                # i/s/m compile to an RE2 inline group the Arrow kernel
                # understands; q quotes the pattern literally; x
                # (whitespace-stripping) has no RE2 equivalent — loud
                self.next()
                flags = self.expect("STRING").val
                bad = set(flags) - set("ismq")
                if bad:
                    raise ValueError(
                        f"unsupported REGEX flags {''.join(sorted(bad))!r}"
                        " (supported: i, s, m, q)"
                    )
                if "q" in flags:
                    import re as _re

                    pat = _re.escape(pat)
                inline = "".join(c for c in "ism" if c in flags)
                if inline:
                    pat = f"(?{inline}){pat}"
            self.expect("PUNCT", ")")
            return ("?" + var, self._STR_FILTER_FNS[fn], pat)
        if t0.kind == "KW" and t0.val == "bound":
            self.next()
            self.expect("PUNCT", "(")
            var = self.expect("VAR").val
            self.expect("PUNCT", ")")
            return ("?" + var, "bound", True)
        if t0.kind == "KW" and t0.val in (
            "isiri", "isuri", "isblank", "isliteral", "isnumeric"
        ):
            # §17.4.2 term tests over the binding's term kind (isNUMERIC
            # follows the engine's lexical model: a literal whose
            # lexical form parses as a number)
            fn = self.next().val
            self.expect("PUNCT", "(")
            var = self.expect("VAR").val
            self.expect("PUNCT", ")")
            return ("?" + var, {"isuri": "isiri"}.get(fn, fn), True)
        if t0.kind == "KW" and t0.val == "sameterm":
            # §17.4.1.8 sameTerm(?a, ?b) — binding-level term equality
            # (lexical + term kind) in the filter algebra
            self.next()
            self.expect("PUNCT", "(")
            a = self.expect("VAR").val
            self.expect("PUNCT", ",")
            b = self.expect("VAR").val
            self.expect("PUNCT", ")")
            return ("?" + a, "sameterm", ("var", b))
        if t0.kind == "KW" and t0.val == "langmatches":
            # §17.4.4.2 LANGMATCHES(LANG(?v), "range") — consumed at the
            # store star scan (the binding carries no language tag)
            self.next()
            self.expect("PUNCT", "(")
            self.expect("KW", "lang")
            self.expect("PUNCT", "(")
            var = self.expect("VAR").val
            self.expect("PUNCT", ")")
            self.expect("PUNCT", ",")
            rng = self.expect("STRING").val
            self.expect("PUNCT", ")")
            return ("?" + var, "langmatches", rng)
        if t0.kind == "KW" and t0.val in ("lang", "datatype"):
            # §17.4.4.1/.3 LANG(?v) = "tag" / DATATYPE(?v) = <iri> —
            # scan-consumed term-metadata atoms; '=' only (a '!=' form
            # cannot be consumed exactly at one pattern's scan)
            fn = self.next().val
            self.expect("PUNCT", "(")
            var = self.expect("VAR").val
            self.expect("PUNCT", ")")
            op_t = self.next()
            if op_t.val != "=":
                raise ValueError(
                    f"{fn.upper()}() filters support '=' only, got "
                    f"{op_t.val!r} at char {op_t.pos}"
                )
            if fn == "lang":
                tag = self.expect("STRING").val
                return ("?" + var, "lang_eq", tag)
            v = self.next()
            if v.kind == "IRI":
                dt = v.val
            elif v.kind == "PNAME":
                dt = self.expand(v)
            else:
                raise ValueError(
                    f"DATATYPE() filters compare against an IRI, got "
                    f"{v.kind}:{v.val!r} at char {v.pos}"
                )
            return ("?" + var, "dt_eq", dt)
        if t0.kind == "KW" and t0.val in _EXPR_FN_KWS:
            # computed left side: FILTER(STRLEN(?nm) > 5) — the BIND
            # expression grammar, compared against a constant
            return self._expr_comparison(self.expr())
        if t0.kind == "VAR":
            t1 = self.peek(1)
            if (
                t1.kind == "PUNCT" and t1.val in ("+", "-", "*", "/")
            ) or self._signed_num(t1):
                # arithmetic left side: FILTER(?a + ?b > 3); a signed
                # NUMBER right after the VAR is the unspaced `?a+1`
                # / `?a-1` form (§19.8)
                return self._expr_comparison(self.expr())
        t = self.expect("VAR")
        if self.at_kw("in") or (
            self.at_kw("not")
            and self.peek(1).kind == "KW"
            and self.peek(1).val == "in"
        ):
            neg = self.eat_kw("not")
            self.expect("KW", "in")
            self.expect("PUNCT", "(")
            consts = []
            while not self.at_punct(")"):
                consts.append(self.filter_const(self.next()))
                if self.at_punct(","):
                    self.next()
            self.expect("PUNCT", ")")
            if not consts:
                # IN () is always false, NOT IN () always true (§17.4.1.9)
                # — a constant filter is never what the author meant
                raise ValueError("empty IN list (always false/true)")
            var = "?" + t.val
            if neg:
                atoms = [(var, "!=", c) for c in consts]
                return atoms[0] if len(atoms) == 1 else ("and", atoms)
            atoms = [(var, "==", c) for c in consts]
            return atoms[0] if len(atoms) == 1 else ("or", atoms)
        op_t = self.next()
        op = {"=": "=="}.get(op_t.val, op_t.val)
        if op not in ("==", "!=", "<", "<=", ">", ">="):
            raise ValueError(
                f"SPARQL syntax: unsupported comparison {op_t.val!r} at "
                f"char {op_t.pos}"
            )
        v = self.next()
        if v.kind == "VAR":
            return ("?" + t.val, op, ("var", v.val))
        return ("?" + t.val, op, self.filter_const(v))

    def _expr_comparison(self, left) -> tuple:
        """Comparison whose LEFT side is a computed expression (the BIND
        grammar); the right side must be a constant — evaluated by the
        binding-filter algebra's expression branch
        (:func:`engine.bgp_algebra._atomic_mask`)."""
        op_t = self.next()
        op = {"=": "=="}.get(op_t.val, op_t.val)
        if op not in ("==", "!=", "<", "<=", ">", ">="):
            raise ValueError(
                f"SPARQL syntax: unsupported comparison {op_t.val!r} at "
                f"char {op_t.pos}"
            )
        v = self.next()
        if v.kind == "VAR":
            raise ValueError(
                "computed-left FILTER comparisons need a constant right "
                f"side, got ?{v.val} at char {v.pos}"
            )
        return (left, op, self.filter_const(v))

    def filter_const(self, v: _Tok):
        """One constant term inside a FILTER comparison / IN list."""
        if v.kind in ("NUMBER", "STRING", "IRI"):
            return v.val
        if v.kind == "PNAME":
            return self.expand(v)
        if v.kind == "KW" and v.val in ("true", "false"):
            return v.val
        raise ValueError(
            f"SPARQL syntax: FILTER comparisons need a constant right "
            f"side, got {v.kind}:{v.val!r} at char {v.pos}"
        )

    # -- group graph pattern ----------------------------------------------
    def triples_block(self, wc: WhereClause):
        subj = self.term(as_subject=True, wc=wc, bnodes=True)
        if (
            isinstance(subj, str)
            and subj.startswith("?__bn_a")
            and (self.at_punct(".") or self.at_punct("}"))
        ):
            # a bare "[ po-list ]" IS a whole triples block (§19.8
            # TriplesBlock := TriplesSameSubjectPath with a
            # BlankNodePropertyListPath and empty PropertyListPath)
            return
        self._property_list(subj, wc)

    def _property_list(self, subj, wc: WhereClause):
        """The verb/object-list loop shared by top-level triple blocks
        and ``[ po-list ]`` blank-node property lists (whose trailing
        ``;`` terminator is ``]``)."""
        while True:
            t = self.peek()
            if t.kind == "VAR":
                # SPARQL §19.8 Verb := VarOrIri — a variable predicate
                # is an ordinary triple pattern; path operators need
                # ground IRIs and cannot follow a variable verb
                self.next()
                verb = ("pred", "?" + t.val)
            else:
                verb = self.path()
            objs = [self.term(wc=wc, bnodes=True)]
            while self.at_punct(","):
                self.next()
                objs.append(self.term(wc=wc, bnodes=True))
            for o in objs:
                if verb[0] == "pred":
                    wc.patterns.append((subj, verb[1], o))
                else:
                    wc.paths.append((subj, verb, o))
            if self.at_punct(";"):
                self.next()
                if (
                    self.at_punct(".")
                    or self.at_punct("}")
                    or self.at_punct("]")
                ):
                    break  # trailing ';'
                continue
            break

    def group(self) -> WhereClause:
        self.expect("PUNCT", "{")
        wc = self.group_body()
        self.expect("PUNCT", "}")
        return wc

    def group_body(self) -> WhereClause:
        wc = WhereClause()
        while not self.at_punct("}"):
            if self.at_kw("filter"):
                self.next()
                if self.at_kw("not"):
                    self.next()
                    self.expect("KW", "exists")
                    sub = self.group()
                    self._require_plain(sub, "FILTER NOT EXISTS")
                    wc.not_exists = (wc.not_exists or []) + sub.patterns
                elif self.at_kw("exists"):
                    self.next()
                    sub = self.group()
                    self._require_plain(sub, "FILTER EXISTS")
                    wc.exists = (wc.exists or []) + sub.patterns
                else:
                    self.expect("PUNCT", "(")
                    e = self.filter_expr()
                    self.expect("PUNCT", ")")
                    if len(e) == 2 and e[0] == "and":
                        # flatten top-level conjunction: separate entries
                        # keep each atom eligible for scan pushdown
                        wc.filters.extend(e[1])
                    else:
                        wc.filters.append(e)
            elif self.at_kw("optional"):
                pos = self.peek().pos
                self.next()
                sub = self.group()
                self._require_optional(sub, pos)
                # sibling OPTIONALs compose as sequential LeftJoins
                # (SPARQL 1.1 §5.2); kept as a list of (patterns,
                # filters) GROUPS — the filters are the LeftJoin's
                # condition, applied to the group's own solutions
                wc.optional = (wc.optional or []) + [
                    (sub.patterns, sub.filters)
                ]
            elif self.at_kw("minus"):
                self.next()
                sub = self.group()
                self._require_plain(sub, "MINUS")
                wc.minus = (wc.minus or []) + sub.patterns
            elif self.at_kw("values"):
                self.next()
                if wc.values is not None:
                    raise ValueError("multiple VALUES blocks not supported")
                wc.values = self.values_clause()
            elif self.at_kw("bind"):
                self.next()
                self.expect("PUNCT", "(")
                e = self.expr()
                self.expect("KW", "as")
                v = self.expect("VAR").val
                self.expect("PUNCT", ")")
                wc.bind.append(("?" + v, e))
            elif self.at_punct("{"):
                t1 = self.peek(1)
                if not (t1.kind == "KW" and t1.val == "select"):
                    # nested CONJUNCTIVE group: Join(outer, group) —
                    # fold its triples/paths/FILTERs into the
                    # enclosing group (exactly equivalent; see
                    # _fold_nested for the soundness conditions)
                    pos = self.peek().pos
                    sub = self.group()
                    if self.at_kw("union"):
                        raise ValueError(
                            "UNION is supported at the top level of "
                            f"WHERE only; at char {self.peek().pos}"
                        )
                    self._fold_nested(wc, sub, pos)
                    if self.at_punct("."):
                        self.next()
                    continue
                # SPARQL 11.2 subquery: evaluated independently, its
                # PROJECTED bindings join the outer group on shared
                # variables. A constant GRAPH <g> scope is the ACTIVE
                # GRAPH for the nested query too (§13.3) — the nested
                # parse INHERITS it (an inner GRAPH clause overwrites
                # it for the subquery only; save/restore keeps the
                # outer scope intact). GRAPH ?var does not compose
                # with subqueries (fails loud in _eval_query).
                self.next()
                saved = getattr(self, "_graph_scope", None)
                saved_var = getattr(self, "_graph_var", None)
                self._graph_var = None
                sub = self.parse_select(top=False)
                self._graph_scope = saved
                self._graph_var = saved_var
                self.expect("PUNCT", "}")
                if sub.project is None:
                    raise ValueError(
                        "subqueries need an explicit projection "
                        "(SELECT * is not supported inside { })"
                    )
                wc.subqueries.append(sub)
            else:
                self.triples_block(wc)
            if self.at_punct("."):
                self.next()
        return wc

    @staticmethod
    def _require_plain(sub: WhereClause, ctx: str):
        if (
            sub.paths or sub.filters or sub.optional or sub.minus
            or sub.not_exists or sub.exists or sub.values or sub.bind
            or sub.subqueries
        ):
            raise ValueError(
                f"{ctx} groups support plain triple patterns only"
            )

    @staticmethod
    def _group_own_vars(sub: WhereClause) -> set:
        """Variables the group's own patterns/paths bind."""
        out: dict = {}
        _pattern_vars_into(sub.patterns, out)
        _pattern_vars_into(sub.paths, out)
        return set(out)

    @staticmethod
    def _filter_vars(filters) -> set:
        """Variables a FILTER expression list reads (shape-aware —
        see :func:`_filter_vars_into`)."""
        out: dict = {}
        _filter_vars_into(filters, out)
        return set(out)

    def _require_optional(self, sub: WhereClause, pos: int):
        """OPTIONAL groups: plain triple patterns plus FILTERs whose
        variables the group ITSELF binds. Under that restriction
        ``LeftJoin(A, B, F)`` equals ``LeftJoin(A, Filter(F, B))`` —
        F(merge(mu1, mu2)) depends only on mu2 — which is how the
        planner executes it. A filter reading an OUTER variable would
        see it unbound inside the group (different answers), so it
        fails loud instead."""
        if (
            sub.paths or sub.optional or sub.minus or sub.not_exists
            or sub.exists or sub.values or sub.bind or sub.subqueries
        ):
            raise ValueError(
                "OPTIONAL groups support plain triple patterns (with "
                f"FILTERs over their own variables); at char {pos}"
            )
        if sub.filters:
            extra = self._filter_vars(sub.filters) - self._group_own_vars(sub)
            if extra:
                raise ValueError(
                    "FILTER inside OPTIONAL reads variables the group "
                    f"does not bind ({sorted(extra)}) — the LeftJoin "
                    "condition would see them unbound; move the FILTER "
                    f"outside the OPTIONAL; at char {pos}"
                )

    def _fold_nested(self, wc: WhereClause, sub: WhereClause, pos: int):
        """Fold a nested conjunctive group into the enclosing one.
        Join is commutative/associative over triples and path units,
        and ``Filter(F, Join(A, B)) = Join(A, Filter(F, B))`` whenever
        F's variables are bound by B itself — so a group carrying only
        triples, paths and such FILTERs flattens exactly. Anything
        whose semantics depend on the group BOUNDARY (OPTIONAL, MINUS,
        EXISTS, VALUES, BIND, subqueries) fails loud."""
        if (
            sub.optional or sub.minus or sub.not_exists or sub.exists
            or sub.values or sub.bind or sub.subqueries
        ):
            raise ValueError(
                "nested groups fold only when conjunctive (triples, "
                "property paths, FILTERs over the group's own "
                "variables); OPTIONAL/MINUS/EXISTS/VALUES/BIND/"
                f"subqueries keep group scope — at char {pos}"
            )
        if sub.filters:
            extra = self._filter_vars(sub.filters) - self._group_own_vars(sub)
            if extra:
                raise ValueError(
                    "FILTER in a nested group reads variables the "
                    f"group does not bind ({sorted(extra)}); move it "
                    f"to the outer group; at char {pos}"
                )
        wc.patterns.extend(sub.patterns)
        wc.paths.extend(sub.paths)
        wc.filters.extend(sub.filters)

    def values_clause(self) -> tuple:
        if self.peek().kind == "VAR":
            vars_ = ["?" + self.next().val]
            self.expect("PUNCT", "{")
            rows = []
            while not self.at_punct("}"):
                rows.append((self.values_term(),))
            self.expect("PUNCT", "}")
            return (vars_, rows)
        self.expect("PUNCT", "(")
        vars_ = []
        while self.peek().kind == "VAR":
            vars_.append("?" + self.next().val)
        self.expect("PUNCT", ")")
        self.expect("PUNCT", "{")
        rows = []
        while not self.at_punct("}"):
            self.expect("PUNCT", "(")
            row = []
            while not self.at_punct(")"):
                row.append(self.values_term())
            self.expect("PUNCT", ")")
            rows.append(tuple(row))
        self.expect("PUNCT", "}")
        return (vars_, rows)

    def values_term(self):
        if self.at_kw("undef"):
            t = self.peek()
            raise ValueError(
                f"VALUES UNDEF is not supported (char {t.pos}); provide "
                "bound terms"
            )
        return self.term()

    # -- where + solution modifiers ---------------------------------------
    def where_clause(self) -> tuple[WhereClause | None, list | None]:
        """→ (single group, None) or (None, union groups). The union
        form is ``WHERE { { g1 } UNION { g2 } … }`` — branch groups
        nested directly inside the outer braces."""
        self.eat_kw("where")
        self.expect("PUNCT", "{")
        if self.at_kw("graph"):
            # GRAPH <iri> { body } wrapping the WHOLE where body — the
            # engine scopes every pattern to one named context
            self.next()
            t = self.peek()
            if t.kind == "IRI":
                self._graph_scope = self.next().val
            elif t.kind == "PNAME":
                self._graph_scope = self.expand(self.next())
            elif t.kind == "VAR":
                # GRAPH ?var: ranges over the store's NAMED contexts
                # (SPARQL §13.3); planned as QUAD patterns — the store's
                # graph column binds the variable, the BGP join on it
                # enforces same-context semantics (no context fan-out)
                self._graph_var = self.next().val
            else:
                raise ValueError(
                    f"GRAPH needs a constant IRI or a variable at char "
                    f"{t.pos}"
                )
            inner = self.group()
            self.expect("PUNCT", "}")
            return inner, None
        if self.at_punct("{") and not (
            self.peek(1).kind == "KW" and self.peek(1).val == "select"
        ):
            pos = self.peek().pos
            head = self.group()
            if self.at_kw("union"):
                groups = [head]
                while self.eat_kw("union"):
                    groups.append(self.group())
                self.expect("PUNCT", "}")
                for g in groups:
                    if (
                        g.paths or g.optional or g.minus or g.not_exists
                        or g.exists or g.values or g.bind or g.filters
                        or g.subqueries
                    ):
                        raise ValueError(
                            "UNION branches support plain triple patterns "
                            "only (the union planner's surface); move "
                            "FILTERs outside or use the programmatic API"
                        )
                return None, groups
            if self.at_punct("}"):
                # WHERE { { g } } is exactly g — any group content
                self.next()
                return head, None
            # nested group followed by more body: Join(head, rest) —
            # fold the (conjunctive) head into the rest
            if self.at_punct("."):
                self.next()
            rest = self.group_body()
            self.expect("PUNCT", "}")
            self._fold_nested(rest, head, pos)
            return rest, None
        first = self.group_body()
        self.expect("PUNCT", "}")
        return first, None

    def solution_modifiers(self, q: ParsedQuery):
        if self.eat_kw("group"):
            self.expect("KW", "by")
            while True:
                if self.peek().kind == "VAR":
                    q.group_by.append(self.next().val)
                elif self.at_punct("("):
                    # GROUP BY (expr AS ?v) — §18.2.4: the key
                    # expression desugars to a BIND over the solution
                    # set; the alias is then a plain grouping column
                    self.next()
                    expr = self.expr()
                    self.expect("KW", "as")
                    v = self.expect("VAR").val
                    self.expect("PUNCT", ")")
                    if q.union_groups is not None:
                        raise ValueError(
                            "GROUP BY expressions need a single WHERE "
                            "group (no top-level UNION)"
                        )
                    q.where.bind.append(("?" + v, expr))
                    q.group_by.append(v)
                else:
                    break
            if not q.group_by:
                raise ValueError("GROUP BY needs at least one variable")
        if self.eat_kw("having"):
            self.expect("PUNCT", "(")
            q.having.append(self.having_cond(q))
            while self.at_punct("&&"):
                self.next()
                q.having.append(self.having_cond(q))
            self.expect("PUNCT", ")")
        if self.eat_kw("order"):
            self.expect("KW", "by")
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    q.order_by.append("?" + t.val)
                elif t.kind == "KW" and t.val in ("asc", "desc"):
                    self.next()
                    self.expect("PUNCT", "(")
                    v = self.expect("VAR").val
                    self.expect("PUNCT", ")")
                    q.order_by.append(("?" + v, t.val))
                else:
                    break
            if not q.order_by:
                raise ValueError("ORDER BY needs at least one variable")
        # LIMIT/OFFSET in either order
        for _ in range(2):
            if self.eat_kw("limit"):
                q.limit = int(self.expect("NUMBER").val)
            elif self.eat_kw("offset"):
                q.offset = int(self.expect("NUMBER").val)
        if not self.at_punct("}") and self.peek().kind != "EOF":
            t = self.peek()
            raise ValueError(
                f"SPARQL syntax: trailing {t.kind}:{t.val!r} at char {t.pos}"
            )

    def having_cond(self, q: ParsedQuery) -> tuple:
        """HAVING(alias-or-aggregate OP number) → filter on the agg
        output column."""
        t = self.peek()
        if t.kind == "VAR":
            alias = self.next().val
        elif t.kind == "KW" and (
            t.val in ("count", "sum", "min", "max", "avg")
        ):
            fn, var, _extra = self.aggregate_call()
            alias = None
            for a, (afn, avar, _x) in (q.aggregates or {}).items():
                if afn != fn:
                    continue
                if avar == var or (
                    # expression aggregate: the SELECT stores a hidden
                    # BIND var — match the HAVING call's AST against
                    # the recorded expression structurally
                    isinstance(var, tuple)
                    and var[0] == "expr"
                    and q.agg_exprs.get(avar) == var[1]
                ):
                    alias = a
                    break
            if alias is None:
                raise ValueError(
                    "HAVING aggregate must also appear in SELECT with an "
                    "alias (the engine filters the aggregated column)"
                )
        else:
            raise ValueError(
                f"HAVING supports ?alias or an aggregate call, got "
                f"{t.kind}:{t.val!r} at char {t.pos}"
            )
        op_t = self.next()
        op = {"=": "=="}.get(op_t.val, op_t.val)
        if op not in ("==", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"unsupported HAVING comparison {op_t.val!r}")
        val = self.expect("NUMBER").val
        return (alias, op, val)

    def aggregate_call(self) -> tuple:
        """→ (fn, var-or-"*"-or-("expr", ast), extra) with fn in
        count/sum/min/max/avg/group_concat. An EXPRESSION argument
        (§18.2.4, e.g. ``SUM(?k * 2)``) comes back as ``("expr", ast)``
        — the SELECT parser desugars it to a hidden BIND so the
        aggregate machinery only ever sees plain binding columns."""
        fn = self.expect("KW").val
        self.expect("PUNCT", "(")
        if self.at_kw("distinct"):
            if fn != "count":
                raise ValueError(
                    f"aggregate DISTINCT is only supported for COUNT "
                    f"(got {fn.upper()}); use the groupagg stages directly"
                )
            self.next()
            fn = "count_distinct"
        extra = None
        if self.at_punct("*"):
            if fn == "count_distinct":
                raise ValueError(
                    "COUNT(DISTINCT *) is not supported; name a variable"
                )
            if fn != "count":
                raise ValueError(f"{fn.upper()}(*) is not valid SPARQL")
            self.next()
            var = "*"
        else:
            e = self.expr()
            if isinstance(e, str) and e.startswith("?"):
                var = e[1:]
            else:
                var = ("expr", e)
        if fn == "group_concat" and self.at_punct(";"):
            self.next()
            self.expect("KW", "separator")
            self.expect("PUNCT", "=")
            extra = self.expect("STRING").val
        self.expect("PUNCT", ")")
        return fn, var, extra

    # -- query forms -------------------------------------------------------
    def parse(self) -> ParsedQuery:
        while self.at_kw("prefix") or self.at_kw("base"):
            kw = self.next().val
            if kw == "base":
                raise ValueError(
                    "BASE is not supported; use absolute IRIs or PREFIX"
                )
            p = self.expect("PNAME")
            pfx, local = p.val
            if local:
                raise ValueError(f"bad PREFIX declaration at char {p.pos}")
            iri = self.expect("IRI")
            self.prefixes[pfx] = iri.val

        t = self.peek()
        if t.kind != "KW":
            raise ValueError(
                f"SPARQL syntax: expected a query form at char {t.pos}"
            )
        if t.val == "select":
            return self.parse_select()
        if t.val == "ask":
            self.next()
            q = ParsedQuery(form="ASK")
            q.where, q.union_groups = self.where_clause()
            q.graph = getattr(self, "_graph_scope", None)
            q.graph_var = getattr(self, "_graph_var", None)
            self.expect("EOF")
            return q
        if t.val == "construct":
            return self.parse_construct()
        if t.val == "describe":
            return self.parse_describe()
        raise ValueError(f"unsupported query form {t.val!r}")

    def parse_select(self, top: bool = True) -> ParsedQuery:
        self.expect("KW", "select")
        q = ParsedQuery(form="SELECT")
        if self.eat_kw("distinct"):
            q.distinct = True
        elif self.eat_kw("reduced"):
            q.distinct = True  # REDUCED permits dedup; we always dedup
        pending_binds: list[tuple] = []
        if self.at_punct("*"):
            self.next()
            q.project = None
        else:
            q.project = []
            q.aggregates = {}
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    q.project.append(t.val)
                elif self.at_punct("("):
                    self.next()
                    t1 = self.peek()
                    if t1.kind == "KW" and t1.val in (
                        "count", "sum", "min", "max", "avg", "sample",
                        "group_concat",
                    ):
                        fn, var, extra = self.aggregate_call()
                        self.expect("KW", "as")
                        alias = self.expect("VAR").val
                        self.expect("PUNCT", ")")
                        if isinstance(var, tuple) and var[0] == "expr":
                            # aggregate over an EXPRESSION: desugar to a
                            # hidden BIND evaluated over the solution
                            # set, then aggregate the bound column
                            hidden = f"_aggexpr{len(pending_binds)}"
                            pending_binds.append(("?" + hidden, var[1]))
                            q.agg_exprs[hidden] = var[1]
                            var = hidden
                        q.aggregates[alias] = (fn, var, extra)
                        q.project.append(alias)
                    else:
                        # §18.2.4 projection expression (expr AS ?x):
                        # lowered to a BIND appended after the WHERE
                        # group parses — same evaluation point (over
                        # the solution set, before DISTINCT/ORDER), and
                        # the alias may serve as a GROUP BY key
                        expr = self.expr()
                        self.expect("KW", "as")
                        alias = self.expect("VAR").val
                        self.expect("PUNCT", ")")
                        pending_binds.append(("?" + alias, expr))
                        q.project.append(alias)
                else:
                    break
            if not q.project:
                raise ValueError("empty SELECT projection")
            if not q.aggregates:
                q.aggregates = None
        q.where, q.union_groups = self.where_clause()
        if pending_binds:
            if q.union_groups is not None:
                raise ValueError(
                    "projection expressions need a single WHERE group "
                    "(no top-level UNION)"
                )
            q.where.bind.extend(pending_binds)
        q.graph = getattr(self, "_graph_scope", None)
        q.graph_var = getattr(self, "_graph_var", None)
        self.solution_modifiers(q)
        if top:
            self.expect("EOF")
        if q.aggregates and not q.group_by:
            # implicit single group (SPARQL §18.3: a query with
            # aggregates but no GROUP BY aggregates over ALL solutions):
            # every projected item must then be an aggregate alias
            for v in q.project or []:
                if v not in q.aggregates:
                    raise ValueError(
                        f"SELECT ?{v} mixes a plain variable with "
                        "aggregates but has no GROUP BY"
                    )
        if q.group_by:
            if not q.aggregates:
                raise ValueError("GROUP BY without aggregates in SELECT")
            for v in q.project or []:
                if v not in q.aggregates and v not in q.group_by:
                    raise ValueError(
                        f"SELECT ?{v} is neither a GROUP BY key nor an "
                        "aggregate alias"
                    )
        return q

    def parse_construct(self) -> ParsedQuery:
        self.expect("KW", "construct")
        q = ParsedQuery(form="CONSTRUCT")
        if self.at_kw("where"):
            # §10.2.2 CONSTRUCT WHERE shorthand: the template IS the
            # where pattern — basic graph pattern only (the spec's
            # shorthand grammar admits no FILTER/OPTIONAL/paths)
            q.where, q.union_groups = self.where_clause()
            if q.union_groups is not None:
                raise ValueError(
                    "CONSTRUCT WHERE takes a basic graph pattern (no UNION)"
                )
            wc = q.where
            if (
                wc.paths or wc.filters or wc.optional or wc.minus
                or wc.not_exists or wc.exists or wc.values or wc.bind
                or wc.subqueries
            ):
                raise ValueError(
                    "CONSTRUCT WHERE takes a basic graph pattern only "
                    "(use the explicit template form for FILTER/OPTIONAL/…)"
                )
            q.construct_templates = list(wc.patterns)
            q.graph = getattr(self, "_graph_scope", None)
            q.graph_var = getattr(self, "_graph_var", None)
            self.solution_modifiers(q)
            if q.group_by or q.order_by or q.limit is not None or q.offset:
                raise ValueError(
                    "CONSTRUCT does not take GROUP BY / ORDER / LIMIT here"
                )
            self.expect("EOF")
            return q
        tmpl = self.group()
        if (
            tmpl.paths or tmpl.filters or tmpl.optional or tmpl.minus
            or tmpl.not_exists or tmpl.exists or tmpl.values or tmpl.bind
        ):
            raise ValueError("CONSTRUCT template must be plain triples")
        q.construct_templates = tmpl.patterns
        q.where, q.union_groups = self.where_clause()
        q.graph = getattr(self, "_graph_scope", None)
        q.graph_var = getattr(self, "_graph_var", None)
        self.solution_modifiers(q)
        if q.group_by or q.order_by or q.limit is not None or q.offset:
            raise ValueError(
                "CONSTRUCT does not take GROUP BY / ORDER / LIMIT here"
            )
        self.expect("EOF")
        return q

    def parse_describe(self) -> ParsedQuery:
        self.expect("KW", "describe")
        q = ParsedQuery(form="DESCRIBE")
        desc_vars: list[str] = []
        while True:
            t = self.peek()
            if t.kind == "IRI":
                q.describe_nodes.append(self.next().val)
            elif t.kind == "PNAME":
                q.describe_nodes.append(self.expand(self.next()))
            elif t.kind == "VAR":
                desc_vars.append(self.next().val)
            else:
                break
        if desc_vars:
            # DESCRIBE ?var needs a WHERE to bind it; the node set is
            # the DISTINCT non-literal bindings of the listed variables
            if q.describe_nodes:
                raise ValueError(
                    "DESCRIBE mixes explicit IRIs and variables; use one "
                    "form (run two queries)"
                )
            q.describe_vars = desc_vars
            q.where, q.union_groups = self.where_clause()
            if q.union_groups is not None:
                raise ValueError("DESCRIBE ?var does not support UNION")
            if q.where is None:
                raise ValueError("DESCRIBE ?var needs a WHERE clause")
            q.graph = getattr(self, "_graph_scope", None)
            q.graph_var = getattr(self, "_graph_var", None)
            self.solution_modifiers(q)
            if q.group_by or q.having:
                raise ValueError("DESCRIBE does not support GROUP BY")
            self.expect("EOF")
            return q
        if not q.describe_nodes:
            raise ValueError(
                "DESCRIBE needs explicit IRIs or a ?var with a WHERE "
                "clause"
            )
        self.expect("EOF")
        return q


def parse_query(text: str) -> ParsedQuery:
    """Parse a SPARQL 1.1 query string into the engine-facing IR.
    Raises ``ValueError`` with the offending position for anything
    outside the supported subset (see module docstring)."""
    return _Parser(text).parse()


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------

def _split_source(source, base):
    """→ (kind, planner kwargs): a str is a materialized store dir, a
    LIST of strs the federated union of stores, a Catalog the
    Direct-Mapping virtual graph under ``base``."""
    if isinstance(source, str) or (
        isinstance(source, list) and all(isinstance(s, str) for s in source)
    ):
        return "store", {}
    if base is None:
        raise ValueError("catalog sources need base= for the DM IRIs")
    return "dm", {"base": base}


def sparql(
    source,
    text: str,
    *,
    base: str | None = None,
    num_partitions: int = 4,
    broadcast_limit: int = 1_000_000,
):
    """Run a SPARQL query STRING against ``source`` — a triple-store
    directory (str) or a :class:`~..sources.catalog.Catalog` (the
    Direct-Mapping virtual graph under ``base``).

    Returns: SELECT → Dataset of variable bindings (one column per
    projected variable); ASK → bool; CONSTRUCT / DESCRIBE → Dataset of
    TRIPLE_SCHEMA rows. All Datasets are lazy; distribution is entirely
    the underlying planners'."""
    q = parse_query(text)
    kind, _ = _split_source(source, base)
    return _eval_query(
        q, source, kind, base,
        num_partitions=num_partitions, broadcast_limit=broadcast_limit,
    )


def _eval_query(
    q: ParsedQuery,
    source,
    kind: str,
    base: str | None,
    *,
    num_partitions: int,
    broadcast_limit: int,
    as_unit: bool = False,
):
    """Execute a :class:`ParsedQuery` — shared by :func:`sparql` and
    the §11.2 subquery recursion (a subquery re-enters here with the
    same source; its projected bindings fold into the outer BGP as a
    pre-built unit).

    ``as_unit=True`` (subquery mode, SELECT only): the result retains a
    ``__k_<var>`` term-kind column for every projected non-aggregate
    variable — the outer join's literal/IRI reconciliation is exact
    only when both sides carry kind metadata (see
    :func:`_ensure_kind_cols`). Returns ``(ds, kind_vars)``."""
    from .construct import construct
    from .lookup import (
        apply_solution_modifiers,
        ask as _ask,
        describe as _describe,
        describe_store,
        get_pattern,
        get_pattern_store,
        get_pattern_store_union,
        get_pattern_union,
    )

    if as_unit and (q.form != "SELECT" or q.union_groups is not None):
        raise NotImplementedError(
            "subqueries support plain/aggregate SELECT bodies only "
            "(no UNION, no ASK/CONSTRUCT/DESCRIBE forms)"
        )

    if q.form == "DESCRIBE" and not q.describe_vars:
        if kind == "store":
            return describe_store(source, q.describe_nodes)
        return _describe(source, q.describe_nodes, base=base)

    if q.union_groups is not None:
        groups = [g.patterns for g in q.union_groups]
        filters = None
        if kind == "store":
            out = get_pattern_store_union(
                source, groups, num_partitions=num_partitions,
                filters=filters,
            )
        else:
            out = get_pattern_union(
                source, groups, base=base, num_partitions=num_partitions,
                filters=filters,
            )
        if q.form == "ASK":
            return _ask(out)
        if q.form != "SELECT" or q.group_by or q.aggregates:
            raise ValueError(
                "UNION queries support SELECT/ASK without aggregates"
            )
        return _project(
            out, q, apply_modifiers=True, num_partitions=num_partitions,
            scope_vars=_scope_vars(q),
        )

    wc = q.where
    if (q.graph is not None or q.graph_var is not None) and kind != "store":
        raise ValueError(
            "GRAPH scope needs a triple-store source (the DM virtual "
            "graph has no named contexts)"
        )
    if q.graph_var is not None and wc.subqueries:
        raise NotImplementedError(
            "subqueries inside GRAPH ?var are not supported (the "
            "subquery would evaluate outside the variable graph scope)"
        )
    plan_kwargs = dict(
        filters=wc.filters or None,
        optional=wc.optional,
        minus=wc.minus,
        not_exists=wc.not_exists,
        exists=wc.exists,
        values=wc.values,
        bind=wc.bind or None,
        paths=wc.paths or None,
        num_partitions=num_partitions,
        broadcast_limit=broadcast_limit,
    )

    if wc.subqueries:
        # evaluate each subquery independently; its PROJECTED bindings
        # become a pre-built join unit. Every non-aggregate projected
        # variable carries its __k_<var> term-kind column (as_unit mode)
        # so the outer reconciliation keeps literal solutions exact; an
        # aggregate OUTPUT shared with an outer pattern variable would
        # need literal-kind + lexical-form join semantics we do not
        # implement — fail loud rather than mis-join
        # every variable the outer group can JOIN a unit on — patterns,
        # property paths, OPTIONAL/MINUS/EXISTS groups, VALUES, and the
        # other subqueries' projections (FILTER/BIND only READ the
        # joined column, so they are not join sites and stay legal over
        # aggregate outputs)
        seen: dict = {}
        for part in (
            wc.patterns, wc.paths, wc.minus,
            wc.not_exists, wc.exists, wc.values,
        ):
            if part:
                _pattern_vars_into(part, seen)
        for opt in wc.optional or []:
            _pattern_vars_into(_optional_patterns(opt), seen)
        outer_vars: set = set(seen)
        sub_units = []
        for sq in wc.subqueries:
            sub_ds, sub_kinds = _eval_query(
                sq, source, kind, base,
                num_partitions=num_partitions,
                broadcast_limit=broadcast_limit,
                as_unit=True,
            )
            names = list(dict.fromkeys(sq.project))
            agg_aliases = set(sq.aggregates or {}) & set(names)
            # a sibling subquery's projection joins this unit too —
            # count every projection EXCEPT this subquery's own
            sibling_vars = {
                v for other in wc.subqueries if other is not sq
                for v in (other.project or [])
            }
            clash = agg_aliases & (outer_vars | sibling_vars)
            if clash:
                raise NotImplementedError(
                    "subquery aggregate output "
                    f"{sorted(clash)} is joined by an outer pattern/"
                    "path/OPTIONAL/MINUS/EXISTS/VALUES/subquery "
                    "variable; join on the GROUP BY keys instead"
                )
            sub_units.append((sub_ds, names, sub_kinds))
        plan_kwargs["units"] = sub_units

    def plan(**kw):
        if kind == "store":
            if q.graph is not None:
                kw["graph"] = q.graph
            if q.graph_var is not None:
                kw["graph_var"] = q.graph_var
            return get_pattern_store(source, wc.patterns, **plan_kwargs, **kw)
        return get_pattern(source, wc.patterns, base=base, **plan_kwargs, **kw)

    if q.form == "ASK":
        return _ask(plan())

    if q.form == "DESCRIBE":
        # DESCRIBE ?var: the node set is the distinct NON-LITERAL
        # bindings of the listed variables over the WHERE solutions (a
        # literal names no resource, even when its lexical form spells
        # an IRI — the kind columns make the distinction exact)
        out = plan(
            keep_kinds=True, order_by=q.order_by or None,
            limit=q.limit, offset=q.offset,
        )
        nodes = _collect_describe_nodes(out, q.describe_vars)
        if not nodes:
            import pyarrow as pa
            import ray.data as rd

            from ..terms import TRIPLE_SCHEMA

            return rd.from_arrow(
                pa.Table.from_arrays(
                    [pa.array([], f.type) for f in TRIPLE_SCHEMA],
                    schema=TRIPLE_SCHEMA,
                )
            )
        if kind == "store":
            return describe_store(source, nodes)
        return _describe(source, nodes, base=base)

    if q.form == "CONSTRUCT":
        return construct(
            plan(keep_kinds=True),
            q.construct_templates,
            num_partitions=num_partitions,
        )

    # SELECT
    if as_unit:
        from .distinct import distinct_rows

        if q.project is None:
            raise NotImplementedError(
                "subqueries must project explicit variables (no SELECT *)"
            )
        cols = list(dict.fromkeys(q.project))
        if q.aggregates:
            out = _aggregate(
                plan(keep_kinds=True), q, apply_solution_modifiers,
                num_partitions, key_kinds=True,
            )
            return out, {v for v in q.group_by if v in cols}
        kcols = [f"__k_{v}" for v in cols]
        if q.distinct:
            out = _ensure_kind_cols(plan(keep_kinds=True), cols)
            out = out.select_columns(cols + kcols)
            out = distinct_rows(out, cols + kcols,
                                num_buckets=num_partitions)
            out = apply_solution_modifiers(
                out, q.order_by, q.limit, q.offset
            )
        else:
            out = plan(
                keep_kinds=True, order_by=q.order_by or None,
                limit=q.limit, offset=q.offset,
            )
            out = _ensure_kind_cols(out, cols).select_columns(cols + kcols)
        return out, set(cols)

    if q.aggregates:
        return _aggregate(
            plan(), q, apply_solution_modifiers, num_partitions
        )
    if q.distinct and q.project is not None:
        # DISTINCT-over-projection precedes ORDER/LIMIT (SPARQL §18.2.4
        # sequence): plan unmodified, project+dedup, then the modifiers
        out = _project(
            plan(), q, apply_modifiers=False, num_partitions=num_partitions,
            scope_vars=_scope_vars(q),
        )
        return apply_solution_modifiers(out, q.order_by, q.limit, q.offset)
    out = plan(order_by=q.order_by or None, limit=q.limit, offset=q.offset)
    return _project(
        out, q, apply_modifiers=False, num_partitions=num_partitions,
        scope_vars=_scope_vars(q),
    )


def _ensure_kind_cols(ds, names: list[str]):
    """Normalize a binding Dataset so EVERY listed variable carries a
    ``__k_<var>`` term-kind column. A variable the planner left unkinded
    was bound only in subject/predicate positions, where the kind is
    derivable from the lexical form alone (:func:`terms.derive_term_kind`;
    NULL = unbound stays NULL). Used to build §11.2 subquery join units
    — the outer BGP's literal/IRI reconciliation needs a kind verdict
    for every shared variable, and an ABSENT kind column is read there
    as \"non-literal position\", which silently dropped literal
    solutions projected out of subqueries."""
    import pyarrow as pa

    def add(t: pa.Table, _names=tuple(names)) -> pa.Table:
        from ..terms import KIND_LITERAL, derive_term_kind

        for v in _names:
            kc = f"__k_{v}"
            if kc in t.column_names:
                continue
            if not pa.types.is_string(t.column(v).type):
                # non-string bindings (BIND arithmetic, aggregate
                # outputs) are literal VALUES by construction
                t = t.append_column(
                    kc,
                    pa.repeat(pa.scalar(KIND_LITERAL, pa.uint8()),
                              t.num_rows),
                )
                continue
            t = t.append_column(
                kc, derive_term_kind(t.column(v))
            )
        return t

    return ds.map_batches(add, batch_format="pyarrow")


def _scope_vars(q: ParsedQuery) -> list[str]:
    """Variables the WHERE group can BIND — the SPARQL 1.1 §18.2.1
    in-scope set minus FILTER / MINUS / (NOT) EXISTS (which never
    extend scope): pattern, property-path and OPTIONAL positions,
    VALUES variables, BIND aliases, subquery projections, GRAPH ?var.
    Computed STATICALLY from the parse so :func:`_project` never has
    to execute the plan to sniff its schema (``Dataset.schema()`` in
    Ray runs the whole pipeline once — the distinct shuffle at the end
    of every BGP defeats its ``limit(1)``)."""
    seen: dict[str, None] = {}

    if q.union_groups is not None:
        for g in q.union_groups:
            _pattern_vars_into(g.patterns, seen)
    elif q.where is not None:
        wc = q.where
        _pattern_vars_into(wc.patterns, seen)
        _pattern_vars_into(wc.paths, seen)
        for opt in wc.optional or []:
            _pattern_vars_into(_optional_patterns(opt), seen)
        _pattern_vars_into(wc.values, seen)
        for alias, _expr in wc.bind or []:
            # only the alias binds; expression vars merely read
            _pattern_vars_into(alias, seen)
        for sq in wc.subqueries:
            for v in sq.project or []:
                seen.setdefault(v)
    if q.graph_var is not None:
        seen.setdefault(q.graph_var)
    return list(seen)


def _optional_patterns(opt) -> list:
    """The pattern list of ONE optional group, whichever surface form
    it arrived in: a bare pattern list or the front-end's
    ``(patterns, filters)`` pair (whose filters only READ variables
    the patterns already bind — never walked for scope)."""
    if (
        isinstance(opt, tuple)
        and len(opt) == 2
        and isinstance(opt[0], list)
    ):
        return opt[0]
    return opt


def _project(bindings, q: ParsedQuery, apply_modifiers: bool,
             num_partitions: int, scope_vars: list[str]):
    import pyarrow as pa

    from .distinct import distinct_rows
    from .lookup import apply_solution_modifiers

    out = bindings
    if q.project is None and any(v.startswith("__bn_") for v in scope_vars):
        # blank nodes in the patterns are non-distinguished variables
        # (§4.1.4): SELECT * projects every IN-SCOPE variable, which
        # excludes them — rewrite to an explicit projection (a COPY;
        # ParsedQuery objects may be reused by callers)
        from dataclasses import replace as _dc_replace

        cols = [v for v in scope_vars if not v.startswith("__bn_")]
        if not cols:
            raise NotImplementedError(
                "SELECT * over a group that binds only blank nodes"
            )
        q = _dc_replace(q, project=cols)
    if q.project is None:
        # SELECT *: the planner's columns ARE the projection. With a
        # non-empty scope the plan never yields the mu0 marker, and
        # _bgp_join's _NO_MATCH table already carries the scope
        # columns — pass through untouched (and lazy).
        if not scope_vars:
            raise NotImplementedError(
                "SELECT * over a WHERE group that binds no variables"
            )
    else:
        cols = list(dict.fromkeys(q.project))
        if not scope_vars:
            # degenerate group (every pattern fully bound): the
            # solution set is {mu0} (one row, see _bgp_join's marker)
            # or empty (_NO_MATCH, zero rows) — count() here executes
            # only existence probes, never a data-sized pipeline
            import ray.data as rd

            n = out.count()
            out = rd.from_arrow(
                pa.table(
                    {c: pa.array([None] * n, pa.string()) for c in cols}
                )
            )
        elif set(cols) <= set(scope_vars):
            # every projected variable is bindable: a plain (lazy,
            # schema-preserving) column selection
            out = out.select_columns(cols)
        else:
            # a variable projected but never bound anywhere in the
            # group (legal SPARQL): batch-wise projection fills it
            # with an all-NULL string column; bound columns pass
            # through zero-copy. (Ray never maps a 0-row block, so an
            # EMPTY result here ends schemaless — acceptable for the
            # ghost-variable edge only.)
            def project(t: pa.Table, _cols=tuple(cols)) -> pa.Table:
                return pa.table(
                    {
                        c: (
                            t.column(c)
                            if c in t.column_names
                            else pa.nulls(t.num_rows, pa.string())
                        )
                        for c in _cols
                    }
                )

            out = out.map_batches(project, batch_format="pyarrow")
        if q.distinct:
            out = distinct_rows(out, cols, num_buckets=num_partitions)
    if apply_modifiers:
        out = apply_solution_modifiers(out, q.order_by, q.limit, q.offset)
    return out


def _aggregate(bindings, q: ParsedQuery, apply_solution_modifiers,
               num_partitions: int, key_kinds: bool = False):
    """GROUP BY + aggregates over a binding set, via the engine's
    combiner-first grouped stages (``stages.groupagg``).

    ``key_kinds=True`` (subquery-unit mode): grouping keys extend to
    ``(lexical, __k_<var>)`` pairs so an IRI and a literal spelling the
    same lexical form stay distinct groups, and the kind columns of the
    projected GROUP BY variables survive into the output for the outer
    join's reconciliation."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.groupagg import (
        grouped_aggregate,
        grouped_concat,
        grouped_count_distinct,
    )

    keys = list(q.group_by)
    implicit = not keys
    kind_keys: list[str] = []
    if key_kinds and keys:
        # the grouped stages reserve the "__" prefix for hidden partials
        # they drop at finalize — ride the kind columns through under
        # "k.<var>" ('.' cannot occur in a SPARQL variable name, so no
        # binding column can collide) and rename back after projection
        bindings = _ensure_kind_cols(bindings, keys)

        def _to_alias(t: pa.Table, _ks=tuple(keys)) -> pa.Table:
            ren = {f"__k_{v}": f"k.{v}" for v in _ks}
            return t.rename_columns(
                [ren.get(c, c) for c in t.column_names]
            )

        bindings = bindings.map_batches(_to_alias, batch_format="pyarrow")
        kind_keys = [f"k.{v}" for v in keys]
    if implicit:
        # implicit single group (SPARQL §18.3): aggregate over ALL
        # solutions via a constant key — '.' is invalid in a SPARQL
        # variable name, so the column can never collide with a binding;
        # the alias-only projection below drops it again
        const = "implicit.group"

        def add_const(t: pa.Table) -> pa.Table:
            import numpy as np

            return t.append_column(
                const, pa.array(np.zeros(t.num_rows, np.uint8))
            )

        bindings = bindings.map_batches(add_const, batch_format="pyarrow")
        keys = [const]
    concat_aggs = {
        a: spec for a, spec in q.aggregates.items() if spec[0] == "group_concat"
    }
    cdist_aggs = {
        a: spec for a, spec in q.aggregates.items()
        if spec[0] == "count_distinct"
    }
    plain_aggs = {
        a: spec for a, spec in q.aggregates.items()
        if spec[0] not in ("group_concat", "count_distinct")
    }
    solo = [n for n, d in
            (("GROUP_CONCAT", concat_aggs), ("COUNT(DISTINCT)", cdist_aggs))
            if d]
    if solo and (plain_aggs or len(concat_aggs) + len(cdist_aggs) > 1):
        raise ValueError(
            f"{solo[0]} cannot be combined with other aggregates in one "
            "query (it would need a per-key join); run two queries"
        )

    if cdist_aggs:
        ((alias, (_fn, var, _x)),) = cdist_aggs.items()
        out = grouped_count_distinct(
            bindings, keys=keys + kind_keys, col=var, out=alias,
            num_partitions=num_partitions,
        )
    elif concat_aggs:
        ((alias, (_fn, var, sep)),) = concat_aggs.items()
        out = grouped_concat(
            bindings, keys=keys + kind_keys, col=var,
            sep=sep if sep is not None else " ",
            order_by=[var], out=alias, num_partitions=num_partitions,
        )
    else:
        # numeric aggregates evaluate over the lexical forms: cast the
        # input variable columns once, map-only, before the shuffle
        # SUM/AVG force a numeric cast of the variable's lexical forms
        # (non-numeric raises — there is no numeric reading); a variable
        # used ONLY by MIN/MAX/SAMPLE aggregates LEXICALLY (string
        # compare — the natural reading for names/IRIs; a var that is
        # also summed keeps the numeric ordering for its min/max)
        num_vars = sorted(
            {v for fn, v, _x in plain_aggs.values()
             if fn in ("sum", "avg") and v != "*"}
        )
        ds = bindings
        if num_vars:
            # derived numeric columns, never in-place: the variable may
            # double as a GROUP BY key, whose lexical form must survive
            def cast(t: pa.Table, _vs=tuple(num_vars)) -> pa.Table:
                for v in _vs:
                    arr = t.column(v)
                    if pa.types.is_string(arr.type):
                        arr = pc.cast(
                            arr.combine_chunks(), pa.float64(), safe=False
                        )
                    t = t.append_column(f"{v}_num_", arr)
                return t

            ds = ds.map_batches(cast, batch_format="pyarrow")
        aggs = {}
        for alias, (fn, var, _x) in plain_aggs.items():
            col = keys[0] if var == "*" else var
            if var in num_vars:
                col = f"{var}_num_"
            # SAMPLE may return any group member (SPARQL §18.5.1.7);
            # deterministic lexical min keeps runs reproducible
            aggs[alias] = (col, {"avg": "mean", "sample": "min"}.get(fn, fn))
        out = grouped_aggregate(
            ds, keys=keys + kind_keys, aggs=aggs,
            num_partitions=num_partitions
        )

    if q.having:
        hv = list(q.having)

        def having_filter(t: pa.Table, _hv=tuple(hv)) -> pa.Table:
            mask = None
            for alias, op, val in _hv:
                c = t.column(alias)
                m = {
                    "==": pc.equal, "!=": pc.not_equal, "<": pc.less,
                    "<=": pc.less_equal, ">": pc.greater,
                    ">=": pc.greater_equal,
                }[op](c, val)
                mask = m if mask is None else pc.and_(mask, m)
            return t.filter(pc.fill_null(mask, False))

        out = out.map_batches(having_filter, batch_format="pyarrow")

    if q.project is not None:
        cols = list(dict.fromkeys(q.project))
        if kind_keys:
            # subquery-unit mode: the projected GROUP BY variables keep
            # their kind columns for the outer join's reconciliation
            kept = [v for v in keys if v in q.project]
            out = out.select_columns(cols + [f"k.{v}" for v in kept])

            def _from_alias(t: pa.Table, _ks=tuple(kept)) -> pa.Table:
                ren = {f"k.{v}": f"__k_{v}" for v in _ks}
                return t.rename_columns(
                    [ren.get(c, c) for c in t.column_names]
                )

            out = out.map_batches(_from_alias, batch_format="pyarrow")
        else:
            out = out.select_columns(cols)
    if implicit:
        out = _single_group_result(out, q)
    return apply_solution_modifiers(out, q.order_by, q.limit, q.offset)


_DESCRIBE_NODE_CAP = 1_000


def _collect_describe_nodes(bindings, desc_vars: list[str]) -> list[str]:
    """Distinct non-literal bindings of ``desc_vars`` — the DESCRIBE
    node set. Driver-materialized BY DESIGN: each node costs one
    bucket-pruned point-lookup union in the CBD walk, so the set must
    stay human-scale; past ``_DESCRIBE_NODE_CAP`` we fail loud and tell
    the user to narrow with LIMIT rather than silently launching
    thousands of lookups. A variable bound in a subject/predicate
    position carries no ``__k_`` column (implicitly non-literal);
    object-position bindings are filtered by their kind column."""
    from ..terms import KIND_LITERAL

    rows = bindings.take(_DESCRIBE_NODE_CAP + 1)
    if len(rows) > _DESCRIBE_NODE_CAP:
        raise ValueError(
            f"DESCRIBE ?var resolved more than {_DESCRIBE_NODE_CAP} "
            "solutions; add ORDER BY + LIMIT to bound the node set"
        )
    nodes: dict[str, None] = {}
    for r in rows:
        for v in desc_vars:
            val = r.get(v)
            if val is None:
                continue
            k = r.get(f"__k_{v}")
            if k is not None and k == KIND_LITERAL:
                continue
            nodes[val] = None
    return list(nodes)


def _single_group_result(out, q: ParsedQuery):
    """An implicit single-group aggregate is ≤ 1 row by construction, so
    materializing it is scale-safe. When the WHERE matched NOTHING the
    grouped stages emit zero rows, but SPARQL §18.5 defines the empty
    group: COUNT = 0, SUM = 0, GROUP_CONCAT = "", MIN/MAX/AVG/SAMPLE
    unbound — emit that identity row instead."""
    import pyarrow as pa
    import ray
    import ray.data as _rd

    tbls = ray.get(out.to_arrow_refs())
    tbl = pa.concat_tables(tbls, promote_options="default") if tbls else None
    if tbl is not None and tbl.num_rows:
        return _rd.from_arrow(tbl)
    vals = {}
    for alias, (fn, _v, _x) in q.aggregates.items():
        if fn in ("count", "count_distinct"):
            vals[alias] = pa.array([0], pa.int64())
        elif fn == "sum":
            vals[alias] = pa.array([0.0], pa.float64())
        elif fn == "group_concat":
            vals[alias] = pa.array([""], pa.string())
        else:
            vals[alias] = pa.array([None], pa.float64())
    cols = list(dict.fromkeys(q.project or vals))
    ident = pa.table({c: vals[c] for c in cols})
    if tbl is not None and tbl.schema.names == ident.schema.names:
        try:
            ident = ident.cast(tbl.schema)
        except pa.ArrowInvalid:
            pass  # keep the identity row's own types
    return _rd.from_arrow(ident)


# -- SPARQL 1.1 Update (store lifecycle) ------------------------------------

@dataclass
class ParsedUpdate:
    kind: str  # insert_data|delete_data|delete_where|insert|delete|modify
    #      |clear
    templates: list = field(default_factory=list)
    where: WhereClause | None = None
    insert_templates: list | None = None  # the INSERT half of "modify"
    # DATA: constant named-graph scope (GRAPH <g> { triples }).
    # CLEAR/DROP: the target — an IRI, or "__default__"/"__named__"/
    # "__all__" sentinels. ADD/COPY/MOVE: the SOURCE graph.
    graph: str | None = None
    # ADD/COPY/MOVE: the DESTINATION graph (IRI or "__default__")
    graph_to: str | None = None
    # LOAD: the document IRI (file: scheme or a bare local path)
    source: str | None = None


def parse_update(text: str) -> ParsedUpdate:
    """SPARQL 1.1 Update, ONE operation → :class:`ParsedUpdate`
    (see :func:`parse_update_ops` for ``;`` sequences)."""
    ops = parse_update_ops(text)
    if len(ops) != 1:
        raise ValueError(
            f"parse_update expects exactly one operation, got {len(ops)} "
            "(use parse_update_ops / sparql_update for sequences)"
        )
    return ops[0]


def parse_update_ops(text: str) -> list[ParsedUpdate]:
    """SPARQL 1.1 Update subset → operations list [W3C Update §3]:
    ``INSERT DATA { triples }``, ``DELETE DATA { triples }``,
    ``DELETE WHERE { patterns }``, the template forms
    ``INSERT/DELETE { template } WHERE { group }``, the combined
    §3.1.3 Modify ``DELETE { t1 } INSERT { t2 } WHERE { group }``,
    ``CLEAR/DROP GRAPH <g> | DEFAULT | NAMED | ALL`` (§3.2.2/3.2.3 —
    identical here: the bucket store has no empty-graph existence),
    ``LOAD [SILENT] <docIRI> [INTO GRAPH <g>]`` (§3.1.4 — local
    N-Triples/N-Quads documents; bootstraps a store at a fresh
    location), and
    ``;``-separated sequences of those (applied in order, each against
    the store state the previous left — §3.1). ``WITH <g>`` before a
    template-form operation scopes BOTH the WHERE matching and the
    template target to that named graph. PREFIX declarations carry
    across the whole request. DATA blocks accept ONE constant
    ``GRAPH <g> { triples }`` wrapper; free GRAPH blocks inside WHERE /
    templates and blank-node labels are not supported (use the
    programmatic store API)."""
    p = _Parser(text)
    ops: list[ParsedUpdate] = []
    while True:
        while p.at_kw("prefix") or p.at_kw("base"):
            kw = p.next().val
            if kw == "base":
                raise ValueError("BASE is not supported; use absolute IRIs")
            tok = p.expect("PNAME")
            pfx, local = tok.val
            if local:
                raise ValueError(f"bad PREFIX declaration at char {tok.pos}")
            p.prefixes[pfx] = p.expect("IRI").val
        ops.append(_parse_one_update(p))
        if p.at_punct(";"):
            p.next()
            if p.peek().kind == "EOF":  # trailing ; is legal
                break
            continue
        break
    p.expect("EOF")
    return ops


def _parse_one_update(p: _Parser) -> ParsedUpdate:
    t = p.peek()
    if t.kind == "KW" and t.val in ("clear", "drop"):
        # §3.2.2/.3.2.2 CLEAR / DROP — identical here (the bucket store
        # has no empty-graph existence, so DROP ≡ CLEAR): target is
        # GRAPH <iri>, DEFAULT, NAMED, or ALL. SILENT is accepted and
        # ignored (clearing an absent graph is already a no-op).
        p.next()
        if p.peek().kind == "IDENT" and str(p.peek().val).lower() == "silent":
            p.next()
        tk = p.peek()
        if tk.kind == "KW" and tk.val == "graph":
            p.next()
            tk = p.peek()
            if tk.kind == "IRI":
                g = p.next().val
            elif tk.kind == "PNAME":
                g = p.expand(p.next())
            else:
                raise ValueError(
                    f"CLEAR GRAPH needs a constant IRI at char {tk.pos}"
                )
            return ParsedUpdate(kind="clear", graph=g)
        if tk.kind == "KW" and tk.val in ("default", "named", "all"):
            p.next()
            return ParsedUpdate(kind="clear", graph=f"__{tk.val}__")
        raise ValueError(
            f"CLEAR/DROP needs GRAPH <iri>, DEFAULT, NAMED or ALL at "
            f"char {tk.pos}"
        )
    if t.kind == "IDENT" and str(t.val).lower() == "load":
        # §3.1.4 LOAD [SILENT] <docIRI> [INTO GRAPH <g>] — the document
        # is an N-Triples/N-Quads file on LOCAL storage (offline
        # sandbox: file: scheme or a bare path IRI; http: rejected).
        # SILENT accepted and ignored (a missing file still raises —
        # silently skipping data loss is worse than the spec's lenience).
        p.next()
        if p.peek().kind == "IDENT" and str(p.peek().val).lower() == "silent":
            p.next()
        tk = p.peek()
        if tk.kind != "IRI":
            raise ValueError(
                f"LOAD needs a document IRI at char {tk.pos}"
            )
        src = p.next().val
        g = None
        if p.peek().kind == "IDENT" and str(p.peek().val).lower() == "into":
            p.next()
            p.expect("KW", "graph")
            tk = p.peek()
            if tk.kind == "IRI":
                g = p.next().val
            elif tk.kind == "PNAME":
                g = p.expand(p.next())
            else:
                raise ValueError(
                    f"INTO GRAPH needs a constant IRI at char {tk.pos}"
                )
        return ParsedUpdate(kind="load", source=src, graph=g)
    if t.kind == "IDENT" and str(t.val).lower() in ("add", "copy", "move"):
        # §3.2.5–3.2.7 graph management: SOURCE (GRAPH <g> | DEFAULT)
        # TO DESTINATION. ADD unions src into dst; COPY replaces dst
        # with src; MOVE is COPY + drop src. SILENT accepted/ignored.
        verb = str(p.next().val).lower()
        if p.peek().kind == "IDENT" and str(p.peek().val).lower() == "silent":
            p.next()

        def graph_ref(role: str) -> str:
            tk = p.peek()
            if tk.kind == "KW" and tk.val == "graph":
                p.next()
                tk = p.peek()
            if tk.kind == "IRI":
                return p.next().val
            if tk.kind == "PNAME":
                return p.expand(p.next())
            if tk.kind == "KW" and tk.val == "default":
                p.next()
                return "__default__"
            raise ValueError(
                f"{verb.upper()} needs a {role} graph (GRAPH <iri> or "
                f"DEFAULT) at char {tk.pos}"
            )

        src = graph_ref("source")
        to = p.peek()
        if not (to.kind == "IDENT" and str(to.val).lower() == "to"):
            raise ValueError(
                f"{verb.upper()} needs TO between graphs at char {to.pos}"
            )
        p.next()
        dst = graph_ref("destination")
        return ParsedUpdate(kind=verb, graph=src, graph_to=dst)
    with_g = None
    if t.kind == "KW" and t.val == "with":
        # §3.1.3 WITH <g>: the named graph is BOTH the template target
        # and the WHERE matching scope for the following template-form
        # operation (spec: equivalent to USING <g> + GRAPH-wrapped
        # templates)
        p.next()
        tk = p.peek()
        if tk.kind == "IRI":
            with_g = p.next().val
        elif tk.kind == "PNAME":
            with_g = p.expand(p.next())
        else:
            raise ValueError(
                f"WITH needs a constant IRI at char {tk.pos}"
            )
        t = p.peek()
    if t.kind != "KW" or t.val not in ("insert", "delete"):
        raise ValueError(
            f"SPARQL Update: expected INSERT or DELETE at char {t.pos}"
        )
    verb = p.next().val

    def plain_group(label: str) -> WhereClause:
        wc = p.group()
        if (
            wc.paths or wc.filters or wc.optional or wc.minus
            or wc.not_exists or wc.exists or wc.values or wc.bind
            or wc.subqueries
        ):
            raise ValueError(f"{label} must contain plain triples only")
        return wc

    if p.at_kw("data"):
        if with_g is not None:
            raise ValueError(
                "WITH does not apply to INSERT/DELETE DATA (use a "
                "GRAPH wrapper inside the DATA block)"
            )
        p.next()
        g = None
        if (
            p.at_punct("{")
            and p.peek(1).kind == "KW"
            and p.peek(1).val == "graph"
        ):
            # DATA { GRAPH <g> { triples } }: one constant named-graph
            # wrapper around the whole block (mixed plain+graphed
            # bodies are outside the subset — fail loud on trailing
            # content via the closing-brace expect)
            p.next()
            p.next()
            tk = p.peek()
            if tk.kind == "IRI":
                g = p.next().val
            elif tk.kind == "PNAME":
                g = p.expand(p.next())
            else:
                raise ValueError(
                    f"GRAPH in a DATA block needs a constant IRI at "
                    f"char {tk.pos}"
                )
            wc = plain_group(f"{verb.upper()} DATA")
            p.expect("PUNCT", "}")
        else:
            wc = plain_group(f"{verb.upper()} DATA")
        for s, pr, o in wc.patterns:
            for term in (s, pr, o):
                if isinstance(term, str) and term.startswith("?"):
                    raise ValueError(
                        f"{verb.upper()} DATA requires ground triples "
                        f"(found variable {term})"
                    )
        u = ParsedUpdate(kind=f"{verb}_data", templates=wc.patterns, graph=g)
    elif verb == "delete" and p.at_kw("where"):
        p.next()
        wc = plain_group("DELETE WHERE")
        u = ParsedUpdate(
            kind="delete_where", templates=wc.patterns, where=wc,
            graph=with_g,
        )
    else:
        tmpl = plain_group(f"{verb.upper()} template")
        ins = None
        if verb == "delete" and p.at_kw("insert"):
            # §3.1.3 Modify: DELETE { t1 } INSERT { t2 } WHERE { g } —
            # both templates instantiate over the same pre-state
            # solutions, deletes applied before inserts
            p.next()
            ins = plain_group("INSERT template")
        p.expect("KW", "where")
        where = p.group_body_braced()
        if ins is not None:
            u = ParsedUpdate(
                kind="modify", templates=tmpl.patterns, where=where,
                insert_templates=ins.patterns, graph=with_g,
            )
        else:
            u = ParsedUpdate(
                kind=verb, templates=tmpl.patterns, where=where,
                graph=with_g,
            )
    return u


def _group_body_braced(self) -> WhereClause:
    self.expect("PUNCT", "{")
    wc = self.group_body()
    self.expect("PUNCT", "}")
    return wc


_Parser.group_body_braced = _group_body_braced


def sparql_update(
    store_dir: str,
    text: str,
    *,
    num_partitions: int = 4,
    broadcast_limit: int = 1_000_000,
) -> dict:
    """Apply a SPARQL Update STRING to a materialized triple store —
    the store-lifecycle front-end over :func:`merge_triplestore` /
    :func:`delete_triplestore` [graft extension; the reference's
    RDF::Trine model is mutable in memory, recalled — here mutation is
    a bucket-local delta merge/rewrite, work ∝ delta size].

    INSERT paths produce the delta with the CONSTRUCT machinery (so
    template instantiation is batch-wise and distinct) and upsert it;
    DELETE paths anti-join the delta against only its hash buckets.
    Returns the store metrics dict of the underlying operation. A
    ``;``-sequence applies in order, each operation against the state
    the previous left (§3.1); the returned dict then carries summed
    ``rows_added``/``rows_removed`` plus the per-operation list under
    ``"ops"``."""
    ops = parse_update_ops(text)
    if len(ops) == 1:
        return _apply_one_update(
            ops[0], store_dir,
            num_partitions=num_partitions, broadcast_limit=broadcast_limit,
        )
    results = [
        _apply_one_update(
            u, store_dir,
            num_partitions=num_partitions, broadcast_limit=broadcast_limit,
        )
        for u in ops
    ]
    return {
        "ops": results,
        "rows_added": sum(r.get("rows_added", 0) or 0 for r in results),
        "rows_removed": sum(
            r.get("rows_removed", 0) or 0 for r in results
        ),
    }


def _stamp_graph_col(t, g):
    """Overwrite the ``graph`` column with the constant ``g`` (None =
    default graph) — shared by ADD/COPY/MOVE's destination re-stamp and
    the constant-GRAPH delta stamp."""
    import pyarrow as pa

    i = t.schema.get_field_index("graph")
    return t.set_column(
        i, "graph", pa.array([g] * t.num_rows, pa.string())
    )


def _apply_one_update(
    u: ParsedUpdate,
    store_dir: str,
    *,
    num_partitions: int,
    broadcast_limit: int,
) -> dict:
    import pyarrow as pa
    import ray.data as rd

    from ..sinks.triplestore import delete_triplestore, merge_triplestore
    from .construct import construct
    from .lookup import get_pattern_store

    if u.kind == "load":
        # §3.1.4: the merge delta is the distributed N-Triples/N-Quads
        # read of the document (lines parallelize for free); INTO GRAPH
        # re-stamps every row, otherwise quad lines keep their own
        # context and triple lines land in the default graph
        import urllib.parse

        from ..sinks.ntriples import read_ntriples
        from ..sinks.triplestore import merge_triplestore

        parsed = urllib.parse.urlparse(u.source)
        if parsed.scheme not in ("", "file"):
            raise ValueError(
                f"LOAD supports local documents only (file: scheme or "
                f"a bare path), got {u.source!r}"
            )
        path = parsed.path if parsed.scheme == "file" else u.source
        delta = read_ntriples(path)
        if u.graph is not None:
            delta = delta.map_batches(
                lambda t, _g=u.graph: _stamp_graph_col(t, _g),
                batch_format="pyarrow",
            )
        import os

        if not os.path.isdir(store_dir):
            # LOAD into a fresh location bootstraps the store (merge
            # needs an existing bucket layout to upsert into)
            from ..sinks.triplestore import write_triplestore

            m = write_triplestore(
                delta, store_dir, input_fp="sparql-update:" + path
            )
            return {
                "rows_added": m.get("rows_written", 0), "rows_removed": 0,
            }
        return merge_triplestore(delta, store_dir, input_fp="sparql-update")

    if u.kind in ("add", "copy", "move"):
        # §3.2.5–3.2.7: the source slice re-stamped to the destination
        # graph is the merge delta. MATERIALIZE it before any rewrite —
        # bucket rewrites replace part files, and a still-lazy scan
        # holding the old file list would fail (or read stale state).
        from ..sinks.triplestore import store_statements

        src, dst = u.graph, u.graph_to
        if src == dst:
            return {"rows_added": 0, "rows_removed": 0}  # §: no-op

        def slice_kw(g: str) -> dict:
            return (
                {"default_graph": True} if g == "__default__"
                else {"graph": g}
            )

        gval = None if dst == "__default__" else dst
        delta = store_statements(store_dir, **slice_kw(src)).map_batches(
            lambda t, _g=gval: _stamp_graph_col(t, _g),
            batch_format="pyarrow",
        ).materialize()
        removed = 0
        if u.kind in ("copy", "move"):  # COPY/MOVE replace the dest
            removed += delete_triplestore(
                store_statements(store_dir, **slice_kw(dst)), store_dir,
                input_fp="sparql-update",
            ).get("rows_removed", 0)
        added = merge_triplestore(
            delta, store_dir, input_fp="sparql-update"
        ).get("rows_added", 0)
        if u.kind == "move":
            removed += delete_triplestore(
                store_statements(store_dir, **slice_kw(src)), store_dir,
                input_fp="sparql-update",
            ).get("rows_removed", 0)
        return {"rows_added": added, "rows_removed": removed}

    if u.kind == "clear":
        # CLEAR/DROP: the delta IS the matching slice of the store —
        # a lazy, graph-filtered scan (work ∝ matched rows + touched
        # buckets; the full-row match removes exactly those quads and
        # leaves the same triples in other graphs alone)
        from ..sinks.triplestore import store_statements

        kw: dict = {}
        if u.graph == "__default__":
            kw["default_graph"] = True
        elif u.graph == "__named__":
            kw["named_only"] = True
        elif u.graph != "__all__":
            kw["graph"] = u.graph
        return delete_triplestore(
            store_statements(store_dir, **kw), store_dir,
            input_fp="sparql-update",
        )

    def stamp(ds: rd.Dataset, g: str | None) -> rd.Dataset:
        # constant named-graph scope: set the graph column on the
        # (graph-NULL) constructed quads
        if g is None:
            return ds
        return ds.map_batches(
            lambda t, _g=g: _stamp_graph_col(t, _g),
            batch_format="pyarrow",
        )

    if u.kind in ("insert_data", "delete_data"):
        one = rd.from_arrow(pa.table({"__one": pa.array([1], pa.int8())}))
        delta = stamp(
            construct(one, u.templates, num_partitions=num_partitions),
            u.graph,
        )
    else:
        wc = u.where
        bindings = get_pattern_store(
            store_dir,
            wc.patterns,
            num_partitions=num_partitions,
            filters=wc.filters or None,
            optional=wc.optional,
            minus=wc.minus,
            not_exists=wc.not_exists,
            exists=wc.exists,
            values=wc.values,
            bind=wc.bind or None,
            paths=wc.paths or None,
            broadcast_limit=broadcast_limit,
            keep_kinds=True,
            # WITH <g>: pattern matching scoped to the named graph
            graph=u.graph,
        )
        if u.kind == "modify":
            # §3.1.3: both templates instantiate over the SAME pre-state
            # solutions; MATERIALIZE both deltas before mutating — the
            # delete rewrites store buckets in place, and a still-lazy
            # insert delta would otherwise read post-delete state.
            # Deltas are update-sized; the blocks pin in the object
            # store, never the driver heap.
            del_delta = stamp(construct(
                bindings, u.templates, num_partitions=num_partitions
            ), u.graph).materialize()
            ins_delta = stamp(construct(
                bindings, u.insert_templates, num_partitions=num_partitions
            ), u.graph).materialize()
            mcols = ("subj", "pred", "obj", "obj_kind")
            if u.graph is not None:  # WITH: delete from that graph only
                mcols = mcols + ("graph",)
            removed = delete_triplestore(
                del_delta, store_dir, input_fp="sparql-update",
                match_cols=mcols,
            )
            added = merge_triplestore(
                ins_delta, store_dir, input_fp="sparql-update"
            )
            return {
                **{f"delete_{k}": v for k, v in removed.items()},
                **{f"insert_{k}": v for k, v in added.items()},
                "rows_removed": removed.get("rows_removed", 0),
                "rows_added": added.get("rows_added", 0),
            }
        delta = stamp(
            construct(bindings, u.templates, num_partitions=num_partitions),
            u.graph,
        )

    if u.kind in ("insert_data", "insert"):
        return merge_triplestore(delta, store_dir, input_fp="sparql-update")
    # lexical identity: bindings carry only (lexical form, kind), so a
    # delta reconstructed from DELETE WHERE solutions has NULL
    # lang/datatype — matching on the full row would silently skip
    # every typed / language-tagged store row the pattern matched. The
    # front-end's literal semantics are lexical+kind throughout
    # (FILTER, joins, aggregation), and DELETE follows them. Graph
    # identity differs by form:
    #   * DELETE DATA (ground quads): graph is ALWAYS part of the
    #     identity — unscoped deletes target the default graph only
    #     (graph-NULL delta rows match graph-NULL store rows; pandas
    #     merge and the row hash both treat NULL keys as equal),
    #     symmetric with INSERT DATA writing the nil context.
    #   * DELETE WHERE / modify (pattern-derived): unscoped patterns
    #     match the UNION of graphs (the store's query semantics), so
    #     the delete sweeps every graph copy the pattern matched —
    #     graph joins the identity only under GRAPH/WITH scope.
    match = ("subj", "pred", "obj", "obj_kind")
    if u.kind == "delete_data" or u.graph is not None:
        match = match + ("graph",)
    return delete_triplestore(
        delta, store_dir, input_fp="sparql-update", match_cols=match,
    )
