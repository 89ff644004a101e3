"""BGP algebra: binding-set combinators -- joins, OPTIONAL/MINUS
anti-joins, FILTER evaluation, BIND expressions, VALUES and property-
path units, and the solution modifiers (the evaluate half of
`engine/lookup.py`, split out in round 5 -- public surface unchanged,
everything re-exported there).

Every combinator is batch-wise over Arrow/pandas blocks: broadcast
joins ship the SMALL side once via `ray.put` (`_BroadcastInner`), the
general case falls back to a co-hash shuffle join; term-kind columns
(`__k_<var>`) ride along only where a variable can bind more than one
RDF term kind, so IRI/literal joins stay exact.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .bgp_plan import _empty, _is_var, _typed_empty_bindings  # noqa: F401

class _BroadcastInner:
    """Inner-join each bindings batch against a small broadcast table on
    the shared variable columns (Acero). Used by :func:`get_pattern` —
    BGP intermediate results are pushdown-pruned and small by the Store's
    usage profile; Ray's Dataset.join is avoided (it breaks on empty
    right partitions)."""

    def __init__(self, right_ref, keys, join_type: str = "inner"):
        import ray

        self.right = ray.get(right_ref)
        self.keys = list(keys)
        self.join_type = join_type

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            for name in self.right.column_names:
                if name not in t.column_names:
                    t = t.append_column(
                        name, pa.array([], self.right.schema.field(name).type)
                    )
            return t
        return t.join(self.right, keys=self.keys, join_type=self.join_type)



def apply_solution_modifiers(
    bindings: rd.Dataset,
    order_by: list | None = None,
    limit: int | None = None,
    offset: int = 0,
) -> rd.Dataset:
    """SPARQL solution modifiers (ORDER BY / LIMIT / OFFSET) over a BGP
    binding set [graft extension beyond the reference Store's surface —
    the SELECT-query shape; the reference delegates queries to
    RDF::Trine/RDF::Query, recalled].

    ``order_by``: sequence of ``"?var"`` (ascending, the SPARQL default)
    or ``("?var", "desc"|"asc")``. ``limit`` + ``offset`` slice the
    ordered solutions.

    Distributed shape (with a limit): per-block vectorized
    sort + head(offset+limit) — each block's survivors are a superset of
    its contribution to the global answer — then ONE final merge task
    over ≤ #blocks × (offset+limit) rows sorts and slices; the
    ``top_k`` shape generalized with an offset, no all-to-all sort
    shuffle. Without a limit, a full distributed ``Dataset.sort`` runs
    (offset must then be 0 — skipping N rows of a distributed sort
    without a limit is not streamable).

    NULL ordering: NULLS LAST (pandas ``na_position='last'``, matching
    DuckDB's default). Ties carry no stability guarantee — include a
    unique variable in ``order_by`` for deterministic paging.
    """
    if limit is not None and limit < 0:
        raise ValueError("limit must be non-negative")
    if offset < 0:
        raise ValueError("offset must be non-negative")
    if not order_by:
        if limit is None and offset == 0:
            return bindings
        raise ValueError(
            "limit/offset over a distributed solution set need order_by "
            "for deterministic results"
        )
    cols, asc = [], []
    for ob in order_by:
        if isinstance(ob, str):
            v, a = ob, True
        else:
            v, d = ob
            a = str(d).lower() != "desc"
        cols.append(v.lstrip("?"))
        asc.append(a)
    if limit is None:
        if offset:
            raise ValueError("offset without limit is not supported")
        return bindings.sort(cols, descending=[not a for a in asc])
    from ..stages.groupagg import top_k

    return top_k(
        bindings, cols, limit, descending=[not a for a in asc],
        offset=offset,
    )


def ask(bindings: rd.Dataset) -> bool:
    """SPARQL ASK result form [graft extension — the reference delegates
    query forms to RDF::Query, recalled]: does at least one solution
    exist? ``limit(1)`` lets the streaming executor stop early — upstream
    operators cancel once one row reaches the limit; nothing
    materializes beyond a single block."""
    return bindings.limit(1).count() > 0


_FILTER_OPS = {
    "==": "eq", "!=": "ne", "<": "lt", "<=": "le", ">": "gt", ">=": "ge",
}

# SPARQL §17.4.3 string tests — evaluated with Arrow kernels over the
# lexical forms, no pandas round-trip (regex compiles once per block
# inside the kernel)
_STR_FILTER_FNS = {
    "regex": "match_substring_regex",
    "contains": "match_substring",
    "strstarts": "starts_with",
    "strends": "ends_with",
}

# SPARQL §17.4.2 term tests — ("?var", op, True) atoms over term kinds
_TERM_TEST_OPS = {"isiri", "isblank", "isliteral", "isnumeric"}


def _validate_filter(flt: tuple) -> None:
    """Raise up-front (driver side, not inside a Ray task) on a filter
    shape the mask evaluator can't handle."""
    if len(flt) == 2 and flt[0] in ("or", "and", "not"):
        if not flt[1]:
            raise ValueError(f"empty {flt[0]!r} filter group")
        for sub in flt[1]:
            _validate_filter(sub)
        return
    var, op, val = flt
    if isinstance(var, tuple):
        # computed left side, e.g. ("strlen", "?nm") — comparisons vs a
        # constant only (the BIND expression machinery evaluates it)
        if op not in _FILTER_OPS:
            raise ValueError(
                f"computed filter left sides support comparisons only, "
                f"got op {op!r}"
            )
        if isinstance(val, tuple):
            raise ValueError(
                "computed filter left sides need a constant right side"
            )
        _compile_bind(var)  # raises on an unsupported function
        return
    if op == "bound" or op in _TERM_TEST_OPS:
        return
    if op == "sameterm":
        # §17.4.1.8 over the engine's (lexical, kind) term model —
        # evaluated in _atomic_mask; needs a variable right side
        if not (isinstance(val, tuple) and len(val) == 2
                and val[0] == "var"):
            raise ValueError("sameTerm needs a variable right side")
        return
    if op in ("lang_eq", "langmatches", "dt_eq"):
        raise ValueError(
            f"{op!r}: LANG()/DATATYPE() filters are consumed at store "
            f"star scans (get_pattern_store over a materialized store, "
            f"single-binder variable) — binding columns carry lexical "
            f"forms only, so they cannot evaluate here"
        )
    if op not in _FILTER_OPS and op not in _STR_FILTER_FNS:
        raise ValueError(f"unsupported filter op {op!r}")
    if isinstance(val, tuple):
        # var right sides: comparisons, plus the §17.4.3 string tests
        # except REGEX (a per-row pattern would compile per row)
        if not (
            len(val) == 2 and val[0] == "var"
            and (op in _FILTER_OPS
                 or op in ("contains", "strstarts", "strends"))
        ):
            raise ValueError(f"bad filter value {val!r} for op {op!r}")


def _atomic_mask(t: pa.Table, var: str, op: str, val):
    """``(keep, valid)`` numpy masks for one ``("?var", op, value)``
    atom — SPARQL's three-valued EBV: ``keep`` is where the atom is
    TRUE, ``valid`` where it evaluated at all. An unbound (NULL —
    possible for OPTIONAL-group vars) binding is a type ERROR
    (valid=False, so it never passes and ``!atom`` drops it too); a
    numeric ``value`` compares numerically and non-numeric lexical
    forms are errors likewise. ``BOUND`` is total (always valid)."""
    import numpy as np
    import pandas as pd

    if isinstance(var, tuple):
        # computed left side [§17.4 over expressions], e.g.
        # FILTER(STRLEN(?nm) > 5): evaluate with the BIND machinery over
        # the referenced columns, then compare the canonical lexical
        # form like a plain binding. A row where the expression errors
        # (unbound input, non-numeric arithmetic) is a type error —
        # never passes, and `!atom` drops it too.
        refs = sorted(_bind_vars_of(var))
        if any(c not in t.column_names for c in refs):
            # a referenced variable is entirely unbound: every row errors
            z = np.zeros(t.num_rows, dtype=bool)
            return z, z.copy()
        df = t.select(refs).to_pandas() if refs else pd.DataFrame(
            index=range(t.num_rows)
        )
        s = _bind_lex(_compile_bind(var)(df))
        valid = s.notna().to_numpy()
        pd_op = _FILTER_OPS[op]
        if isinstance(val, bool) or not isinstance(val, (int, float)):
            return (
                valid & getattr(s.astype(str), pd_op)(str(val)).to_numpy(),
                valid,
            )
        num = pd.to_numeric(s, errors="coerce")
        valid = valid & num.notna().to_numpy()
        return (
            valid & getattr(num, pd_op)(val).fillna(False).to_numpy(),
            valid,
        )

    name = var.lstrip("?")
    if op == "bound":
        col = t.column(name).combine_chunks()
        m = pc.is_valid(col).to_numpy(zero_copy_only=False)
        return m, np.ones(len(m), dtype=bool)
    if op in _TERM_TEST_OPS:
        # §17.4.2 term tests: the term kind comes from the hidden
        # ``__k_<var>`` column when the planner kept one (object /
        # BIND / VALUES positions), else derives from the lexical form
        # (subject/predicate positions bind IRIs or bnodes only).
        # isNUMERIC follows the engine's datatype-insensitive model: a
        # LITERAL whose lexical form parses as a number. Unbound is a
        # type error (never passes, ``!test`` drops it too).
        from ..terms import (
            KIND_BNODE, KIND_IRI, KIND_LITERAL, derive_term_kind,
        )

        col = t.column(name).combine_chunks()
        kname = f"__k_{name}"
        kd = (
            t.column(kname).combine_chunks()
            if kname in t.column_names
            else derive_term_kind(col)
        )
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        if op == "isnumeric":
            lit = pc.fill_null(
                pc.equal(kd, KIND_LITERAL), False
            ).to_numpy(zero_copy_only=False)
            num = (
                pd.to_numeric(col.to_pandas(), errors="coerce")
                .notna()
                .to_numpy()
            )
            return valid & lit & num, valid
        want = {
            "isiri": KIND_IRI,
            "isblank": KIND_BNODE,
            "isliteral": KIND_LITERAL,
        }[op]
        m = pc.fill_null(pc.equal(kd, want), False).to_numpy(
            zero_copy_only=False
        )
        return valid & m, valid
    if op in _STR_FILTER_FNS:
        col = t.column(name).combine_chunks()
        if isinstance(val, tuple) and len(val) == 2 and val[0] == "var":
            # string test with a VARIABLE second argument, e.g.
            # CONTAINS(?text, ?name): row-pairwise over the two binding
            # columns (no vectorized per-row-pattern kernel exists —
            # the zip stays inside the batch like the §17.4.6 hash
            # maps). Unbound either side is a type error.
            b_name = str(val[1]).lstrip("?")
            if b_name not in t.column_names:
                z = np.zeros(t.num_rows, dtype=bool)
                return z, z.copy()
            a = col.to_pandas()
            b = t.column(b_name).combine_chunks().to_pandas()
            valid = (a.notna() & b.notna()).to_numpy()
            fn = {
                "contains": lambda x, y: y in x,
                "strstarts": lambda x, y: x.startswith(y),
                "strends": lambda x, y: x.endswith(y),
            }[op]
            keep = np.fromiter(
                (
                    bool(v) and fn(str(x), str(y))
                    for v, x, y in zip(valid, a, b)
                ),
                dtype=bool,
                count=len(valid),
            )
            return keep, valid
        m = getattr(pc, _STR_FILTER_FNS[op])(col, str(val))
        return (
            pc.fill_null(m, False).to_numpy(zero_copy_only=False),
            pc.is_valid(col).to_numpy(zero_copy_only=False),
        )
    if op == "sameterm":
        # §17.4.1.8 sameTerm(?a, ?b) under the engine's term model:
        # lexical equality AND term-kind equality (an IRI and a literal
        # spelled the same are different terms; datatype/language
        # distinctions are out of scope — bindings drop them, see the
        # module docstring's deviation notes). Unbound either side is a
        # type error (never passes; `!sameTerm` drops it too).
        from ..terms import derive_term_kind

        b_name = str(val[1]).lstrip("?")
        if b_name not in t.column_names:
            z = np.zeros(t.num_rows, dtype=bool)
            return z, z.copy()
        a = t.column(name).combine_chunks()
        b = t.column(b_name).combine_chunks()

        def kind_of(col, nm):
            kn = f"__k_{nm}"
            return (
                t.column(kn).combine_chunks()
                if kn in t.column_names
                else derive_term_kind(col)
            )

        valid = pc.and_(pc.is_valid(a), pc.is_valid(b)).to_numpy(
            zero_copy_only=False
        )
        eq = pc.and_(
            pc.equal(a, b), pc.equal(kind_of(a, name), kind_of(b, b_name))
        )
        keep = pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
        return valid & keep, valid

    if isinstance(val, tuple) and len(val) == 2 and val[0] == "var":
        # variable-vs-variable comparison: term (lexical) equality for
        # == / !=, numeric for the order ops (either side non-numeric
        # errors — SPARQL type-error semantics); unbound never passes
        a = t.column(name).to_pandas()
        b = t.column(str(val[1]).lstrip("?")).to_pandas()
        valid = (a.notna() & b.notna()).to_numpy()
        pd_op = _FILTER_OPS[op]
        if op in ("==", "!="):
            return (
                valid
                & getattr(a.astype(str), pd_op)(b.astype(str)).to_numpy(),
                valid,
            )
        na = pd.to_numeric(a, errors="coerce")
        nb = pd.to_numeric(b, errors="coerce")
        valid = valid & (na.notna() & nb.notna()).to_numpy()
        return (
            valid & getattr(na, pd_op)(nb).fillna(False).to_numpy(),
            valid,
        )
    s = t.column(name).to_pandas()
    valid = s.notna().to_numpy()
    pd_op = _FILTER_OPS[op]
    if isinstance(val, bool) or not isinstance(val, (int, float)):
        return (
            valid & getattr(s.astype(str), pd_op)(str(val)).to_numpy(),
            valid,
        )
    num = pd.to_numeric(s, errors="coerce")
    valid = valid & num.notna().to_numpy()
    return valid & getattr(num, pd_op)(val).fillna(False).to_numpy(), valid


def _filter_mask3(t: pa.Table, flt: tuple):
    """Recursive ``(keep, valid)`` masks for one filter entry: an atom,
    or an ``("or"|"and"|"not", [entry, …])`` boolean group (SPARQL
    ``||`` / ``&&`` / ``!`` with standard precedence — the text
    front-end flattens top-level conjunction into separate entries,
    so nested groups only appear under a disjunction). Error
    propagation follows SPARQL 1.1 §17.2: ``true || E = true``,
    ``false && E = false``, ``!E = E`` — a row whose entry errors is
    dropped at the top level, including under negation."""
    import numpy as np

    if len(flt) == 2 and flt[0] == "or":
        pairs = [_filter_mask3(t, c) for c in flt[1]]
        keep = np.logical_or.reduce([k for k, _ in pairs])
        all_valid = np.logical_and.reduce([v for _, v in pairs])
        return keep, keep | all_valid
    if len(flt) == 2 and flt[0] == "and":
        pairs = [_filter_mask3(t, c) for c in flt[1]]
        keep = np.logical_and.reduce([k for k, _ in pairs])
        any_false = np.logical_or.reduce([v & ~k for k, v in pairs])
        all_valid = np.logical_and.reduce([v for _, v in pairs])
        return keep & all_valid, any_false | all_valid
    if len(flt) == 2 and flt[0] == "not":
        (inner,) = flt[1]
        keep, valid = _filter_mask3(t, inner)
        return valid & ~keep, valid
    return _atomic_mask(t, *flt)


def _filter_mask(t: pa.Table, flt: tuple):
    """Top-level keep-mask: TRUE rows only (an error is not TRUE)."""
    return _filter_mask3(t, flt)[0]


def _apply_binding_filters(acc: rd.Dataset, filters: list[tuple]) -> rd.Dataset:
    """SPARQL-FILTER-style constraints over variable bindings, applied
    BEFORE the final distinct (fewer rows through the shuffle). Each
    filter is ``("?var", op, value)`` with op in ``== != < <= > >=``
    plus the string tests ``regex contains strstarts strends``
    (value = pattern), or a boolean group ``("or"|"and", [filter, …])``
    over those atoms; a numeric ``value`` compares numerically
    (bindings whose lexical form is not a number drop, mirroring SPARQL
    type-error semantics), a string ``value`` compares lexically.
    [graft extension beyond the reference Store's BGP surface]"""
    for flt in filters:
        _validate_filter(flt)
    filters = list(filters)

    def f(t: pa.Table) -> pa.Table:
        # Arrow in/out: this stage feeds the final distinct's hash
        # shuffle, and a pandas round-trip would widen nullable uint8
        # __k_* kind columns to float64 ONLY in blocks containing NULLs
        # (possible with OPTIONAL groups) — identical solutions would
        # then hash into different partitions and survive the distinct.
        # Only the filtered VARIABLE columns (always strings) go through
        # pandas, for the mask computation alone.
        import numpy as np

        if t.num_rows == 0:
            return t
        keep = np.logical_and.reduce(
            [_filter_mask(t, flt) for flt in filters]
        )
        # strip schema metadata: an unhashable pandas-metadata dict from
        # any upstream pandas lineage defeats the shuffle's schema dedup
        return t.filter(pa.array(keep)).replace_schema_metadata(None)

    return acc.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SPARQL BIND (extend) — computed variables over a binding set
# ---------------------------------------------------------------------------

# expression AST (tuples, evaluated vectorized over pandas columns):
#   "?var"                      -> the variable's lexical form
#   str / int / float constant  -> a constant
#   ("str-const", s)            -> a string constant starting with "?"
#                                  (bare "?…" strings are variables)
#   ("concat", a, b, ...)       -> string concatenation (NULL-propagating)
#   ("strlen", a) ("ucase", a) ("lcase", a)
#   ("substr", a, start[, len]) -> SPARQL 1-based substring
#   ("replace", a, pat, repl)   -> regex replace
#   ("str", a)                  -> lexical form, bound as a literal
#   ("strbefore"|"strafter", a, sep) -> §17.4.3 (constant sep; no match -> "")
#   ("abs"|"ceil"|"floor"|"round", a) -> numeric (round = xpath ties-up)
#   ("encode_for_uri", a)       -> percent-encode outside RFC3986 unreserved
#   ("+"|"-"|"*"|"/", a, b)     -> numeric (lexical forms parse numerically;
#                                  a non-numeric binding yields NULL = the
#                                  SPARQL expression-error -> unbound rule)
#   ("iri", a)                  -> the value binds as an IRI, not a literal
#   ("if", ("?v", cmp, val), then, else) -> SPARQL IF (FILTER-semantics
#                                  condition; erroring condition -> unbound)
#   ("coalesce", a, b, ...)     -> first non-unbound value
#   ("year"|"month"|"day"|"hours"|"minutes"|"seconds", a)
#                               -> §17.4.5 accessors over xsd:dateTime /
#                                  xsd:date LEXICAL forms (numeric; a
#                                  non-date/dateTime binding -> unbound)
#   ("tz", a)                   -> §17.4.5.8 timezone designator as a
#                                  string ("" when the form carries none)
#   ("md5"|"sha1"|"sha256", a)  -> §17.4.6 lowercase hex digest of the
#                                  UTF-8 lexical form
_BIND_ARITH = {"+", "-", "*", "/"}

# xsd:dateTime / xsd:date lexical shape; the time block is optional so
# YEAR/MONTH/DAY also work over xsd:date (HOURS/… over a date-only form
# extract nothing -> the SPARQL expression-error -> unbound rule)
_DT_LEXICAL = (
    r"^(-?\d{4,})-(\d{2})-(\d{2})"
    r"(?:T(\d{2}):(\d{2})(?::(\d{2}(?:\.\d+)?))?)?"
    r"(Z|[+-]\d{2}:\d{2})?$"
)
_DT_GROUP = {"year": 0, "month": 1, "day": 2,
             "hours": 3, "minutes": 4, "seconds": 5}


def _bind_vars_of(expr) -> set[str]:
    if isinstance(expr, str) and expr.startswith("?"):
        return {expr[1:]}
    if isinstance(expr, tuple):
        if expr and expr[0] == "str-const":
            return set()  # a wrapped "?…" string CONSTANT, not a var
        # element 0 is normally the op NAME — except in an ("if", …)
        # CONDITION tuple ("?v", cmp, val), where it is the variable
        head_is_var = bool(expr) and isinstance(expr[0], str) and expr[
            0
        ].startswith("?")
        out: set[str] = set()
        for a in (expr if head_is_var else expr[1:]):
            out |= _bind_vars_of(a)
        return out
    return set()


def _bind_lex(s):
    """Canonical lexical form of an evaluated series: each INTEGRAL
    numeric value prints without a decimal point (xsd:integer style),
    non-integral ones as decimals; NULLs preserved. The rule is
    PER-VALUE, never per-batch — a batch-level "all integral?" test
    would make the same logical value print differently depending on
    which rows share a block (block-layout-dependent output that
    defeats the final distinct)."""
    import pandas as pd

    if pd.api.types.is_numeric_dtype(s) and not pd.api.types.is_string_dtype(s):
        integral = s.notna() & (s % 1 == 0)
        out = s.astype("string")
        if integral.any():
            out[integral] = s[integral].astype("Int64").astype("string")
        return out
    return s.astype("string")


def _compile_bind(expr):
    """Compile one BIND expression to ``fn(pandas.DataFrame) -> Series``."""
    import pandas as pd

    if isinstance(expr, str) and expr.startswith("?"):
        v = expr[1:]

        def col(df, _v=v):
            if _v not in df.columns:
                raise ValueError(f"BIND references unbound variable ?{_v}")
            return df[_v]

        return col
    if not isinstance(expr, tuple):
        const = expr
        return lambda df: pd.Series([const] * len(df), index=df.index)

    op, *args = expr
    if op == "str-const":
        # a string constant that happens to start with "?" — the parser
        # wraps it because a bare "?…" string in this AST is a variable
        const = args[0]
        return lambda df: pd.Series([const] * len(df), index=df.index)
    if op == "iri":  # kind marker only — value semantics are identity
        return _compile_bind(args[0])
    if op == "if":
        # ("if", ("?v", cmp, val), then, else) — SPARQL IF(): the
        # condition uses FILTER comparison semantics (numeric value →
        # numeric compare, lexical otherwise); an erroring/unbound
        # condition leaves the variable UNBOUND (§10), not `else`
        (cvar, cop, cval), then_e, else_e = args
        if cop not in _FILTER_OPS:
            raise ValueError(f"unsupported IF comparison {cop!r}")
        cf = _compile_bind(cvar)
        tf = _compile_bind(then_e)
        ef = _compile_bind(else_e)
        meth = _FILTER_OPS[cop]

        def iff(df):
            s = cf(df)
            if isinstance(cval, bool) or not isinstance(cval, (int, float)):
                mask = getattr(s.astype("string"), meth)(str(cval))
            else:
                num = pd.to_numeric(s, errors="coerce")
                mask = getattr(num, meth)(cval)
                mask = mask.mask(num.isna())
            mask = mask.mask(s.isna())
            out = _bind_lex(tf(df)).where(
                mask.fillna(False).astype(bool), _bind_lex(ef(df))
            )
            return out.mask(mask.isna())

        return iff
    if op == "coalesce":
        cfs = [_compile_bind(a) for a in args]

        def coalesce(df):
            out = _bind_lex(cfs[0](df))
            for g in cfs[1:]:
                out = out.where(out.notna(), _bind_lex(g(df)))
            return out

        return coalesce
    fns = [_compile_bind(a) for a in args]
    if op == "concat":
        def concat(df):
            out = _bind_lex(fns[0](df))
            for f in fns[1:]:
                out = out + _bind_lex(f(df))
            return out

        return concat
    if op == "strlen":
        return lambda df: fns[0](df).astype("string").str.len()
    if op == "ucase":
        return lambda df: fns[0](df).astype("string").str.upper()
    if op == "lcase":
        return lambda df: fns[0](df).astype("string").str.lower()
    if op == "substr":
        start = args[1]
        length = args[2] if len(args) > 2 else None
        stop = None if length is None else start - 1 + length
        return lambda df: fns[0](df).astype("string").str.slice(
            start - 1, stop
        )
    if op == "replace":
        pat, repl = args[1], args[2]
        return lambda df: fns[0](df).astype("string").str.replace(
            pat, repl, regex=True
        )
    if op == "str":
        # lexical identity — the engine's bindings ARE lexical forms;
        # the result binds as a literal (the default BIND kind), which
        # is exactly STR()'s IRI→string / literal→lexical semantics
        return lambda df: fns[0](df).astype("string")
    if op in ("strbefore", "strafter"):
        sep = args[1]
        if isinstance(sep, tuple) and sep and sep[0] == "str-const":
            sep = sep[1]  # wrapped "?…" string constant
        if not isinstance(sep, str) or sep.startswith("?"):
            # a "?…" string IS a variable in this AST — a variable
            # separator would need a per-row split; fail loud instead
            # of silently splitting on the variable's NAME
            raise ValueError(
                f"{op.upper()} needs a constant separator string"
                " (variable separators are unsupported)"
            )

        def part(df, _after=(op == "strafter"), _sep=sep):
            s = fns[0](df).astype("string")
            if _sep == "":
                # §17.4.3.3/.4: empty separator → "" before, whole after
                return s if _after else s.where(s.isna(), "")
            parts = s.str.split(_sep, n=1, regex=False)
            found = (parts.str.len() > 1).fillna(False)
            picked = parts.str[1] if _after else parts.str[0]
            # no match → "" (not an error), unbound input stays unbound
            return picked.where(found, "").mask(s.isna())

        return part
    if op in ("abs", "ceil", "floor", "round"):
        def num1(df, _op=op):
            import numpy as np

            num = pd.to_numeric(fns[0](df), errors="coerce")
            if _op == "abs":
                return num.abs()
            if _op == "ceil":
                return pd.Series(np.ceil(num), index=num.index)
            if _op == "floor":
                return pd.Series(np.floor(num), index=num.index)
            # xpath fn:round — ties round toward positive infinity
            return pd.Series(np.floor(num + 0.5), index=num.index)

        return num1
    if op == "encode_for_uri":
        def enc(df):
            from urllib.parse import quote

            s = fns[0](df).astype("string")
            # fast path: rows that are all RFC3986-unreserved pass
            # zero-copy; only flagged rows take the per-value encoder
            need = (
                s.str.fullmatch(r"[A-Za-z0-9\-._~]*") == False  # noqa: E712
            ).fillna(False).astype(bool)
            if need.any():
                s = s.mask(need, s[need].map(lambda v: quote(v, safe="")))
            return s

        return enc
    if op in _DT_GROUP or op == "tz":
        # §17.4.5 date/time accessors, evaluated over the binding's
        # lexical form with ONE vectorized regex extract per batch (the
        # engine's bindings are lexical forms already — no datetime
        # object round-trip). Non-matching forms and unbound inputs
        # leave the variable unbound.
        def dtacc(df, _op=op):
            s = fns[0](df).astype("string")
            m = s.str.extract(_DT_LEXICAL)
            if _op == "tz":
                return m[6].fillna("").mask(m[0].isna())
            return pd.to_numeric(m[_DT_GROUP[_op]], errors="coerce")

        return dtacc
    if op in ("md5", "sha1", "sha256"):
        # §17.4.6 hash functions: cryptographic digests are inherently
        # per-value; the map stays inside the batch (row-local, no
        # Python loop over the Dataset)
        def digest(df, _op=op):
            import hashlib

            h = getattr(hashlib, _op)
            s = fns[0](df).astype("string")
            return s.map(
                lambda v: h(v.encode("utf-8")).hexdigest(),
                na_action="ignore",
            ).astype("string")

        return digest
    if op in _BIND_ARITH:
        def arith(df, _op=op):
            a = pd.to_numeric(fns[0](df), errors="coerce")
            b = pd.to_numeric(fns[1](df), errors="coerce")
            if _op == "+":
                return a + b
            if _op == "-":
                return a - b
            if _op == "*":
                return a * b
            return a / b

        return arith
    raise ValueError(f"unsupported BIND function {op!r}")


def _extend_bindings(
    acc: rd.Dataset, binds: list[tuple], existing: list[str]
) -> tuple[rd.Dataset, list[str], set[str]]:
    """SPARQL BIND (§7.6) over a binding set [graft extension beyond the
    reference Store's surface]: each ``("?new", expr)`` adds a computed
    variable column. Row-local and map-only — no shuffle; runs BEFORE
    FILTER (a FILTER may constrain a BIND'd variable) and before the
    final distinct (the new column participates in solution identity).

    An expression error (non-numeric lexical form in arithmetic, unbound
    input) leaves the variable UNBOUND (NULL), per SPARQL §10.
    BIND'd variables bind literals, or IRIs under ``("iri", …)``.
    """
    from ..terms import KIND_IRI, KIND_LITERAL

    names, kinds, compiled = [], {}, []
    seen = set(existing)
    for var, expr in binds:
        v = var.lstrip("?")
        if v in seen:
            raise ValueError(
                f"BIND target ?{v} is already in scope (SPARQL §7.6)"
            )
        seen.add(v)
        names.append(v)
        kinds[v] = (
            KIND_IRI
            if isinstance(expr, tuple) and expr and expr[0] == "iri"
            else KIND_LITERAL
        )
        compiled.append((v, _compile_bind(expr), _bind_vars_of(expr)))

    def f(t: pa.Table) -> pa.Table:
        # pandas only for the referenced variable columns (all strings);
        # the table itself stays Arrow so hidden uint8 kind columns never
        # take the pandas null-widening round-trip (see memory notes)
        import numpy as np
        import pandas as pd

        refs = sorted({r for _, _, rs in compiled for r in rs})
        present = [c for c in refs if c in t.column_names]
        df = (
            t.select(present).to_pandas()
            if present
            else pd.DataFrame(index=range(t.num_rows))
        )
        for v, fn, _rs in compiled:
            res = _bind_lex(fn(df)) if t.num_rows else None
            # SPARQL §7.6 scopes BINDs sequentially: a later expression
            # in the same list may reference this variable, so it joins
            # the pandas frame too, not just the Arrow output
            df[v] = res if res is not None else pd.Series([], dtype="string")
            arr = (
                pa.Array.from_pandas(res, type=pa.string())
                if res is not None
                else pa.nulls(0, pa.string())
            )
            t = t.append_column(v, arr)
            t = t.append_column(
                f"__k_{v}",
                pa.array(np.full(t.num_rows, kinds[v], np.uint8)),
            )
        return t.replace_schema_metadata(None)

    return acc.map_batches(f, batch_format="pyarrow"), names, set(names)


_NO_MATCH = object()  # a fully-bound pattern matched nothing


def _values_unit(
    vars_: list[str], rows: list[tuple]
) -> tuple[rd.Dataset, list[str], set[str]]:
    """SPARQL VALUES (inline data, §7.2) as a pre-built binding unit:
    each row's terms are pattern-term-shaped (IRI/bnode string or
    ``("lit", value)``), every variable carries an explicit term-kind
    column so the inline data joins TERM-correctly (a literal row never
    matches an IRI binding spelled the same).  UNDEF is not supported —
    joining a wildcard needs per-variable join splitting; fail loud."""
    from ..terms import KIND_BNODE, KIND_IRI, KIND_LITERAL

    names = [v.lstrip("?") for v in vars_]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate VALUES variables: {vars_}")
    cols: dict[str, list] = {n: [] for n in names}
    kinds: dict[str, list] = {n: [] for n in names}
    for row in rows:
        if len(row) != len(names):
            raise ValueError(
                f"VALUES row width {len(row)} != {len(names)} variables"
            )
        for n, term in zip(names, row):
            if isinstance(term, tuple) and len(term) == 2 and term[0] == "lit":
                cols[n].append(str(term[1]))
                kinds[n].append(KIND_LITERAL)
            elif isinstance(term, str):
                cols[n].append(term)
                kinds[n].append(
                    KIND_BNODE if term.startswith("_:") else KIND_IRI
                )
            else:
                raise ValueError(
                    f"unsupported VALUES term {term!r} (UNDEF/None is not "
                    "supported; provide a bound IRI or ('lit', value))"
                )
    t = pa.table(
        {
            **{n: pa.array(cols[n], pa.string()) for n in names},
            **{f"__k_{n}": pa.array(kinds[n], pa.uint8()) for n in names},
        }
    )
    return rd.from_arrow(t), names, set(names)


def _path_can_literal(p, end: str) -> bool:
    """Static endpoint analysis for a path AST: can the ``src``/``dst``
    endpoint of its relation bind a LITERAL term?  Forward edges start
    at subjects (never literals); inverse swaps the question; the
    zero-length forms (`*`, `?`) include the §18.4 all-graph-terms
    identity, which contains literals on BOTH ends.  Decides whether a
    path unit's endpoint variable carries a ``__k_`` term-kind column
    (kind visibility must match the sharing side — see
    :func:`_bgp_join`'s mixed-pair restriction)."""
    op = p[0]
    if op in ("pred", "nps"):
        return end == "dst"
    if op == "inv":
        return _path_can_literal(p[1], "src" if end == "dst" else "dst")
    if op == "seq":
        return _path_can_literal(p[1] if end == "src" else p[2], end)
    if op == "alt":
        return _path_can_literal(p[1], end) or _path_can_literal(p[2], end)
    if op == "plus":
        return _path_can_literal(p[1], end)
    if op in ("star", "opt"):
        return True
    raise ValueError(f"unknown path op {p!r}")


def _parse_nt_terms(arr: pa.Array):
    """Vectorized single-term N-Triples parse: ``<iri>`` → iri,
    ``_:label`` → label as-is, ``"lex"[@lang|^^<dt>]`` → unescaped
    lexical form.  → (lexical: pa.Array[string], kind: pa.Array[uint8]).
    Language/datatype suffixes are dropped — BGP bindings carry the
    lexical form + kind, same as the store pivot's object columns."""
    import numpy as np
    import pandas as pd

    from ..sinks.ntriples import _unescape_nt
    from ..terms import KIND_BNODE, KIND_IRI, KIND_LITERAL

    s = pd.Series(arr.to_pylist(), dtype="object")
    is_lit = s.str.startswith('"')
    is_bn = s.str.startswith("_:")
    kind = np.where(
        is_lit, KIND_LITERAL, np.where(is_bn, KIND_BNODE, KIND_IRI)
    ).astype("uint8")
    lex = s.copy()
    lex[~is_lit & ~is_bn] = s[~is_lit & ~is_bn].str.slice(1, -1)  # <iri>
    if is_lit.any():
        body = s[is_lit].str.extract(r'^"((?:[^"\\]|\\.)*)"', expand=False)
        esc = body.str.contains("\\", regex=False)
        if esc.any():
            body = body.copy()
            body[esc] = body[esc].map(_unescape_nt)
        lex[is_lit] = body
    return pa.array(lex, pa.string()), pa.array(kind, pa.uint8())


def _path_unit(
    source,
    s_term,
    path,
    o_term,
    num_partitions: int,
) -> tuple[rd.Dataset, list[str], set[str]] | None:
    """A SPARQL §9.1 property-path item as a BGP binding unit
    [graft extension — paths compose with ordinary triple patterns]:
    the path relation (``stages.paths.eval_path`` over ``source`` — a
    store directory or the ``(catalog, base)`` DM virtual graph)
    parses back into binding columns; bound endpoints filter the
    relation (their N-Triples form compares in one vectorized pass);
    endpoint kind columns appear only where the path can actually bind
    a literal (:func:`_path_can_literal`), so sharing a variable with a
    subject position joins cleanly.  Returns None when both endpoints
    are bound and at least one solution exists is all that matters —
    callers get a 0/1-row unit instead."""
    from ..stages.paths import eval_path, parse_path
    from ..terms import KIND_LITERAL

    if isinstance(path, str):
        path = parse_path(path)
    rel = eval_path(source, path, num_partitions=num_partitions)

    def fmt_bound(term) -> str:
        if isinstance(term, tuple) and len(term) == 2 and term[0] == "lit":
            from ..functions.scalars import ntriples_escape

            return f'"{ntriples_escape(str(term[1]))}"'
        if isinstance(term, str):
            return term if term.startswith("_:") else f"<{term}>"
        raise ValueError(f"unsupported path endpoint {term!r}")

    s_var = isinstance(s_term, str) and s_term.startswith("?")
    o_var = isinstance(o_term, str) and o_term.startswith("?")
    names: list[str] = []
    kinds: set[str] = set()

    def project(t: pa.Table) -> pa.Table:
        # bound endpoints: one vectorized equality on the NT form;
        # literal bounds compare lexical+kind (datatype-insensitive,
        # matching store_statements' obj_literal semantics)
        # Literal endpoints compare the UNESCAPED lexical form (what
        # _parse_nt_terms yields) against the raw term value — never the
        # NT-escaped body, which diverges for quotes/backslashes/controls.
        if not s_var:
            if isinstance(s_term, tuple) and s_term[0] == "lit":
                lex, kd = _parse_nt_terms(t.column("src").combine_chunks())
                m = pc.and_(
                    pc.equal(kd, KIND_LITERAL),
                    pc.equal(lex, str(s_term[1])),
                )
            else:
                m = pc.equal(t.column("src"), fmt_bound(s_term))
            t = t.filter(pc.fill_null(m, False))
        if not o_var:
            if isinstance(o_term, tuple) and o_term[0] == "lit":
                lex, kd = _parse_nt_terms(t.column("dst").combine_chunks())
                m = pc.and_(
                    pc.equal(kd, KIND_LITERAL),
                    pc.equal(lex, str(o_term[1])),
                )
            else:
                m = pc.equal(t.column("dst"), fmt_bound(o_term))
            t = t.filter(pc.fill_null(m, False))
        if s_var and o_var and s_term == o_term:
            t = t.filter(
                pc.fill_null(pc.equal(t.column("src"), t.column("dst")), False)
            )
        cols: dict[str, pa.Array] = {}
        if s_var:
            lex, kd = _parse_nt_terms(t.column("src").combine_chunks())
            n = s_term.lstrip("?")
            cols[n] = lex
            if _path_can_literal(path, "src"):
                cols[f"__k_{n}"] = kd
        if o_var and not (s_var and s_term == o_term):
            lex, kd = _parse_nt_terms(t.column("dst").combine_chunks())
            n = o_term.lstrip("?")
            cols[n] = lex
            if _path_can_literal(path, "dst"):
                cols[f"__k_{n}"] = kd
        if not cols:
            # fully-bound path probe: contributes existence only
            return pa.table(
                {"__path_probe": pa.nulls(t.num_rows, pa.uint8())}
            )
        return pa.table(cols)

    ds = rel.map_batches(project, batch_format="pyarrow")
    if s_var:
        n = s_term.lstrip("?")
        names.append(n)
        if _path_can_literal(path, "src"):
            kinds.add(n)
    if o_var and not (s_var and s_term == o_term):
        n = o_term.lstrip("?")
        names.append(n)
        if _path_can_literal(path, "dst"):
            kinds.add(n)
    if not names:
        # both bound: reduce to a 0/1-row unit (existence gate)
        one = ds.limit(1).map_batches(
            lambda t: pa.table(
                {"__path_probe": pa.nulls(t.num_rows, pa.uint8())}
            ),
            batch_format="pyarrow",
        )
        return one, ["__path_probe"], set()
    return ds, names, kinds


def _bgp_acc(
    stmt_fn,
    patterns: list[tuple],
    num_partitions: int,
    units: list[tuple[rd.Dataset, list[str], set[str]]] | None = None,
    broadcast_limit: int = 1_000_000,
    graph_var: str | None = None,
):
    """Shared BGP accumulation: per-pattern statement Datasets
    (``stmt_fn`` maps bound-term kwargs → triples) joined on shared
    variables → ``(acc, vars, kind_vars)``; ``acc`` is None for an
    empty pattern list and ``_NO_MATCH`` when a fully-bound pattern
    matched nothing. See :func:`get_pattern` for the binding/term-kind
    semantics.

    ``units`` are pre-built binding Datasets ``(ds, vars, kind_vars)``
    (e.g. fused star groups from :func:`_star_groups`); they fold FIRST,
    so the usually-largest fused unit becomes the streamed accumulator
    instead of a driver-materialized broadcast side.

    ``graph_var`` [SPARQL §13.3 GRAPH ?var]: every pattern additionally
    binds the statement's ``graph`` column to that variable — a QUAD
    pattern, fully distributed (no per-context fan-out; the join on the
    shared graph variable enforces the same-context semantics across
    the group's patterns). The caller's ``stmt_fn`` must restrict to
    named contexts (``named_only=True``) and its Datasets must carry a
    ``graph`` column (stores do; the DM virtual graph does not).

    Join strategy per unit: the new side is collected to the driver for
    a broadcast inner join UP TO ``broadcast_limit`` rows (point-lookup
    profile — bindings are pushdown-pruned); past the limit it spills to
    the engine's co-hash-shuffle ``hash_join`` (one shuffle, no driver
    copy; the collected prefix is discarded and the side re-executes
    lazily — the standard recompute-vs-hold trade)."""
    import ray

    from ..terms import KIND_LITERAL

    acc: rd.Dataset | None = None
    acc_vars: list[str] = []
    acc_kinds: set[str] = set()  # vars with a __k_<var> column in acc
    unit_queue: list[tuple[rd.Dataset, list[str], set[str]]] = list(
        units or []
    )
    for pat in patterns:
        # a 4th element is a dict of extra stmt_fn kwargs attached by the
        # planner (e.g. get_pattern's subject-anchored table prune for
        # variable-predicate patterns) — invisible to 3-tuple callers
        s, p, o = pat[:3]
        kwargs: dict = dict(pat[3]) if len(pat) > 3 else {}
        slots: dict[str, str] = {}  # triple column -> var name
        if _is_var(s):
            slots["subj"] = s[1:]
        else:
            kwargs["subject"] = s
        if _is_var(p):
            slots["pred"] = p[1:]
        else:
            kwargs["predicate"] = p
        if _is_var(o):
            slots["obj"] = o[1:]
        elif isinstance(o, tuple) and o and o[0] == "lit":
            kwargs["obj_literal"] = o[1]
        else:
            kwargs["obj"] = o
        if graph_var is not None:
            # quad pattern: the named context binds like any other
            # position (non-literal — graph terms are IRIs/bnodes)
            slots["graph"] = graph_var
        ds = stmt_fn(**kwargs)

        if not slots:
            # fully bound pattern = existence filter
            if ds.count() == 0:
                return _NO_MATCH, [], set()
            continue

        # does any var repeat across subj/pred AND obj within this pattern?
        # then the obj occurrence must be non-literal (term equality with
        # an implicitly non-literal position) and needs no kind column
        np_vars = {v for c, v in slots.items() if c != "obj"}
        obj_var = slots.get("obj")
        obj_kind_var = (
            obj_var if obj_var is not None and obj_var not in np_vars else None
        )

        def proj(
            t: pa.Table, _slots=dict(slots), _kv=obj_kind_var
        ) -> pa.Table:
            cols, names = [], []
            seen: dict[str, pa.Array] = {}
            mask = None
            for c, v in _slots.items():
                arr = t.column(c).combine_chunks() if t.num_rows else pa.array([], pa.string())
                if v in seen:  # repeated var within one pattern: must match
                    eq = pc.equal(seen[v], arr)
                    mask = eq if mask is None else pc.and_(mask, eq)
                    if c == "obj":
                        # term equality with a non-literal position
                        nl = pc.not_equal(
                            t.column("obj_kind").combine_chunks()
                            if t.num_rows
                            else pa.array([], pa.uint8()),
                            KIND_LITERAL,
                        )
                        mask = pc.and_(mask, nl)
                    continue
                seen[v] = arr
                cols.append(arr)
                names.append(v)
            if _kv is not None:
                cols.append(
                    t.column("obj_kind").combine_chunks()
                    if t.num_rows
                    else pa.array([], pa.uint8())
                )
                names.append(f"__k_{_kv}")
            out = pa.Table.from_arrays(cols, names=names)
            if mask is not None:
                out = out.filter(pc.fill_null(mask, False))
            return out

        unit_queue.append(
            (
                ds.map_batches(proj, batch_format="pyarrow"),
                list(dict.fromkeys(slots.values())),
                {obj_kind_var} if obj_kind_var is not None else set(),
            )
        )

    for bnd, new_vars, new_kinds in unit_queue:
        new_kinds = set(new_kinds)
        if acc is None:
            acc, acc_vars, acc_kinds = bnd, new_vars, new_kinds
            continue
        shared = [v for v in new_vars if v in acc_vars]
        # reconcile term kinds on shared vars BEFORE the lexical join —
        # metadata-only decisions, so they apply to either join strategy
        join_keys = list(shared)
        for v in shared:
            a_has, n_has = v in acc_kinds, v in new_kinds
            if a_has and n_has:
                join_keys.append(f"__k_{v}")
            elif a_has:
                # new side binds v in a non-literal position: drop acc's
                # literal bindings, then the kind column is redundant
                acc = acc.map_batches(
                    lambda t, _c=f"__k_{v}": t.filter(
                        pc.not_equal(t.column(_c), KIND_LITERAL)
                    ).drop_columns([_c]),
                    batch_format="pyarrow",
                )
                acc_kinds.discard(v)
            elif n_has:
                # acc binds v in a non-literal position: drop the new
                # side's literal bindings, then its kind column
                bnd = bnd.map_batches(
                    lambda t, _c=f"__k_{v}": t.filter(
                        pc.not_equal(t.column(_c), KIND_LITERAL)
                    ).drop_columns([_c]),
                    batch_format="pyarrow",
                )
                new_kinds.discard(v)
        # collect the new side for the broadcast join, but stop at
        # broadcast_limit: an analytics-sized side spills to the engine's
        # co-hash-shuffle join instead of exhausting driver memory
        batches, total, spill = [], 0, False
        for b in bnd.iter_batches(batch_format="pyarrow", batch_size=None):
            batches.append(b)
            total += b.num_rows
            if total > broadcast_limit:
                spill = True
                break
        if spill and not shared:
            # a variable-disjoint (cross-product) side has no join key to
            # hash-spill on — co-hashing a constant key would pile the
            # whole side onto one partition, so fail loudly instead of
            # silently materializing past broadcast_limit on the driver
            raise ValueError(
                "BGP cross-product side (no shared variable with the "
                f"accumulated bindings) exceeds broadcast_limit="
                f"{broadcast_limit} rows; reorder the patterns to share "
                "a variable or raise broadcast_limit explicitly"
            )
        if spill:
            from .joins import hash_join

            marker = "__bgp_m"
            rds = bnd.map_batches(
                lambda t, _m=marker: t.append_column(
                    _m, pa.repeat(pa.scalar(1, pa.int8()), t.num_rows)
                ),
                batch_format="pyarrow",
            )
            acc = hash_join(
                acc, rds, join_keys, join_keys,
                num_partitions=max(num_partitions, 16),
            )
            acc = acc.map_batches(
                lambda t, _m=marker: t.filter(
                    t.column(_m).is_valid()
                ).drop_columns([_m]),
                batch_format="pyarrow",
            )
            acc_vars = list(dict.fromkeys(acc_vars + new_vars))
            acc_kinds |= new_kinds
            continue
        right = pa.concat_tables(
            batches or [_typed_empty_bindings(new_vars, new_kinds)]
        )
        if not shared:
            # cross product via a constant join key
            k = "__cross"
            right = right.append_column(k, pa.nulls(right.num_rows, pa.int8()).fill_null(0))
            acc = acc.map_batches(
                lambda t, _k=k: t.append_column(
                    _k, pa.repeat(pa.scalar(0, pa.int8()), t.num_rows)
                ),
                batch_format="pyarrow",
            )
            join_keys = [k]
        rref = ray.put(right)
        acc = acc.map_batches(
            _BroadcastInner,
            fn_constructor_kwargs={"right_ref": rref, "keys": join_keys},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        if join_keys == ["__cross"]:
            acc = acc.map_batches(
                lambda t: t.drop_columns(["__cross"]), batch_format="pyarrow"
            )
        acc_vars = list(dict.fromkeys(acc_vars + new_vars))
        acc_kinds |= new_kinds
    return acc, acc_vars, acc_kinds


def _derive_kind(ds: rd.Dataset, var: str) -> rd.Dataset:
    """Append a ``__k_<var>`` term-kind column derived from the surface
    form of a NON-LITERAL-position binding (``_:`` prefix = bnode, else
    IRI — no IRI can start with ``_:``). Used to reconcile kind
    visibility across the two sides of a negation anti-join, where
    *filtering* literals out (the inner-join trick in :func:`_bgp_acc`)
    would be unsound: a literal solution that cannot match the negation
    side must be KEPT, not dropped."""
    kc = f"__k_{var}"

    def f(t: pa.Table) -> pa.Table:
        from ..terms import derive_term_kind

        s = (
            t.column(var).combine_chunks()
            if t.num_rows
            else pa.array([], pa.string())
        )
        return t.append_column(kc, derive_term_kind(s))

    return ds.map_batches(f, batch_format="pyarrow")


def _bgp_anti(
    acc: rd.Dataset,
    acc_vars: list[str],
    acc_kinds: set[str],
    stmt_fn,
    mode: str,
    n_pats: list[tuple],
    n_units: list | None,
    num_partitions: int,
    broadcast_limit: int,
    graph_var: str | None = None,
) -> tuple[rd.Dataset, bool]:
    """One SPARQL existence group (MINUS / FILTER NOT EXISTS / FILTER
    EXISTS) applied to the accumulated required bindings [graft
    extension beyond the reference Store's BGP surface — SPARQL 1.1 §8
    shapes].

    With shared variables (the common case) the negative forms coincide
    for fully-bound group solutions: an ANTI SEMI-JOIN on the shared
    variables — solutions whose shared-variable values appear in the
    group's solution set drop. Mode ``"exists"`` is the positive dual:
    a SEMI-JOIN keeping exactly the solutions that DO appear.
    Distributed exactly like the positive joins: the group's DISTINCT
    key projection broadcasts up to ``broadcast_limit`` rows (Acero
    ``left anti`` / ``left semi`` per batch, no shuffle); past the
    limit it spills to the engine's union-tag co-hash-shuffle join with
    a match-marker filter (one shuffle, no driver copy).

    Without shared variables the forms diverge per SPARQL 1.1:
    ``minus`` is a no-op (disjoint domains are never compatible —
    §8.3.3); ``not_exists`` / ``exists`` are global existence gates
    (group matched anything → every solution drops / survives).

    NULL shared-variable bindings (possible after OPTIONAL) never match
    — SQL join semantics — which coincides with MINUS' bound-variable
    compatibility rule when the NULL variable is the only shared one.

    Returns ``(acc, empty)``; ``empty=True`` short-circuits to no
    solutions (the NOT-EXISTS global gate fired).
    """
    import ray

    from .distinct import _unique_batch

    if mode not in ("minus", "not_exists", "exists"):
        raise ValueError(f"unknown negation mode {mode!r}")
    # graph_var [GRAPH ?var]: the group's patterns bind the context too,
    # and the context joins the shared-variable set — the anti/semi join
    # then enforces SPARQL's per-named-graph Minus/Exists semantics
    nacc, nvars, nkinds = _bgp_acc(
        stmt_fn, n_pats, num_partitions, n_units, broadcast_limit,
        graph_var=graph_var,
    )
    if nacc is _NO_MATCH:
        # group can match nothing → negation is a no-op; positive
        # EXISTS is the dual: no solution survives
        return acc, mode == "exists"
    if nacc is None:
        raise ValueError("empty negation group")
    shared = [v for v in nvars if v in acc_vars]
    if not shared:
        if mode == "minus":
            # SPARQL MINUS §8.3.3: disjoint domains are never compatible
            return acc, False
        # (NOT) EXISTS: the group is independent of each solution — one
        # match anywhere eliminates/keeps everything (tiny limit(1)
        # probe, not a full count)
        matched = nacc.limit(1).count() > 0
        return acc, (matched if mode == "not_exists" else not matched)

    # kind reconciliation: every shared var that carries term-kind
    # visibility on EITHER side gets a kind column on BOTH (derived from
    # the surface form on the non-literal side), so a literal binding
    # never anti-matches an IRI spelled the same — and, unlike the
    # inner-join literal-filter trick, stays in the solution set.
    keys = list(shared)
    drop_after: list[str] = []
    for v in shared:
        a_has, n_has = v in acc_kinds, v in nkinds
        if not (a_has or n_has):
            continue
        if not n_has:
            nacc = _derive_kind(nacc, v)
        if not a_has:
            acc = _derive_kind(acc, v)
            drop_after.append(f"__k_{v}")
        keys.append(f"__k_{v}")

    # project the group to the join keys + per-block local dedup (the
    # anti-join only needs the distinct key set; a full distinct shuffle
    # is not worth it — the combiner removes the bulk)
    nkeys = nacc.map_batches(
        lambda t, _k=tuple(keys): _unique_batch(t, list(_k)),
        batch_format="pyarrow",
    )
    batches, total, spill = [], 0, False
    for b in nkeys.iter_batches(batch_format="pyarrow", batch_size=None):
        batches.append(b)
        total += b.num_rows
        if total > broadcast_limit:
            spill = True
            break
    if spill:
        from .joins import hash_join

        marker = "__bgp_nm"
        rds = nkeys.map_batches(
            lambda t, _m=marker: t.append_column(
                _m, pa.repeat(pa.scalar(1, pa.int8()), t.num_rows)
            ),
            batch_format="pyarrow",
        )
        acc = hash_join(
            acc, rds, keys, keys, num_partitions=max(num_partitions, 16)
        )
        keep = pc.is_valid if mode == "exists" else pc.is_null
        acc = acc.map_batches(
            lambda t, _m=marker, _f=keep: t.filter(
                _f(t.column(_m))
            ).drop_columns([_m]),
            batch_format="pyarrow",
        )
    else:
        right = pa.concat_tables(
            batches or [_typed_empty_bindings(shared,
                                              {k[4:] for k in keys
                                               if k.startswith("__k_")})]
        )
        rref = ray.put(right)
        acc = acc.map_batches(
            _BroadcastInner,
            fn_constructor_kwargs={
                "right_ref": rref,
                "keys": keys,
                "join_type": "left semi" if mode == "exists" else "left anti",
            },
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    if drop_after:
        acc = acc.map_batches(
            lambda t, _d=tuple(drop_after): t.drop_columns(list(_d)),
            batch_format="pyarrow",
        )
    return acc, False




def _bgp_left_join(
    acc,
    acc_vars: list[str],
    acc_kinds: set[str],
    stmt_fn,
    optional: list[tuple],
    optional_units,
    num_partitions: int,
    broadcast_limit: int,
    graph_var: str | None = None,
    filters: list | None = None,
):
    """ONE left-outer (OPTIONAL) group joined into the accumulator
    [SPARQL 1.1 §6 LeftJoin]: required solutions keep their row when
    the group matches nothing, with the group's exclusive variables
    NULL. Restriction (raises ValueError): every shared variable must
    carry term-kind visibility on BOTH sides or NEITHER — a mixed pair
    cannot be joined term-correctly without splitting required rows.
    ``graph_var`` [GRAPH ?var]: the group binds the context variable
    too, so the left join matches per named graph — exactly
    ``Graph(?g, LeftJoin(A, B))``'s per-context semantics.
    Returns the updated ``(acc, acc_vars, acc_kinds)``."""
    import ray

    oacc, ovars, okinds = _bgp_acc(
        stmt_fn, optional or [], num_partitions, optional_units,
        broadcast_limit, graph_var=graph_var,
    )
    if filters and oacc is not None and oacc is not _NO_MATCH:
        # the LeftJoin condition F, restricted to the group's OWN
        # variables (callers enforce it): LeftJoin(A, B, F) =
        # LeftJoin(A, Filter(F, B)) under that restriction, so the
        # filter applies to the group's solutions BEFORE the join —
        # required rows the filtered group no longer matches survive
        # as left-only rows with NULL extensions, exactly §6.
        # (oacc None = the group is fully bound and matched, {mu0}:
        # the group binds NOTHING, so whether F passes (extend by
        # nothing) or fails (keep as unmatched) every required row is
        # returned unchanged — the filter is a no-op by construction
        # and is skipped, not an error.)
        oacc = _apply_binding_filters(oacc, filters)
    if oacc is _NO_MATCH:
        # a fully-bound pattern in the group matched nothing → the
        # whole group is unmatched for every required solution: its
        # exclusive variables (derived statically) extend as NULLs.
        # The structural no-shared-variable check still applies —
        # it must not be data-dependent (raise vs succeed depending
        # on store contents).
        ovars = [
            t[1:]
            for pat in (optional or [])
            for t in pat
            if _is_var(t)
        ]
        for _, uvars, _k in optional_units or []:
            ovars.extend(uvars)
        if not (set(ovars) & set(acc_vars)):
            raise ValueError(
                "optional group shares no variable with the required "
                "patterns (a left cross product is never intended)"
            )
        add = tuple(
            v for v in dict.fromkeys(ovars) if v not in acc_vars
        )
        if add:
            def null_extend(t: pa.Table, _a=add) -> pa.Table:
                for v in _a:
                    t = t.append_column(
                        v, pa.nulls(t.num_rows, pa.string())
                    )
                return t

            acc = acc.map_batches(null_extend, batch_format="pyarrow")
            acc_vars = list(dict.fromkeys(acc_vars + list(add)))
        oacc = None
    if oacc is not None:
        from ..terms import KIND_BNODE, KIND_IRI, KIND_LITERAL

        okinds = set(okinds)
        shared = [v for v in ovars if v in acc_vars]
        if not shared:
            raise ValueError(
                "optional group shares no variable with the required "
                "patterns (a left cross product is never intended)"
            )
        # reconcile term kinds on shared vars BEFORE the lexical join
        # (mirrors the inner-join reconciliation in _bgp_acc, adapted
        # to left-outer semantics: the acc side must NEVER lose rows)
        join_keys = list(shared)
        derived: set[str] = set()
        for v in shared:
            a_has, o_has = v in acc_kinds, v in okinds
            if a_has and o_has:
                join_keys.append(f"__k_{v}")
            elif o_has:
                # acc binds v in a non-literal position: the group's
                # literal bindings can never match any acc row — drop
                # them (unmatched acc rows still NULL-extend, so the
                # left join is unchanged), then the kind col is moot
                oacc = oacc.map_batches(
                    lambda t, _c=f"__k_{v}": t.filter(
                        pc.not_equal(t.column(_c), KIND_LITERAL)
                    ).drop_columns([_c]),
                    batch_format="pyarrow",
                )
                okinds.discard(v)
            elif a_has:
                # group binds v in a non-literal position only — derive
                # its kind column from the lexical form ('_:' prefix =
                # bnode; no IRI can carry it) and join term-correctly;
                # acc's literal bindings then correctly NULL-extend
                derived.add(v)

                def derive_kind(t: pa.Table, _v=v) -> pa.Table:
                    from ..terms import derive_term_kind

                    col = t.column(_v).combine_chunks()
                    return t.append_column(
                        f"__k_{_v}", derive_term_kind(col)
                    )

                oacc = oacc.map_batches(derive_kind, batch_format="pyarrow")
                join_keys.append(f"__k_{v}")
        batches, total, spill = [], 0, False
        for b in oacc.iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            batches.append(b)
            total += b.num_rows
            if total > broadcast_limit:
                spill = True
                break
        if spill:
            from .joins import hash_join

            acc = hash_join(  # hash_join is LEFT OUTER already
                acc, oacc, join_keys, join_keys,
                num_partitions=max(num_partitions, 16),
            )
        else:
            right = (
                pa.concat_tables(batches)
                if batches
                else _typed_empty_bindings(ovars, okinds | derived)
            )
            rref = ray.put(right)
            acc = acc.map_batches(
                _BroadcastInner,
                fn_constructor_kwargs={
                    "right_ref": rref,
                    "keys": join_keys,
                    "join_type": "left outer",
                },
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
        acc_vars = list(dict.fromkeys(acc_vars + ovars))
        acc_kinds |= okinds
    return acc, acc_vars, acc_kinds


def _bgp_join(
    stmt_fn,
    patterns: list[tuple],
    num_partitions: int,
    filters: list[tuple] | None = None,
    units: list[tuple[rd.Dataset, list[str], set[str]]] | None = None,
    broadcast_limit: int = 1_000_000,
    optional_groups: list[tuple[list[tuple], list, list]] | None = None,
    negations: list[tuple[str, list[tuple], list | None]] | None = None,
    bind: list[tuple] | None = None,
    keep_kinds: bool = False,
    graph_var: str | None = None,
) -> rd.Dataset:
    """Required BGP ⟕ optional BGP groups → negations → BIND → FILTER →
    distinct bindings. ``graph_var`` threads to every :func:`_bgp_acc`
    (GRAPH ?var quad patterns — required, OPTIONAL, and negation groups
    all bind the context, so the joins enforce SPARQL's per-named-graph
    LeftJoin/Minus/Exists semantics).

    ``keep_kinds=True`` retains the hidden ``__k_<var>`` term-kind
    columns on the output (consumed by :mod:`engine.construct`, which
    must distinguish literal from IRI bindings to emit valid RDF).

    ``negations`` is a list of ``(mode, patterns, units)`` groups with
    mode ``"minus"``, ``"not_exists"``, or ``"exists"`` (positive
    semi-join) — see :func:`_bgp_anti` for the SPARQL 1.1 §8 semantics
    and the anti/semi-join distribution strategy.

    ``optional_groups`` is a list of ``(patterns, units, filters)``
    left-outer
    groups applied SEQUENTIALLY — left-associative LeftJoin composition,
    exactly SPARQL 1.1 §5.2's algebra for sibling OPTIONALs [graft
    extension beyond the reference Store's BGP surface]. See
    :func:`_bgp_left_join` for the per-group semantics/restrictions.
    """
    from .distinct import distinct_rows

    acc, acc_vars, acc_kinds = _bgp_acc(
        stmt_fn, patterns, num_partitions, units, broadcast_limit,
        graph_var=graph_var,
    )
    if acc is _NO_MATCH:
        # a fully-bound pattern missed: the group's solution set is
        # empty. Emit the EMPTY table WITH the group's bindable columns
        # (pattern/unit/OPTIONAL/BIND/graph-var positions) so consumers
        # keep a stable schema — Ray never maps a 0-row block, so a
        # zero-column table here could not be repaired downstream
        scope: dict[str, None] = {}
        for pat in patterns:
            for term in pat:
                if isinstance(term, str) and term.startswith("?"):
                    scope.setdefault(term[1:])
        for _ds, names, _kinds in units or []:
            for v in names:
                scope.setdefault(v)
        for o_pats, o_units, *_ofilters in optional_groups or []:
            for pat in o_pats:
                for term in pat:
                    if isinstance(term, str) and term.startswith("?"):
                        scope.setdefault(term[1:])
            for _ds, names, _kinds in o_units or []:
                for v in names:
                    scope.setdefault(v)
        for alias, *_ in bind or []:
            scope.setdefault(alias.lstrip("?"))
        if graph_var is not None:
            scope.setdefault(graph_var)
        scope.pop("__path_probe", None)
        cols = {v: pa.array([], pa.string()) for v in scope}
        if keep_kinds:
            for v in list(scope):
                cols[f"__k_{v}"] = pa.array([], pa.uint8())
        return rd.from_arrow(pa.table(cols) if cols else pa.table({}))
    if acc is None:
        # every pattern was fully bound and matched (or the group is
        # empty): the BGP's solution set is {μ0} — ONE solution binding
        # nothing (SPARQL 1.1 §18.5 Join identity), NOT the empty set;
        # ASK over an existing fully-bound triple must answer True.
        # Arrow cannot express a 1-row/0-column table, so the solution
        # rides an internal marker column (same convention as
        # ``__path_probe``).
        if optional_groups or negations or bind or filters:
            raise NotImplementedError(
                "OPTIONAL/MINUS/EXISTS/BIND/FILTER over a WHERE group "
                "that binds no variables is not supported"
            )
        return rd.from_arrow(pa.table({"__mu0": pa.array([True])}))

    for o_pats, o_units, *o_rest in optional_groups or []:
        # (patterns, units) legacy 2-tuples and (patterns, units,
        # filters) 3-tuples both accepted — the filters entry is the
        # LeftJoin condition over the group's OWN variables
        acc, acc_vars, acc_kinds = _bgp_left_join(
            acc, acc_vars, acc_kinds, stmt_fn, o_pats, o_units,
            num_partitions, broadcast_limit, graph_var=graph_var,
            filters=(o_rest[0] or None) if o_rest else None,
        )

    for mode, n_pats, n_units in negations or []:
        acc, empty = _bgp_anti(
            acc, acc_vars, acc_kinds, stmt_fn, mode, n_pats, n_units,
            num_partitions, broadcast_limit, graph_var=graph_var,
        )
        if empty:  # (NOT-)EXISTS global gate fired: no solutions survive
            acc = acc.limit(0)
            break

    if bind:
        acc, bvars, bkinds = _extend_bindings(acc, bind, acc_vars)
        acc_vars = list(dict.fromkeys(acc_vars + bvars))
        acc_kinds |= bkinds
    if filters:
        acc = _apply_binding_filters(acc, filters)
    if "__path_probe" in acc_vars:
        # a fully-bound path probe contributed existence only; its
        # internal all-null column must not leak into the solutions
        if len(acc_vars) == 1:
            # the probe was the ONLY unit: the group's answer is {μ0}
            # when any probe row survived — same marker convention as
            # the fully-bound-pattern branch above
            n = acc.limit(1).count()
            return rd.from_arrow(
                pa.table({"__mu0": pa.array([True] * n)})
            )
        acc_vars = [v for v in acc_vars if v != "__path_probe"]
        acc = acc.map_batches(
            lambda t: t.drop_columns(["__path_probe"]),
            batch_format="pyarrow",
        )
    kind_cols = sorted(f"__k_{v}" for v in acc_kinds)
    out = distinct_rows(acc, acc_vars + kind_cols, num_buckets=num_partitions)
    if kind_cols and not keep_kinds:
        # kinds joined on above distinguish literal-vs-IRI solutions in the
        # distinct; the public binding surface stays lexical-only
        out = out.map_batches(
            lambda t, _k=tuple(kind_cols): t.drop_columns(list(_k)),
            batch_format="pyarrow",
        )
    return out
