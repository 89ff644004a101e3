"""BGP planning: DM term decoding, star-group fusion, and FILTER ->
scan pushdown (the query-shape half of `engine/lookup.py`, split out in
round 5 -- public surface unchanged, everything re-exported there).

Star-group fusion: same-subject-variable triple patterns share ONE scan
of their table (the DM emits a subject-complete row per scan batch), so
an n-pattern star costs one pass + a pivot instead of n-1 joins.
Pushdown: FILTER constraints on scan-backed variables compile to
parquet row-group predicates (`_filter_pushdown_expr`) -- rows never
leave storage. The store-side planners mirror both over bucket-
partitioned triple stores.
"""

from __future__ import annotations

import urllib.parse
from dataclasses import replace

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data as rd

from ..mapping.direct import direct_mapping
from ..mapping.spec import MappingSpec
from ..sources.catalog import Catalog

def decode_subject(iri: str, base: str) -> tuple[str, dict[str, str]] | None:
    """Inverse of the DM subject template: ``<base>T/c1=v1;c2=v2`` →
    (table, {col: raw_value}); None if the IRI is not a DM row node."""
    if not iri.startswith(base):
        return None
    rest = iri[len(base):]
    if "/" not in rest:
        return None
    table, _, kv = rest.partition("/")
    out: dict[str, str] = {}
    for part in kv.split(";"):
        if "=" not in part:
            return None
        c, _, v = part.partition("=")
        out[urllib.parse.unquote(c)] = urllib.parse.unquote(v)
    return urllib.parse.unquote(table), out


def decode_predicate(iri: str, base: str) -> tuple[str, str] | None:
    """``<base>T#col`` → (table, col); None otherwise (type/ref preds)."""
    if not iri.startswith(base) or "#" not in iri:
        return None
    table, _, col = iri[len(base):].partition("#")
    if col.startswith("ref-"):
        return None
    return urllib.parse.unquote(table), urllib.parse.unquote(col)


def decode_ref_predicate(iri: str, base: str) -> tuple[str, tuple[str, ...]] | None:
    """``<base>T#ref-c1;c2`` → (table, (c1, c2)); None otherwise."""
    if not iri.startswith(base) or "#" not in iri:
        return None
    table, _, col = iri[len(base):].partition("#")
    if not col.startswith("ref-"):
        return None
    cols = tuple(urllib.parse.unquote(c) for c in col[4:].split(";"))
    return urllib.parse.unquote(table), cols


class _Uncastable(Exception):
    """A bound term's lexical form cannot be cast to the column type —
    Store semantics: such a pattern simply matches nothing."""


def _cast_value(schema: pa.Schema, col: str, raw: str):
    t = schema.field(col).type
    try:
        if pa.types.is_integer(t):
            return int(raw)
        if pa.types.is_floating(t):
            return float(raw)
    except (ValueError, TypeError) as e:
        raise _Uncastable(f"{col}={raw!r}") from e
    return raw


def _is_var(t) -> bool:
    return isinstance(t, str) and t.startswith("?")


# variable names the star pivot cannot bind without clobbering its own
# working columns (the triple schema + hidden __-prefixed columns) —
# such patterns stay on the generic path, which handles them correctly
_RESERVED_BINDING_NAMES = frozenset(
    ["subj", "pred", "obj", "obj_kind", "lang", "datatype", "graph"]
)


def _fusable_var(name: str) -> bool:
    return name not in _RESERVED_BINDING_NAMES and not name.startswith("__")


def _group_star_patterns(patterns: list[tuple], resolve) -> tuple[list, list]:
    """Shared star-group planner core. ``resolve(pred)`` returns the
    group scope (the DM table for source BGPs, a constant for the store)
    or None when the predicate cannot be served by a fused scan.
    Eligible patterns: var subject, bound predicate, and a var object
    distinct from the subject and the group's other object vars — or a
    ``("lit", value)`` bound literal (joins the group as an existence
    filter). Returns ``([(svar, scope, items)], leftover_patterns)``;
    groups of one pattern fall back to the generic path."""
    groups: dict[tuple[str, str], list] = {}
    leftover: list[tuple] = []
    for pat in patterns:
        s, p, o = pat
        obj_ok = (_is_var(o) and o != s and _fusable_var(o[1:])) or (
            isinstance(o, tuple) and o and o[0] == "lit"
        )
        if _is_var(s) and not _fusable_var(s[1:]):
            obj_ok = False
        scope = None
        if _is_var(s) and isinstance(p, str) and not _is_var(p) and obj_ok:
            scope = resolve(p)
        if scope is None:
            leftover.append(pat)
            continue
        grp = groups.setdefault((s[1:], scope), [])
        item = o[1:] if _is_var(o) else o  # var name | ("lit", value)
        if isinstance(item, str) and any(
            it == item for _, it in grp if isinstance(it, str)
        ):
            leftover.append(pat)  # repeated object var → generic path
        else:
            grp.append((p, item))
    fused = []
    for (svar, scope), items in groups.items():
        if len(items) < 2:  # no fusion win — back to the generic path
            p, it = items[0]
            leftover.append(
                ("?" + svar, p, "?" + it if isinstance(it, str) else it)
            )
            continue
        fused.append((svar, scope, items))
    return fused, leftover


_PUSH_OPS = {"==", "!=", "<", "<=", ">", ">="}

# FILTER atoms over a literal's TERM METADATA (language tag / datatype
# IRI).  Binding columns carry lexical forms only (`terms.py` drops the
# suffixes), so unlike _PUSH_OPS these are not pruning hints: they are
# CONSUMED at the store scan, and `get_pattern_store` guards that the
# consumption is exact (single-binder variable under a uniquely-used
# predicate inside a fused star group).
LANG_FILTER_OPS = {"lang_eq", "langmatches", "dt_eq"}

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _lang_term_expr(op: str, val: str):
    """Store-scan expression for one LANG()/DATATYPE() FILTER atom over
    a triple row's ``lang`` / ``datatype`` columns (SPARQL §17.4.4.x
    evaluated against the store's term metadata). LANG of a non-literal
    is a type error — the row drops, hence the ``obj_kind`` conjunct.
    A plain literal has LANG ``""`` (``lang_eq ""`` matches it); its
    DATATYPE is xsd:string and a tagged literal's is rdf:langString
    (RDF 1.1 §3.3). LANGMATCHES implements RFC 4647 basic ranges:
    case-insensitive (tags are ASCII per BCP 47), ``"*"`` matches any
    non-empty tag, a range matches the tag exactly or as a
    ``-``-delimited prefix."""
    from ..terms import KIND_LITERAL

    lit = pc.field("obj_kind") == KIND_LITERAL
    lang = pc.field("lang")
    if op == "lang_eq":
        if val == "":
            return lit & lang.is_null()
        return lit & (lang == val)
    if op == "langmatches":
        if val == "*":
            return lit & ~lang.is_null()
        low = pc.ascii_lower(lang)
        v = val.lower()
        return lit & ((low == v) | pc.starts_with(low, v + "-"))
    if op == "dt_eq":
        dt = pc.field("datatype")
        if val == XSD_STRING:
            return lit & dt.is_null() & lang.is_null()
        if val == RDF_LANGSTRING:
            return lit & ~lang.is_null()
        return lit & (dt == val)
    raise ValueError(f"not a LANG/DATATYPE filter op: {op!r}")


def _cmp_expr(f, op: str, val):
    """One pyarrow comparison expression for a _PUSH_OPS operator —
    shared by the source- and store-side pushdown builders so their
    semantics cannot diverge."""
    return {
        "==": f == val,
        "!=": f != val,
        "<": f < val,
        "<=": f <= val,
        ">": f > val,
        ">=": f >= val,
    }[op]


def _filter_pushdown_expr(
    catalog: Catalog,
    base: str,
    table: str,
    items: list[tuple[str, str]],
    filters: list[tuple] | None,
):
    """FILTER → scan predicate pushdown for one star group: a filter
    ``("?v", op, val)`` whose variable is one of the group's object
    variables bound from a plain column predicate becomes a pyarrow
    row filter on that column — rows the binding-level filter would
    drop anyway never leave the parquet reader. PRUNING-ONLY (the
    binding filter still runs): pushed only when the comparison class
    matches the column type (numeric val ↔ numeric column, string val
    ↔ string column), where scan and binding semantics provably agree
    (NULL drops both ways; UTF-8 byte order == codepoint order)."""
    if not filters:
        return None
    var_col = {}
    for p, it in items:
        if isinstance(it, str):
            dec = decode_predicate(p, base)
            if dec is not None:
                var_col[it] = dec[1]
    if not var_col:
        return None
    try:
        schema = catalog.schema(table)
    except Exception:
        return None
    def atom_expr(flt):
        if len(flt) != 3:
            return None
        var, op, val = flt
        if not isinstance(var, str) or isinstance(val, tuple):
            return None  # computed left side / var-vs-var: binding-only
        col = var_col.get(var.lstrip("?"))
        if col is None or op not in _PUSH_OPS or col not in schema.names:
            return None
        typ = schema.field(col).type
        numeric = pa.types.is_integer(typ) or pa.types.is_floating(typ)
        if isinstance(val, bool):
            return None
        if isinstance(val, (int, float)) and not numeric:
            return None  # numeric compare on a string column: lexical
            # vs numeric semantics diverge — binding filter only
        if isinstance(val, str) and not pa.types.is_string(typ):
            return None
        return _cmp_expr(pc.field(col), op, val)

    def push_one(flt):
        # boolean groups from FILTER || / && (see _apply_binding_filters):
        # an AND pushes any pushable subset (superset prune stays sound);
        # an OR pushes only when EVERY disjunct pushes — dropping a
        # disjunct would prune rows that disjunct alone admits.
        if len(flt) == 2 and flt[0] == "and":
            sub = [e for e in (push_one(c) for c in flt[1]) if e is not None]
            if not sub:
                return None
            expr = sub[0]
            for e in sub[1:]:
                expr = expr & e
            return expr
        if len(flt) == 2 and flt[0] == "or":
            sub = [push_one(c) for c in flt[1]]
            if any(e is None for e in sub) or not sub:
                return None
            expr = sub[0]
            for e in sub[1:]:
                expr = expr | e
            return expr
        return atom_expr(flt)

    expr = None
    for flt in filters:
        e = push_one(flt)
        if e is not None:
            expr = e if expr is None else expr & e
    return expr


def subject_tables(
    catalog: Catalog, patterns: list[tuple], base: str
) -> dict[str, set[str]]:
    """Map each subject VARIABLE to the set of DM tables its bound
    column/ref predicates resolve to. A DM subject IRI (or skolem bnode)
    encodes its table, so a variable-predicate pattern whose subject
    joins such a variable can only match triples emitted by those
    tables' maps — :func:`get_pattern` passes the set to
    ``get_statements(only_tables=…)`` so the ``?s ?p ?o`` wildcard
    expands ONE table instead of the whole catalog (at 100 TB: one
    table scan instead of an all-tables scan, same bindings)."""
    known = set(catalog.table_names())
    out: dict[str, set[str]] = {}
    for pat in patterns:
        s, p = pat[0], pat[1]
        if not (_is_var(s) and isinstance(p, str) and not _is_var(p)):
            continue
        for dec in (decode_predicate(p, base), decode_ref_predicate(p, base)):
            if dec is not None and dec[0] in known:
                out.setdefault(s[1:], set()).add(dec[0])
    return out


def _star_groups(
    catalog: Catalog,
    patterns: list[tuple],
    base: str,
    filters: list[tuple] | None = None,
) -> tuple[list, list]:
    """Star-join pushdown planner: patterns that share one subject
    variable and whose bound predicates decode to the SAME Direct-Mapping
    table are served by ONE scan of that table (subject minted once, one
    binding column per pattern) instead of one scan + one broadcast join
    per pattern. Bound-IRI-object patterns stay on the generic path —
    its parquet value pushdown is the better plan for them. ``filters``
    (the caller's binding-level FILTER list) additionally push as scan
    predicates where sound (:func:`_filter_pushdown_expr`). Returns
    ``(fused_units, leftover_patterns)``."""
    known = set(catalog.table_names())

    def resolve(p: str) -> str | None:
        dec = decode_predicate(p, base)
        if dec is not None and dec[0] in known:
            return dec[0]
        decr = decode_ref_predicate(p, base)
        if decr is not None and decr[0] in known:
            return decr[0]
        return None

    fused, leftover = _group_star_patterns(patterns, resolve)
    units = [
        _fused_star_unit(
            catalog, base, svar, table, items,
            row_filter=_filter_pushdown_expr(
                catalog, base, table, items, filters
            ),
        )
        for svar, table, items in fused
    ]
    return units, leftover


def _fused_star_unit(
    catalog: Catalog,
    base: str,
    svar: str,
    table: str,
    items: list[tuple[str, str]],
    row_filter=None,
) -> tuple[rd.Dataset, list[str], set[str]]:
    """ONE scan serves every pattern of a star group: the DM map
    restricted to the group's predicates runs once (no distinct — DM is
    duplicate-free), and the pivot inner-merges the bindings on the
    subject INSIDE the expansion UDF (``plan_triples_map(post_batch=)``)
    — fused in the same task so Ray's output block splitting can never
    separate a source row's triples before the merge; DM subjects are
    row-unique, so the within-batch merge is exact. No shuffle, no
    broadcast, no driver materialization."""
    from .runner import plan_triples_map

    wanted = {p for p, _ in items}
    spec = direct_mapping(catalog, base=base)
    tm = spec.maps[table]
    tm2 = replace(
        tm,
        pos=tuple(pp for pp in tm.pos if pp.pred.constant in wanted),
        refs=tuple(r for r in tm.refs if r.pred.constant in wanted),
        classes=(),
    )
    spec2 = MappingSpec(maps={**spec.maps, table: tm2}, base=spec.base)
    plan = tuple(items)

    def pivot(t: pa.Table) -> pa.Table:
        return _star_pivot(t.to_pandas(), plan, svar)

    bnd = plan_triples_map(
        tm2, spec2, catalog, post_batch=pivot, row_filter=row_filter
    )
    obj_vars = [v for _, v in plan if isinstance(v, str)]
    return bnd, [svar] + obj_vars, set(obj_vars)


def _star_pivot(df, plan: tuple, svar: str) -> pa.Table:
    """Merge one subject-complete triple frame into star bindings: one
    column per (pred → var) item, inner-merged on the subject; a
    ``("lit", value)`` item filters subjects by lexical equality on the
    emitted term (exactly :func:`get_statements`' bound-object semantic
    gate) and binds nothing. Exact iff every triple of a subject is
    inside ``df`` (row-local DM batch, or whole subject-hash store
    buckets)."""
    import pandas as pd

    from ..terms import KIND_LITERAL
    from .distinct import to_clean_arrow

    out = None
    for pred, o in plan:
        sel = df[df["pred"] == pred]
        if isinstance(o, tuple):  # ("lit", value) existence filter
            sel = sel[
                (sel["obj"] == str(o[1]))
                & (sel["obj_kind"] == KIND_LITERAL)
            ][["subj"]]
        else:
            sel = pd.DataFrame(
                {
                    "subj": sel["subj"],
                    o: sel["obj"],
                    f"__k_{o}": sel["obj_kind"],
                }
            )
        out = sel if out is None else out.merge(sel, on="subj", how="inner")
    return to_clean_arrow(out.rename(columns={"subj": svar}))


def _store_filter_pushdown_expr(
    items: list[tuple[str, str]], filters: list[tuple] | None
):
    """FILTER → store-scan predicate pushdown (the store twin of
    :func:`_filter_pushdown_expr`): a STRING-valued binding filter on a
    group object variable becomes ``(pred != p) | (obj CMP val)`` — it
    prunes only the triples that bind that variable, leaving the other
    predicates' rows untouched. String comparisons only: the store's
    ``obj`` column IS the lexical form, so lexical semantics carry
    exactly (NULL obj never binds; numeric filters compare NUMERICALLY
    over lexicals and stay binding-level).

    A filter pushes ONLY when its variable's predicate appears in
    exactly ONE item of the group: unlike a DM column (single value per
    row), a store predicate is multi-valued, so with the same predicate
    bound to a second variable (or a ``("lit", x)`` existence item) the
    pruned row may still be needed as the OTHER item's binding —
    pruning would drop valid solutions, not just filtered ones."""
    if not filters:
        return None
    from collections import Counter

    pred_uses = Counter(p for p, _ in items)
    var_pred = {
        it: p
        for p, it in items
        if isinstance(it, str) and pred_uses[p] == 1
    }
    def atom_cmp(flt):
        """(predicate, obj-comparison expr) for a pushable atom."""
        if len(flt) != 3:
            return None
        var, op, val = flt
        if not isinstance(var, str):
            return None  # computed left side: binding-level only
        p = var_pred.get(var.lstrip("?"))
        if p is None:
            return None
        if op in LANG_FILTER_OPS:
            # term-metadata atom: consumed here (get_pattern_store
            # guarantees the single-binder shape before planning)
            return p, _lang_term_expr(op, str(val))
        if (
            op not in _PUSH_OPS
            or not isinstance(val, str)
            or isinstance(val, bool)
        ):
            return None
        return p, _cmp_expr(pc.field("obj"), op, val)

    def push_one(flt):
        if len(flt) == 2 and flt[0] == "or":
            # a disjunction pushes only when every disjunct is an atom
            # on the SAME variable/predicate: the pruned form is then
            # (pred != p) | cmp1 | cmp2 … — across different predicates
            # the (pred != other) escape makes the prune vacuous anyway.
            subs = [atom_cmp(c) for c in flt[1]]
            if any(s is None for s in subs) or not subs:
                return None
            preds = {p for p, _ in subs}
            if len(preds) != 1:
                return None
            expr = pc.field("pred") != subs[0][0]
            for _, cmp_e in subs:
                expr = expr | cmp_e
            return expr
        a = atom_cmp(flt)
        if a is None:
            return None
        return (pc.field("pred") != a[0]) | a[1]

    expr = None
    for flt in filters:
        e = push_one(flt)
        if e is not None:
            expr = e if expr is None else expr & e
    return expr


def _store_star_groups(
    store_dir: str, patterns: list[tuple],
    filters: list[tuple] | None = None,
    graph: str | None = None,
    default_graph: bool = False,
) -> tuple[list, list]:
    """Store-side star-join pushdown: every same-subject-var pattern
    with a bound predicate and a fresh object var joins inside ONE store
    scan — one Ray task per bundle of ``bucket=`` dirs reads its parts
    with a ``pred IN (…)`` row filter and pivots, which is exact because
    a subject's triples never span buckets (subject-hash partitioning).
    No per-pattern scans, no joins, no shuffle. String-valued binding
    ``filters`` on group object vars additionally push into the scan
    (:func:`_store_filter_pushdown_expr`, pruning-only)."""
    dirs = [store_dir] if isinstance(store_dir, str) else list(store_dir)
    if len(dirs) > 1 and not _buckets_aligned(dirs):
        # subject-completeness of a bucket holds only when every store
        # hashes subjects into the SAME bucket layout; otherwise the
        # whole-bucket pivot would silently drop cross-store star rows —
        # fall back to per-pattern joins (slower, always correct)
        return [], patterns
    fused, leftover = _group_star_patterns(patterns, lambda p: "store")
    gflt = None
    if graph is not None:
        gflt = pc.field("graph") == graph
    elif default_graph:
        gflt = pc.field("graph").is_null()

    def conj(expr):
        if gflt is None:
            return expr
        return gflt if expr is None else expr & gflt

    units = [
        _fused_store_star_unit(
            dirs, svar, items,
            row_filter=conj(_store_filter_pushdown_expr(items, filters)),
        )
        for svar, _scope, items in fused
    ]
    return units, leftover


def _bucket_names(store_dir: str) -> list[str]:
    import os

    return sorted(
        n
        for n in os.listdir(store_dir)
        if n.startswith("bucket=")
        and os.path.isdir(os.path.join(store_dir, n))
    )


def _buckets_aligned(dirs: list[str]) -> bool:
    """Do all stores share one bucket layout (same ``bucket=`` dirs,
    hence the same subject-hash partitioning)?  Required for federated
    star fusion: bucket *i* of the UNION graph is subject-complete iff
    it is bucket *i* of every member store."""
    names = [_bucket_names(d) for d in dirs]
    return all(n == names[0] for n in names[1:])


def _fused_store_star_unit(
    store_dir: str | list[str], svar: str, items: list[tuple[str, str]],
    row_filter=None,
) -> tuple[rd.Dataset, list[str], set[str]]:
    import os

    dirs = [store_dir] if isinstance(store_dir, str) else list(store_dir)
    preds = [p for p, _ in items]
    plan = tuple(items)
    obj_vars = [v for _, v in plan if isinstance(v, str)]
    new_vars = [svar] + obj_vars
    kinds = set(obj_vars)
    # federated union [graft extension]: one task reads the SAME bucket
    # from every member store (alignment checked by the caller), so the
    # union slice stays subject-complete and pivots exactly; duplicate
    # triples across stores dedup before the pivot (set semantics)
    bucket_groups = [
        [os.path.join(d, n) for d in dirs if os.path.isdir(os.path.join(d, n))]
        for n in sorted({b for d in dirs for b in _bucket_names(d)})
    ]
    if not bucket_groups:
        return (
            rd.from_arrow(_typed_empty_bindings(new_vars, kinds)),
            new_vars,
            kinds,
        )

    def read_pivot(batch: dict) -> pa.Table:
        parts: list[str] = []
        for grp in batch["dirs"]:
            for d in grp:
                d = str(d)
                parts.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
        if not parts:
            t = _empty()
        else:
            flt = pc.field("pred").isin(preds)
            if row_filter is not None:
                flt = flt & row_filter
            t = pads.dataset(parts).to_table(
                filter=flt,
                columns=["subj", "pred", "obj", "obj_kind"],
            )
        df = t.to_pandas()
        if len(batch["dirs"]) and len(batch["dirs"][0]) > 1:
            df = df.drop_duplicates(["subj", "pred", "obj", "obj_kind"])
        return _star_pivot(df, plan, svar)

    ds = rd.from_items([{"dirs": g} for g in bucket_groups]).map_batches(
        read_pivot, batch_format="numpy"
    )
    return ds, new_vars, kinds


def _typed_empty_bindings(vars_: list[str], kinds: set[str]) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], pa.string()) for _ in vars_]
        + [pa.array([], pa.uint8()) for _ in sorted(kinds)],
        names=list(vars_) + [f"__k_{v}" for v in sorted(kinds)],
    )


def _empty() -> pa.Table:
    from ..terms import TRIPLE_SCHEMA

    return pa.Table.from_arrays(
        [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
    )
