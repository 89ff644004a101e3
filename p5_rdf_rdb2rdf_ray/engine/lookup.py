"""Triple-pattern lookup with pushdown (SURVEY §2 #21c).

The reference's ``DirectMapping::Store->get_statements($s,$p,$o)`` decodes
bound terms back into table/column/PK constraints and issues a targeted
``SELECT … WHERE`` [R: DirectMapping/Store.pm :: sub get_statements]. Ours
decodes the subject IRI → (table, pk filter) and the predicate IRI →
(table, column), then runs the Direct Mapping restricted to that slice with
parquet predicate + projection pushdown — no full scan.
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


def get_statements(
    catalog: Catalog,
    subject: str | None = None,
    predicate: str | None = None,
    obj: str | None = None,
    obj_literal: str | None = None,
    base: str = "http://example.com/base/",
    distinct_buckets: int = 8,
    distinct: bool = False,
) -> rd.Dataset:
    """Lazy Dataset of DM triples matching the bound terms.

    ``distinct=False`` (default) skips the set-semantics shuffle — DM
    output is duplicate-free by construction (see the proof comment at
    the ``run_mapping`` call below). Pass ``distinct=True`` (with
    ``distinct_buckets``) only when declared PKs cannot be trusted.

    Pushdown [R: DirectMapping/Store.pm :: get_statements — bound subject →
    table+PK WHERE; bound predicate → table+column; bound object → value
    WHERE]:

    - bound ``subject`` → parquet row filter on the PK columns;
    - bound ``predicate`` → only that column's triples map is compiled;
    - bound object: ``obj_literal`` (lexical form) with a bound column
      predicate → ``WHERE col = value`` pushed to the parquet read;
      ``obj`` (an IRI) with a bound ``#ref-…`` predicate → decode the
      parent row node → WHERE on the child FK columns. An object bound
      WITHOUT a predicate falls back to a post-filter on the emitted term
      (the reference scans every column in that case too).
    """
    from .runner import run_mapping

    tables = None
    flt = None
    if subject is not None:
        dec = decode_subject(subject, base)
        if dec is None:
            return rd.from_arrow(_empty())
        table, kv = dec
        tables = [table]
        schema = catalog.schema(table)
        try:
            exprs = [
                pc.field(c) == _cast_value(schema, c, v) for c, v in kv.items()
            ]
        except _Uncastable:
            return rd.from_arrow(_empty())
        flt = exprs[0]
        for e in exprs[1:]:
            flt = flt & e
    if predicate is not None:
        decp = decode_predicate(predicate, base)
        if decp is not None:
            table, col = decp
            if tables is None:
                tables = [table]
            if obj_literal is not None:
                # bound literal object + bound column predicate → value WHERE
                schema = catalog.schema(table)
                try:
                    e = pc.field(col) == _cast_value(schema, col, obj_literal)
                except _Uncastable:
                    return rd.from_arrow(_empty())
                flt = e if flt is None else flt & e
        decr = decode_ref_predicate(predicate, base)
        if decr is not None:
            table, fk_cols = decr
            if tables is None:
                tables = [table]
            if obj is not None:
                # bound IRI object on a ref predicate → decode the parent
                # row node, constrain the child FK columns to its PK values
                deco = decode_subject(obj, base)
                if deco is None:
                    return rd.from_arrow(_empty())
                _ptable, pkv = deco
                if len(pkv) != len(fk_cols):
                    return rd.from_arrow(_empty())
                schema = catalog.schema(table)
                try:
                    for c, v in zip(fk_cols, pkv.values()):
                        e = pc.field(c) == _cast_value(schema, c, v)
                        flt = e if flt is None else flt & e
                except _Uncastable:
                    return rd.from_arrow(_empty())
    # an object bound WITHOUT a predicate gets no column pushdown — the
    # semantic gate below post-filters the emitted terms (the reference
    # scans every column in that case too)

    # compile over ALL tables so FK parents resolve; execute only the bound
    # table's map (if any)
    spec = direct_mapping(catalog, base=base)
    only_maps = tables
    if predicate is not None:
        # keep only matching predicate-object maps (type preds keep the map
        # with classes only)
        newmaps = {}
        for name, tm in spec.maps.items():
            pos = tuple(
                p for p in tm.pos if p.pred.constant == predicate
            )
            refs = tuple(r for r in tm.refs if r.pred.constant == predicate)
            classes = tm.classes if predicate.endswith("#type") else ()
            if pos or refs or classes:
                newmaps[name] = replace(tm, pos=pos, refs=refs, classes=classes)
        spec = MappingSpec(maps={**spec.maps, **newmaps}, base=spec.base)
        only_maps = sorted(newmaps) if only_maps is None else [
            t for t in only_maps if t in newmaps
        ]
        if not newmaps or not only_maps:
            return rd.from_arrow(_empty())

    if flt is not None:
        # filter pushdown: load the filtered slice into the catalog as an
        # in-memory table (point lookups are small by construction)
        table = tables[0]
        if table in catalog.tables:
            dset = pads.dataset(catalog.tables[table])
        else:
            files = catalog.files(table)
            fmt = "csv" if files[0].endswith(".csv") else "parquet"
            dset = pads.dataset(files, format=fmt)
        sliced = dset.to_table(filter=flt)
        catalog = Catalog(
            root=catalog.root,
            layouts=catalog.layouts,
            tables={**catalog.tables, table: sliced},
        )

    # No distinct stage: Direct-Mapping output is duplicate-free BY
    # CONSTRUCTION, so the set-semantics shuffle would be a no-op that
    # still moves every triple. Proof: subjects are row-unique (PK
    # template over a declared-unique key, or a per-physical-row skolem
    # bnode), and within one row every emitted triple has a distinct
    # predicate (rdf:type / one per column / one per FK with the child
    # columns encoded in the predicate; two FKs on the same child columns
    # mint different parent-table IRIs). Driver-side rdfs schema triples
    # are constants, not per-row. Assumes declared PKs actually hold —
    # the same trust the FK fast-path join already places in the layout.
    out = run_mapping(
        spec,
        catalog,
        distinct=distinct,
        distinct_buckets=distinct_buckets,
        only_maps=only_maps,
    )

    # exact semantic gate on a bound object: the parquet value-WHERE above
    # is an optimization; the emitted term must still equal the bound term
    # (lexical canon, term kind). Cheap — runs on the already-pruned slice.
    if obj is not None or obj_literal is not None:
        from ..terms import KIND_LITERAL

        if obj is not None:
            want, want_kind = obj, None  # IRI or bnode label
        else:
            want, want_kind = obj_literal, KIND_LITERAL

        def keep(t: pa.Table, _w=want, _k=want_kind) -> pa.Table:
            m = pc.equal(t.column("obj"), _w)
            if _k is not None:
                m = pc.and_(m, pc.equal(t.column("obj_kind"), _k))
            else:
                m = pc.and_(m, pc.not_equal(t.column("obj_kind"), KIND_LITERAL))
            return t.filter(pc.fill_null(m, False))

        out = out.map_batches(keep, batch_format="pyarrow")
    return out


def count_statements(
    catalog: Catalog,
    subject: str | None = None,
    predicate: str | None = None,
    obj: str | None = None,
    obj_literal: str | None = None,
    base: str = "http://example.com/base/",
) -> int:
    """Number of DM triples matching the bound terms
    [R: DirectMapping/Store.pm :: count_statements] — a ``count()`` over
    the lazy lookup Dataset (same pushdown, never materializes triples)."""
    return get_statements(
        catalog,
        subject=subject,
        predicate=predicate,
        obj=obj,
        obj_literal=obj_literal,
        base=base,
        distinct_buckets=2,
    ).count()


def _is_var(t) -> bool:
    return isinstance(t, str) and t.startswith("?")


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
    expr = None
    for var, op, val in filters:
        v = var.lstrip("?")
        col = var_col.get(v)
        if col is None or op not in _PUSH_OPS or col not in schema.names:
            continue
        typ = schema.field(col).type
        numeric = pa.types.is_integer(typ) or pa.types.is_floating(typ)
        if isinstance(val, bool):
            continue
        if isinstance(val, (int, float)) and not numeric:
            continue  # numeric compare on a string column: lexical vs
            # numeric semantics diverge — binding filter only
        if isinstance(val, str) and not pa.types.is_string(typ):
            continue
        e = _cmp_expr(pc.field(col), op, val)
        expr = e if expr is None else expr & e
    return expr


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


def get_pattern(
    catalog: Catalog,
    patterns: list[tuple],
    base: str = "http://example.com/base/",
    num_partitions: int = 4,
    filters: list[tuple] | None = None,
    optional: list[tuple] | None = None,
    minus: list[tuple] | None = None,
    not_exists: list[tuple] | None = None,
    values: tuple[list[str], list[tuple]] | None = None,
    bind: list[tuple] | None = None,
    paths: list[tuple] | None = None,
    order_by: list | None = None,
    limit: int | None = None,
    offset: int = 0,
    broadcast_limit: int = 1_000_000,
    keep_kinds: bool = False,
) -> rd.Dataset:
    """Basic-graph-pattern matching over the Direct Mapping — the
    reference Store's ``get_pattern`` surface [R: DirectMapping/Store.pm
    :: get_pattern]: a list of (s, p, o) triple patterns where each term
    is a bound IRI string, ``("lit", value)`` for a bound literal object,
    or a ``"?var"``. Returns a Dataset of DISTINCT variable bindings (one
    column per variable, ``?`` stripped; subject/predicate vars bind
    IRIs, object vars bind the term lexical form).

    Execution: each pattern runs through :func:`get_statements` (so every
    bound term gets its parquet pushdown), then patterns join on shared
    variables via broadcast inner joins (intermediates are
    pushdown-pruned; for analytics-sized BGPs use the engine's hash
    joins instead).

    Joins are on RDF TERMS, not bare lexical strings: an object-variable
    binding carries its ``obj_kind`` in a hidden ``__k_<var>`` column, so
    a literal whose lexical form happens to spell an IRI (e.g. a string
    column holding a DM row-node URL) never joins an IRI binding. Subject/
    predicate bindings are implicitly non-literal; joining one against an
    object binding filters the object side to non-literals first (IRI vs
    bnode then disambiguate by the ``_:`` prefix, which no IRI can carry).
    """

    def stmt_fn(**kwargs):
        return get_statements(
            catalog, base=base, distinct_buckets=num_partitions, **kwargs
        )

    units, rest = _star_groups(catalog, patterns, base, filters=filters)
    if paths:
        # §9.1 property-path items over the DM VIRTUAL graph — the path
        # evaluator's (catalog, base) source; folds like any other unit
        units = list(units) + [
            _path_unit((catalog, base), s, p, o, num_partitions)
            for (s, p, o) in paths
        ]
    if values:
        # VALUES folds LAST: the inline table is tiny and must join
        # into the accumulator as a broadcast side — putting it first
        # would make it the accumulator and force the (large) pattern
        # sides through the driver collect instead
        units = list(units) + [_values_unit(*values)]
    o_units, o_rest = (
        _star_groups(catalog, optional, base) if optional else ([], [])
    )
    negs = [
        (mode, *reversed(_star_groups(catalog, grp, base)))
        for mode, grp in (("minus", minus), ("not_exists", not_exists))
        if grp
    ]
    out = _bgp_join(
        stmt_fn, rest, num_partitions, filters=filters, units=units,
        optional=o_rest, optional_units=o_units, negations=negs,
        bind=bind, broadcast_limit=broadcast_limit, keep_kinds=keep_kinds,
    )
    return apply_solution_modifiers(out, order_by, limit, offset)


def get_pattern_union(
    catalog: Catalog,
    groups: list[list[tuple]],
    base: str = "http://example.com/base/",
    num_partitions: int = 4,
    filters: list[tuple] | None = None,
) -> rd.Dataset:
    """SPARQL-UNION-shaped alternation over the Direct Mapping [graft
    extension]: the DISTINCT solutions of ANY group, aligned on the
    union of the groups' variables (a variable absent from a group is
    NULL in that group's solutions). Each group plans independently
    (star fusion included); alignment is map-only; one final distinct.

    Term-kind alignment: a variable that carries a kind column in some
    group gets one in every group that binds it — filled from the
    binding's surface form (``_:`` prefix = bnode, else IRI; subject/
    predicate positions never bind literals) — so identical terms from
    different groups collapse in the distinct.
    """

    def stmt_fn(**kwargs):
        return get_statements(
            catalog, base=base, distinct_buckets=num_partitions, **kwargs
        )

    def plan_group(pats):
        return _star_groups(catalog, pats, base)

    return _bgp_union(stmt_fn, plan_group, groups, num_partitions, filters)


def get_pattern_store_union(
    store_dir: str | list[str],
    groups: list[list[tuple]],
    num_partitions: int = 4,
    filters: list[tuple] | None = None,
) -> rd.Dataset:
    """:func:`get_pattern_union` served from a materialized store (the
    store star fusion and pushdown of :func:`get_pattern_store`); a
    LIST of store dirs unions federated members per pattern."""
    from ..sinks.triplestore import store_statements

    dirs = [store_dir] if isinstance(store_dir, str) else list(store_dir)

    def stmt_fn(**kwargs):
        out = store_statements(dirs[0], **kwargs)
        for d in dirs[1:]:
            out = out.union(store_statements(d, **kwargs))
        return out

    def plan_group(pats):
        return _store_star_groups(store_dir, pats)

    return _bgp_union(stmt_fn, plan_group, groups, num_partitions, filters)


def _bgp_union(
    stmt_fn,
    plan_group,
    groups: list[list[tuple]],
    num_partitions: int,
    filters: list[tuple] | None,
) -> rd.Dataset:
    from ..terms import KIND_BNODE, KIND_IRI
    from .distinct import distinct_rows

    parts: list[tuple[rd.Dataset, list[str], set[str]]] = []
    for pats in groups:
        units, rest = plan_group(pats)
        acc, vars_, kinds = _bgp_acc(stmt_fn, rest, num_partitions, units)
        if acc is _NO_MATCH or acc is None:
            continue
        parts.append((acc, vars_, kinds))
    if not parts:
        return rd.from_arrow(pa.table({}))

    all_vars = list(dict.fromkeys(v for _, vs, _k in parts for v in vs))
    all_kinds = sorted(set().union(*(k for _, _v, k in parts)))

    def align(t: pa.Table, _vars, _kinds) -> pa.Table:
        cols, names = [], []
        for v in all_vars:
            if v in _vars:
                cols.append(t.column(v).combine_chunks() if t.num_rows
                            else pa.array([], pa.string()))
            else:
                cols.append(pa.nulls(t.num_rows, pa.string()))
            names.append(v)
        for v in all_kinds:
            kc = f"__k_{v}"
            if v in _kinds:
                arr = (t.column(kc).combine_chunks() if t.num_rows
                       else pa.array([], pa.uint8()))
            elif v in _vars:
                # bound in a non-literal position: derive kind from the
                # surface form so cross-group identical terms collapse
                s = cols[names.index(v)]
                arr = pc.if_else(
                    pc.starts_with(pc.fill_null(s, ""), "_:"),
                    pa.scalar(KIND_BNODE, pa.uint8()),
                    pa.scalar(KIND_IRI, pa.uint8()),
                )
                arr = pc.if_else(pc.is_valid(s), arr, pa.nulls(len(s), pa.uint8()))
            else:
                arr = pa.nulls(t.num_rows, pa.uint8())
            cols.append(arr)
            names.append(kc)
        return pa.Table.from_arrays(cols, names=names)

    aligned = [
        acc.map_batches(
            lambda t, _v=tuple(vs), _k=frozenset(ks): align(t, _v, _k),
            batch_format="pyarrow",
        )
        for acc, vs, ks in parts
    ]
    out = aligned[0] if len(aligned) == 1 else aligned[0].union(*aligned[1:])
    if filters:
        out = _apply_binding_filters(out, filters)
    kind_cols = [f"__k_{v}" for v in all_kinds]
    out = distinct_rows(out, all_vars + kind_cols, num_buckets=num_partitions)
    if kind_cols:
        out = out.map_batches(
            lambda t, _k=tuple(kind_cols): t.drop_columns(list(_k)),
            batch_format="pyarrow",
        )
    return out


def get_pattern_store(
    store_dir: str | list[str],
    patterns: list[tuple],
    num_partitions: int = 4,
    filters: list[tuple] | None = None,
    optional: list[tuple] | None = None,
    minus: list[tuple] | None = None,
    not_exists: list[tuple] | None = None,
    values: tuple[list[str], list[tuple]] | None = None,
    bind: list[tuple] | None = None,
    paths: list[tuple] | None = None,
    order_by: list | None = None,
    limit: int | None = None,
    offset: int = 0,
    broadcast_limit: int = 1_000_000,
    keep_kinds: bool = False,
) -> rd.Dataset:
    """:func:`get_pattern` served from a MATERIALIZED triple store
    (``sinks/triplestore.py``) instead of the source tables: each
    pattern's bound terms become bucket pruning (bound subject → one
    ``bucket=`` dir) + parquet row filters via ``store_statements``; the
    BGP join machinery (term-kind-aware broadcast joins + distinct) is
    shared. Same-subject-var pattern groups fuse into one scan: the
    store partitions by subject hash, so whole buckets are
    subject-complete and pivot exactly (see :func:`_store_star_groups`).

    FEDERATED form [graft extension]: ``store_dir`` may be a LIST of
    store directories — the query runs over the UNION graph (the
    100-TB deployment shape: a compacted base plus daily deltas queried
    live before the next ``merge_triplestore``). Every pattern scans
    each member with full pushdown; identical triples across members
    collapse in the solution distinct. Star fusion stays active when
    the members share one bucket layout (same subject-hash
    partitioning — one task reads the same bucket from every store);
    with mismatched layouts it falls back to per-pattern joins, slower
    but exact.
    """
    from ..sinks.triplestore import store_statements

    dirs = [store_dir] if isinstance(store_dir, str) else list(store_dir)
    if not dirs:
        raise ValueError("get_pattern_store needs at least one store dir")

    def stmt_fn(**kwargs):
        out = store_statements(dirs[0], **kwargs)
        for d in dirs[1:]:
            out = out.union(store_statements(d, **kwargs))
        return out

    units, rest = _store_star_groups(store_dir, patterns, filters=filters)
    if paths:
        # §9.1 property-path items: each becomes one binding unit whose
        # relation is the distributed path evaluation (seq = one co-hash
        # join, closures = path doubling); folds with the ordinary
        # patterns on shared variables like any other side
        units = list(units) + [
            _path_unit(store_dir, s, p, o, num_partitions)
            for (s, p, o) in paths
        ]
    if values:
        units = list(units) + [_values_unit(*values)]  # fold LAST (tiny)
    o_units, o_rest = (
        _store_star_groups(store_dir, optional) if optional else ([], [])
    )
    negs = [
        (mode, *reversed(_store_star_groups(store_dir, grp)))
        for mode, grp in (("minus", minus), ("not_exists", not_exists))
        if grp
    ]
    out = _bgp_join(
        stmt_fn, rest, num_partitions, filters=filters, units=units,
        optional=o_rest, optional_units=o_units, negations=negs,
        bind=bind, broadcast_limit=broadcast_limit, keep_kinds=keep_kinds,
    )
    return apply_solution_modifiers(out, order_by, limit, offset)


def ask(bindings: rd.Dataset) -> bool:
    """SPARQL ASK result form [graft extension — the reference delegates
    query forms to RDF::Query, recalled]: does at least one solution
    exist? ``limit(1)`` lets the streaming executor stop early — upstream
    operators cancel once one row reaches the limit; nothing
    materializes beyond a single block."""
    return bindings.limit(1).count() > 0


def describe_store(
    store_dir: str | list[str],
    nodes: list[str] | str,
    max_depth: int = 8,
) -> rd.Dataset:
    """SPARQL DESCRIBE as a Concise Bounded Description (CBD) over a
    MATERIALIZED store [graft extension; result-form analogue of the
    reference Store's bounded iteration — recalled]: each node's
    outgoing triples, recursively following BLANK-NODE objects (a bnode
    label is scoped to the graph, so its triples belong in the
    description; IRI objects do not recurse).

    Distribution: every level is a union of bucket-pruned point lookups
    (bound subject → one ``bucket=`` dir + parquet row filter). The only
    driver-side state is the bnode frontier — the size of ONE node's
    description, never the corpus. Each level materializes only its
    distinct bnode-object labels to compute the next frontier; the
    returned Dataset re-plans the (cheap, pruned) point lookups lazily.
    ``max_depth`` caps bnode-chain recursion (cycle-safe via a seen-set
    regardless). A LIST of store dirs describes over the federated
    union (every point lookup fans across the members)."""
    from ..sinks.triplestore import store_statements
    from ..terms import KIND_BNODE

    dirs = [store_dir] if isinstance(store_dir, str) else list(store_dir)
    if isinstance(nodes, str):
        nodes = [nodes]
    if not nodes:
        raise ValueError("describe_store needs at least one node")

    def point(subject: str) -> rd.Dataset:
        lv = store_statements(dirs[0], subject=subject)
        for d in dirs[1:]:
            lv = lv.union(store_statements(d, subject=subject))
        return lv

    seen: set[str] = set(nodes)
    frontier = list(dict.fromkeys(nodes))
    out: rd.Dataset | None = None
    for _ in range(max_depth + 1):
        if not frontier:
            break
        level = point(frontier[0])
        for s in frontier[1:]:
            level = level.union(point(s))
        out = level if out is None else out.union(level)
        # next frontier: the level's distinct bnode objects (tiny —
        # bounded by the description itself, so a driver collect is safe)
        bn = (
            level.map_batches(
                lambda t: t.filter(
                    pc.equal(t.column("obj_kind"), KIND_BNODE)
                ).select(["obj"]),
                batch_format="pyarrow",
            )
            .unique("obj")
        )
        # Ray 2.49 Dataset.unique returns None for an all-empty dataset
        frontier = [o for o in (bn or []) if o not in seen]
        seen.update(frontier)
    assert out is not None  # nodes is non-empty or ValueError below
    if len(dirs) > 1:
        # each member store is duplicate-free, but the same triple may
        # live in several members — restore graph set semantics
        from ..terms import TRIPLE_SCHEMA
        from .distinct import distinct_rows

        out = distinct_rows(out, [f.name for f in TRIPLE_SCHEMA])
    return out


def describe(
    catalog: Catalog,
    nodes: list[str] | str,
    base: str = "http://example.com/base/",
) -> rd.Dataset:
    """DESCRIBE over the Direct-Mapping surface: the union of each
    node's outgoing triples (pushdown point lookups). DM objects are
    IRIs or literals — never blank nodes (bnode subjects arise only for
    PK-less tables, which cannot be FK targets) — so the CBD closure is
    the subject's own triples; no recursion by construction."""
    if isinstance(nodes, str):
        nodes = [nodes]
    if not nodes:
        raise ValueError("describe needs at least one node")
    # a DESCRIBE result is an RDF graph (set semantics): dedup the
    # request so a repeated node doesn't duplicate its triples
    nodes = list(dict.fromkeys(nodes))
    out = get_statements(catalog, subject=nodes[0], base=base)
    for n in nodes[1:]:
        out = out.union(get_statements(catalog, subject=n, base=base))
    return out


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
    expr = None
    for var, op, val in filters:
        p = var_pred.get(var.lstrip("?"))
        if (
            p is None
            or op not in _PUSH_OPS
            or not isinstance(val, str)
            or isinstance(val, bool)
        ):
            continue
        e = (pc.field("pred") != p) | _cmp_expr(pc.field("obj"), op, val)
        expr = e if expr is None else expr & e
    return expr


def _store_star_groups(
    store_dir: str, patterns: list[tuple],
    filters: list[tuple] | None = None,
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
    units = [
        _fused_store_star_unit(
            dirs, svar, items,
            row_filter=_store_filter_pushdown_expr(items, filters),
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


_FILTER_OPS = {
    "==": "eq", "!=": "ne", "<": "lt", "<=": "le", ">": "gt", ">=": "ge",
}


def _apply_binding_filters(acc: rd.Dataset, filters: list[tuple]) -> rd.Dataset:
    """SPARQL-FILTER-style constraints over variable bindings, applied
    BEFORE the final distinct (fewer rows through the shuffle). Each
    filter is ``("?var", op, value)`` with op in ``== != < <= > >=``; a
    numeric ``value`` compares numerically (bindings whose lexical form
    is not a number drop, mirroring SPARQL type-error semantics), a
    string ``value`` compares lexically. [graft extension beyond the
    reference Store's BGP surface]"""
    spec = []
    for var, op, val in filters:
        if op not in _FILTER_OPS:
            raise ValueError(f"unsupported filter op {op!r}")
        spec.append((var.lstrip("?"), _FILTER_OPS[op], val))

    def f(t: pa.Table) -> pa.Table:
        # Arrow in/out: this stage feeds the final distinct's hash
        # shuffle, and a pandas round-trip would widen nullable uint8
        # __k_* kind columns to float64 ONLY in blocks containing NULLs
        # (possible with OPTIONAL groups) — identical solutions would
        # then hash into different partitions and survive the distinct.
        # Only the filtered VARIABLE columns (always strings) go through
        # pandas, for the mask computation alone.
        import numpy as np
        import pandas as pd

        if t.num_rows == 0:
            return t
        keep = np.ones(t.num_rows, bool)
        for var, op, val in spec:
            s = t.column(var).to_pandas()
            # SPARQL type-error semantics: an unbound (NULL — possible
            # for OPTIONAL-group vars) binding never passes a FILTER
            keep &= s.notna().to_numpy()
            if isinstance(val, bool) or not isinstance(val, (int, float)):
                keep &= getattr(s.astype(str), op)(str(val)).to_numpy()
            else:
                num = pd.to_numeric(s, errors="coerce")
                keep &= (
                    getattr(num, op)(val).fillna(False) & num.notna()
                ).to_numpy()
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
#   ("concat", a, b, ...)       -> string concatenation (NULL-propagating)
#   ("strlen", a) ("ucase", a) ("lcase", a)
#   ("substr", a, start[, len]) -> SPARQL 1-based substring
#   ("replace", a, pat, repl)   -> regex replace
#   ("+"|"-"|"*"|"/", a, b)     -> numeric (lexical forms parse numerically;
#                                  a non-numeric binding yields NULL = the
#                                  SPARQL expression-error -> unbound rule)
#   ("iri", a)                  -> the value binds as an IRI, not a literal
#   ("if", ("?v", cmp, val), then, else) -> SPARQL IF (FILTER-semantics
#                                  condition; erroring condition -> unbound)
#   ("coalesce", a, b, ...)     -> first non-unbound value
_BIND_ARITH = {"+", "-", "*", "/"}


def _bind_vars_of(expr) -> set[str]:
    if isinstance(expr, str) and expr.startswith("?"):
        return {expr[1:]}
    if isinstance(expr, tuple):
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
    for s, p, o in patterns:
        kwargs: dict = {}
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
    from ..terms import KIND_BNODE, KIND_IRI

    kc = f"__k_{var}"

    def f(t: pa.Table) -> pa.Table:
        s = (
            t.column(var).combine_chunks()
            if t.num_rows
            else pa.array([], pa.string())
        )
        arr = pc.if_else(
            pc.starts_with(pc.fill_null(s, ""), "_:"),
            pa.scalar(KIND_BNODE, pa.uint8()),
            pa.scalar(KIND_IRI, pa.uint8()),
        )
        arr = pc.if_else(pc.is_valid(s), arr, pa.nulls(len(s), pa.uint8()))
        return t.append_column(kc, arr)

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
) -> tuple[rd.Dataset, bool]:
    """One SPARQL negation group (MINUS / FILTER NOT EXISTS) applied to
    the accumulated required bindings [graft extension beyond the
    reference Store's BGP surface — SPARQL 1.1 §8 shapes].

    With shared variables (the common case) both forms coincide for
    fully-bound group solutions: an ANTI SEMI-JOIN on the shared
    variables — solutions whose shared-variable values appear in the
    group's solution set drop. Distributed exactly like the positive
    joins: the group's DISTINCT key projection broadcasts up to
    ``broadcast_limit`` rows (Acero ``left anti`` per batch, no
    shuffle); past the limit it spills to the engine's union-tag
    co-hash-shuffle join with a match-marker filter (one shuffle, no
    driver copy).

    Without shared variables the two forms diverge per SPARQL 1.1:
    ``minus`` is a no-op (disjoint domains are never compatible —
    §8.3.3), ``not_exists`` is a global existence gate (group matched
    anything → every solution drops).

    NULL shared-variable bindings (possible after OPTIONAL) never match
    — SQL join semantics — which coincides with MINUS' bound-variable
    compatibility rule when the NULL variable is the only shared one.

    Returns ``(acc, empty)``; ``empty=True`` short-circuits to no
    solutions (the NOT-EXISTS global gate fired).
    """
    import ray

    from .distinct import _unique_batch

    if mode not in ("minus", "not_exists"):
        raise ValueError(f"unknown negation mode {mode!r}")
    nacc, nvars, nkinds = _bgp_acc(
        stmt_fn, n_pats, num_partitions, n_units, broadcast_limit
    )
    if nacc is _NO_MATCH:
        return acc, False  # group can match nothing → negation is a no-op
    if nacc is None:
        raise ValueError("empty negation group")
    shared = [v for v in nvars if v in acc_vars]
    if not shared:
        if mode == "minus":
            # SPARQL MINUS §8.3.3: disjoint domains are never compatible
            return acc, False
        # NOT EXISTS: the group is independent of each solution — one
        # match anywhere eliminates everything (tiny limit(1) probe, not
        # a full count)
        return acc, nacc.limit(1).count() > 0

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
        acc = acc.map_batches(
            lambda t, _m=marker: t.filter(
                pc.is_null(t.column(_m))
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
                "join_type": "left anti",
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


def _typed_empty_bindings(vars_: list[str], kinds: set[str]) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], pa.string()) for _ in vars_]
        + [pa.array([], pa.uint8()) for _ in sorted(kinds)],
        names=list(vars_) + [f"__k_{v}" for v in sorted(kinds)],
    )


def _bgp_join(
    stmt_fn,
    patterns: list[tuple],
    num_partitions: int,
    filters: list[tuple] | None = None,
    units: list[tuple[rd.Dataset, list[str], set[str]]] | None = None,
    broadcast_limit: int = 1_000_000,
    optional: list[tuple] | None = None,
    optional_units: list[tuple[rd.Dataset, list[str], set[str]]] | None = None,
    negations: list[tuple[str, list[tuple], list | None]] | None = None,
    bind: list[tuple] | None = None,
    keep_kinds: bool = False,
) -> rd.Dataset:
    """Required BGP ⟕ optional BGP group → negations → BIND → FILTER →
    distinct bindings.

    ``keep_kinds=True`` retains the hidden ``__k_<var>`` term-kind
    columns on the output (consumed by :mod:`engine.construct`, which
    must distinguish literal from IRI bindings to emit valid RDF).

    ``negations`` is a list of ``(mode, patterns, units)`` groups with
    mode ``"minus"`` or ``"not_exists"`` — see :func:`_bgp_anti` for the
    SPARQL 1.1 §8 semantics and the anti-join distribution strategy.

    ``optional`` (+ ``optional_units``) form ONE left-outer group
    [graft extension beyond the reference Store's BGP surface —
    SPARQL-OPTIONAL-shaped]: required solutions keep their row when the
    group matches nothing, with the group's exclusive variables NULL.
    Restriction (raises ValueError): every shared variable must carry
    term-kind visibility on BOTH sides or NEITHER — a mixed pair cannot
    be joined term-correctly without splitting required rows.
    """
    import ray

    from .distinct import distinct_rows

    acc, acc_vars, acc_kinds = _bgp_acc(
        stmt_fn, patterns, num_partitions, units, broadcast_limit
    )
    if acc is _NO_MATCH or acc is None:
        return rd.from_arrow(pa.table({}))

    if optional or optional_units:
        oacc, ovars, okinds = _bgp_acc(
            stmt_fn, optional or [], num_partitions, optional_units,
            broadcast_limit,
        )
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
            shared = [v for v in ovars if v in acc_vars]
            for v in shared:
                if (v in acc_kinds) != (v in okinds):
                    raise ValueError(
                        f"optional group shares ?{v} with mixed term-kind "
                        "visibility; bind it in a non-literal position on "
                        "both sides (or an object position on both)"
                    )
            if not shared:
                raise ValueError(
                    "optional group shares no variable with the required "
                    "patterns (a left cross product is never intended)"
                )
            join_keys = list(shared) + [
                f"__k_{v}" for v in shared if v in okinds
            ]
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
                    else _typed_empty_bindings(ovars, okinds)
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

    for mode, n_pats, n_units in negations or []:
        acc, empty = _bgp_anti(
            acc, acc_vars, acc_kinds, stmt_fn, mode, n_pats, n_units,
            num_partitions, broadcast_limit,
        )
        if empty:  # NOT-EXISTS global gate fired: no solutions survive
            acc = acc.limit(0)
            break

    if bind:
        acc, bvars, bkinds = _extend_bindings(acc, bind, acc_vars)
        acc_vars = list(dict.fromkeys(acc_vars + bvars))
        acc_kinds |= bkinds
    if filters:
        acc = _apply_binding_filters(acc, filters)
    if "__path_probe" in acc_vars and len(acc_vars) > 1:
        # a fully-bound path probe contributed existence only; its
        # internal all-null column must not leak into the solutions
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


def _empty() -> pa.Table:
    from ..terms import TRIPLE_SCHEMA

    return pa.Table.from_arrays(
        [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
    )

# --------------------------------------------------------------------------
# R2RML / Simple point lookup (rr:inverseExpression consumer, W3C §7.7)
# --------------------------------------------------------------------------

def _sql_quote(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _sql_ident(c: str) -> str:
    return '"' + c.replace('"', '""') + '"'


def _instantiate_inverse(expr: str, bindings: dict[str, str]) -> str:
    """Instantiate an rr:inverseExpression (W3C-R2RML §7.7): '{col}' refs
    whose column was recovered by template/column inversion become SQL
    string literals of the recovered value (the logical table's SQL engine
    coerces types, matching the spec's "SQL literal of the value"); refs to
    any OTHER column become quoted identifiers, so the instantiated string
    is a boolean WHERE expression over the logical table."""
    from ..functions.scalars import Template

    t = Template(expr)
    out: list[str] = []
    for kind, s in t.segments:
        if kind == "lit":
            out.append(s)
        elif s in bindings:
            out.append(_sql_quote(bindings[s]))
        else:
            out.append(_sql_ident(s))
    return "".join(out)


def r2rml_lookup(
    spec: MappingSpec,
    catalog: Catalog,
    subject: str,
    *,
    distinct_buckets: int = 8,
) -> rd.Dataset:
    """All triples of one bound subject under an arbitrary R2RML / Simple
    mapping, with per-map read pruning — the generalization of
    :func:`get_statements`'s bound-subject path beyond the Direct Mapping
    [R: the reference exposes Store lookups for DM only; R2RML.pm relies on
    rr:inverseExpression for this per W3C §7.7].

    Per triples map, the subject term map is INVERTED against the bound
    term to recover column bindings (``Template.match``; a column-valued
    subject binds its column to the term's lexical form; a constant subject
    matches by equality). Then:

    - ``rr:inverseExpression`` present → instantiate it (§7.7, see
      :func:`_instantiate_inverse`) and run the logical table through the
      catalog's SQL path with that WHERE — this sees through SQL
      transformations plain template inversion can't (e.g. a column built
      by string concatenation).
    - otherwise, base table → conjunctive equality filters pushed to the
      parquet scan; SQL logical table → equality WHERE wrapped around it.
    - non-invertible subjects (udf / skolem) → the map runs unpruned.

    Inversion is an OPTIMIZATION, never the semantics: an exact gate keeps
    only rows whose regenerated subject equals the bound term, so ambiguous
    templates stay correct (just less pruned). Maps whose subject cannot
    have produced the term are skipped entirely.
    """
    from ..functions.scalars import Template
    from ..mapping.spec import BNODE, IRI
    from .runner import run_mapping

    want_bnode = subject.startswith("_:")
    lex = subject[2:] if want_bnode else subject

    run_names: list[str] = []
    new_maps = dict(spec.maps)
    new_tables = dict(catalog.tables)

    for name, tm in spec.maps.items():
        sub = tm.subject
        if (sub.kind == BNODE) != want_bnode:
            continue
        bindings: dict[str, str] | None = None
        prune = True
        if sub.constant is not None:
            const = sub.constant.removeprefix("_:") if want_bnode else sub.constant
            if const != lex:
                continue
            bindings, prune = {}, False  # every row of the map qualifies
        elif sub.template is not None:
            bindings, unique = Template(sub.template).match_detail(
                lex, iri_safe=(sub.kind in (IRI, BNODE))
            )
            if bindings is None:
                continue  # no fill of this template can produce the term
            if not unique:
                # another row with a different split could generate the
                # same term — pruning on THESE bindings would miss it; run
                # the map unpruned and let the exact gate do the work
                prune = False
        elif sub.column is not None:
            bindings = {sub.column: lex}
        else:
            prune = False  # udf / skolem subject: run unpruned, gate below

        if prune and bindings:
            if sub.inverse_expression is not None:
                cond = _instantiate_inverse(sub.inverse_expression, bindings)
                inner = (
                    f"({tm.sql.rstrip().rstrip(';')})"
                    if tm.sql is not None
                    else _sql_ident(tm.table)
                )
                new_maps[name] = replace(
                    tm, sql=f"SELECT * FROM {inner} AS __t WHERE {cond}"
                )
            elif tm.sql is not None:
                cond = " AND ".join(
                    f"{_sql_ident(c)} = {_sql_quote(v)}"
                    for c, v in bindings.items()
                )
                new_maps[name] = replace(
                    tm,
                    sql=f"SELECT * FROM ({tm.sql.rstrip().rstrip(';')}) "
                    f"AS __t WHERE {cond}",
                )
            else:
                schema = catalog.schema(tm.table)
                try:
                    exprs = [
                        pc.field(c) == _cast_value(schema, c, v)
                        for c, v in bindings.items()
                        if c in schema.names
                    ]
                except _Uncastable:
                    continue  # term can't come from this table's values
                if len(exprs) < len(bindings):
                    continue  # template references a missing column
                flt = exprs[0]
                for e in exprs[1:]:
                    flt = flt & e
                if tm.table in catalog.tables:
                    dset = pads.dataset(catalog.tables[tm.table])
                else:
                    files = catalog.files(tm.table)
                    fmt = "csv" if files[0].endswith(".csv") else "parquet"
                    dset = pads.dataset(files, format=fmt)
                # point lookups are small by construction; the slice rides
                # into every task as an in-memory table. Registered under a
                # PER-MAP synthetic name: keying by tm.table would let two
                # maps over the same base table clobber each other's slice
                # (and an unpruned sibling map would wrongly read a pruned
                # slice instead of the full table)
                syn = f"__lookup_{name}"
                new_tables[syn] = dset.to_table(filter=flt)
                new_maps[name] = replace(tm, table=syn)
        run_names.append(name)

    if not run_names:
        return rd.from_arrow(_empty())

    spec2 = MappingSpec(
        maps=new_maps, base=spec.base, namespaces=spec.namespaces
    )
    cat2 = Catalog(
        root=catalog.root, layouts=catalog.layouts, tables=new_tables
    )
    out = run_mapping(
        spec2, cat2, distinct_buckets=distinct_buckets, only_maps=run_names
    )

    def keep(t: pa.Table, _s=subject) -> pa.Table:
        return t.filter(
            pc.fill_null(pc.equal(t.column("subj"), _s), False)
        )

    return out.map_batches(keep, batch_format="pyarrow")
