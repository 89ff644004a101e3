"""Triple-pattern lookup with pushdown (SURVEY §2 #21c).

The reference's ``DirectMapping::Store->get_statements($s,$p,$o)`` decodes
bound terms back into table/column/PK constraints and issues a targeted
``SELECT … WHERE`` [R: DirectMapping/Store.pm :: sub get_statements]. Ours
decodes the subject IRI → (table, pk filter) and the predicate IRI →
(table, column), then runs the Direct Mapping restricted to that slice with
parquet predicate + projection pushdown — no full scan.
"""

from __future__ import annotations

from dataclasses import replace

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data as rd

from ..mapping.direct import direct_mapping
from ..mapping.spec import MappingSpec
from ..sources.catalog import Catalog

from .bgp_algebra import (  # noqa: F401  (re-exported public surface)
    _NO_MATCH,
    _apply_binding_filters,
    _bgp_acc,
    _bgp_join,
    _path_unit,
    _values_unit,
    apply_solution_modifiers,
    ask,
)
from .bgp_plan import (  # noqa: F401
    _Uncastable,
    _filter_pushdown_expr,
    _cast_value,
    _empty,
    _is_var,
    _star_groups,
    _star_pivot,
    _store_star_groups,
    LANG_FILTER_OPS,
    subject_tables,
    decode_predicate,
    decode_ref_predicate,
    decode_subject,
)


def _lang_filter_guard(
    lang_filters: list[tuple],
    patterns: list[tuple],
    *,
    paths=None,
    optional=None,
    minus=None,
    not_exists=None,
    exists=None,
    values=None,
    bind=None,
    graph_var=None,
) -> None:
    """Fail loud unless every LANG()/DATATYPE() FILTER atom is exactly
    consumable at a store star scan: its variable's ONLY binder in the
    whole query is one ``?s <pred> ?v`` pattern whose bound predicate
    no other pattern uses (then restricting that pattern's scan IS the
    solution filter — the pattern is the sole source of ``?v``
    bindings). Any other shape — a second binder, a variable/bound
    subject or predicate, the variable reappearing in an
    OPTIONAL/MINUS/(NOT) EXISTS group, a path endpoint, VALUES or BIND
    — would make the scan restriction diverge from SPARQL's
    filter-after-join semantics, so it raises instead."""
    from collections import Counter

    def err(v: str, why: str):
        raise NotImplementedError(
            f"LANG()/DATATYPE() FILTER on {v} needs exactly one binding "
            f"pattern `?s <pred> {v}` whose predicate no other pattern "
            f"uses (the filter is consumed at that pattern's store "
            f"scan); got: {why}"
        )

    group_vars: set[str] = set()
    for grp in (minus, not_exists, exists):
        for p in grp or []:
            group_vars.update(x for x in p if isinstance(x, str)
                              and x.startswith("?"))
    for pats, _f in _optional_as_groups(optional):
        for p in pats:
            group_vars.update(x for x in p if isinstance(x, str)
                              and x.startswith("?"))
    pred_uses = Counter(
        p for _s, p, _o in patterns
        if isinstance(p, str) and not p.startswith("?")
    )
    for v, _op, _val in lang_filters:
        if graph_var is not None:
            err(v, "GRAPH ?var bypasses star fusion")
        binders = [pt for pt in patterns if pt[2] == v]
        if len(binders) != 1:
            err(v, f"{len(binders)} object bindings in the group")
        s, p, _o = binders[0]
        if not (isinstance(p, str) and not p.startswith("?")):
            err(v, "variable predicate")
        if pred_uses[p] != 1:
            err(v, f"predicate used by {pred_uses[p]} patterns")
        if not (isinstance(s, str) and s.startswith("?")):
            err(v, "bound subject (the pattern will not star-fuse)")
        if any(pt[0] == v or pt[1] == v for pt in patterns):
            err(v, "also bound in a subject/predicate position")
        if any(v in (ps, po) for (ps, _pp, po) in (paths or [])):
            err(v, "also a property-path endpoint")
        if v in group_vars:
            err(v, "also used inside OPTIONAL/MINUS/(NOT) EXISTS")
        if values and v.lstrip("?") in [
            str(x).lstrip("?") for x in values[0]
        ]:
            err(v, "also bound by VALUES")
        if bind and any(
            str(b[-1]).lstrip("?") == v.lstrip("?") for b in bind
        ):
            err(v, "also bound by BIND")



def get_statements(
    catalog: Catalog,
    subject: str | None = None,
    predicate: str | None = None,
    obj: str | None = None,
    obj_literal: str | None = None,
    base: str = "http://example.com/base/",
    distinct_buckets: int = 8,
    distinct: bool = False,
    only_tables: list[str] | None = None,
) -> rd.Dataset:
    """Lazy Dataset of DM triples matching the bound terms.

    ``only_tables`` [graft extension]: restrict the expansion to these
    tables' maps when no bound term already pins a table — the BGP
    planner passes the tables a shared subject VARIABLE is known to
    range over (DM subject IRIs encode their table, so a
    variable-predicate pattern joined on such a subject can only match
    triples from those tables). Sound prune, never widens results.

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

    if tables is None and only_tables is not None:
        # planner-supplied subject-anchored prune (see docstring)
        tables = sorted(set(only_tables) & set(catalog.table_names()))
        if not tables:
            return rd.from_arrow(_empty())

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


def _lang_pattern_unit(
    dirs: list[str],
    pattern: tuple,
    expr,
    graph: str | None = None,
    default_graph: bool = False,
) -> tuple[rd.Dataset, list[str], set[str]]:
    """Binding unit for one ``?s <p> ?v`` pattern whose LANG()/
    DATATYPE() FILTER atoms are CONSUMED in the store read's row filter
    (``expr`` — built by ``bgp_plan._lang_term_expr``); the non-star
    twin of the fused-scan consumption. Exactness is guaranteed by
    ``_lang_filter_guard``: the pattern is the variable's only binder,
    so restricting its scan equals filtering the final solutions."""
    from ..sinks.triplestore import store_statements

    s, p, o = pattern
    sv, ov = s[1:], o[1:]
    out = store_statements(
        dirs[0], predicate=p, graph=graph,
        default_graph=default_graph, extra_filter=expr,
    )
    for d in dirs[1:]:
        out = out.union(store_statements(
            d, predicate=p, graph=graph,
            default_graph=default_graph, extra_filter=expr,
        ))

    def project(t: pa.Table, _sv=sv, _ov=ov) -> pa.Table:
        return pa.table({
            _sv: t.column("subj"),
            _ov: t.column("obj"),
            f"__k_{_ov}": t.column("obj_kind"),
        })

    return (
        out.map_batches(project, batch_format="pyarrow"),
        [sv, ov],
        {ov},
    )


def _optional_as_groups(optional) -> list[tuple[list, list]]:
    """``optional`` accepts ONE group (a list of ``(s, p, o)`` pattern
    TUPLES — the historical surface), a list of GROUPS (list of
    lists — sibling OPTIONALs, applied as sequential LeftJoins per
    SPARQL 1.1 §5.2), or a list of ``(patterns, filters)`` 2-tuples
    (the SPARQL front-end's form: the filters are the LeftJoin
    condition, over the group's OWN variables only). Normalize to a
    list of ``(patterns, filters)`` pairs."""
    if not optional:
        return []
    first = optional[0]
    if (
        isinstance(first, tuple)
        and len(first) == 2
        and isinstance(first[0], list)
    ):
        return [(list(p), list(f or [])) for p, f in optional]
    if isinstance(first, list):
        return [(list(g), []) for g in optional]
    return [(list(optional), [])]


def get_pattern(
    catalog: Catalog,
    patterns: list[tuple],
    base: str = "http://example.com/base/",
    num_partitions: int = 4,
    filters: list[tuple] | None = None,
    optional: list[tuple] | list[list[tuple]] | None = None,
    minus: list[tuple] | None = None,
    not_exists: list[tuple] | None = None,
    exists: list[tuple] | None = None,
    values: tuple[list[str], list[tuple]] | None = None,
    bind: list[tuple] | None = None,
    paths: list[tuple] | None = None,
    order_by: list | None = None,
    limit: int | None = None,
    offset: int = 0,
    broadcast_limit: int = 1_000_000,
    keep_kinds: bool = False,
    units: list | None = None,
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

    ``units`` [graft extension — SPARQL 11.2 subqueries]: pre-built
    binding units ``(Dataset, var_names, kind_vars)`` (e.g. an
    evaluated subquery's projected bindings) that fold into the join
    like any pattern side, joining on shared variables.
    """

    def stmt_fn(**kwargs):
        return get_statements(
            catalog, base=base, distinct_buckets=num_partitions, **kwargs
        )

    extra_units = list(units) if units else []
    units, rest = _star_groups(catalog, patterns, base, filters=filters)
    units = list(units) + extra_units
    sv_tables = subject_tables(catalog, patterns, base)
    if sv_tables:
        # variable-predicate wildcards whose subject var is anchored to
        # known tables by a sibling bound-predicate pattern expand only
        # those tables' maps (sound: DM subjects encode their table)
        rest = [
            (s, p, o, {"only_tables": sorted(sv_tables[s[1:]])})
            if _is_var(p) and _is_var(s) and s[1:] in sv_tables
            else (s, p, o)
            for (s, p, o) in rest
        ]
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
    optional_groups = []
    for grp, o_filters in _optional_as_groups(optional):
        # the group's own filters (the LeftJoin condition) push into
        # its star-group scan exactly like the required side's —
        # superset contract; _bgp_left_join re-applies them exactly
        o_units, o_rest = _star_groups(
            catalog, grp, base, filters=o_filters or None
        )
        optional_groups.append((o_rest, o_units, o_filters))
    negs = [
        (mode, *reversed(_star_groups(catalog, grp, base)))
        for mode, grp in (
            ("minus", minus), ("not_exists", not_exists), ("exists", exists)
        )
        if grp
    ]
    out = _bgp_join(
        stmt_fn, rest, num_partitions, filters=filters, units=units,
        optional_groups=optional_groups or None, negations=negs,
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
                from ..terms import derive_term_kind

                arr = derive_term_kind(cols[names.index(v)])
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
    optional: list[tuple] | list[list[tuple]] | None = None,
    minus: list[tuple] | None = None,
    not_exists: list[tuple] | None = None,
    exists: list[tuple] | None = None,
    values: tuple[list[str], list[tuple]] | None = None,
    bind: list[tuple] | None = None,
    paths: list[tuple] | None = None,
    order_by: list | None = None,
    limit: int | None = None,
    offset: int = 0,
    broadcast_limit: int = 1_000_000,
    keep_kinds: bool = False,
    units: list | None = None,
    graph: str | None = None,
    default_graph: bool = False,
    graph_var: str | None = None,
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

    NAMED-GRAPH scope [SPARQL GRAPH]: ``graph=`` restricts every
    pattern to one named context, ``default_graph=True`` to the nil
    context — pushed as a parquet row filter into the star scans, the
    per-pattern ``store_statements`` reads, AND the property-path edge
    reads (incl. the §18.4 zero-length term domain, via the
    scoped-source wrapper consumed by ``stages.paths``).

    ``graph_var`` [SPARQL §13.3 GRAPH ?var]: every pattern becomes a
    QUAD pattern over the NAMED contexts — the store's ``graph`` column
    binds to that variable and the join on it enforces the
    same-context semantics, fully distributed with no per-context
    fan-out (scale-safe at millions of contexts). Star fusion is
    bypassed (the subject-pivot would have to pivot per (subject,
    graph); per-pattern joins are exact). OPTIONAL/MINUS/(NOT) EXISTS
    groups bind the context variable too, so the left/anti joins are
    per-named-graph — exactly ``Graph(?g, LeftJoin/Minus(A, B))``.
    Property paths under a variable scope are rejected loud (the path
    relation reads the whole graph).
    """
    from ..sinks.triplestore import store_statements

    dirs = [store_dir] if isinstance(store_dir, str) else list(store_dir)
    if not dirs:
        raise ValueError("get_pattern_store needs at least one store dir")

    # LANG()/DATATYPE() FILTER atoms [SPARQL §17.4.4.x]: binding columns
    # carry lexical forms only, so these are consumed at the store star
    # SCAN (a row filter over the lang/datatype columns) — exact when
    # the variable's ONLY binder is the scanned pattern; the guard
    # fails loud on every other shape
    lang_filters = [
        f for f in (filters or [])
        if len(f) == 3 and isinstance(f[0], str) and f[1] in LANG_FILTER_OPS
    ]
    binding_filters = filters
    if lang_filters:
        _lang_filter_guard(
            lang_filters, patterns, paths=paths, optional=optional,
            minus=minus, not_exists=not_exists, exists=exists,
            values=values, bind=bind, graph_var=graph_var,
        )
        binding_filters = [f for f in filters if f not in lang_filters]

    # a CONSTANT graph scope composes with paths: every edge read (and
    # the §18.4 zero-length term domain) restricts to that context via
    # the scoped-source wrapper consumed by stages.paths
    path_source = (
        ("graph_scope", store_dir, graph, default_graph)
        if (graph is not None or default_graph)
        else store_dir
    )
    if graph_var is not None:
        if graph is not None or default_graph:
            raise ValueError(
                "graph_var= does not compose with graph=/default_graph="
            )
        if paths:
            raise ValueError(
                "graph_var= does not compose with paths= "
                "(path relations read the whole graph)"
            )

    def stmt_fn(**kwargs):
        out = store_statements(
            dirs[0], graph=graph, default_graph=default_graph,
            named_only=graph_var is not None, **kwargs
        )
        for d in dirs[1:]:
            out = out.union(store_statements(
                d, graph=graph, default_graph=default_graph,
                named_only=graph_var is not None, **kwargs
            ))
        return out

    extra_units = list(units) if units else []
    if graph_var is not None:
        # quad patterns bypass star fusion: the subject-pivot is
        # per-subject-complete, not per-(subject, graph)-complete
        units, rest = [], list(patterns)
    else:
        units, rest = _store_star_groups(
            store_dir, patterns, filters=filters,
            graph=graph, default_graph=default_graph,
        )
    units = list(units)
    if lang_filters:
        from .bgp_plan import _lang_term_expr

        # a binder that star-FUSED had its atoms consumed by the group
        # scan (_store_filter_pushdown_expr); a binder left in `rest`
        # (single-pattern group, or a federated fallback) gets a
        # dedicated unit whose store read consumes them instead
        by_binder: dict[tuple, list[tuple]] = {}
        for v, op, val in lang_filters:
            binder = next(pt for pt in patterns if pt[2] == v)
            by_binder.setdefault(binder, []).append((op, str(val)))
        for binder, atoms in by_binder.items():
            if binder not in rest:
                continue
            rest = [pt for pt in rest if pt != binder]
            expr = None
            for op, val in atoms:
                e = _lang_term_expr(op, val)
                expr = e if expr is None else expr & e
            units.append(_lang_pattern_unit(
                dirs, binder, expr, graph=graph,
                default_graph=default_graph,
            ))
    units = list(units) + extra_units
    if paths:
        # §9.1 property-path items: each becomes one binding unit whose
        # relation is the distributed path evaluation (seq = one co-hash
        # join, closures = path doubling); folds with the ordinary
        # patterns on shared variables like any other side
        units = list(units) + [
            _path_unit(path_source, s, p, o, num_partitions)
            for (s, p, o) in paths
        ]
    if values:
        units = list(units) + [_values_unit(*values)]  # fold LAST (tiny)
    optional_groups = []
    for grp, o_filters in _optional_as_groups(optional):
        if graph_var is not None:
            # quad patterns bypass star fusion (see above); the group
            # binds the context var itself, so the left join is
            # per-named-graph
            optional_groups.append((list(grp), [], o_filters))
        else:
            o_units, o_rest = _store_star_groups(
                store_dir, grp, filters=o_filters or None,
                graph=graph, default_graph=default_graph,
            )
            optional_groups.append((o_rest, o_units, o_filters))
    negs = [
        (
            mode,
            *(
                (list(grp), [])
                if graph_var is not None
                else tuple(reversed(_store_star_groups(
                    store_dir, grp, graph=graph,
                    default_graph=default_graph,
                )))
            ),
        )
        for mode, grp in (
            ("minus", minus), ("not_exists", not_exists), ("exists", exists)
        )
        if grp
    ]
    out = _bgp_join(
        stmt_fn, rest, num_partitions, filters=binding_filters,
        units=units,
        optional_groups=optional_groups or None, negations=negs,
        bind=bind, broadcast_limit=broadcast_limit, keep_kinds=keep_kinds,
        graph_var=graph_var,
    )
    return apply_solution_modifiers(out, order_by, limit, offset)


from .results import (  # noqa: E402,F401  (re-exported result forms)
    _instantiate_inverse,
    describe,
    describe_store,
    r2rml_lookup,
)
