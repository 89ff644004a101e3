"""Result forms beyond SELECT bindings: DESCRIBE (concise bounded
description) and the R2RML rr:inverseExpression point lookup (the
result-form half of `engine/lookup.py`, split out in round 5 -- public
surface unchanged, everything re-exported there)."""

from __future__ import annotations

from dataclasses import replace

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

import pyarrow.dataset as pads

from ..mapping.spec import MappingSpec
from ..sources.catalog import Catalog
from .bgp_plan import _Uncastable, _cast_value, _empty

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
    from .lookup import get_statements  # runtime: lookup re-exports this module

    out = get_statements(catalog, subject=nodes[0], base=base)
    for n in nodes[1:]:
        out = out.union(get_statements(catalog, subject=n, base=base))
    return out


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
