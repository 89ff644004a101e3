"""SPARQL-CONSTRUCT-shaped KG enrichment: variable bindings → new
triples [graft extension — the reference materializes only
mapping-derived triples; the CONSTRUCT query form is recalled from the
public SPARQL 1.1 spec §10.2].

``construct(bindings, templates)`` instantiates each triple template
once per solution, batch-wise and fully vectorized — one output
``TRIPLE_SCHEMA`` table per input binding block, no joins, no driver
work — then (optionally) applies RDF set semantics with ONE distinct
shuffle.  Composes with every binding producer: ``get_pattern(...,
keep_kinds=True)``, ``get_pattern_store``, or any Dataset whose string
columns are term lexical forms.

Per SPARQL §10.2.1, a solution that would instantiate an INVALID
triple produces nothing for that template (other templates still
fire): literal or NULL subjects drop, non-IRI or NULL predicates drop,
NULL objects drop.  Term kinds come from the hidden ``__k_<var>``
columns when the producer kept them (object-position vars), else are
derived from the surface form (``_:`` prefix = bnode, else IRI — no
IRI can carry that prefix).

Literal OBJECT bindings re-enter as plain literals: the binding
surface is lexical (language tags / datatypes are not part of the
solution), matching the engine's BGP join semantics.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..terms import KIND_BNODE, KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA


def _is_var(t) -> bool:
    return isinstance(t, str) and t.startswith("?")


def _compile_templates(templates: list[tuple], graph: str | None):
    """Validate constants once at compile time (fail loud, not per
    batch): subjects must be IRI/bnode constants or vars, predicates
    IRI constants or vars, objects any term or var."""
    compiled = []
    for s, p, o in templates:
        if not (_is_var(s) or isinstance(s, str)):
            raise ValueError(f"invalid subject template term: {s!r}")
        if isinstance(s, str) and not _is_var(s) and s.startswith('"'):
            raise ValueError(f"literal subject template: {s!r}")
        if not (_is_var(p) or isinstance(p, str)):
            raise ValueError(f"invalid predicate template term: {p!r}")
        if (
            isinstance(p, str)
            and not _is_var(p)
            and (p.startswith("_:") or p.startswith('"'))
        ):
            raise ValueError(f"predicate template must be an IRI: {p!r}")
        lit = isinstance(o, tuple) and len(o) == 2 and o[0] == "lit"
        if not (_is_var(o) or isinstance(o, str) or lit):
            raise ValueError(f"invalid object template term: {o!r}")
        compiled.append((s, p, o, lit))
    if graph is not None and (graph.startswith('"') or graph.startswith("_:")):
        raise ValueError(f"graph must be an IRI: {graph!r}")
    return compiled


def construct(
    bindings: rd.Dataset,
    templates: list[tuple],
    graph: str | None = None,
    distinct: bool = True,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Instantiate ``templates`` (s, p, o triples of ``"?var"`` /
    constant-IRI / ``("lit", value)`` terms) once per solution row →
    lazy ``TRIPLE_SCHEMA`` Dataset, ready for ``write_triplestore`` /
    the N-Triples & Turtle sinks / ``get_pattern_store`` — constructed
    graphs are first-class stores.

    ``distinct=True`` applies RDF set semantics (one hash shuffle);
    pass False when the caller proves uniqueness (e.g. one template
    over a key-unique binding set) or feeds a deduping store sink."""
    from .distinct import distinct_rows

    compiled = _compile_templates(templates, graph)

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        outs = []
        names = set(t.column_names)
        for s, p, o, lit in compiled:
            # ---- subject: IRI/bnode only
            mask = None
            if _is_var(s):
                v = s[1:]
                subj = t.column(v).combine_chunks() if n else pa.array([], pa.string())
                m = pc.is_valid(subj)
                if f"__k_{v}" in names:
                    m = pc.and_(
                        m,
                        pc.fill_null(
                            pc.not_equal(t.column(f"__k_{v}").combine_chunks()
                                         if n else pa.array([], pa.uint8()),
                                         KIND_LITERAL),
                            False,
                        ),
                    )
                mask = m
            else:
                subj = pa.nulls(n, pa.string()).fill_null(s)
            # ---- predicate: IRI only
            if _is_var(p):
                v = p[1:]
                pred = t.column(v).combine_chunks() if n else pa.array([], pa.string())
                m = pc.and_(
                    pc.is_valid(pred),
                    pc.invert(
                        pc.starts_with(pc.fill_null(pred, "_:"), "_:")
                    ),
                )
                if f"__k_{v}" in names:
                    m = pc.and_(
                        m,
                        pc.fill_null(
                            pc.not_equal(t.column(f"__k_{v}").combine_chunks()
                                         if n else pa.array([], pa.uint8()),
                                         KIND_LITERAL),
                            False,
                        ),
                    )
                mask = m if mask is None else pc.and_(mask, m)
            else:
                pred = pa.nulls(n, pa.string()).fill_null(p)
            # ---- object: any term; kind column required downstream
            if _is_var(o):
                v = o[1:]
                obj = t.column(v).combine_chunks() if n else pa.array([], pa.string())
                if f"__k_{v}" in names:
                    kind = (
                        t.column(f"__k_{v}").combine_chunks()
                        if n
                        else pa.array([], pa.uint8())
                    )
                else:
                    from ..terms import derive_term_kind

                    # NULL rows get a NULL kind here; the validity mask
                    # below drops them before emission
                    kind = derive_term_kind(obj)
                m = pc.is_valid(obj)
                mask = m if mask is None else pc.and_(mask, m)
            elif lit:
                obj = pa.nulls(n, pa.string()).fill_null(str(o[1]))
                kind = pa.nulls(n, pa.uint8()).fill_null(KIND_LITERAL)
            else:
                obj = pa.nulls(n, pa.string()).fill_null(o)
                kind = pa.nulls(n, pa.uint8()).fill_null(
                    KIND_BNODE if o.startswith("_:") else KIND_IRI
                )
            out = pa.Table.from_arrays(
                [
                    subj.cast(pa.string()),
                    pred.cast(pa.string()),
                    obj.cast(pa.string()),
                    kind,
                    pa.nulls(n, pa.string()),
                    pa.nulls(n, pa.string()),
                    pa.nulls(n, pa.string())
                    if graph is None
                    else pa.nulls(n, pa.string()).fill_null(graph),
                ],
                schema=TRIPLE_SCHEMA,
            )
            if mask is not None:
                out = out.filter(pc.fill_null(mask, False))
            outs.append(out)
        return (
            pa.concat_tables(outs)
            if outs
            else pa.Table.from_arrays(
                [pa.array([], f.type) for f in TRIPLE_SCHEMA],
                schema=TRIPLE_SCHEMA,
            )
        )

    out = bindings.map_batches(expand, batch_format="pyarrow")
    if distinct:
        out = distinct_rows(
            out,
            [f.name for f in TRIPLE_SCHEMA],
            num_buckets=num_partitions,
        )
    return out
