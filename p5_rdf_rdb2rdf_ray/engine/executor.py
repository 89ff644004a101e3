"""The single mapping executor (SURVEY.md §2 #10, §3).

Reference lifecycle [R: Simple.pm :: process]: per mapping entry, loop SQL
rows; per row mint subject, then per column map mint predicate+object, then
``add_statement``. Row-at-a-time Perl.

Here the same semantics run *batch-wise* over zero-copy Arrow blocks:
for a batch of R rows and M compiled term patterns we build M column slices
(each a vectorized template fill / lexical conversion) and concatenate them
into ONE output batch of ≤ R·M triple rows — a flat map done batch-wise,
never a per-row ``flat_map``. NULL suppression (W3C-R2RML §11: a term map
referencing a NULL column produces no triple) falls out of Arrow null
propagation: every builder yields null where any referenced column is null,
and one ``pc.filter`` per pattern drops those rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.scalars import Template, bnode_skolem_array
from ..functions.xsd import lexical_array
from ..mapping.spec import (
    BNODE,
    IRI,
    LITERAL,
    TermMapSpec,
    TriplesMapSpec,
)
from ..terms import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_TYPE,
    TRIPLE_SCHEMA,
    empty_triples,
)

# ===========================================================================
# column lexical cache
# ===========================================================================

class _BatchCols:
    """Per-batch cache of column → (lexical string array, natural datatype)."""

    def __init__(self, batch: pa.Table):
        self.batch = batch
        self.n = batch.num_rows
        self._lex: dict[str, tuple[pa.Array, str | None]] = {}
        self._raw: dict[str, pa.Array] | None = None

    def lex(self, col: str) -> tuple[pa.Array, str | None]:
        hit = self._lex.get(col)
        if hit is None:
            arr = self.batch.column(col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            hit = lexical_array(arr)
            self._lex[col] = hit
        return hit

    def raw(self) -> dict[str, pa.Array]:
        if self._raw is None:
            self._raw = {
                name: (
                    c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                )
                for name, c in zip(self.batch.column_names, self.batch.columns)
            }
        return self._raw


# ===========================================================================
# term builders
# ===========================================================================

TermBuilder = Callable[[_BatchCols], pa.Array]


def _const_builder(value: str) -> TermBuilder:
    def build(cols: _BatchCols) -> pa.Array:
        return pa.repeat(pa.scalar(value, pa.string()), cols.n)

    return build


def _template_builder(tmpl: str, iri_safe: bool, prefix: str = "") -> TermBuilder:
    t = Template(prefix + tmpl) if prefix else Template(tmpl)

    def build(cols: _BatchCols) -> pa.Array:
        col_arrays = {c: cols.lex(c)[0] for c in t.columns}
        return t.fill_array(col_arrays, cols.n, iri_safe=iri_safe)

    return build


def _column_builder(col: str) -> TermBuilder:
    def build(cols: _BatchCols) -> pa.Array:
        return cols.lex(col)[0]

    return build


def _udf_builder(fn: Callable) -> TermBuilder:
    def build(cols: _BatchCols) -> pa.Array:
        out = fn(cols.raw(), cols.n)
        if not isinstance(out, (pa.Array, pa.ChunkedArray)):
            out = pa.array(out, pa.string())
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        if not pa.types.is_string(out.type):
            out = pc.cast(out, pa.string())
        return out

    return build


def _skolem_builder(scope: str, key_cols: Sequence[str]) -> TermBuilder:
    def build(cols: _BatchCols) -> pa.Array:
        parts = [cols.lex(c)[0] for c in key_cols]
        return bnode_skolem_array(scope, parts, cols.n)

    return build


def make_term_builder(tm: TermMapSpec) -> tuple[TermBuilder, int]:
    """→ (builder, obj_kind). For literals the builder yields the lexical
    form; lang/datatype are handled by the pattern."""
    if tm.udf is not None:
        kind = {IRI: KIND_IRI, BNODE: KIND_BNODE, LITERAL: KIND_LITERAL}[tm.kind]
        return _udf_builder(tm.udf), kind
    if tm.kind == IRI:
        if tm.constant is not None:
            return _const_builder(tm.constant), KIND_IRI
        if tm.template is not None:
            return _template_builder(tm.template, iri_safe=True), KIND_IRI
        if tm.column is not None:
            # rr:column with termType IRI: value used as-is (no encoding)
            return _column_builder(tm.column), KIND_IRI
        raise ValueError(f"IRI term map with no source: {tm}")
    if tm.kind == BNODE:
        if tm.skolem_scope is not None:
            if not tm.skolem_cols:
                raise ValueError(
                    "per-row bnode needs resolved skolem columns (planner bug)"
                )
            return _skolem_builder(tm.skolem_scope, tm.skolem_cols), KIND_BNODE
        if tm.template is not None:
            # value-based bnode: equal template values ⇒ same node
            # (W3C-R2RML §7.4 termType BlankNode)
            return _template_builder(tm.template, iri_safe=True, prefix="_:"), KIND_BNODE
        if tm.constant is not None:
            return _const_builder("_:" + tm.constant.removeprefix("_:")), KIND_BNODE
        if tm.column is not None:
            return _template_builder("_:{%s}" % tm.column, iri_safe=True), KIND_BNODE
        raise ValueError(f"bnode term map with no source: {tm}")
    # literal
    if tm.constant is not None:
        return _const_builder(tm.constant), KIND_LITERAL
    if tm.template is not None:
        return _template_builder(tm.template, iri_safe=False), KIND_LITERAL
    if tm.column is not None:
        return _column_builder(tm.column), KIND_LITERAL
    raise ValueError(f"literal term map with no source: {tm}")


# ===========================================================================
# compiled patterns
# ===========================================================================

@dataclass
class _Pattern:
    subj: TermBuilder
    subj_kind: int          # KIND_IRI | KIND_BNODE (for validity only)
    pred: TermBuilder
    obj: TermBuilder
    obj_kind: int
    lang: str | None
    datatype_fixed: str | None      # explicit override or None
    datatype_from_col: str | None   # natural datatype of this column
    graph: TermBuilder | None


class CompiledMap:
    """A TriplesMapSpec compiled to vectorized pattern builders.

    Picklable (only dataclasses, Templates and module-level closures over
    plain values) so Ray can ship it inside the ``map_batches`` UDF.
    """

    def __init__(self, tmap: TriplesMapSpec):
        self.name = tmap.name
        subj_b, subj_kind = make_term_builder(tmap.subject)
        self.patterns: list[_Pattern] = []

        def graph_builders(pom_graphs) -> list[TermBuilder | None]:
            """Target-graph set (W3C-R2RML §11.1): UNION of the subject
            map's graph maps and the POM's; empty → [default graph].
            A ``None`` member is an explicit rr:defaultGraph."""
            out: list[TermBuilder | None] = []
            seen: set = set()
            for g in tuple(tmap.graphs) + tuple(pom_graphs):
                key = (
                    None if g is None
                    else (g.template, g.column, g.constant, id(g.udf) if g.udf else None)
                )
                if key in seen:
                    continue
                seen.add(key)
                out.append(None if g is None else make_term_builder(g)[0])
            return out or [None]

        subj_graphs = graph_builders(())

        for cls in tmap.classes:
            for graph_b in subj_graphs:
                self.patterns.append(
                    _Pattern(
                        subj=subj_b,
                        subj_kind=subj_kind,
                        pred=_const_builder(RDF_TYPE),
                        obj=_const_builder(cls),
                        obj_kind=KIND_IRI,
                        lang=None,
                        datatype_fixed=None,
                        datatype_from_col=None,
                        graph=graph_b,
                    )
                )

        for po in tmap.pos:
            pred_b, _ = make_term_builder(po.pred)
            obj_b, obj_kind = make_term_builder(po.obj)
            dt_col = None
            if (
                obj_kind == KIND_LITERAL
                and po.obj.datatype is None
                and po.obj.lang is None
                and po.obj.column is not None
            ):
                dt_col = po.obj.column   # natural datatype resolved per batch
            for graph_b in graph_builders(po.graphs):
                if po.rev:
                    # reversed triple [R: Simple.pm 'rev']: object term
                    # becomes the subject; the row subject the object.
                    self.patterns.append(
                        _Pattern(
                            subj=obj_b,
                            subj_kind=obj_kind,
                            pred=pred_b,
                            obj=subj_b,
                            obj_kind=subj_kind,
                            lang=None,
                            datatype_fixed=None,
                            datatype_from_col=None,
                            graph=graph_b,
                        )
                    )
                else:
                    self.patterns.append(
                        _Pattern(
                            subj=subj_b,
                            subj_kind=subj_kind,
                            pred=pred_b,
                            obj=obj_b,
                            obj_kind=obj_kind,
                            lang=po.obj.lang,
                            datatype_fixed=po.obj.datatype,
                            datatype_from_col=dt_col,
                            graph=graph_b,
                        )
                    )

    # -- execution ---------------------------------------------------------

    def expand_batch(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_triples()
        cols = _BatchCols(batch)
        n = cols.n
        pieces: list[pa.Table] = []
        for p in self.patterns:
            subj = p.subj(cols)
            pred = p.pred(cols)
            obj = p.obj(cols)
            graph = p.graph(cols) if p.graph is not None else None
            valid = pc.and_kleene(
                pc.and_kleene(pc.is_valid(subj), pc.is_valid(pred)),
                pc.is_valid(obj),
            )
            dt = p.datatype_fixed
            if p.datatype_from_col is not None:
                dt = cols.lex(p.datatype_from_col)[1]
            arrays = [
                subj,
                pred,
                obj,
                pa.repeat(pa.scalar(p.obj_kind, pa.uint8()), n),
                pa.repeat(pa.scalar(p.lang, pa.string()), n)
                if p.lang is not None
                else pa.nulls(n, pa.string()),
                pa.repeat(pa.scalar(dt, pa.string()), n)
                if dt is not None
                else pa.nulls(n, pa.string()),
                graph if graph is not None else pa.nulls(n, pa.string()),
            ]
            t = pa.Table.from_arrays(arrays, schema=TRIPLE_SCHEMA)
            if pc.all(valid).as_py() is not True:
                t = t.filter(pc.fill_null(valid, False))
            pieces.append(t)
        if not pieces:
            return empty_triples()
        return pa.concat_tables(pieces)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.expand_batch(batch)


def expand_triples_fn(tmap: TriplesMapSpec) -> CompiledMap:
    """Compile a triples map for use in ``ds.map_batches(fn, batch_format="pyarrow")``."""
    return CompiledMap(tmap)
