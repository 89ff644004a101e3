"""MappingSpec — the engine's IR, mirroring the reference's "Simple" hashref.

In the reference, R2RML and DirectMapping both compile down to the Simple
mapping structure and share one executor [R: R2RML.pm is a subclass of
Simple.pm; DirectMapping builds the same per-table plan]. We mirror that:
:mod:`.r2rml` and :mod:`.direct` are front-ends emitting ``MappingSpec``;
:mod:`..engine.executor` is the single executor.

Simple-dict surface (the reference's user API [R: Simple.pm POD]):

    mapping = {
      "book": {                       # logical table name
        "about": "book/{book_id}",    # subject template (or callable, or None → per-row bnode)
        "typeof": "ex:Book",          # rdf:type class(es)
        "select": "...", "from": "...",  "sql": "SELECT ..."  # optional
        "graph": "ex:g1",             # optional named graph for the whole map
        "columns": {
          "title":  [{"property": "dc:title", "lang": "en"}],
          "author_id": [{"rel": "dc:creator", "resource": "author/{author_id}"},
                        {"rev": "ex:wrote",  "resource": "author/{author_id}"}],
          "price":  [{"property": "ex:price", "datatype": "xsd:decimal"}],
        },
      },
    }

Term-map callables (the reference's coderef extension point
[R: Simple.pm POD "callbacks"]) are Python callables
``fn(cols: dict[str, pyarrow.Array], n: int) -> pyarrow.Array`` executed
per batch inside ``map_batches`` — batch-wise, never per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Mapping

from ..functions.scalars import Template, curie_expand
from ..terms import DEFAULT_NAMESPACES

# term kinds
IRI, BNODE, LITERAL = "iri", "bnode", "literal"


class _RenamedUdf:
    """Adapter presenting post-join renamed columns to a user term-map
    callable under their original names. Picklable (plain attributes)."""

    def __init__(self, fn: Callable, rename: dict[str, str]):
        self.fn = fn
        self.rename = rename

    def __call__(self, cols: dict, n: int):
        view = dict(cols)
        for old, new in self.rename.items():
            if new in cols:
                view[old] = cols[new]
        return self.fn(view, n)


@dataclass
class TermMapSpec:
    """One term map (W3C-R2RML §7.4): exactly one of template / column /
    constant / udf, plus a term type and (for literals) lang / datatype."""

    kind: str = IRI                   # iri | bnode | literal
    template: str | None = None       # '{col}' slots; IRI-safe-encoded for IRIs
    column: str | None = None
    constant: str | None = None       # already-expanded IRI or literal text
    udf: Callable | None = None       # batch-wise callable (see module doc)
    lang: str | None = None
    datatype: str | None = None       # datatype IRI override (rr:datatype)
    # rr:inverseExpression (W3C-R2RML §7.7): a SQL-expression template over
    # '{col}' refs that, instantiated with values inverted from a generated
    # term, selects exactly the logical rows producing that term. Used by
    # engine.r2rml_lookup for point lookups whose term maps apply
    # transformations plain template inversion can't see through.
    inverse_expression: str | None = None
    # Direct Mapping no-PK / Simple no-'about' rows: fresh-per-row skolem
    # bnode over these key columns ('' scope col list, SURVEY §2 #16)
    skolem_scope: str | None = None
    skolem_cols: tuple[str, ...] = ()

    def referenced_columns(self) -> list[str]:
        if self.template is not None:
            return Template(self.template).columns
        if self.column is not None:
            return [self.column]
        return list(self.skolem_cols)

    def rename_columns(self, rename: dict[str, str]) -> "TermMapSpec":
        """A copy of this term map reading from renamed columns (RefObjectMap
        fast path / post-join prefixed parent columns)."""
        from dataclasses import replace

        tm = self
        if tm.template is not None:
            tm = replace(tm, template=Template(tm.template).unparse(rename))
        if tm.column is not None:
            tm = replace(tm, column=rename.get(tm.column, tm.column))
        if tm.skolem_cols:
            tm = replace(
                tm, skolem_cols=tuple(rename.get(c, c) for c in tm.skolem_cols)
            )
        if tm.udf is not None:
            tm = replace(tm, udf=_RenamedUdf(tm.udf, rename))
        return tm


# Target-graph sets (W3C-R2RML §11.1): a triple's target graphs are the
# UNION of the subject map's graph maps and the POM's graph maps; the
# empty set means the default graph. ``None`` inside a ``graphs`` tuple
# is the explicit rr:defaultGraph member (so {rr:defaultGraph, ex:g1}
# puts the triple in BOTH the default graph and g1).
GraphMaps = tuple  # tuple[TermMapSpec | None, ...]


@dataclass
class PredObjSpec:
    """predicate-object map; ``rev`` swaps subject/object (Simple 'rev')."""

    pred: TermMapSpec
    obj: TermMapSpec
    rev: bool = False
    graphs: GraphMaps = ()


@dataclass
class RefObjectSpec:
    """RefObjectMap (W3C-R2RML §8): object = parent map's subject, joined on
    conjunctive column equality. Empty ``join`` ⇒ same logical table, same
    row (the spec's no-join-condition case)."""

    pred: TermMapSpec
    parent: str                        # key of the parent triples map
    join: tuple[tuple[str, str], ...] = ()   # (child_col, parent_col), ANDed
    rev: bool = False
    graphs: GraphMaps = ()


@dataclass
class TriplesMapSpec:
    name: str
    table: str                         # logical table (parquet basename)
    sql: str | None = None             # rr:sqlQuery (see sources.load_logical_table)
    subject: TermMapSpec = field(default_factory=TermMapSpec)
    classes: tuple[str, ...] = ()      # rr:class / Simple 'typeof'
    graphs: GraphMaps = ()             # subject-level graph maps
    pos: tuple[PredObjSpec, ...] = ()
    refs: tuple[RefObjectSpec, ...] = ()

    def referenced_columns(self) -> list[str]:
        cols: list[str] = list(self.subject.referenced_columns())
        for p in self.pos:
            for tm in (p.pred, p.obj, *p.graphs):
                if tm is not None:
                    cols.extend(tm.referenced_columns())
        for r in self.refs:
            cols.extend(r.pred.referenced_columns())
            cols.extend(c for c, _ in r.join)
            for g in r.graphs:
                if g is not None:
                    cols.extend(g.referenced_columns())
        for g in self.graphs:
            if g is not None:
                cols.extend(g.referenced_columns())
        seen: dict[str, None] = {}
        for c in cols:
            seen.setdefault(c)
        return list(seen)


@dataclass
class MappingSpec:
    maps: dict[str, TriplesMapSpec]
    base: str = "http://example.com/"
    namespaces: dict[str, str] = field(default_factory=dict)


# --------------------------------------------------------------------------
# Simple-dict front-end (the reference's primary user API)
# --------------------------------------------------------------------------

def _expand(name: str, ns: Mapping[str, str], base: str) -> str:
    return curie_expand(name, ns, base)


def _subject_from_about(
    about: Any, table: str, ns: Mapping[str, str], base: str
) -> TermMapSpec:
    if about is None:
        # no 'about' → fresh bnode per row [R: Simple.pm]; deterministic
        # skolem over all columns is resolved at execution time (scope=table,
        # cols filled by the executor with the row-identity columns).
        return TermMapSpec(kind=BNODE, skolem_scope=table)
    if callable(about):
        return TermMapSpec(kind=IRI, udf=about)
    about = str(about)
    if about.startswith("_:"):
        return TermMapSpec(kind=BNODE, template=about[2:])
    t = Template(about)
    if t.columns:
        return TermMapSpec(kind=IRI, template=_expand_template(about, ns, base))
    return TermMapSpec(kind=IRI, constant=_expand(about, ns, base))


def _expand_template(tmpl: str, ns: Mapping[str, str], base: str) -> str:
    """Expand a CURIE/relative prefix in the literal head of a template."""
    t = Template(tmpl)
    if t.segments and t.segments[0][0] == "lit":
        head = t.segments[0][1]
        # find the longest prefix of head that is the IRI part
        expanded = _expand(head, ns, base)
        if expanded != head:
            return expanded + tmpl[len(head):]
        return tmpl
    return base + tmpl if not tmpl.startswith("http") else tmpl


def compile_simple(
    mapping: Mapping[str, Any],
    base: str = "http://example.com/",
    namespaces: Mapping[str, str] | None = None,
) -> MappingSpec:
    """Compile the reference's Simple hashref structure into a MappingSpec.

    [R: Simple.pm :: new/process — 'about', 'typeof', 'columns' with
    property/rel/rev/resource/lang/datatype, optional coderefs]
    """
    ns = dict(DEFAULT_NAMESPACES)
    ns.update(namespaces or {})
    maps: dict[str, TriplesMapSpec] = {}
    for tname, m in mapping.items():
        subject = _subject_from_about(m.get("about"), tname, ns, base)
        typeof = m.get("typeof") or ()
        if isinstance(typeof, str):
            typeof = (typeof,)
        classes = tuple(_expand(c, ns, base) for c in typeof)
        graphs: tuple = ()
        if m.get("graph"):
            graphs = (
                TermMapSpec(kind=IRI, constant=_expand(m["graph"], ns, base)),
            )
        pos: list[PredObjSpec] = []
        refs: list[RefObjectSpec] = []
        for col, cmaps in (m.get("columns") or {}).items():
            if isinstance(cmaps, (str, dict)):
                cmaps = [cmaps]
            for cm in cmaps:
                if isinstance(cm, str):
                    cm = {"property": cm}
                pos_graphs: tuple = ()
                if cm.get("graph"):
                    pos_graphs = (
                        TermMapSpec(
                            kind=IRI, constant=_expand(cm["graph"], ns, base)
                        ),
                    )
                if "property" in cm:
                    pred = _termmap_pred(cm["property"], ns, base)
                    obj = TermMapSpec(
                        kind=LITERAL,
                        column=col,
                        lang=cm.get("lang"),
                        datatype=_expand(cm["datatype"], ns, base)
                        if cm.get("datatype")
                        else None,
                        udf=cm.get("udf"),
                    )
                    pos.append(PredObjSpec(pred=pred, obj=obj, graphs=pos_graphs))
                elif "rel" in cm or "rev" in cm:
                    key = "rel" if "rel" in cm else "rev"
                    pred = _termmap_pred(cm[key], ns, base)
                    res = cm.get("resource")
                    if callable(res):
                        obj = TermMapSpec(kind=IRI, udf=res)
                    elif res is None:
                        obj = TermMapSpec(kind=IRI, column=col)
                    else:
                        obj = TermMapSpec(
                            kind=IRI, template=_expand_template(str(res), ns, base)
                        )
                    pos.append(
                        PredObjSpec(
                            pred=pred, obj=obj, rev=(key == "rev"),
                            graphs=pos_graphs,
                        )
                    )
                else:
                    raise ValueError(f"column map needs property/rel/rev: {cm}")
        maps[tname] = TriplesMapSpec(
            name=tname,
            table=m.get("from", tname),
            sql=m.get("sql"),
            subject=subject,
            classes=classes,
            graphs=graphs,
            pos=tuple(pos),
            refs=tuple(refs),
        )
    return MappingSpec(maps=maps, base=base, namespaces=ns)


def _termmap_pred(p: Any, ns: Mapping[str, str], base: str) -> TermMapSpec:
    if callable(p):
        return TermMapSpec(kind=IRI, udf=p)
    p = str(p)
    t = Template(p)
    if t.columns:
        return TermMapSpec(kind=IRI, template=_expand_template(p, ns, base))
    return TermMapSpec(kind=IRI, constant=_expand(p, ns, base))
