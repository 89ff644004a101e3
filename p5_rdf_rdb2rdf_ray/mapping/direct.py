"""Direct Mapping front-end (W3C-DM §2; [R: DirectMapping.pm]).

Compiles a :class:`~..sources.catalog.Catalog` (schemas + declared
``TableLayout`` keys — the Parquet stand-in for DBI catalog introspection
[R: DirectMapping.pm :: layout]) into the same ``MappingSpec`` IR the other
front-ends emit; one engine, three front-ends, like the reference.

Per table T:
- subject: PK (c1…ck) → ``<base>T/c1=v1;c2=v2`` with IRI-safe-encoded names
  and values; no PK → fresh blank node per row (deterministic rowid skolem).
- ``rdf:type <base>T`` per row.
- each non-NULL column c → ``<base>T#c`` literal with the natural datatype.
- each FK (c1…cn)→P: ``<base>T#ref-c1;c2`` → parent row node. When the FK
  references the parent PK (the normal case) the planner's fast path mints
  the parent IRI from child columns — zero shuffle; an FK to a no-PK table
  degrades to the general join against parent rowid-skolem bnodes.
- ``rdfs=True`` adds the reference's schema-triples extension
  [R: DirectMapping.pm rdfs=>1]: class/property typing + labels.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.scalars import iri_safe_encode
from ..functions.xsd import has_natural_mapping
from ..sources.catalog import Catalog
from ..terms import KIND_IRI, KIND_LITERAL, RDF_TYPE, TRIPLE_SCHEMA
from .spec import (
    BNODE,
    IRI,
    LITERAL,
    MappingSpec,
    PredObjSpec,
    RefObjectSpec,
    TermMapSpec,
    TriplesMapSpec,
)

RDFS = "http://www.w3.org/2000/01/rdf-schema#"


def _tbl_iri(base: str, table: str) -> str:
    return base + iri_safe_encode(table)


def _col_pred(base: str, table: str, col: str) -> str:
    return f"{base}{iri_safe_encode(table)}#{iri_safe_encode(col)}"


def _ref_pred(base: str, table: str, cols: tuple[str, ...]) -> str:
    return (
        f"{base}{iri_safe_encode(table)}#ref-"
        + ";".join(iri_safe_encode(c) for c in cols)
    )


def _pk_subject(base: str, table: str, pk: tuple[str, ...]) -> TermMapSpec:
    tmpl = base + iri_safe_encode(table) + "/" + ";".join(
        f"{iri_safe_encode(c)}={{{c}}}" for c in pk
    )
    return TermMapSpec(kind=IRI, template=tmpl)


def direct_mapping(
    catalog: Catalog,
    tables: list[str] | None = None,
    base: str = "http://example.com/base/",
    rdfs: bool = False,
) -> MappingSpec:
    maps: dict[str, TriplesMapSpec] = {}
    names = tables if tables is not None else catalog.table_names()
    for t in names:
        schema = catalog.schema(t)
        layout = catalog.layout(t)
        if layout.pkey:
            subject = _pk_subject(base, t, tuple(layout.pkey))
        else:
            subject = TermMapSpec(kind=BNODE, skolem_scope=t)

        pos: list[PredObjSpec] = []
        for f in schema:
            if not has_natural_mapping(f.type):
                # nested Arrow types (list/struct/map) have no W3C natural
                # datatype mapping — outside the reference's SQL-92 world;
                # skip the column rather than fail the whole table
                continue
            pos.append(
                PredObjSpec(
                    pred=TermMapSpec(kind=IRI, constant=_col_pred(base, t, f.name)),
                    obj=TermMapSpec(kind=LITERAL, column=f.name),
                )
            )
        refs: list[RefObjectSpec] = []
        for child_cols, parent, parent_cols in layout.fkeys:
            refs.append(
                RefObjectSpec(
                    pred=TermMapSpec(
                        kind=IRI, constant=_ref_pred(base, t, tuple(child_cols))
                    ),
                    parent=parent,
                    join=tuple(zip(child_cols, parent_cols)),
                )
            )
        maps[t] = TriplesMapSpec(
            name=t,
            table=t,
            subject=subject,
            classes=(_tbl_iri(base, t),),
            pos=tuple(pos),
            refs=tuple(refs),
        )
    return MappingSpec(maps=maps, base=base)


def rdfs_schema_triples(
    catalog: Catalog,
    tables: list[str] | None = None,
    base: str = "http://example.com/base/",
) -> pa.Table:
    """The reference's rdfs=>1 extension: small constant schema graph
    (driver-side; union it onto the triple stream)."""
    rows: list[tuple] = []
    names = tables if tables is not None else catalog.table_names()
    for t in names:
        cls = _tbl_iri(base, t)
        rows.append((cls, RDF_TYPE, RDFS + "Class", KIND_IRI, None, None))
        rows.append((cls, RDFS + "label", t, KIND_LITERAL, None, None))
        for f in catalog.schema(t):
            if not has_natural_mapping(f.type):
                continue
            p = _col_pred(base, t, f.name)
            rows.append(
                (p, RDF_TYPE, "http://www.w3.org/1999/02/22-rdf-syntax-ns#Property",
                 KIND_IRI, None, None)
            )
            rows.append((p, RDFS + "label", f.name, KIND_LITERAL, None, None))
            rows.append((p, RDFS + "domain", cls, KIND_IRI, None, None))
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([r[1] for r in rows], pa.string()),
            pa.array([r[2] for r in rows], pa.string()),
            pa.array([r[3] for r in rows], pa.uint8()),
            pa.array([r[4] for r in rows], pa.string()),
            pa.array([r[5] for r in rows], pa.string()),
            pa.nulls(len(rows), pa.string()),
        ],
        schema=TRIPLE_SCHEMA,
    )
