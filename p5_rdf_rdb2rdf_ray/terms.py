"""RDF term / triple representation on Arrow (SURVEY.md §1.2).

The reference materializes ``RDF::Trine::Statement`` objects into an
in-memory model [R: RDB2RDF.pm :: process]. We instead stream flat Arrow
batches of triple rows; flat string columns (not a term struct) keep
``map_batches`` zero-copy-friendly and make sort / distinct trivial.

Encoding:

- ``subj``  — subject: full IRI, or blank node label spelled ``_:label``
  (an IRI can never start with ``_:``).
- ``pred``  — predicate IRI.
- ``obj``   — object lexical form: IRI / ``_:label`` / literal lexical value,
  disambiguated by ``obj_kind``.
- ``obj_kind`` — uint8: 0 = IRI, 1 = blank node, 2 = literal.
- ``lang``   — language tag for language-tagged literals, else null.
- ``datatype`` — datatype IRI for typed literals, else null (plain literal).
- ``graph`` — named-graph IRI, null = default graph (quads per R2RML
  rr:graphMap, W3C-R2RML §9).
"""

from __future__ import annotations

import pyarrow as pa

KIND_IRI = 0
KIND_BNODE = 1
KIND_LITERAL = 2

TRIPLE_COLUMNS = ["subj", "pred", "obj", "obj_kind", "lang", "datatype", "graph"]

TRIPLE_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("obj_kind", pa.uint8()),
        pa.field("lang", pa.string()),
        pa.field("datatype", pa.string()),
        pa.field("graph", pa.string()),
    ]
)

def derive_term_kind(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Term-kind array for a binding column in a NON-LITERAL position
    (subject / predicate — no literal can bind there): ``_:`` prefix →
    blank node, anything else → IRI; NULL (unbound, e.g. an OPTIONAL
    var) stays NULL. The single shared implementation for every
    kind-derivation site (BGP join reconciliation, lookup unit folding,
    subquery units, CONSTRUCT instantiation)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = pc.if_else(
        pc.starts_with(pc.fill_null(col, ""), "_:"),
        pa.scalar(KIND_BNODE, pa.uint8()),
        pa.scalar(KIND_IRI, pa.uint8()),
    )
    return pc.if_else(pc.is_valid(col), arr, pa.nulls(len(col), pa.uint8()))


# Well-known IRIs
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATE = XSD + "date"
XSD_TIME = XSD + "time"
XSD_DATETIME = XSD + "dateTime"
XSD_HEXBINARY = XSD + "hexBinary"
XSD_STRING = XSD + "string"

DEFAULT_NAMESPACES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": XSD,
    "rr": "http://www.w3.org/ns/r2rml#",
}


def empty_triples() -> pa.Table:
    """An empty triple table with the canonical schema."""
    return TRIPLE_SCHEMA.empty_table()


def triples_from_arrays(
    n: int,
    subj: pa.Array,
    pred: pa.Array,
    obj: pa.Array,
    obj_kind: pa.Array,
    lang: pa.Array | None = None,
    datatype: pa.Array | None = None,
    graph: pa.Array | None = None,
) -> pa.Table:
    """Assemble a triple table; None columns become all-null."""
    def _nulls(t: pa.DataType) -> pa.Array:
        return pa.nulls(n, t)

    return pa.Table.from_arrays(
        [
            subj,
            pred,
            obj,
            obj_kind,
            lang if lang is not None else _nulls(pa.string()),
            datatype if datatype is not None else _nulls(pa.string()),
            graph if graph is not None else _nulls(pa.string()),
        ],
        schema=TRIPLE_SCHEMA,
    )
