"""Turtle text sink — the reference's primary serialization
[R: RDB2RDF.pm :: process_turtle]. N-Triples (``sinks/ntriples.py``)
remains the canonical golden-compare format (line-oriented ⇒
embarrassingly parallel); this sink produces the compact, prefixed,
subject-grouped Turtle a reference user expects.

Distribution model: each batch serializes independently into per-subject
blocks. Blocks are valid Turtle wherever a subject's triples land, but
output is most compact when subjects are co-located (the triple store's
subject-hash buckets already guarantee that; otherwise sort by subject
first). Every written part file carries its own ``@prefix`` header, so
parts stay independently parseable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.scalars import ntriples_escape_array
from ..terms import KIND_LITERAL, RDF_TYPE
from .ntriples import _fmt_node

DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

_LOCAL_OK = r"^[A-Za-z_][A-Za-z0-9_\-]*$"


def _abbreviator(prefixes: dict[str, str]):
    import re

    rx = re.compile(_LOCAL_OK)
    # longest namespace wins when namespaces nest
    items = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))

    def abbrev(iri: str) -> str:
        for pfx, ns in items:
            if iri.startswith(ns) and rx.match(iri[len(ns):] or " "):
                return f"{pfx}:{iri[len(ns):]}"
        return f"<{iri}>"

    return abbrev


def _abbrev_array(arr: pa.Array, abbrev, rdf_type_as_a: bool = False) -> pa.Array:
    """Apply the (Python) prefix abbreviator to an IRI column via its
    dictionary encoding — O(distinct IRIs) Python calls, everything else
    Arrow take. Predicates/datatypes have few distinct values per batch."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = pc.dictionary_encode(arr)
    vals = pa.array(
        [
            None
            if v is None
            else ("a" if rdf_type_as_a and v == RDF_TYPE else abbrev(v))
            for v in d.dictionary.to_pylist()
        ],
        pa.string(),
    )
    return pc.take(vals, d.indices)


def _term_strings(t: pa.Table, abbrev) -> pa.Table:
    """Triple rows → Arrow table of Turtle-formatted subj/pred/obj.
    Vectorized with the same Arrow kernels as the N-Triples sink; the
    Python ``abbrev`` runs only per distinct predicate/datatype."""
    subj = _fmt_node(t.column("subj").combine_chunks())
    pred = _abbrev_array(t.column("pred"), abbrev, rdf_type_as_a=True)
    obj = t.column("obj").combine_chunks()
    kind = t.column("obj_kind").combine_chunks()
    lang = t.column("lang").combine_chunks()
    dt = t.column("datatype").combine_chunks()
    lit_body = pc.binary_join_element_wise(
        pa.scalar('"'), ntriples_escape_array(obj), pa.scalar('"'), pa.scalar("")
    )
    lang_sfx = pc.if_else(
        pc.is_valid(lang),
        pc.binary_join_element_wise(
            pa.scalar("@"), pc.fill_null(lang, ""), pa.scalar("")
        ),
        pa.scalar(""),
    )
    # datatype abbreviates like any IRI (xsd: usually); lang wins if both
    dt_sfx = pc.if_else(
        pc.and_(pc.is_null(lang), pc.is_valid(dt)),
        pc.binary_join_element_wise(
            pa.scalar("^^"),
            _abbrev_array(pc.fill_null(dt, ""), abbrev),
            pa.scalar(""),
        ),
        pa.scalar(""),
    )
    literal = pc.binary_join_element_wise(lit_body, lang_sfx, dt_sfx, pa.scalar(""))
    obj_s = pc.if_else(pc.equal(kind, KIND_LITERAL), literal, _fmt_node(obj))
    return pa.table({"subj": subj, "pred": pred, "obj": obj_s})


def turtle_blocks_batch(
    t: pa.Table, prefixes: dict[str, str] | None = None
) -> pa.Table:
    """Triple rows → one-row table ``(block: the batch's Turtle text,
    n_subjects)`` of per-subject blocks (``<s> p1 o1 ; p2 o2 .``),
    predicates/objects ``,``-grouped per predicate, stable (subj, pred,
    obj) order, blocks joined by newline.

    Arrow-native end to end: sort → neighbor dedup → one vectorized
    ``binary_join_element_wise`` pass picks each row's separator (new
    subject / new predicate / same predicate) — no pandas, no per-group
    Python loop; the only Python-level work is the final byte join."""
    abbrev = _abbreviator({**DEFAULT_PREFIXES, **(prefixes or {})})
    if t.num_rows == 0:
        return pa.table(
            {
                "block": pa.array([], pa.string()),
                "n_subjects": pa.array([], pa.int64()),
            }
        )
    ts = _term_strings(t, abbrev).sort_by(
        [("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")]
    )
    subj = ts.column("subj").combine_chunks()
    pred = ts.column("pred").combine_chunks()
    obj = ts.column("obj").combine_chunks()
    n = len(subj)

    def changed(a: pa.Array) -> pa.Array:
        # row i differs from row i-1 (row 0 always "changed")
        if n == 1:
            return pa.array([True])
        neq = pc.not_equal(a.slice(1), a.slice(0, n - 1))
        if isinstance(neq, pa.ChunkedArray):
            neq = neq.combine_chunks()
        return pa.concat_arrays([pa.array([True]), neq])

    new_subj = changed(subj)
    new_pred = pc.or_(new_subj, changed(pred))
    dup = pc.and_(
        pc.invert(new_pred), pc.invert(changed(obj))
    )  # same (s,p,o) as previous row → exact-duplicate triple
    keep = pc.invert(dup)
    if not pc.all(keep).as_py():
        subj = subj.filter(keep)
        pred = pred.filter(keep)
        obj = obj.filter(keep)
        new_subj = new_subj.filter(keep)
        new_pred = new_pred.filter(keep)
        n = len(subj)

    first = pa.array([True] + [False] * (n - 1))
    sep = pc.if_else(
        new_subj,
        pc.if_else(first, pa.scalar(""), pa.scalar(" .\n")),
        pc.if_else(new_pred, pa.scalar(" ;\n    "), pa.scalar(", ")),
    )
    head = pc.if_else(
        new_subj,
        pc.binary_join_element_wise(subj, " ", pred, " ", ""),
        pc.if_else(
            new_pred,
            pc.binary_join_element_wise(pred, " ", ""),
            pa.scalar(""),
        ),
    )
    pieces = pc.binary_join_element_wise(sep, head, obj, "")
    text = "".join(pieces.to_pylist()) + " ."
    return pa.table(
        {
            "block": pa.array([text], pa.string()),
            "n_subjects": pa.array(
                [pc.sum(pc.cast(new_subj, pa.int64())).as_py()], pa.int64()
            ),
        }
    )


def prefix_header(prefixes: dict[str, str] | None = None) -> str:
    out = []
    for pfx, ns in sorted({**DEFAULT_PREFIXES, **(prefixes or {})}.items()):
        out.append(f"@prefix {pfx}: <{ns}> .")
    return "\n".join(out)


def collect_turtle(
    ds: rd.Dataset, prefixes: dict[str, str] | None = None
) -> str:
    """Materialize the whole graph as one Turtle document (small graphs /
    tests — the reference's ``process_turtle`` return value)."""
    parts = [prefix_header(prefixes), ""]
    for b in ds.map_batches(
        lambda t: turtle_blocks_batch(t, prefixes), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        parts.extend(s for s in b.column("block").to_pylist() if s)
    return "\n".join(parts) + "\n"


class _TurtleWriter:
    def __init__(self, path: str, prefixes: dict[str, str] | None):
        self.path = path
        self.prefixes = prefixes

    def __call__(self, t: pa.Table) -> pa.Table:
        import os
        import uuid

        out = turtle_blocks_batch(t, self.prefixes)
        texts = [s for s in out.column("block").to_pylist() if s]
        n_subj = sum(out.column("n_subjects").to_pylist() or [0])
        if texts:
            os.makedirs(self.path, exist_ok=True)
            fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.ttl")
            with open(fname, "w", encoding="utf-8") as f:
                f.write(prefix_header(self.prefixes) + "\n\n")
                f.write("\n".join(texts) + "\n")
        return pa.table({"blocks": pa.array([n_subj], pa.int64())})


def write_turtle(
    ds: rd.Dataset, path: str, prefixes: dict[str, str] | None = None
) -> int:
    """Distributed Turtle text sink (one self-contained ``part-*.ttl``
    per batch, each with its own @prefix header); returns block count."""
    counts = ds.map_batches(_TurtleWriter(path, prefixes), batch_format="pyarrow")
    return sum(r["blocks"] for r in counts.take_all())


def turtle_to_triple_table(text: str) -> pa.Table:
    """Parse one Turtle document → triple rows (TRIPLE_SCHEMA; Turtle is
    a triples serialization — ``graph`` is null). Reuses the mapping
    front-end's Turtle-subset parser (prefixes, ``a``, ``;``/``,``
    groups, bnodes, language/datatype literals) — a superset of what
    :func:`write_turtle` emits, so sink output always round-trips."""
    from ..mapping.turtle import parse_turtle
    from ..terms import KIND_BNODE, KIND_IRI, TRIPLE_SCHEMA

    g, _ = parse_turtle(text)
    subj, pred, obj, kind, lang, dt = [], [], [], [], [], []
    for s, p, o in g.triples:
        subj.append(s[1] if s[0] == "iri" else "_:" + s[1])
        pred.append(p[1])
        if o[0] == "lit":
            obj.append(o[1])
            kind.append(KIND_LITERAL)
            lang.append(o[2])
            dt.append(o[3])
        else:
            obj.append(o[1] if o[0] == "iri" else "_:" + o[1])
            kind.append(KIND_IRI if o[0] == "iri" else KIND_BNODE)
            lang.append(None)
            dt.append(None)
    n = len(subj)
    return pa.table(
        {
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "obj_kind": pa.array(kind, pa.uint8()),
            "lang": pa.array(lang, pa.string()),
            "datatype": pa.array(dt, pa.string()),
            "graph": pa.nulls(n, pa.string()),
        },
        schema=TRIPLE_SCHEMA,
    )


def read_turtle(path: str) -> rd.Dataset:
    """Distributed Turtle source: ``path`` is a ``write_turtle`` output
    directory (or a single ``.ttl`` file). Each part file is
    self-contained (own @prefix header), so files parse in parallel —
    one task per file via ``map_batches`` over the file list."""
    import os

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".ttl")
        )
    else:
        files = [path]
    if not files:
        from ..terms import TRIPLE_SCHEMA

        return rd.from_arrow(
            pa.Table.from_arrays(
                [pa.array([], f.type) for f in TRIPLE_SCHEMA],
                schema=TRIPLE_SCHEMA,
            )
        )

    def parse_files(t: pa.Table) -> pa.Table:
        from ..terms import TRIPLE_SCHEMA

        tabs = []
        for p in t.column("path").to_pylist():
            with open(p, encoding="utf-8") as f:
                tabs.append(turtle_to_triple_table(f.read()))
        if not tabs:
            return pa.Table.from_arrays(
                [pa.array([], f.type) for f in TRIPLE_SCHEMA],
                schema=TRIPLE_SCHEMA,
            )
        return pa.concat_tables(tabs)

    return rd.from_items([{"path": f} for f in files]).map_batches(
        parse_files, batch_format="pyarrow", batch_size=1
    )
