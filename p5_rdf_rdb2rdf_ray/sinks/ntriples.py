"""N-Triples / N-Quads text sink (SURVEY §2 #6).

The reference serializes the model to Turtle [R: RDB2RDF.pm ::
process_turtle]. We emit N-Triples/N-Quads instead: line-oriented ⇒
embarrassingly parallel, canonical for golden compares. Fully vectorized
(pyarrow string kernels; the only python-level work is the values that
actually need escaping).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.scalars import ntriples_escape_array
from ..terms import KIND_LITERAL


def _fmt_node(arr: pa.Array) -> pa.Array:
    """IRI → <iri>; blank node label (``_:…``) passes through."""
    is_bnode = pc.starts_with(arr, "_:")
    wrapped = pc.binary_join_element_wise(
        pa.scalar("<"), arr, pa.scalar(">"), pa.scalar("")
    )
    return pc.if_else(is_bnode, arr, wrapped)


def format_batch(t: pa.Table) -> pa.Table:
    """Triple rows → one-column table ``line`` of N-Triples/N-Quads lines
    (without trailing newline)."""
    n = t.num_rows
    if n == 0:
        return pa.table({"line": pa.array([], pa.string())})
    subj = _fmt_node(t.column("subj").combine_chunks())
    pred = pc.binary_join_element_wise(
        pa.scalar("<"), t.column("pred").combine_chunks(), pa.scalar(">"), pa.scalar("")
    )
    obj = t.column("obj").combine_chunks()
    kind = t.column("obj_kind").combine_chunks()
    lang = t.column("lang").combine_chunks()
    dt = t.column("datatype").combine_chunks()

    lit_body = pc.binary_join_element_wise(
        pa.scalar('"'), ntriples_escape_array(obj), pa.scalar('"'), pa.scalar("")
    )
    lang_sfx = pc.if_else(
        pc.is_valid(lang),
        pc.binary_join_element_wise(pa.scalar("@"), pc.fill_null(lang, ""), pa.scalar("")),
        pa.scalar(""),
    )
    dt_sfx = pc.if_else(
        pc.is_valid(dt),
        pc.binary_join_element_wise(
            pa.scalar("^^<"), pc.fill_null(dt, ""), pa.scalar(">"), pa.scalar("")
        ),
        pa.scalar(""),
    )
    literal = pc.binary_join_element_wise(lit_body, lang_sfx, dt_sfx, pa.scalar(""))
    node = _fmt_node(obj)
    obj_s = pc.if_else(pc.equal(kind, KIND_LITERAL), literal, node)

    graph = t.column("graph").combine_chunks()
    g_sfx = pc.if_else(
        pc.is_valid(graph),
        pc.binary_join_element_wise(
            pa.scalar(" "), _fmt_node(pc.fill_null(graph, "")), pa.scalar("")
        ),
        pa.scalar(""),
    )
    line = pc.binary_join_element_wise(
        subj, pa.scalar(" "), pred, pa.scalar(" "), obj_s, g_sfx, pa.scalar(" ."),
        pa.scalar(""),
    )
    return pa.table({"line": line})


def format_terms_batch(t: pa.Table, with_graph: bool = False) -> pa.Table:
    """Triple rows → 3 columns (subj, pred, obj) of N-Triples TERM strings
    — the order-insensitive compare format for the DuckDB oracles.
    ``with_graph=True`` adds a 4th ``graph`` column (``<iri>`` or null for
    the default graph) for named-graph / quad oracles."""
    n = t.num_rows
    if n == 0:
        e = pa.array([], pa.string())
        cols = {"subj": e, "pred": e, "obj": e}
        if with_graph:
            cols["graph"] = e
        return pa.table(cols)
    subj = _fmt_node(t.column("subj").combine_chunks())
    pred = pc.binary_join_element_wise(
        pa.scalar("<"), t.column("pred").combine_chunks(), pa.scalar(">"), pa.scalar("")
    )
    obj = t.column("obj").combine_chunks()
    kind = t.column("obj_kind").combine_chunks()
    lang = t.column("lang").combine_chunks()
    dt = t.column("datatype").combine_chunks()
    lit_body = pc.binary_join_element_wise(
        pa.scalar('"'), ntriples_escape_array(obj), pa.scalar('"'), pa.scalar("")
    )
    lang_sfx = pc.if_else(
        pc.is_valid(lang),
        pc.binary_join_element_wise(pa.scalar("@"), pc.fill_null(lang, ""), pa.scalar("")),
        pa.scalar(""),
    )
    dt_sfx = pc.if_else(
        pc.is_valid(dt),
        pc.binary_join_element_wise(
            pa.scalar("^^<"), pc.fill_null(dt, ""), pa.scalar(">"), pa.scalar("")
        ),
        pa.scalar(""),
    )
    literal = pc.binary_join_element_wise(lit_body, lang_sfx, dt_sfx, pa.scalar(""))
    obj_s = pc.if_else(pc.equal(kind, KIND_LITERAL), literal, _fmt_node(obj))
    cols = {"subj": subj, "pred": pred, "obj": obj_s}
    if with_graph:
        g = t.column("graph").combine_chunks()
        cols["graph"] = pc.if_else(
            pc.is_valid(g), _fmt_node(pc.fill_null(g, "")), pa.nulls(n, pa.string())
        )
    return pa.table(cols)


def to_term_columns(ds: rd.Dataset, with_graph: bool = False) -> rd.Dataset:
    def fmt(t: pa.Table) -> pa.Table:
        return format_terms_batch(t, with_graph=with_graph)

    return ds.map_batches(fmt, batch_format="pyarrow")


def to_ntriples_dataset(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(format_batch, batch_format="pyarrow")


def collect_ntriples(ds: rd.Dataset) -> list[str]:
    """Materialize all lines (tests / small graphs only)."""
    out: list[str] = []
    for b in to_ntriples_dataset(ds).iter_batches(batch_format="pyarrow"):
        out.extend(b.column("line").to_pylist())
    return out


class _PartWriter:
    """Task-side text writer: one ``part-*.nt`` file per batch."""

    def __init__(self, path: str):
        self.path = path

    def __call__(self, t: pa.Table) -> pa.Table:
        import os
        import uuid

        lines = format_batch(t).column("line").to_pylist()
        if lines:
            os.makedirs(self.path, exist_ok=True)
            fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.nt")
            with open(fname, "w", encoding="utf-8") as f:
                f.write("\n".join(lines) + "\n")
        return pa.table({"rows": pa.array([len(lines)], pa.int64())})


def write_ntriples(ds: rd.Dataset, path: str) -> int:
    """Distributed N-Triples text sink; returns the number of lines.

    Parts are uniquely named, so a re-run APPENDS — text sinks are
    export formats, not the resumable system of record; for
    checkpoint/resume semantics write the partitioned triple store
    (``sinks/triplestore.py``) and export from it."""
    counts = ds.map_batches(_PartWriter(path), batch_format="pyarrow")
    return sum(r["rows"] for r in counts.take_all())


def table_to_ntriples(t: pa.Table) -> list[str]:
    """Driver-side helper for an in-memory triple table."""
    return format_batch(t).column("line").to_pylist()


# ---------------------------------------------------------------------------
# N-Triples / N-Quads READER (source symmetry: .nt written by this sink —
# or any conformant tool — parses back into the engine's triple Dataset;
# an optional 4th graph term makes quad lines round-trip too)

_NT_LINE = (
    r'^\s*(?:(<(?P<siri>[^>]*)>)|(?P<sbn>_:\S+))\s+'
    r'<(?P<pred>[^>]*)>\s+'
    r'(?:(<(?P<oiri>[^>]*)>)|(?P<obn>_:[^\s]+)|'
    r'"(?P<olit>(?:[^"\\]|\\.)*)"'
    r'(?:@(?P<lang>[A-Za-z0-9\-]+)|\^\^<(?P<dt>[^>]*)>)?)'
    r'(?:\s+(?:<(?P<giri>[^>]*)>|(?P<gbn>_:\S+)))?'
    r'\s*\.\s*$'
)


def _unescape_nt(s: str) -> str:
    from ..mapping.turtle import _unescape

    return _unescape(s)


def parse_ntriples_batch(t: pa.Table, line_col: str = "text") -> pa.Table:
    """Vectorized-ish N-Triples line parse → TRIPLE_SCHEMA rows.

    Structure extraction is one compiled-regex pass (pandas
    ``str.extract``); only literal values containing escapes take the
    Python unescape path. Lines that are blank/comments are skipped;
    malformed lines raise (garbage in a triple dump is a data bug)."""
    import pandas as pd

    from ..terms import KIND_BNODE, KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA

    s = pd.Series(t.column(line_col).to_pylist(), dtype="object").fillna("")
    keep = ~(s.str.match(r"^\s*(#.*)?$"))
    s = s[keep]
    if not len(s):
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
        )
    m = s.str.extract(_NT_LINE)
    bad = m["pred"].isna()
    if bad.any():
        raise ValueError(f"malformed N-Triples line: {s[bad].iloc[0]!r}")
    subj = m["siri"].combine_first(m["sbn"])
    is_lit = m["olit"].notna()
    obj = m["oiri"].combine_first(m["obn"]).combine_first(m["olit"])
    kind = np.where(
        is_lit, KIND_LITERAL, np.where(m["obn"].notna(), KIND_BNODE, KIND_IRI)
    ).astype("uint8")
    # unescape only literals that contain a backslash (the single escape
    # character — NOT the two-char sequence r"\\")
    esc = is_lit & obj.str.contains("\\", regex=False)
    if esc.any():
        obj = obj.copy()
        obj[esc] = obj[esc].map(_unescape_nt)
    graph = m["giri"].combine_first(m["gbn"])
    return pa.Table.from_arrays(
        [
            pa.array(subj, pa.string()),
            pa.array(m["pred"], pa.string()),
            pa.array(obj, pa.string()),
            pa.array(kind),
            pa.array(m["lang"], pa.string()),
            pa.array(m["dt"], pa.string()),
            pa.array(graph, pa.string()),
        ],
        schema=TRIPLE_SCHEMA,
    )


def read_ntriples(path: str) -> rd.Dataset:
    """Distributed N-Triples source: line-oriented text → triple Dataset
    (the inverse of :func:`write_ntriples`; lines parallelize for free)."""
    return rd.read_text(path).map_batches(
        parse_ntriples_batch, batch_format="pyarrow"
    )
