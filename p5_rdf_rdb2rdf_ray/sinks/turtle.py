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

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.scalars import ntriples_escape
from ..terms import KIND_LITERAL, RDF_TYPE

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


def _term_strings(t: pa.Table, abbrev) -> pd.DataFrame:
    """Triple rows → pandas frame of Turtle-formatted subj/pred/obj."""
    df = t.to_pandas()
    subj = df["subj"].map(
        lambda s: s if s.startswith("_:") else f"<{s}>"
    )
    pred = df["pred"].map(
        lambda p: "a" if p == RDF_TYPE else abbrev(p)
    )

    def fmt_obj(row) -> str:
        if row["obj_kind"] == KIND_LITERAL:
            out = f'"{ntriples_escape(row["obj"])}"'
            if row["lang"] is not None and not pd.isna(row["lang"]):
                out += f"@{row['lang']}"
            elif row["datatype"] is not None and not pd.isna(row["datatype"]):
                out += f"^^{abbrev(row['datatype'])}"
            return out
        o = row["obj"]
        return o if o.startswith("_:") else f"<{o}>"

    obj = df.apply(fmt_obj, axis=1) if len(df) else pd.Series([], dtype=object)
    return pd.DataFrame({"subj": subj, "pred": pred, "obj": obj})


def turtle_blocks_batch(
    t: pa.Table, prefixes: dict[str, str] | None = None
) -> pa.Table:
    """Triple rows → one-column table ``block`` of per-subject Turtle
    blocks (``<s> p1 o1 ; p2 o2 .``), predicates/objects ``,``-grouped
    per predicate, stable (subj, pred, obj) order."""
    abbrev = _abbreviator({**DEFAULT_PREFIXES, **(prefixes or {})})
    if t.num_rows == 0:
        return pa.table({"block": pa.array([], pa.string())})
    df = _term_strings(t, abbrev)
    df = df.drop_duplicates().sort_values(
        ["subj", "pred", "obj"], kind="mergesort"
    )
    blocks: list[str] = []
    for subj, g in df.groupby("subj", sort=False):
        po: list[str] = []
        for pred, gg in g.groupby("pred", sort=False):
            po.append(f"{pred} " + ", ".join(gg["obj"]))
        blocks.append(f"{subj} " + " ;\n    ".join(po) + " .")
    return pa.table({"block": pa.array(blocks, pa.string())})


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
        parts.extend(b.column("block").to_pylist())
    return "\n".join(parts) + "\n"


class _TurtleWriter:
    def __init__(self, path: str, prefixes: dict[str, str] | None):
        self.path = path
        self.prefixes = prefixes

    def __call__(self, t: pa.Table) -> pa.Table:
        import os
        import uuid

        blocks = turtle_blocks_batch(t, self.prefixes).column("block").to_pylist()
        if blocks:
            os.makedirs(self.path, exist_ok=True)
            fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.ttl")
            with open(fname, "w", encoding="utf-8") as f:
                f.write(prefix_header(self.prefixes) + "\n\n")
                f.write("\n".join(blocks) + "\n")
        return pa.table({"blocks": pa.array([len(blocks)], pa.int64())})


def write_turtle(
    ds: rd.Dataset, path: str, prefixes: dict[str, str] | None = None
) -> int:
    """Distributed Turtle text sink (one self-contained ``part-*.ttl``
    per batch, each with its own @prefix header); returns block count."""
    counts = ds.map_batches(_TurtleWriter(path, prefixes), batch_format="pyarrow")
    return sum(r["blocks"] for r in counts.take_all())
