"""SPARQL query-results serializers: the W3C result formats over a
bindings Dataset (one string column per variable, as returned by
``engine.sparql.sparql`` / ``get_pattern*``).

- CSV  — *SPARQL 1.1 Query Results CSV and TSV Formats* §3: header of
  bare variable names, LEXICAL values (no term syntax), RFC 4180
  quoting, CRLF row endings, unbound → empty field.
- TSV  — same Recommendation §4: header of ``?var`` names, terms in
  Turtle/N-Triples syntax (``<iri>``, ``"literal"``, ``_:bnode``),
  unbound → empty field.
- JSON — *SPARQL 1.1 Query Results JSON Format*: ``{"head": {"vars":
  […]}, "results": {"bindings": […]}}``; each binding maps bound vars
  to ``{"type": "uri"|"literal"|"bnode", "value": …}``; ASK results
  serialize as ``{"head": {}, "boolean": …}``.

Term typing: a hidden ``__k_<var>`` term-kind column is used when the
Dataset retains one (``keep_kinds=True`` planner calls), else the kind
derives from the surface form (``terms.derive_term_kind`` — the same
rule the BGP union alignment uses). Language tags and datatypes are
NOT emitted: the engine's binding model carries lexical forms only
(see ``engine/sparql.py`` deviation notes), so TSV literals are plain
``"…"`` and JSON literals carry no ``xml:lang``/``datatype`` keys.

Distribution: each output is a DIRECTORY of part files, one per input
block, written task-side (the ``write_ntriples`` pattern) — the scale
path for big solution sets. Every CSV/TSV part repeats the header and
every JSON part is a complete, valid results document, so parts are
individually consumable; ``single_file=True`` instead streams batches
through the driver with backpressure into ONE standards-exact file
(bounded driver memory: one batch at a time — the right mode for the
typical final, human-sized result).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..terms import KIND_BNODE, KIND_LITERAL, derive_term_kind


def binding_vars(names: list[str]) -> list[str]:
    """Variable columns of a bindings schema (hidden ``__``-prefixed
    planner columns — term kinds etc. — are not variables)."""
    return [c for c in names if not c.startswith("__")]


def _kinds_of(t: pa.Table, v: str) -> pa.Array:
    kc = f"__k_{v}"
    col = t.column(v).combine_chunks()
    if kc in t.column_names:
        k = t.column(kc).combine_chunks()
        # OPTIONAL rows may carry NULL kinds for unbound vars; fall
        # back to the surface form there (value is NULL anyway)
        return pc.fill_null(k, KIND_LITERAL)
    return derive_term_kind(col)


def _csv_field(s: str) -> str:
    if any(c in s for c in (",", '"', "\n", "\r")):
        return '"' + s.replace('"', '""') + '"'
    return s


def _csv_lines(t: pa.Table, vars_: list[str], header: bool) -> list[str]:
    """W3C results-CSV lines (no trailing newline per line; the writer
    joins with CRLF). Lexical values; unbound → empty."""
    lines = [",".join(vars_)] if header else []
    cols = [t.column(v).to_pylist() for v in vars_]
    for row in zip(*cols) if cols else []:
        lines.append(
            ",".join(_csv_field(x) if x is not None else "" for x in row)
        )
    return lines


def _tsv_term(value: str | None, kind: int) -> str:
    if value is None:
        return ""
    if kind == KIND_LITERAL:
        from ..functions.scalars import ntriples_escape

        return '"' + ntriples_escape(value) + '"'
    if kind == KIND_BNODE or value.startswith("_:"):
        return value
    return f"<{value}>"


def _tsv_lines(t: pa.Table, vars_: list[str], header: bool) -> list[str]:
    lines = ["\t".join("?" + v for v in vars_)] if header else []
    cols = [t.column(v).to_pylist() for v in vars_]
    kinds = [_kinds_of(t, v).to_pylist() for v in vars_]
    for i in range(t.num_rows):
        lines.append(
            "\t".join(_tsv_term(cols[j][i], kinds[j][i])
                      for j in range(len(vars_)))
        )
    return lines


_JSON_TYPE = {KIND_LITERAL: "literal", KIND_BNODE: "bnode"}


def _json_bindings(t: pa.Table, vars_: list[str]) -> list[dict]:
    cols = [t.column(v).to_pylist() for v in vars_]
    kinds = [_kinds_of(t, v).to_pylist() for v in vars_]
    out = []
    for i in range(t.num_rows):
        b = {}
        for j, v in enumerate(vars_):
            val = cols[j][i]
            if val is None:
                continue  # unbound vars are omitted from the binding
            b[v] = {
                "type": _JSON_TYPE.get(kinds[j][i], "uri"),
                "value": val,
            }
        out.append(b)
    return out


class _ResultsPartWriter:
    """Task-side part writer: one self-contained results file per
    block (header / head repeated, so each part parses standalone).
    Variables come from the block's own column names — never from
    ``Dataset.schema()``, which would execute the plan once extra."""

    def __init__(self, path: str, fmt: str):
        self.path, self.fmt = path, fmt

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n:
            vars_ = binding_vars(t.column_names)
            os.makedirs(self.path, exist_ok=True)
            part = os.path.join(
                self.path, f"part-{uuid.uuid4().hex}.{self.fmt}"
            )
            with open(part, "w", encoding="utf-8", newline="") as f:
                if self.fmt == "csv":
                    f.write(
                        "\r\n".join(_csv_lines(t, vars_, True)) + "\r\n"
                    )
                elif self.fmt == "tsv":
                    f.write("\n".join(_tsv_lines(t, vars_, True)) + "\n")
                else:
                    json.dump(
                        {
                            "head": {"vars": vars_},
                            "results": {
                                "bindings": _json_bindings(t, vars_)
                            },
                        },
                        f,
                        ensure_ascii=False,
                    )
        return pa.table({"rows": pa.array([n], pa.int64())})


def _write(ds: rd.Dataset, path: str, fmt: str, single_file: bool) -> int:
    if not single_file:
        counts = ds.map_batches(
            _ResultsPartWriter(path, fmt), batch_format="pyarrow"
        )
        return sum(r["rows"] for r in counts.take_all())
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    total = 0
    vars_: list[str] | None = None
    with open(path, "w", encoding="utf-8", newline="") as f:
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            if vars_ is None:
                vars_ = binding_vars(b.column_names)
                if fmt == "csv":
                    f.write(",".join(vars_) + "\r\n")
                elif fmt == "tsv":
                    f.write("\t".join("?" + v for v in vars_) + "\n")
                else:
                    f.write(
                        '{"head": {"vars": %s}, "results": {"bindings": ['
                        % json.dumps(vars_)
                    )
            if fmt == "csv":
                lines = _csv_lines(b, vars_, False)
                if lines:
                    f.write("\r\n".join(lines) + "\r\n")
            elif fmt == "tsv":
                lines = _tsv_lines(b, vars_, False)
                if lines:
                    f.write("\n".join(lines) + "\n")
            else:
                txt = ", ".join(
                    json.dumps(x, ensure_ascii=False)
                    for x in _json_bindings(b, vars_)
                )
                if txt:
                    f.write((", " if total else "") + txt)
            total += b.num_rows
        if vars_ is None:
            # zero blocks: emit an empty-but-valid document (the var
            # list is unknowable without executing the plan — W3C
            # permits an empty head)
            f.write('{"head": {"vars": []}, "results": {"bindings": []}}'
                    if fmt == "json" else "")
        elif fmt == "json":
            f.write("]}}")
    return total


def write_results_csv(
    ds: rd.Dataset, path: str, single_file: bool = False
) -> int:
    """W3C results-CSV sink; returns the number of solution rows."""
    return _write(ds, path, "csv", single_file)


def write_results_tsv(
    ds: rd.Dataset, path: str, single_file: bool = False
) -> int:
    """W3C results-TSV sink (terms in N-Triples syntax)."""
    return _write(ds, path, "tsv", single_file)


def write_results_json(
    ds: rd.Dataset, path: str, single_file: bool = False
) -> int:
    """W3C SPARQL-results-JSON sink. Sharded mode writes one complete
    results document per block; ``single_file=True`` streams all
    bindings into one document."""
    return _write(ds, path, "json", single_file)


def ask_results_json(result: bool) -> str:
    """The JSON results document for an ASK answer."""
    return json.dumps({"head": {}, "boolean": bool(result)})
