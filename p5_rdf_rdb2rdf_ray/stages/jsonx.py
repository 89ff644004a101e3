"""Vectorized JSON field extraction from string columns [brief
extension — semi-structured payload columns (event properties, API
blobs) are routine in transcript/event tables; the reference maps flat
SQL scalars only].

Map-only, no shuffle: the whole batch goes through polars
``str.json_path_match`` (Rust JSON parser, no per-row Python), then one
Arrow cast per requested dtype.  Malformed JSON and missing paths yield
NULL — same contract as SQL ``json_extract`` — so NULL-suppression /
filters downstream behave exactly like any other nullable column.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

_DTYPES = {"int64", "float64", "string", "bool"}


def json_extract_fields(
    ds: rd.Dataset,
    col: str,
    fields: dict[str, tuple[str, str]],
    keep: list[str] | None = None,
) -> rd.Dataset:
    """→ Dataset(keep… , out_name…): for each ``out_name → (json_path,
    dtype)`` extract the JSONPath (e.g. ``"$.k"``) from string column
    ``col`` and cast (dtype ∈ int64/float64/string/bool).  ``keep``
    lists pass-through columns (default: every column except ``col``).
    """
    bad = {d for _, d in fields.values()} - _DTYPES
    if bad:
        raise ValueError(f"unsupported dtypes {bad}; pick from {_DTYPES}")

    def f(t: pa.Table) -> pa.Table:
        import polars as pl

        kept = keep if keep is not None else [
            c for c in t.column_names if c != col
        ]
        s = pl.from_arrow(
            t.select([col]).rename_columns(["__j"])
        )["__j"]
        cols: dict[str, pa.Array] = {
            k: t.column(k).combine_chunks() for k in kept
        }
        for out, (path, dtype) in fields.items():
            raw = s.str.json_path_match(path).to_arrow()
            if dtype == "string":
                cols[out] = raw.cast(pa.string())
            elif dtype == "bool":
                cols[out] = raw.cast(pa.string()).cast(pa.bool_())
            else:
                cols[out] = raw.cast(pa.string()).cast(
                    pa.int64() if dtype == "int64" else pa.float64()
                )
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")
