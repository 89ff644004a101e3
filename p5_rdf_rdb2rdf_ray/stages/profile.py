"""Single-pass column profiling — the catalog-statistics op a planner
(and any data-quality gate) wants before touching 100 TB [brief
extension; not in the reference].

One streaming pass: each block emits ONE tiny partial row per profiled
column (count / nulls / min / max — all monoids), the driver merges
``#blocks × #cols`` partial rows (bytes, not data). No shuffle. For
approximate distinct counts compose with the HLL sketch in
``stages/sketches`` (also combiner-only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def profile_columns(
    ds: rd.Dataset, cols: list[str] | None = None
) -> pd.DataFrame:
    """→ one row per profiled NUMERIC/temporal column:
    ``(column, n, nulls, min_v float64, max_v float64)`` — temporal
    columns profile as epoch microseconds. The result is #cols rows on
    the driver (a profile IS a driver artifact); everything upstream
    streams. Non-numeric columns raise — stringly min/max is
    serialization-dependent, use a grouped aggregate for those."""

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        use = cols if cols is not None else t.column_names
        for c in use:
            a = t.column(c)
            if pa.types.is_null(a.type):
                # an all-null block arrives as Arrow `null` type — it is
                # numeric-compatible (every value missing)
                a = a.cast(pa.float64())
            elif pa.types.is_timestamp(a.type):
                # normalize to epoch µs by unit-aware int64 SCALING (a
                # bare int64 cast keeps the native unit, and a safe
                # timestamp[us] cast raises on sub-µs ns values —
                # truncation is the right call for a min/max profile;
                # ns truncates toward zero, off-by-1 µs pre-epoch only)
                mult = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[
                    a.type.unit
                ]
                a64 = a.cast(pa.int64())
                a = (
                    pc.divide(a64, 1_000)
                    if mult is None
                    else pc.multiply(a64, mult)
                )
            elif pa.types.is_date(a.type):
                if pa.types.is_date64(a.type):  # ms since epoch
                    a = pc.multiply(a.cast(pa.int64()), 1_000)
                else:  # date32: days since epoch
                    a = pc.multiply(
                        a.cast(pa.int32()).cast(pa.int64()),
                        86_400_000_000,
                    )
            elif not (
                pa.types.is_integer(a.type) or pa.types.is_floating(a.type)
            ):
                raise ValueError(
                    f"profile_columns: column {c!r} has non-numeric type "
                    f"{a.type} (profile numerics/timestamps only)"
                )
            names.append(c)
            ns.append(len(a))
            nulls.append(a.null_count)
            if len(a) - a.null_count:
                mins.append(float(pc.min(a).as_py()))
                maxs.append(float(pc.max(a).as_py()))
            else:
                mins.append(np.nan)
                maxs.append(np.nan)
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.float64()),
                "max_v": pa.array(maxs, pa.float64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if not len(parts):
        return pd.DataFrame(
            {
                "column": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "nulls": pd.Series([], dtype="int64"),
                "min_v": pd.Series([], dtype="float64"),
                "max_v": pd.Series([], dtype="float64"),
            }
        )
    g = parts.groupby("column", sort=True)
    out = g.agg(
        n=("n", "sum"),
        nulls=("nulls", "sum"),
        min_v=("min_v", "min"),
        max_v=("max_v", "max"),
    ).reset_index()
    return out
