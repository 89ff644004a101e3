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


def zscore_column(
    ds: rd.Dataset,
    col: str,
    out: str = "z",
    id_cols: list[str] | None = None,
) -> rd.Dataset:
    """Z-score normalization of an INTEGER column — the standard feature
    scaling pass before mixing quality signals. Two executions:

    1. tiny global moments: per-block ``(sum, sum-of-squares, count)``
       int partials (exact — integer addition is associative; sums are
       Python ints on the driver, no float accumulation order issues),
       ≤ 3 ints per block to the driver;
    2. map-only transform with the broadcast scalars.

    Float contract for SQL-twin hashing: mean/std/z are built from the
    exact integer moments by the fixed IEEE op sequence
    ``mean = S/N; var = SS/N - mean*mean; std = sqrt(var);
    z = (x - mean)/std`` — mirror the same expression shape in the SQL
    twin and the doubles match bit-for-bit. Integer-only input is a
    hard requirement (float sums would be order-dependent); raises on
    non-integer ``col``.
    """
    import math

    import ray

    id_cols = list(id_cols) if id_cols else []

    def moments(t: pa.Table) -> pa.Table:
        a = t.column(col)
        if not pa.types.is_integer(a.type):
            raise TypeError(
                f"zscore_column needs an integer column, got {a.type}"
            )
        s = pc.sum(a).as_py() or 0
        ss = pc.sum(pc.multiply_checked(a, a)).as_py() or 0
        n = len(a) - a.null_count
        return pa.table(
            {
                "s": pa.array([s], pa.int64()),
                "ss": pa.array([ss], pa.int64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    parts = ds.select_columns([col]).map_batches(
        moments, batch_format="pyarrow"
    ).take_all()
    S = sum(p["s"] for p in parts)
    SS = sum(p["ss"] for p in parts)
    N = sum(p["n"] for p in parts)
    if N == 0:
        raise ValueError(f"zscore_column: no non-null values in {col!r}")
    mean = float(S) / float(N)
    var = float(SS) / float(N) - mean * mean
    std = math.sqrt(var)
    if std == 0.0:
        raise ValueError(f"zscore_column: {col!r} is constant")
    scal = ray.put((mean, std))

    class Z:
        def __init__(self):
            self.mean, self.std = ray.get(scal)

        def __call__(self, t: pa.Table) -> pa.Table:
            x = pc.cast(t.column(col), pa.float64())
            z = pc.divide(pc.subtract(x, self.mean), self.std)
            return t.append_column(out, z)

    keep = (id_cols + [col]) if id_cols else None
    src = ds.select_columns(keep) if keep else ds
    return src.map_batches(Z, batch_format="pyarrow", concurrency=(1, 8))


def pearson_corr(
    ds: rd.Dataset,
    x: str,
    y: str,
) -> rd.Dataset:
    """Pearson correlation of two INTEGER columns in ONE pass → a
    one-row Dataset ``(n:int64, r:float64)``.

    Same exact-moment discipline as :func:`zscore_column`: each block
    ships six integer partials ``(n, Σx, Σy, Σx², Σy², Σxy)``. The
    per-element products use checked 64-bit multiplies (overflow raises
    rather than wrapping) and the per-block sums fold in decimal128(38,0)
    — exact to 10³⁸, so a block of 10⁶ rows of near-2⁶³ products cannot
    wrap (unchecked int64 block sums could). The driver then
    folds the partials as Python ints (arbitrary precision, no float
    accumulation order), and the final float is the fixed IEEE tree
    ``(N·Σxy − Σx·Σy) / (√(N·Σx² − Σx²ᵗᵒᵗ) · √(N·Σy² − Σy²ᵗᵒᵗ))`` —
    mirror the identical expression shape in the SQL twin (HUGEINT
    arithmetic, one cast to DOUBLE per operand) and the doubles match
    bit-for-bit. Integer-only input is a hard requirement."""
    import math

    def moments(t: pa.Table) -> pa.Table:
        ax, ay = t.column(x), t.column(y)
        if not (pa.types.is_integer(ax.type) and pa.types.is_integer(ay.type)):
            raise TypeError(
                f"pearson_corr needs integer columns, got {ax.type}/{ay.type}"
            )
        if ax.null_count or ay.null_count:
            raise ValueError("pearson_corr: NULLs not supported — filter first")
        dec = pa.decimal128(38, 0)

        def dsum(arr) -> str:
            # exact block sum: checked products widen to decimal128 so
            # the in-block fold cannot wrap int64; ship as string so the
            # partial schema stays Arrow-simple and the driver folds
            # arbitrary-precision Python ints
            v = pc.sum(arr.cast(dec)).as_py()
            return str(int(v)) if v is not None else "0"

        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "sx": pa.array([dsum(ax)], pa.string()),
                "sy": pa.array([dsum(ay)], pa.string()),
                "sxx": pa.array([dsum(pc.multiply_checked(ax, ax))], pa.string()),
                "syy": pa.array([dsum(pc.multiply_checked(ay, ay))], pa.string()),
                "sxy": pa.array([dsum(pc.multiply_checked(ax, ay))], pa.string()),
            }
        )

    parts = ds.map_batches(
        moments, batch_format="pyarrow", batch_size=None
    ).take_all()
    n = sum(p["n"] for p in parts)
    sx = sum(int(p["sx"]) for p in parts)
    sy = sum(int(p["sy"]) for p in parts)
    sxx = sum(int(p["sxx"]) for p in parts)
    syy = sum(int(p["syy"]) for p in parts)
    sxy = sum(int(p["sxy"]) for p in parts)
    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(
        float(n * syy - sy * sy)
    )
    r = num / den if den else float("nan")
    return rd.from_arrow(
        pa.table({"n": pa.array([n], pa.int64()),
                  "r": pa.array([r], pa.float64())})
    )
