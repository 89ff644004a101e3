"""As-of (temporal) join — a custom operator Ray Data lacks natively
(SURVEY §2.4 note: equality joins only in the reference; this is a brief
extension for event/state alignment at scale).

Semantics: INNER as-of join — each left row is matched to the single
right row with the same key and the LATEST right timestamp ≤ the left
timestamp (``direction="backward"``, pandas ``merge_asof`` semantics).
Left rows with no earlier right row are dropped.

Distribution: one union-tag hash shuffle co-locates both sides by key
(the same pattern as ``stages/dedup._semi_join`` — Ray 2.49's
``Dataset.join`` breaks on empty right partitions), then each partition
runs one vectorized ``pd.merge_asof`` over its whole block (the hash
shuffle emits exactly one block per partition, and this is the FIRST map
after it — see the invariant note in ``engine/distinct.py``).

Determinism caveat: if the right side has several rows with the same
(key, ts), which row wins is arbitrary — deduplicate the right side to
one row per (key, ts) first (the registry query keeps max(o_orderkey)).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..engine.distinct import ensure_hash_shuffle, keyed_exact, to_clean_arrow

_KEY, _TS, _SIDE = "__key", "__ts", "__side"


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    left_cols: list[str],
    right_cols: list[str],
    num_partitions: int = 16,
    out_dtypes: dict[str, str] | None = None,
) -> rd.Dataset:
    """→ ``left_cols + right_cols`` for every left row with a match.

    ``left_cols`` / ``right_cols`` are the payload columns kept from each
    side (include ``ts_left``/``key_left`` in ``left_cols`` if wanted in
    the output; ``right_cols`` may include ``ts_right``). Column names
    must not collide across sides.

    ``out_dtypes`` (column → numpy dtype string) restores integer payload
    columns on BOTH sides after the union-tag shuffle's null-padding
    widens them to float64 — without it every int64 id comes back
    float64 (round-3 driver-hash failure; same fix as ``range_join``).
    The in-partition ``rdtypes`` re-cast below only undoes merge_asof's
    own unmatched-row widening, with dtypes that are ALREADY widened by
    the union, so it cannot substitute for ``out_dtypes``.
    """
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"left/right output columns collide: {sorted(overlap)}")
    out_cols = list(left_cols) + list(right_cols)

    def tag(side: int, key: str, ts: str, cols: list[str]):
        def f(df: pd.DataFrame):
            out = pd.DataFrame({_KEY: df[key], _TS: df[ts], _SIDE: side})
            for c in cols:
                out[c] = df[c]
            return to_clean_arrow(out)

        return f

    u = left.map_batches(
        tag(0, key_left, ts_left, left_cols), batch_format="pandas"
    ).union(
        right.map_batches(
            tag(1, key_right, ts_right, right_cols), batch_format="pandas"
        )
    )
    ensure_hash_shuffle(u)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or _SIDE not in df.columns:
            return df.reindex(columns=out_cols)
        L = df[df[_SIDE] == 0].sort_values(_TS, kind="mergesort")
        R = df[df[_SIDE] == 1].sort_values(_TS, kind="mergesort")
        if not len(L) or not len(R):
            return df.reindex(columns=out_cols).iloc[0:0]
        rdtypes = {c: R[c].dtype for c in right_cols}
        R = R[[_KEY, _TS] + right_cols].assign(__m=1)
        m = pd.merge_asof(
            L[[_KEY, _TS] + left_cols],
            R,
            on=_TS,
            by=_KEY,
            direction="backward",
        )
        m = m[m["__m"].notna()]
        # unmatched rows forced right int columns to float; cast back
        for c, dt in rdtypes.items():
            m[c] = m[c].astype(dt)
        for c, dt in (out_dtypes or {}).items():
            m[c] = m[c].astype(dt)
        return m[out_cols].reset_index(drop=True)

    return keyed_exact(u, [_KEY], merge, num_partitions)


_BKT, _V, _LO, _HI = "__bkt", "__v", "__lo", "__hi"


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    value_col: str,
    lo_col: str,
    hi_col: str,
    left_cols: list[str],
    right_cols: list[str],
    bucket_width: float,
    num_partitions: int = 16,
    out_dtypes: dict[str, str] | None = None,
) -> rd.Dataset:
    """INNER interval join: every left row × every right row whose
    half-open ``[lo, hi)`` contains the left row's value — the range
    join of the brief's custom-operator list (Ray Data has no native
    interval join; the reference has equality joins only).

    ``out_dtypes`` (column → numpy dtype string) restores integer
    payload columns after the union-tag shuffle's null-padding widens
    them to float64 (see the union-tag note in the project memory /
    ``stages/dedup._semi_join``).

    Distribution (grid bucketing): a grid of ``bucket_width`` cells;
    each RIGHT interval replicates to every cell it overlaps
    (replication factor ≈ interval_len/width + 1 — pick the width near
    the typical interval length), each LEFT row lands in exactly ONE
    cell, so every match meets in the left row's cell and the output is
    duplicate-free by construction. One union-tag hash shuffle on the
    cell id, then one vectorized equi-merge + interval filter per
    partition.
    """
    import numpy as np

    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"left/right output columns collide: {sorted(overlap)}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    out_cols = list(left_cols) + list(right_cols)
    w = float(bucket_width)

    def tag_left(df: pd.DataFrame):
        v = df[value_col].to_numpy(dtype=np.float64)
        out = pd.DataFrame(
            {
                _BKT: np.floor(v / w).astype(np.int64),
                _V: v,
                _LO: np.nan,
                _HI: np.nan,
            }
        )
        for c in left_cols:
            out[c] = df[c].to_numpy()
        return to_clean_arrow(out.dropna(subset=[_V]))

    def tag_right(df: pd.DataFrame):
        lo = df[lo_col].to_numpy(dtype=np.float64)
        hi = df[hi_col].to_numpy(dtype=np.float64)
        b0 = np.floor(lo / w).astype(np.int64)
        b1 = np.ceil(hi / w).astype(np.int64) - 1  # last cell with points < hi
        span = np.maximum(b1 - b0 + 1, 0)
        keep = span > 0
        idx = np.repeat(np.flatnonzero(keep), span[keep])
        offs = np.concatenate(
            [np.arange(s) for s in span[keep]]
        ) if keep.any() else np.array([], np.int64)
        out = pd.DataFrame(
            {
                _BKT: b0[idx] + offs,
                _V: np.nan,
                _LO: lo[idx],
                _HI: hi[idx],
            }
        )
        for c in right_cols:
            out[c] = df[c].to_numpy()[idx]
        return to_clean_arrow(out)

    u = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )
    ensure_hash_shuffle(u)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or _V not in df.columns:
            return df.reindex(columns=out_cols)
        # slice columns only after the emptiness check: a one-sided
        # partition's block may lack the other side's columns entirely
        L = df[df[_V].notna()]
        R = df[df[_V].isna()]
        if not len(L) or not len(R):
            return df.reindex(columns=out_cols).iloc[0:0]
        L = L[[_BKT, _V] + left_cols]
        R = R[[_BKT, _LO, _HI] + right_cols]
        rdtypes = {c: R[c].dtype for c in right_cols}
        m = L.merge(R, on=_BKT)
        m = m[(m[_V] >= m[_LO]) & (m[_V] < m[_HI])]
        for c, dt in rdtypes.items():
            m[c] = m[c].astype(dt)
        for c, dt in (out_dtypes or {}).items():
            m[c] = m[c].astype(dt)
        return m[out_cols].reset_index(drop=True)

    return keyed_exact(u, [_BKT], merge, num_partitions)
