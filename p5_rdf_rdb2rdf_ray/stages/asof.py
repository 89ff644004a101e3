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

from ..engine.distinct import ensure_hash_shuffle, to_clean_arrow

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
) -> rd.Dataset:
    """→ ``left_cols + right_cols`` for every left row with a match.

    ``left_cols`` / ``right_cols`` are the payload columns kept from each
    side (include ``ts_left``/``key_left`` in ``left_cols`` if wanted in
    the output; ``right_cols`` may include ``ts_right``). Column names
    must not collide across sides.
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
        return m[out_cols].reset_index(drop=True)

    return (
        u.repartition(num_partitions, keys=[_KEY])
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )
