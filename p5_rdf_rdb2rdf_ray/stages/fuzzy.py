"""Blocked fuzzy string matching (edit-distance join) [brief extension
— entity-resolution / record-linkage staple; the reference joins on
column equality only (rr:joinCondition, W3C-R2RML §8)].

Scale shape — the classic BLOCKING strategy: candidate pairs come only
from rows agreeing on a cheap blocking key (here: the last ``block_last``
characters), so the quadratic verify runs per block, never corpus-wide.
ONE union-tag co-hash shuffle on the block key; each partition forms its
block-local pairs and verifies them with a BATCHED Levenshtein DP —
O(maxlen²) numpy steps vectorized across every pair in the partition,
no per-pair Python loop.

Recall caveat (inherent to blocking, document per use): pairs whose
edits fall INSIDE the blocking suffix land in different blocks and are
missed; pick the key from the stable part of the string (or union
several blocking passes with different keys).

Skew caveat: a hot blocking key concentrates its whole n_left×n_right
candidate square in ONE partition (the quadratic is per block by
design — that is what blocking is for). If a key's block is corpus-
sized, the blocking key is wrong for the data; lengthen it or salt the
verify like the engine's hash-join hot-key defense."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Edit distances for PAIRED lists (len(a) == len(b)) → int64 array.
    One DP over the padded character matrices: ~La·Lb vectorized numpy
    steps across all pairs at once."""
    n = len(a)
    if n == 0:
        return np.zeros(0, np.int64)
    la = np.array([len(s) for s in a], np.int64)
    lb = np.array([len(s) for s in b], np.int64)
    La, Lb = int(la.max(initial=0)), int(lb.max(initial=0))
    A = np.zeros((n, La), np.uint32)
    B = np.zeros((n, Lb), np.uint32)
    for i, s in enumerate(a):
        if s:
            A[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), np.uint32
            )
    for i, s in enumerate(b):
        if s:
            B[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), np.uint32
            )
    out = np.empty(n, np.int64)
    prev = np.broadcast_to(np.arange(Lb + 1, dtype=np.int64), (n, Lb + 1)).copy()
    done = la == 0
    if done.any():
        out[done] = lb[done]
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        neq = A[:, i - 1 : i] != B  # (n, Lb) substitution costs
        for j in range(1, Lb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + neq[:, j - 1],
            )
        prev = cur
        hit = la == i
        if hit.any():
            out[hit] = prev[hit, lb[hit]]
    return out


def fuzzy_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    block_last: int = 6,
    num_partitions: int = 32,
) -> rd.Dataset:
    """→ Dataset(left_col, right_col, dist:int64): pairs whose strings
    share the last-``block_last``-character blocking key AND are within
    ``max_dist`` edits. Column names must differ. NULL strings never
    match."""
    if left_col == right_col:
        raise ValueError("fuzzy_join needs distinct output column names")
    from ..engine.distinct import ensure_hash_shuffle

    def keyed(col: str, is_left: bool):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            s = t.filter(pc.is_valid(t.column(col)))
            v = s.column(col).combine_chunks()
            blk = pc.utf8_slice_codeunits(
                v, -block_last, 2_147_483_647
            )
            # union-tag into ONE explicit schema (typed null padding —
            # empty blocks stay typed, same device as engine/joins)
            pad = pa.nulls(s.num_rows, pa.string())
            return pa.table(
                {
                    "__blk": blk,
                    "__l": v if is_left else pad,
                    "__r": pad if is_left else v,
                }
            )

        return f

    L = left.map_batches(keyed(left_col, True), batch_format="pyarrow")
    R = right.map_batches(keyed(right_col, False), batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pa.Table:
        lf = df[df["__l"].notna()][["__blk", "__l"]]
        rf = df[df["__r"].notna()][["__blk", "__r"]]
        if not len(lf) or not len(rf):
            return pa.table(
                {
                    left_col: pa.array([], pa.string()),
                    right_col: pa.array([], pa.string()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        m = lf.merge(rf, on="__blk")  # block-local candidates
        d = levenshtein_batch(m["__l"].tolist(), m["__r"].tolist())
        keep = d <= max_dist
        return pa.table(
            {
                left_col: pa.array(m["__l"][keep], pa.string()),
                right_col: pa.array(m["__r"][keep], pa.string()),
                "dist": pa.array(d[keep], pa.int64()),
            }
        )

    ensure_hash_shuffle(L)
    return (
        L.union(R)
        .repartition(num_partitions, keys=["__blk"])
        .map_batches(pairs, batch_format="pandas", batch_size=None)
    )
