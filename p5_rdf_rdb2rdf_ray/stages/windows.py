"""Ordered-window operators over keyed partitions: rolling (sliding
ROWS-frame) aggregates and per-group rank functions.

Complements ``stages/sessions.py`` (session/tumbling/hopping windows,
LAG/LEAD shifts) with the remaining SQL-window shapes a
feature-engineering pipeline needs: moving averages over a user's event
stream and rank/ntile signals per group (e.g. spend percentile within a
customer segment).

Scale shape (shared by both ops): project to the needed columns, ONE
hash shuffle on the partition keys, then per-block vectorized pandas —
exact because a key never spans blocks after the keyed repartition (one
block per partition; see ``sessions.window_shift`` for the same
invariant). Both route through :func:`~..engine.distinct.keyed_exact`,
which pins that invariant per Ray version and degrades to a
slow-but-correct ``map_groups`` fallback on an unpinned runtime. The
reference has no window functions (RDF output is a set) — these are
brief extensions for the training-data surface.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pandas as pd
import ray.data as rd

from ..engine.distinct import ensure_hash_shuffle, keyed_exact, to_clean_arrow

_ROLL_FNS = {"sum", "mean", "min", "max", "count"}


def rolling_aggregate(
    events: rd.Dataset,
    keys: Sequence[str],
    order_by: Sequence[str],
    aggs: Mapping[str, tuple[str, str, int]],
    num_partitions: int = 16,
) -> rd.Dataset:
    """SQL sliding-window aggregate per key partition —
    ``aggs``: out_col -> (src_col, fn, n) computes
    ``fn(src) OVER (PARTITION BY keys ORDER BY order_by
    ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW)``.

    fn in sum/mean/min/max/count. Make ``order_by`` a TOTAL order
    (include a unique tiebreaker) for deterministic output. Every input
    column rides along; windows never cross group boundaries
    (pandas ``groupby(...).rolling`` semantics == SQL PARTITION BY).

    Float caveat for SQL-twin comparison: pandas ``rolling.sum/mean``
    uses a sliding add/subtract accumulator while SQL re-sums each
    frame, so float64 sources can differ in the last ulp — use integral
    sources (counts, int-valued doubles) when hash-matching an oracle,
    the same rule as ``grouped_aggregate``.
    """
    if not aggs:
        raise ValueError("aggs must not be empty")
    keys = list(keys)
    order_by = list(order_by)
    for out, (_src, fn, n) in aggs.items():
        if fn not in _ROLL_FNS:
            raise ValueError(f"unsupported rolling fn {fn!r}")
        if n < 1:
            raise ValueError(f"window size for {out!r} must be >= 1")
        if out.startswith("__"):
            raise ValueError("'__'-prefixed output columns are reserved")

    ensure_hash_shuffle(events)

    def roll(df: pd.DataFrame):
        clash = [o for o in aggs if o in df.columns]
        if clash:
            raise ValueError(f"rolling outputs {clash} collide with input")
        if not len(df):
            for out, (src, _fn, _n) in aggs.items():
                df[out] = pd.Series([], dtype="float64")
            return to_clean_arrow(df)
        df = df.sort_values(
            keys + order_by, kind="mergesort"
        ).reset_index(drop=True)
        g = df.groupby(keys, dropna=False, sort=False)
        computed = {}
        for out, (src, fn, n) in aggs.items():
            r = g[src].rolling(window=n, min_periods=1)
            s = getattr(r, fn)().reset_index(drop=True)
            if fn == "count":
                s = s.astype("int64")
            computed[out] = s
        for out, s in computed.items():
            df[out] = s
        return to_clean_arrow(df)

    return keyed_exact(events, keys, roll, num_partitions)


_RANK_FNS = {"row_number", "rank", "dense_rank", "percent_rank", "ntile"}


def grouped_rank(
    ds: rd.Dataset,
    keys: Sequence[str],
    order_by: Sequence[str],
    ranks: Mapping[str, tuple[str, int | None]],
    descending: bool | Sequence[bool] = False,
    num_partitions: int = 16,
) -> rd.Dataset:
    """SQL rank window functions per key partition —
    ``ranks``: out_col -> (fn, arg) with fn in row_number / rank /
    dense_rank / percent_rank / ntile (arg = bucket count, ntile only;
    pass None otherwise), all over
    ``PARTITION BY keys ORDER BY order_by [DESC...]``.

    Output dtypes match SQL: BIGINT for the integer ranks, DOUBLE for
    percent_rank (exact — ``(rank-1)/(n-1)``, one IEEE divide). ntile
    uses the ANSI rule: first ``n % tiles`` buckets get the extra row.
    Every input column rides along. Make ``order_by`` total for
    deterministic row_number.
    """
    if not ranks:
        raise ValueError("ranks must not be empty")
    keys = list(keys)
    order_by = list(order_by)
    if isinstance(descending, bool):
        desc = [descending] * len(order_by)
    else:
        desc = list(descending)
        if len(desc) != len(order_by):
            raise ValueError("descending list must match order_by length")
    for out, (fn, arg) in ranks.items():
        if fn not in _RANK_FNS:
            raise ValueError(f"unsupported rank fn {fn!r}")
        if fn == "ntile" and (arg is None or arg < 1):
            raise ValueError(f"ntile for {out!r} needs a positive bucket count")
        if out.startswith("__"):
            raise ValueError("'__'-prefixed output columns are reserved")

    ascending = [not d for d in desc]
    ensure_hash_shuffle(ds)

    def rank(df: pd.DataFrame):
        import numpy as np

        clash = [o for o in ranks if o in df.columns]
        if clash:
            raise ValueError(f"rank outputs {clash} collide with input")
        if not len(df):
            for out, (fn, _a) in ranks.items():
                df[out] = pd.Series(
                    [], dtype="float64" if fn == "percent_rank" else "int64"
                )
            return to_clean_arrow(df)
        df = df.sort_values(
            keys + order_by,
            ascending=[True] * len(keys) + ascending,
            kind="mergesort",
        ).reset_index(drop=True)
        g = df.groupby(keys, dropna=False, sort=False)
        rn = g.cumcount().to_numpy() + 1  # row_number in sorted order
        size = g[order_by[0]].transform("size").to_numpy()
        # SQL rank/dense_rank tie on the ORDER BY columns only: rows
        # equal on every order_by key share a rank
        first_in_grp = rn == 1
        if len(order_by):
            same_as_prev = np.ones(len(df), dtype=bool)
            for c in order_by:
                col = df[c]
                prev = col.shift(1)
                eq = (col == prev) | (col.isna() & prev.isna())
                same_as_prev &= eq.to_numpy()
            same_as_prev[first_in_grp] = False
        else:
            same_as_prev = np.zeros(len(df), dtype=bool)
        new_peer = ~same_as_prev
        gid = g.ngroup().to_numpy()
        # tie runs never span groups (new_peer is forced True at group
        # start), so a global run id is safe for per-run transforms
        run_id = np.cumsum(new_peer)
        # rank = row_number of the first peer in the tie run
        rank_vals = (
            pd.Series(rn).groupby(run_id).transform("min").to_numpy()
        )
        computed = {}
        for out, (fn, arg) in ranks.items():
            if fn == "row_number":
                computed[out] = pd.Series(rn, dtype="int64")
            elif fn == "rank":
                computed[out] = pd.Series(rank_vals, dtype="int64")
            elif fn == "dense_rank":
                # cumulative count of peer-run starts within the group
                cum = pd.Series(new_peer.astype("int64")).groupby(gid).cumsum()
                computed[out] = cum.astype("int64")
            elif fn == "percent_rank":
                denom = np.maximum(size - 1, 1)
                pr = (rank_vals - 1) / denom
                pr = np.where(size == 1, 0.0, pr)
                computed[out] = pd.Series(pr, dtype="float64")
            else:  # ntile
                tiles = int(arg)
                base = size // tiles
                rem = size % tiles
                # first `rem` buckets have base+1 rows
                idx0 = rn - 1
                cut = rem * (base + 1)
                nt = np.where(
                    idx0 < cut,
                    idx0 // np.maximum(base + 1, 1) + 1,
                    np.where(
                        base > 0, rem + (idx0 - cut) // np.maximum(base, 1) + 1, 0
                    ),
                )
                computed[out] = pd.Series(np.minimum(nt, tiles), dtype="int64")
        for out, s in computed.items():
            df[out] = s.to_numpy()
        return to_clean_arrow(df)

    return keyed_exact(ds, keys, rank, num_partitions)
