"""Gap-based sessionization — a windowed aggregate Ray Data lacks natively
(SURVEY §2.4 "custom operators" note; the events table's stream shape).

Semantics: per user, order events by ts; a new session starts when the gap
to the previous event exceeds ``gap``. Output: one row per session with
(user_id, session_idx, n_events, t_start, t_end).

Partitioning guarantee: we hash-repartition by user and window inside
each block (vectorized cumsum over a boolean gap mask). One user's
events ALWAYS share a block — Ray 2.49's hash-shuffle emits exactly one
block per partition regardless of size (invariant pinned by
tests/test_stages.py::test_shuffle_partition_invariant), so the only
real limit is a single partition exceeding worker memory; size
``num_partitions`` to the input for that.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..engine.distinct import ensure_hash_shuffle, keyed_exact, to_clean_arrow


def tumbling_window(
    events: rd.Dataset,
    window_s: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    value_dtype: str = "float64",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Fixed (tumbling) time-window aggregate per key — the windowed
    aggregate Ray Data lacks natively, as a pure combiner + grouped
    merge: the window id is a ROW-LOCAL function of the timestamp
    (epoch // window), so this is just a grouped aggregate on
    (key, window) — partial per batch, one hash shuffle, exact merge.
    → (key_col, window_start:timestamp, n_events, sum_value?).
    """
    from .groupagg import grouped_aggregate

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].astype("datetime64[us]").astype("int64")
        win = (us // (window_s * 1_000_000)) * (window_s * 1_000_000)
        out = {key_col: df[key_col], "wstart_us": win}
        if value_col is not None:
            out["wval"] = df[value_col]
        return pd.DataFrame(out)

    aggs = {"n_events": ("wstart_us", "count")}
    if value_col is not None:
        aggs["sum_value"] = ("wval", "sum")
    agg = grouped_aggregate(
        events.map_batches(assign, batch_format="pandas"),
        keys=[key_col, "wstart_us"],
        aggs=aggs,
        num_partitions=num_partitions,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            cols = {
                key_col: pd.Series([], dtype="int64"),
                "window_start": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
            }
            if value_col is not None:
                cols["sum_value"] = pd.Series([], dtype=value_dtype)
            return pd.DataFrame(cols)
        df = df.rename(columns={"wstart_us": "window_start"})
        # datetime64[us] (not ns): the DuckDB oracle returns TIMESTAMP as
        # [us] and the driver's value hash is dtype-sensitive.
        df["window_start"] = pd.to_datetime(
            df["window_start"], unit="us"
        ).astype("datetime64[us]")
        return df

    return agg.map_batches(finish, batch_format="pandas")


def hopping_window(
    events: rd.Dataset,
    window_s: int = 3600,
    hop_s: int = 900,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    value_dtype: str = "float64",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Overlapping (hopping/sliding) time windows: window length
    ``window_s``, a new window every ``hop_s`` (must divide window_s).
    An event belongs to exactly ``window_s // hop_s`` windows, so the
    stage replicates each row k times with shifted window starts
    (vectorized ``np.repeat`` — the only cost over tumbling) and then
    rides the same pure combiner + one-hash-shuffle grouped aggregate.
    → (key_col, window_start:timestamp[us], n_events, sum_value?).
    """
    if window_s % hop_s:
        raise ValueError("hop_s must divide window_s")
    k = window_s // hop_s
    hop_us = hop_s * 1_000_000

    import numpy as np

    from .groupagg import grouped_aggregate

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        # latest window containing t starts at floor(t/hop)*hop; the k
        # windows are that minus j*hop for j in 0..k-1 (all contain t
        # because window = k*hop)
        base = (us // hop_us) * hop_us
        starts = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * hop_us, len(us)
        )
        out = {
            key_col: np.repeat(df[key_col].to_numpy(), k),
            "wstart_us": starts,
        }
        if value_col is not None:
            out["wval"] = np.repeat(df[value_col].to_numpy(), k)
        return pd.DataFrame(out)

    aggs = {"n_events": ("wstart_us", "count")}
    if value_col is not None:
        aggs["sum_value"] = ("wval", "sum")
    agg = grouped_aggregate(
        events.map_batches(assign, batch_format="pandas"),
        keys=[key_col, "wstart_us"],
        aggs=aggs,
        num_partitions=num_partitions,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            cols = {
                key_col: pd.Series([], dtype="int64"),
                "window_start": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
            }
            if value_col is not None:
                cols["sum_value"] = pd.Series([], dtype=value_dtype)
            return pd.DataFrame(cols)
        df = df.rename(columns={"wstart_us": "window_start"})
        df["window_start"] = pd.to_datetime(
            df["window_start"], unit="us"
        ).astype("datetime64[us]")
        return df

    return agg.map_batches(finish, batch_format="pandas")


def window_shift(
    events: rd.Dataset,
    keys: list[str],
    order_by: list[str],
    shifts: dict[str, tuple[str, int]],
    num_partitions: int = 16,
) -> rd.Dataset:
    """SQL LAG/LEAD window functions per key partition —
    ``shifts``: out_col -> (src_col, n) with n > 0 ≡ ``LAG(src, n)``
    and n < 0 ≡ ``LEAD(src, -n)`` over
    ``PARTITION BY keys ORDER BY order_by``. Make ``order_by`` a TOTAL
    order (include a unique tiebreaker) for deterministic output.

    Shape: ONE hash shuffle on ``keys`` (a key's rows never span blocks
    after the keyed repartition), then per-block vectorized
    sort + groupby-shift. Output keeps every input column and appends
    the shifted ones; integer sources shift into pandas nullable Int64
    (NOT float64 — silent int→float widening would hash-diverge from a
    SQL twin), timestamps into datetime64 with NaT.
    """
    if not shifts:
        raise ValueError("shifts must not be empty")
    taken = set(keys) | set(order_by) | {s for s, _ in shifts.values()}
    for out, (_src, n) in shifts.items():
        if n == 0:
            raise ValueError(f"shift offset for {out!r} must be non-zero")
        if out.startswith("__"):
            raise ValueError("'__'-prefixed output columns are reserved")
        if out in taken:
            # overwriting a source/key in place would feed already-
            # shifted values to the NEXT shift in the same call (silent,
            # dict-order-dependent corruption) — fail loud instead
            raise ValueError(
                f"shift output {out!r} collides with an input column"
            )

    ensure_hash_shuffle(events)

    def shift(df: pd.DataFrame) -> pd.DataFrame:
        clash = [o for o in shifts if o in df.columns]
        if clash:  # columns beyond keys/order/src ride along — check all
            raise ValueError(
                f"shift outputs {clash} collide with input columns"
            )
        if not len(df):
            for out, (src, _n) in shifts.items():
                df[out] = df[src]
            return df
        df = df.sort_values(
            keys + order_by, kind="mergesort"
        ).reset_index(drop=True)
        g = df.groupby(keys, dropna=False, sort=False)
        # compute EVERY shift from the original frame before assigning
        # any (defense in depth next to the collision check above)
        computed = {}
        for out, (src, n) in shifts.items():
            s = g[src].shift(n)
            if pd.api.types.is_integer_dtype(df[src]):
                s = s.astype("Int64")
            computed[out] = s
        for out, s in computed.items():
            df[out] = s
        return df

    return keyed_exact(events, keys, shift, num_partitions)


def sessionize(
    events: rd.Dataset,
    gap_s: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> rd.Dataset:
    """→ (user_id, session_idx, n_events, t_start, t_end), exact."""

    ensure_hash_shuffle(events)

    def window(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    user_col: pd.Series([], dtype="int64"),
                    "session_idx": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "t_start": pd.Series([], dtype="datetime64[us]"),
                    "t_end": pd.Series([], dtype="datetime64[us]"),
                }
            )
        df = df.sort_values([user_col, ts_col], kind="mergesort")
        new_user = df[user_col] != df[user_col].shift()
        gap = df[ts_col].diff().dt.total_seconds() > gap_s
        df = df.assign(__s=(new_user | gap).cumsum())
        g = df.groupby([user_col, "__s"], sort=False)
        out = g.agg(
            n_events=(ts_col, "size"),
            t_start=(ts_col, "min"),
            t_end=(ts_col, "max"),
        ).reset_index()
        out["session_idx"] = out.groupby(user_col, sort=False).cumcount() + 1
        return out[[user_col, "session_idx", "n_events", "t_start", "t_end"]]

    # key-complete frames: all of a user's events in one frame
    return keyed_exact(events, [user_col], window, num_partitions)


def funnel_conversion(
    events: rd.Dataset,
    step_a: str,
    step_b: str,
    within_s: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Two-step funnel: per user, did a ``step_b`` event occur strictly
    after a ``step_a`` event and within ``within_s`` seconds of it?
    → ``(user_col, n_a:int64, n_b:int64, converted:int64)``, one row per
    user present in the event stream (0/1 flag — integer, so a SQL twin
    hash-matches; no float windows).

    Scale shape: ONE hash shuffle on the user key (a user's events never
    span blocks afterwards), then a per-block vectorized pass — per user
    the a/b timestamps are matched with ``searchsorted`` (O(n log n) in
    the user's events, no self-join materialization; the SQL twin's
    a×b join is quadratic per user, which is exactly why funnels need a
    native operator at scale).
    """
    import numpy as np

    ensure_hash_shuffle(events)
    within_us = int(round(within_s * 1_000_000))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    user_col: pd.Series([], dtype="int64"),
                    "n_a": pd.Series([], dtype="int64"),
                    "n_b": pd.Series([], dtype="int64"),
                    "converted": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values([user_col, ts_col], kind="mergesort")
        ts = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        et = df[type_col].to_numpy()
        rows = []
        for uid, idx in df.groupby(user_col, sort=False).indices.items():
            t = ts[idx]
            is_a = et[idx] == step_a
            is_b = et[idx] == step_b
            ta, tb = t[is_a], t[is_b]
            conv = 0
            if len(ta) and len(tb):
                # for each a, the first b strictly after it
                pos = np.searchsorted(tb, ta, side="right")
                ok = pos < len(tb)
                conv = int(np.any((tb[pos[ok]] - ta[ok]) <= within_us))
            rows.append((uid, int(is_a.sum()), int(is_b.sum()), conv))
        return pd.DataFrame(
            rows, columns=[user_col, "n_a", "n_b", "converted"]
        ).astype({user_col: "int64", "n_a": "int64", "n_b": "int64",
                  "converted": "int64"})

    return keyed_exact(events, [user_col], flag, num_partitions)


def cohort_retention(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Cohort retention matrix: users bucketed by the calendar month of
    their FIRST event (the cohort), counted against every later month
    they were active in. → ``(cohort_month, active_month, n_users:int64)``.

    Scale shape: one hash shuffle on the user key; per block (a user's
    rows are complete there) each user contributes its cohort month ×
    distinct active months — at most ``#months`` rows per user, already
    the combiner — then a tiny grouped count over (cohort, month).
    """
    import numpy as np

    ensure_hash_shuffle(events)

    def explode(df: pd.DataFrame):
        if not len(df):
            return pd.DataFrame(
                {
                    "cohort_month": pd.Series([], dtype="datetime64[us]"),
                    "active_month": pd.Series([], dtype="datetime64[us]"),
                    "one": pd.Series([], dtype="int64"),
                }
            )
        m = (
            df[ts_col]
            .astype("datetime64[us]")
            .dt.to_period("M")
            .dt.to_timestamp()
            .astype("datetime64[us]")
        )
        u = df[[user_col]].assign(__m=m)
        cohort = u.groupby(user_col, sort=False)["__m"].transform("min")
        out = (
            u.assign(cohort_month=cohort)
            .rename(columns={"__m": "active_month"})[
                [user_col, "cohort_month", "active_month"]
            ]
            .drop_duplicates()
        )
        out = out[["cohort_month", "active_month"]].copy()
        # count carrier: a grouped count needs a non-key column
        out["one"] = np.int64(1)
        return to_clean_arrow(out)

    from .groupagg import grouped_aggregate

    pairs = keyed_exact(events, [user_col], explode, num_partitions)
    return grouped_aggregate(
        pairs,
        keys=["cohort_month", "active_month"],
        aggs={"n_users": ("one", "count")},
        num_partitions=min(num_partitions, 8),
    )
