"""Grouped aggregation and top-k (SURVEY §2 #25 + relational extras).

The reference exposes no grouped aggregation (RDF output is a set), but the
driver's correctness harness and any real lakehouse workload needs it.

Pattern (scale-first):

1. **partial aggregate** per batch (pandas groupby — exact, no pyarrow
   group_by: see ``engine/distinct._unique_batch`` for the arrow 16.1
   duplicate-groups bug) — a batch with G distinct keys contributes ≤G rows
   to the shuffle, i.e. the combiner IS the hot-key salting: a key in every
   row of every block still only ships #blocks partial rows;
2. **hash repartition** on the group keys (Ray hash shuffle);
3. **final aggregate** per whole block — exact because a key never spans
   blocks after the repartition.

Supported fns: sum, count, min, max, mean (mean decomposes into
sum+count partials and divides at finalize).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pandas as pd
import ray.data as rd

from ..engine.distinct import ensure_hash_shuffle, keyed_exact, to_clean_arrow

# fn name -> (partial fn, merge fn)
_MERGES = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def grouped_aggregate(
    ds: rd.Dataset,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    num_partitions: int = 32,
) -> rd.Dataset:
    """``aggs``: out_col -> (in_col, fn); fn in sum/count/min/max/mean.

    Output columns: ``keys`` + the out_cols, exact global aggregates.
    """
    keys = list(keys)
    if any(k.startswith("__") for k in keys):
        # "__" prefixes are reserved for the hidden mean partials, which
        # the finalizer drops — a "__" key column would vanish silently
        raise ValueError(f"group keys must not start with '__': {keys}")
    # expand mean into hidden sum/count partials
    plan: list[tuple[str, str, str]] = []  # (out, in, fn) non-mean
    means: list[tuple[str, str]] = []  # (out, in)
    for out, (col, fn) in aggs.items():
        if fn == "mean":
            means.append((out, col))
            plan.append((f"__{out}_sum", col, "sum"))
            plan.append((f"__{out}_cnt", col, "count"))
        elif fn in _MERGES:
            plan.append((out, col, fn))
        else:
            raise ValueError(f"unsupported agg fn {fn!r}")

    def partial(df: pd.DataFrame):
        # works for empty frames too: pandas groupby of an empty frame
        # yields a typed empty result (keeps dtypes for schema unification)
        g = df.groupby(keys, dropna=False, sort=False)
        out = {}
        for o, c, fn in plan:
            out[o] = getattr(g[c], fn)()
        return to_clean_arrow(pd.DataFrame(out).reset_index())

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            cols = keys + [o for o, _, _ in plan if not o.startswith("__")] + [
                o for o, _ in means
            ]
            return pd.DataFrame(columns=cols)
        g = df.groupby(keys, dropna=False, sort=False)
        out = {}
        for o, _c, fn in plan:
            out[o] = getattr(g[o], _MERGES[fn])()
        res = pd.DataFrame(out).reset_index()
        for o, _c in means:
            res[o] = res[f"__{o}_sum"] / res[f"__{o}_cnt"]
        drop = [c for c in res.columns if c.startswith("__")]
        return res.drop(columns=drop)

    ensure_hash_shuffle(ds)
    return keyed_exact(
        ds.map_batches(partial, batch_format="pandas"),
        keys, final, num_partitions,
    )


_REAGG = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def rollup_aggregate(
    ds: rd.Dataset,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    num_partitions: int = 32,
) -> rd.Dataset:
    """``GROUP BY ROLLUP(keys…)``: one result row set per prefix level
    ``keys[:n] … keys[:1], ()``, rolled-up key columns NULL (ANSI
    semantics). Scale shape: the RAW data aggregates ONCE (the finest
    level); every coarser level re-aggregates the FINER level's already
    tiny result (count re-aggregates as sum, sum as sum, min/max as
    min/max) — no second pass over the input, no extra wide shuffle.

    ``aggs`` fns are limited to the re-aggregable monoids
    sum/count/min/max (mean does not compose across levels — decompose
    it into sum+count yourself). Key columns should be string-typed:
    NULL-padding an integer key would float-widen through pandas and
    hash-diverge from a SQL twin (see memory notes)."""
    import pyarrow as pa

    keys = list(keys)
    if not keys:
        raise ValueError("rollup needs at least one key")
    for out, (_c, fn) in aggs.items():
        if fn not in _REAGG:
            raise ValueError(
                f"rollup agg {out!r}: fn {fn!r} does not re-aggregate "
                "across levels (use sum/count/min/max)"
            )

    def null_extend(level_keys: list[str]):
        missing = [k for k in keys if k not in level_keys]

        def f(t: pa.Table) -> pa.Table:
            for k in missing:
                t = t.append_column(k, pa.nulls(t.num_rows, pa.string()))
            order = keys + [c for c in t.column_names if c not in keys]
            return t.select(order).replace_schema_metadata(None)

        return f

    finest = grouped_aggregate(
        ds, keys, aggs, num_partitions=num_partitions
    ).map_batches(to_clean_arrow, batch_format="pandas").materialize()
    out = finest.map_batches(null_extend(keys), batch_format="pyarrow")
    cur = finest
    reagg = {o: (o, _REAGG[fn]) for o, (_c, fn) in aggs.items()}
    for i in range(len(keys) - 1, 0, -1):
        sub = keys[:i]
        cur = grouped_aggregate(
            cur, sub, reagg, num_partitions=min(num_partitions, 8)
        ).map_batches(to_clean_arrow, batch_format="pandas").materialize()
        out = out.union(cur.map_batches(null_extend(sub), batch_format="pyarrow"))
    # grand-total level: aggregate the coarsest level via a constant key
    top = cur.map_batches(
        lambda t: t.append_column("_all", pa.nulls(t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    total = grouped_aggregate(top, ["_all"], reagg, num_partitions=2).map_batches(
        lambda df: df.drop(columns=["_all"]), batch_format="pandas"
    ).map_batches(to_clean_arrow, batch_format="pandas")
    return out.union(total.map_batches(null_extend([]), batch_format="pyarrow"))


def grouped_concat(
    ds: rd.Dataset,
    keys: Sequence[str],
    col: str,
    sep: str = ",",
    order_by: Sequence[str] | None = None,
    out: str = "concat",
    num_partitions: int = 32,
) -> rd.Dataset:
    """GROUP_CONCAT / ``string_agg(col, sep ORDER BY …)`` per group —
    SPARQL's GROUP_CONCAT aggregate and the feature-engineering
    "behavioral trail" op (e.g. a user's event types in time order).

    Distribution note: unlike sum/count, concatenation is NOT a reducing
    aggregate — the output is as big as the input, so a combiner cannot
    shrink the shuffle. The exact minimal shape is: project to
    ``keys + [col] + order_by`` (column pruning IS the combiner here),
    ONE hash shuffle on ``keys``, then a per-partition vectorized
    sort + join — exact because a key never spans blocks after the
    keyed repartition (one block per partition, see memory notes).

    ``order_by`` defaults to ``[col]``; make it a TOTAL order (add a
    unique tiebreaker column) for deterministic output. NULL values of
    ``col`` are skipped (DuckDB ``string_agg`` semantics); a group with
    only NULLs concatenates to NULL.
    """
    keys = list(keys)
    order_cols = list(order_by) if order_by else [col]
    if any(c.startswith("__") for c in keys + [col, out] + order_cols):
        raise ValueError("'__'-prefixed columns are reserved")
    need = list(dict.fromkeys(keys + [col] + order_cols))

    def project(t):
        return t.select(need).replace_schema_metadata(None)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(columns=keys + [out])
        df = df.sort_values(keys + order_cols, kind="mergesort")
        g = df.groupby(keys, dropna=False, sort=False)[col]
        res = g.agg(
            # all-NULL group -> NULL, group row kept (string_agg semantics)
            lambda s: sep.join(s.dropna().astype(str))
            if s.notna().any()
            else None
        ).rename(out)
        return res.reset_index()

    ensure_hash_shuffle(ds)
    return keyed_exact(
        ds.map_batches(project, batch_format="pyarrow"),
        keys, final, num_partitions,
    )


def grouped_count_distinct(
    ds: rd.Dataset,
    keys: Sequence[str],
    col: str,
    out: str = "ndistinct",
    num_partitions: int = 32,
    approx: bool = False,
    p: int = 12,
) -> rd.Dataset:
    """``COUNT(DISTINCT col)`` per group — SPARQL §18.5's set-function
    COUNT with DISTINCT, and the profile-style cardinality op.

    Exact mode shuffles the distinct (keys, col) PAIRS: per-block
    dedupe is the combiner (a value appearing in every row of a block
    still ships once per block), ONE keyed hash shuffle, then a
    per-partition dedupe + ``nunique`` — exact because a key never
    spans blocks after the keyed repartition. NULL values of ``col``
    do not count (SPARQL: unbound is not a solution value; pandas
    ``nunique`` dropna matches).

    ``approx=True`` delegates to the mergeable HLL sketch
    (:func:`~..stages.sketches.grouped_approx_distinct`, precision
    ``p``): one 2^p-byte register row per key per block instead of the
    pair shuffle — the scale path when ``col`` has high cardinality
    per group. NULL handling differs (the sketch counts NULL as one
    value); filter first if that matters.
    """
    keys = list(keys)
    if any(c.startswith("__") for c in keys + [col, out]):
        raise ValueError("'__'-prefixed columns are reserved")
    if approx:
        from .sketches import grouped_approx_distinct

        res = grouped_approx_distinct(
            ds, keys=keys, col=col, p=p, num_partitions=num_partitions
        )
        if out != "approx_ndistinct":
            # not Dataset.rename_columns: that op renames ARROW blocks,
            # and the sketch finalizer emits pandas blocks
            res = res.map_batches(
                lambda df: df.rename(columns={"approx_ndistinct": out}),
                batch_format="pandas",
            )
        return res

    need = list(dict.fromkeys(keys + [col]))

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df[need].drop_duplicates()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {**{k: pd.Series(dtype=object) for k in keys},
                 out: pd.Series(dtype="int64")}
            )
        res = (
            df.groupby(keys, dropna=False, sort=False)[col]
            .nunique()
            .rename(out)
            .astype("int64")
        )
        return res.reset_index()

    ensure_hash_shuffle(ds)
    return keyed_exact(
        ds.map_batches(dedupe, batch_format="pandas"),
        keys, final, num_partitions,
    )


def column_quantiles(
    ds: rd.Dataset,
    col: str,
    qs: Sequence[float],
    num_partitions: int = 32,
):
    """Exact discrete quantiles of a column via a distributed value
    HISTOGRAM (combiner-first grouped count — a value appearing M times
    in a block ships one partial row) collected to the driver, which
    picks elements by cumulative count. Matches DuckDB ``quantile_disc``:
    0-based index ``ceil(q·n) − 1`` over the sorted values, nulls
    ignored. → small pandas DataFrame ``(q:float64, value)``.

    Scale assumption (documented, like every broadcast here): distinct
    values ≪ rows — true for the integer feature columns this serves
    (token counts, line counts, quality signals). For unbounded floats,
    bucket first or sample."""
    import math

    import numpy as np

    hist = grouped_aggregate(
        ds,
        keys=[col],
        aggs={"q_cnt": (col, "count")},
        num_partitions=num_partitions,
    ).to_pandas()
    if col not in hist.columns:  # all-empty input → column-less frame
        hist = pd.DataFrame({col: [], "q_cnt": []})
    hist = (
        hist.dropna(subset=[col])
        .sort_values(col, kind="mergesort")
        .reset_index(drop=True)
    )
    out_q, out_v = [], []
    n = int(hist["q_cnt"].sum()) if len(hist) else 0
    cum = hist["q_cnt"].cumsum().to_numpy() if len(hist) else np.array([])
    for q in qs:
        if n == 0:
            out_q.append(float(q))
            out_v.append(None)
            continue
        idx = max(0, math.ceil(q * n) - 1)
        pos = int(np.searchsorted(cum, idx, side="right"))
        out_q.append(float(q))
        out_v.append(hist[col].iloc[pos])
    return pd.DataFrame({"q": pd.Series(out_q, dtype="float64"), "value": out_v})


def grouped_quantiles(
    ds: rd.Dataset,
    keys: Sequence[str],
    col: str,
    qs: Sequence[float],
    num_partitions: int = 32,
) -> rd.Dataset:
    """Exact discrete quantiles of ``col`` PER GROUP — the per-segment
    percentile op (``quantile_disc(col, q) GROUP BY keys``). Same pick
    rule as :func:`column_quantiles` (0-based index ``ceil(q·n) − 1``
    over the sorted values, nulls ignored — DuckDB ``quantile_disc``),
    but fully distributed: a combiner-first grouped count on
    ``keys + [col]`` (a value appearing M times in a block ships ONE
    partial row), then one tiny keyed shuffle on ``keys`` and a
    per-partition cumulative pick. Nothing collects on the driver.

    → one row per (group, q): ``keys…, q float64, value`` (value keeps
    the column dtype — it is an actual element, never interpolated).
    Scale assumption (as :func:`column_quantiles`): distinct values per
    group ≪ rows per group; for unbounded floats use the mergeable
    sketch in ``stages/sketches``.
    """
    import math

    import numpy as np

    keys = list(keys)
    qlist = [float(q) for q in qs]
    if not qlist or any(not 0.0 <= q <= 1.0 for q in qlist):
        raise ValueError(f"quantiles must be in [0, 1]: {qs}")
    hist = grouped_aggregate(
        ds,
        keys=keys + [col],
        aggs={"q_cnt": (col, "count")},
        num_partitions=num_partitions,
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df.reindex(columns=keys + [col]).rename(
                columns={col: "value"}
            )
            out["q"] = pd.Series([], dtype="float64")
            return out[keys + ["q", "value"]]
        df = df.dropna(subset=[col]).sort_values(
            keys + [col], kind="mergesort"
        )
        rows = []
        for gkey, grp in df.groupby(keys, dropna=False, sort=False):
            cum = grp["q_cnt"].cumsum().to_numpy()
            n = int(cum[-1]) if len(cum) else 0
            if n == 0:
                continue
            vals = grp[col].to_numpy()
            kt = gkey if isinstance(gkey, tuple) else (gkey,)
            for q in qlist:
                idx = max(0, math.ceil(q * n) - 1)
                pos = int(np.searchsorted(cum, idx, side="right"))
                rows.append((*kt, q, vals[pos]))
        out = pd.DataFrame(rows, columns=keys + ["q", "value"])
        out["value"] = out["value"].astype(df[col].dtype)
        return out

    ensure_hash_shuffle(hist)
    return (
        # clean Arrow into the shuffle: grouped_aggregate finalizes in
        # pandas, whose schema metadata defeats the shuffle's dedup
        keyed_exact(
            hist.map_batches(to_clean_arrow, batch_format="pandas"),
            keys, pick, min(num_partitions, 16),
        )
    )


def grouped_top_k(
    ds: rd.Dataset,
    keys: Sequence[str],
    sort_cols: Sequence[str],
    k: int,
    descending: bool | Sequence[bool] = True,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Top-k rows PER GROUP (e.g. best k orders per customer segment).

    Scale shape: per-block prune to ≤k rows per key seen in that block
    (the combiner — a key appearing in B blocks ships ≤B·k rows), then
    one hash shuffle on ``keys``, then an exact per-key prune (a key
    never spans blocks after the key repartition). Ties broken by the
    full ``sort_cols`` order; callers wanting determinism include a
    unique column last. [brief extension; reference has no aggregation]
    """
    keys = list(keys)
    sort_cols = list(sort_cols)
    if isinstance(descending, bool):
        desc = [descending] * len(sort_cols)
    else:
        desc = list(descending)
    ascending = [not d for d in desc]

    def prune(df: pd.DataFrame):
        if not len(df):
            return to_clean_arrow(df)
        out = (
            df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .groupby(keys, dropna=False, sort=False)
            .head(k)
        )
        return to_clean_arrow(out)

    ensure_hash_shuffle(ds)
    return keyed_exact(
        ds.map_batches(prune, batch_format="pandas"),
        keys, prune, num_partitions,
    )


def top_k(
    ds: rd.Dataset,
    sort_cols: Sequence[str],
    k: int,
    descending: bool | Sequence[bool] = True,
    offset: int = 0,
) -> rd.Dataset:
    """Global top-k without a full sort shuffle: per-block
    (offset+k)-prune — each block's survivors are a superset of its
    contribution to the global answer — then one tiny final merge
    (#blocks × (offset+k) rows through a single task) sorts and slices
    ``[offset, offset+k)``. NULLs sort LAST (pandas ``na_position``
    default, matching DuckDB's default NULL order). Also the engine's
    ORDER BY / LIMIT / OFFSET kernel (``apply_solution_modifiers``)."""
    sort_cols = list(sort_cols)
    if isinstance(descending, bool):
        desc = [descending] * len(sort_cols)
    else:
        desc = list(descending)
    ascending = [not d for d in desc]
    stop = offset + k

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            sort_cols, ascending=ascending, kind="mergesort"
        ).head(stop)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(
            sort_cols, ascending=ascending, kind="mergesort"
        ).iloc[offset:stop]
        return out.reset_index(drop=True)

    return (
        ds.map_batches(prune, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def pivot_counts(
    ds: rd.Dataset,
    keys: Sequence[str],
    col: str,
    values: Sequence[str],
    prefix: str = "n_",
    total: str | None = "n_total",
    num_partitions: int = 32,
) -> rd.Dataset:
    """PIVOT-by-count: one output row per key group with one int64 count
    column per listed value of ``col`` (``SUM(CASE WHEN col = v THEN 1
    ELSE 0 END)``), plus an optional all-rows ``total``. The schema is
    declared by ``values`` — data-independent, so the pipeline's output
    schema is stable across shards/scales (a dynamic pivot would not
    be); unlisted values count only toward ``total``.

    Scale shape: the indicator columns are added batch-wise (vectorized
    ``==``), then :func:`grouped_aggregate` does its usual
    combiner → one keyed shuffle → exact merge; a group appearing in B
    blocks ships B partial rows regardless of group size.
    """
    keys = list(keys)
    values = list(values)
    if len(set(values)) != len(values):
        raise ValueError(f"duplicate pivot values: {values}")
    out_cols = [f"{prefix}{v}" for v in values]
    clash = set(out_cols) & set(keys + [col])
    if clash:
        raise ValueError(f"pivot output columns collide with input: {clash}")

    def indicate(df: pd.DataFrame):
        out = df[keys].copy()
        for v, oc in zip(values, out_cols):
            out[oc] = (df[col] == v).astype("int64")
        if total is not None:
            out[total] = 1
        return to_clean_arrow(out)

    aggs = {oc: (oc, "sum") for oc in out_cols}
    if total is not None:
        aggs[total] = (total, "sum")
    return grouped_aggregate(
        ds.map_batches(indicate, batch_format="pandas"),
        keys=keys,
        aggs=aggs,
        num_partitions=num_partitions,
    )


def cube_aggregate(
    ds: rd.Dataset,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    num_partitions: int = 32,
) -> rd.Dataset:
    """``GROUP BY CUBE(keys…)``: one result row set per key SUBSET
    (2^len(keys) levels), absent key columns NULL (ANSI semantics).
    Same scale shape as :func:`rollup_aggregate`: the raw data
    aggregates ONCE at the finest level; every subset re-aggregates the
    already tiny finest result (count→sum, sum→sum, min/max→min/max) —
    no second pass over the input.

    ``aggs`` fns limited to the re-aggregable monoids sum/count/min/max
    (decompose mean yourself). Key columns should be string-typed —
    NULL-padding an integer key would float-widen through pandas and
    hash-diverge from a SQL twin (same rule as rollup).
    """
    from itertools import combinations

    import pyarrow as pa

    keys = list(keys)
    if not keys:
        raise ValueError("cube needs at least one key")
    for out, (_c, fn) in aggs.items():
        if fn not in _REAGG:
            raise ValueError(
                f"cube agg {out!r}: fn {fn!r} does not re-aggregate "
                "across levels (use sum/count/min/max)"
            )

    def null_extend(level_keys: list[str]):
        missing = [k for k in keys if k not in level_keys]

        def f(t: pa.Table) -> pa.Table:
            for k in missing:
                t = t.append_column(k, pa.nulls(t.num_rows, pa.string()))
            order = keys + [c for c in t.column_names if c not in keys]
            return t.select(order).replace_schema_metadata(None)

        return f

    finest = grouped_aggregate(
        ds, keys, aggs, num_partitions=num_partitions
    ).map_batches(to_clean_arrow, batch_format="pandas").materialize()
    out = finest.map_batches(null_extend(keys), batch_format="pyarrow")
    reagg = {o: (o, _REAGG[fn]) for o, (_c, fn) in aggs.items()}
    for r in range(len(keys) - 1, 0, -1):
        for sub in combinations(keys, r):
            lvl = grouped_aggregate(
                finest, list(sub), reagg, num_partitions=min(num_partitions, 8)
            ).map_batches(to_clean_arrow, batch_format="pandas")
            out = out.union(
                lvl.map_batches(null_extend(list(sub)), batch_format="pyarrow")
            )
    top = finest.map_batches(
        lambda t: t.append_column("_all", pa.nulls(t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    total = grouped_aggregate(top, ["_all"], reagg, num_partitions=2).map_batches(
        lambda df: df.drop(columns=["_all"]), batch_format="pandas"
    ).map_batches(to_clean_arrow, batch_format="pandas")
    return out.union(total.map_batches(null_extend([]), batch_format="pyarrow"))
