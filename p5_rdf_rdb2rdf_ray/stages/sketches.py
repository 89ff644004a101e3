"""Sketch aggregates: fixed-size commutative summaries for corpus
profiling [brief extension; the reference (RDF::RDB2RDF) has no
aggregates at all — these are the scale path for statistics whose exact
form needs an all-to-all shuffle].

HyperLogLog count-distinct: sizing a vocabulary build, a dedup shuffle
or a partitioning scheme over 100 TB starts with "how many distinct
keys?", and the exact answer (``distinct_rows`` + count) moves every
key through a hash shuffle. The HLL register array is a 2^p-byte
max-monoid: each block folds its rows locally into one register row,
partial rows max-merge in a bundled fan-in stage, and ONE tiny row
reaches the final reducer — nothing about the data ever shuffles.
Deterministic for a fixed polars version (row hash = the same
``engine.distinct.row_hash`` xxhash the store bucketing keys on).

Error: standard HLL with linear-counting small-range correction;
relative standard error ≈ 1.04/√(2^p) (p=12 → ~1.6%). 64-bit hashes —
no large-range correction needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..engine.distinct import row_hash


def hll_partial(h: np.ndarray, p: int = 12) -> np.ndarray:
    """Fold uint64 hashes into a fresh (2^p,) uint8 register array.

    ``p`` is clamped to [12, 18]: the rank computation takes the low
    ``64-p ≤ 52`` bits through float64 ``frexp`` for an exact vectorized
    bit-length (every integer < 2^53 is exactly representable), which
    needs p ≥ 12; registers beyond 2^18 stop being "small state".
    """
    if not 12 <= p <= 18:
        raise ValueError(f"precision p={p} outside [12, 18]")
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if not len(h):
        return regs
    h = h.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    wbits = 64 - p
    w = (h & np.uint64((1 << wbits) - 1)).astype(np.float64)
    # frexp exponent == bit_length for integers (exact below 2^53)
    bl = np.frexp(w)[1]
    rank = np.where(w == 0, wbits + 1, wbits + 1 - bl).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(reg_rows: list[bytes] | list[np.ndarray]) -> np.ndarray:
    """Elementwise max of register arrays (the monoid op)."""
    arrs = [
        r if isinstance(r, np.ndarray) else np.frombuffer(r, np.uint8)
        for r in reg_rows
    ]
    return np.maximum.reduce(arrs) if arrs else np.zeros(0, np.uint8)


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    if m == 0 or not regs.any():
        return 0.0
    alpha = 0.7213 / (1 + 1.079 / m)  # valid for m ≥ 128 (p ≥ 7)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)  # linear counting
    return float(est)


def grouped_approx_distinct(
    ds: rd.Dataset,
    keys: list[str],
    col: str,
    p: int = 12,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Approximate COUNT(DISTINCT col) PER GROUP — one HLL register
    array per key (e.g. distinct users per event type, vocabulary size
    per language). The exact answer shuffles every (key, value) pair;
    this ships one 2^p-byte register row per key PER BLOCK (the
    combiner), then ONE keyed shuffle of those tiny rows and a
    per-partition max-merge. Estimates are BLOCK-LAYOUT INDEPENDENT:
    register max-merge is an exact commutative monoid, so any
    partitioning yields byte-identical registers.

    → Dataset(keys…, approx_ndistinct int64). NULL values of ``col``
    are counted like any other distinct value by the row hash (one
    NULL bucket); filter first if NULLs should not count."""
    if not keys:
        raise ValueError("grouped_approx_distinct needs group keys")
    from ..engine.distinct import ensure_hash_shuffle

    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    **{k: t.column(k) for k in keys},
                    "regs": pa.array([], pa.binary()),
                }
            )
        h = row_hash(t, [col])
        df = t.select(keys).to_pandas()
        df["__h"] = h
        rows_k: dict[str, list] = {k: [] for k in keys}
        regs_out = []
        for gkey, grp in df.groupby(keys, dropna=False, sort=False):
            kt = gkey if isinstance(gkey, tuple) else (gkey,)
            for k, v in zip(keys, kt):
                rows_k[k].append(v)
            regs_out.append(
                hll_partial(grp["__h"].to_numpy(), p=p).tobytes()
            )
        return pa.table(
            {
                **{
                    k: pa.array(rows_k[k], t.schema.field(k).type)
                    for k in keys
                },
                "regs": pa.array(regs_out, pa.binary()),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df.reindex(columns=keys).copy()
            out["approx_ndistinct"] = pd.Series([], dtype="int64")
            return out
        rows = []
        for gkey, grp in df.groupby(keys, dropna=False, sort=False):
            kt = gkey if isinstance(gkey, tuple) else (gkey,)
            est = hll_estimate(hll_merge(list(grp["regs"])))
            rows.append((*kt, round(est)))
        out = pd.DataFrame(rows, columns=keys + ["approx_ndistinct"])
        out["approx_ndistinct"] = out["approx_ndistinct"].astype("int64")
        return out

    ensure_hash_shuffle(ds)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(num_partitions, keys=keys)
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )


def _reduce_registers(partials: rd.Dataset, p: int, fan_in: int) -> rd.Dataset:
    """Shared tail: bundled max-merge of register rows → one result row."""

    def merge_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        merged = hll_merge(t.column("regs").to_pylist())
        return pa.table({"regs": pa.array([merged.tobytes()], pa.binary())})

    def finish(t: pa.Table) -> pa.Table:
        regs = (
            hll_merge(t.column("regs").to_pylist())
            if t.num_rows
            else np.zeros(1 << p, np.uint8)
        )
        est = hll_estimate(regs)
        return pa.table(
            {
                "approx_ndistinct": pa.array([round(est)], pa.int64()),
                "precision": pa.array([p], pa.int64()),
                "rel_std_error": pa.array(
                    [1.04 / np.sqrt(1 << p)], pa.float64()
                ),
            }
        )

    # the all-zero register row is the monoid identity: unioning it in
    # guarantees the finish stage always sees ≥1 row (an all-empty input
    # otherwise produces no blocks and the estimate row would vanish)
    seed = rd.from_arrow(
        pa.table(
            {
                "regs": pa.array(
                    [np.zeros(1 << p, np.uint8).tobytes()], pa.binary()
                )
            }
        )
    )
    folded = partials.union(seed).map_batches(
        merge_rows, batch_format="pyarrow", batch_size=fan_in
    )
    return folded.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def approx_ndistinct(
    ds: rd.Dataset,
    cols: list[str],
    p: int = 12,
    fan_in: int = 64,
) -> rd.Dataset:
    """≈ COUNT(DISTINCT cols) as a one-row Dataset
    ``(approx_ndistinct, precision, rel_std_error)``.

    Shape: per-block fold (one 2^p-byte row per block) → bundled
    max-merge (``fan_in`` partial rows per task — at 800k blocks/100 TB
    that is two fan-in levels of 4 KB rows) → single-row finish. No
    shuffle touches the data columns.
    """

    def partial(t: pa.Table) -> pa.Table:
        regs = (
            hll_partial(row_hash(t, cols), p)
            if t.num_rows
            else np.zeros(1 << p, np.uint8)
        )
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    return _reduce_registers(partials, p, fan_in)


def approx_ndistinct_ngrams(
    docs: rd.Dataset,
    n: int = 2,
    text_col: str = "text",
    p: int = 12,
    lowercase: bool = True,
    fan_in: int = 64,
) -> rd.Dataset:
    """≈ vocabulary size (distinct n-grams) without building the
    vocabulary: the exploded n-gram stream of :func:`..stages.vocab
    .ngram_counts` exists only inside each batch — it folds straight
    into the block's HLL registers, so the ~10× token blow-up never
    leaves the task and nothing shuffles (``ngram_counts`` must move
    every distinct n-gram once)."""
    import polars as pl

    from .vocab import _token_frame

    def partial(df: pd.DataFrame) -> pa.Table:
        e = _token_frame(df, text_col, lowercase)
        if n > 1:
            exprs = [
                pl.col("t").shift(-i).over("r").alias(f"_s{i}")
                for i in range(1, n)
            ]
            e = (
                e.with_columns(exprs)
                .drop_nulls()
                .select(
                    t=pl.concat_str(
                        [pl.col("t")]
                        + [pl.col(f"_s{i}") for i in range(1, n)],
                        separator=" ",
                    )
                )
            )
        h = e.select(pl.col("t").hash(seed=0))["t"].to_numpy()
        regs = hll_partial(h, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    partials = docs.map_batches(partial, batch_format="pandas")
    return _reduce_registers(partials, p, fan_in)


# ---------------------------------------------------------------------------
# mergeable quantile summary
#
# ``groupagg.column_quantiles`` is exact but assumes distinct values ≪
# rows (it ships a value histogram). For unbounded float columns
# (scores, ratios, embeddings norms) the scale path is a fixed-size
# mergeable summary: each block keeps s evenly-spaced order statistics
# with uniform weight n/s; summaries merge by weight-sorted re-picking.
# Every compression level adds ≤ 1/s rank error, and the fan-in tree has
# ceil(log_fan_in(blocks)) + 1 levels — at s=1024, fan_in=64 and 800k
# blocks that is 4 levels ≈ 0.4 % worst-case rank error. Deterministic:
# no sampling, no randomness, merge order fixed by the sort.


def quantile_summary(v: np.ndarray, s: int) -> tuple[np.ndarray, float]:
    """(sorted values, uniform weight) — ≤ s entries summarizing v."""
    v = np.sort(v[~np.isnan(v)])
    n = len(v)
    if n <= s:
        return v, 1.0
    idx = np.minimum(((np.arange(s) + 0.5) * n / s).astype(np.int64), n - 1)
    return v[idx], n / s


def merge_summaries(
    summaries: list[tuple[np.ndarray, float]], s: int
) -> tuple[np.ndarray, float]:
    """Weight-aware merge of uniform-weight summaries, re-compressed to
    ≤ s entries of equal weight."""
    summaries = [(v, w) for v, w in summaries if len(v)]
    if not summaries:
        return np.array([], np.float64), 1.0
    vals = np.concatenate([v for v, _ in summaries])
    wts = np.concatenate(
        [np.full(len(v), w, np.float64) for v, w in summaries]
    )
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    total = float(wts.sum())
    if len(vals) <= s:
        # keep exact entries; uniform weight only if they already are
        if np.all(wts == wts[0]):
            return vals, float(wts[0])
    cum = np.cumsum(wts)
    targets = (np.arange(s) + 0.5) * total / s
    pos = np.searchsorted(cum, targets, side="left")
    pos = np.minimum(pos, len(vals) - 1)
    return vals[pos], total / s


def approx_quantiles(
    ds: rd.Dataset,
    col: str,
    qs: list[float],
    s: int = 1024,
    fan_in: int = 64,
) -> pd.DataFrame:
    """Approximate quantiles of a numeric column with bounded rank
    error (≈ levels/s; see module comment). → pandas ``(q, value)``,
    the same shape as :func:`..stages.groupagg.column_quantiles`; nulls
    ignored; all-null/empty input yields NULL values."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        pv, w = quantile_summary(v, s)
        return pa.table(
            {
                "vals": pa.array([pv.tobytes()], pa.binary()),
                "w": pa.array([w], pa.float64()),
            }
        )

    def unpack(t: pa.Table) -> list[tuple[np.ndarray, float]]:
        return [
            (np.frombuffer(b, np.float64), float(w))
            for b, w in zip(
                t.column("vals").to_pylist(), t.column("w").to_pylist()
            )
        ]

    def fold(t: pa.Table) -> pa.Table:
        v, w = merge_summaries(unpack(t), s)
        return pa.table(
            {
                "vals": pa.array([v.tobytes()], pa.binary()),
                "w": pa.array([w], pa.float64()),
            }
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .map_batches(fold, batch_format="pyarrow", batch_size=fan_in)
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )
    rows = folded.take_all()  # exactly one tiny summary row
    if rows:
        v = np.frombuffer(rows[0]["vals"], np.float64)
    else:
        v = np.array([], np.float64)
    out_q, out_v = [], []
    for q in qs:
        out_q.append(float(q))
        if len(v) == 0:
            out_v.append(None)
        else:
            idx = min(len(v) - 1, max(0, int(np.ceil(q * len(v)) - 1)))
            out_v.append(float(v[idx]))
    return pd.DataFrame(
        {"q": pd.Series(out_q, dtype="float64"), "value": out_v}
    )


# ---------------------------------------------------------------------------
# Misra–Gries / Space-Saving heavy hitters: the bounded-state answer to
# "top words / top keys" that the exact path (ngram_counts: full keyed
# shuffle) pays an all-to-all for. One MG(k) summary per block (≤ k
# (item, count) pairs + one error scalar), bundled fan-in merges, ONE
# tiny row at the root — the data columns never shuffle. Mergeability
# per Agarwal et al., "Mergeable Summaries" (PODS'12): merge = counter
# sum, then subtract the (k+1)-th largest count from everyone and drop
# the non-positive; errors add.
#
# Guarantees (true count f, reported count c, reported error e):
#   c ≤ f ≤ c + e  for every reported item, and every item with
#   f > n/(k+1) is reported. With NO truncation anywhere (k ≥ distinct
#   items in every block and bundle) counts are EXACT and e = 0 — the
#   oracle-checkable mode. Truncated estimates depend on merge order
#   (bounds always hold; byte-identity across layouts does not).
# ---------------------------------------------------------------------------


def mg_truncate(
    items: list, cnts: np.ndarray, k: int
) -> tuple[list, np.ndarray, int]:
    """Keep at most ``k`` counters: subtract the (k+1)-th largest count
    from all and drop the non-positive. Returns (items, counts,
    subtracted) — ``subtracted`` adds to the summary's error bound."""
    if len(items) <= k:
        return items, cnts, 0
    c = int(np.partition(cnts, len(cnts) - k - 1)[len(cnts) - k - 1])
    keep = cnts > c
    return (
        [it for it, m in zip(items, keep) if m],
        cnts[keep] - c,
        c,
    )


def _mg_summary_row(items: list, cnts: np.ndarray, err: int) -> pa.Table:
    return pa.table(
        {
            "items": pa.array([list(map(str, items))], pa.list_(pa.string())),
            "cnts": pa.array(
                [np.asarray(cnts, np.int64)], pa.list_(pa.int64())
            ),
            "err": pa.array([err], pa.int64()),
        }
    )


def _mg_merge_table(t: pa.Table, k: int) -> pa.Table:
    """Merge a bundle of summary rows into one (the monoid op)."""
    if t.num_rows == 0:
        return _mg_summary_row([], np.zeros(0, np.int64), 0)
    import polars as pl

    d = pl.from_arrow(t.select(["items", "cnts"])).explode(["items", "cnts"])
    d = (
        d.drop_nulls("items")
        .group_by("items")
        .agg(pl.col("cnts").sum())
        .sort("items")
    )
    items = d["items"].to_list()
    cnts = d["cnts"].to_numpy().astype(np.int64)
    err = int(pc.sum(t.column("err")).as_py() or 0)
    items, cnts, sub = mg_truncate(items, cnts, k)
    return _mg_summary_row(items, cnts, err + sub)


def heavy_hitters(
    ds: rd.Dataset,
    col: str,
    k: int = 256,
    limit: int | None = None,
    fan_in: int = 64,
) -> rd.Dataset:
    """Approximate top items of ``col`` → Dataset(item, cnt, err),
    sorted by (cnt desc, item asc), at most ``limit`` rows (default
    ``k``). ``cnt`` is a LOWER bound; the true count is ≤ cnt + err
    (err is the summary-wide subtraction total). NULLs are skipped.

    Shape: per-block exact value counts → MG(k) truncate (one ≤ k-pair
    row per block) → bundled ``fan_in`` merges → one root row →
    explode/sort. Nothing but k-sized summaries ever moves."""
    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _mg_summary_row([], np.zeros(0, np.int64), 0)
        d = (
            pl.from_arrow(t.select([col]))
            .rename({col: "items"})
            .drop_nulls("items")
            .group_by("items")
            .len()
            .sort("items")
        )
        items, cnts, sub = mg_truncate(
            d["items"].to_list(), d["len"].to_numpy().astype(np.int64), k
        )
        return _mg_summary_row(items, cnts, sub)

    def finish(t: pa.Table) -> pa.Table:
        m = _mg_merge_table(t, k)
        items = m.column("items").to_pylist()[0]
        cnts = np.asarray(m.column("cnts").to_pylist()[0], np.int64)
        err = int(m.column("err").to_pylist()[0])
        order = np.lexsort((np.array(items, dtype=object), -cnts))
        if limit is not None or k:
            order = order[: (limit if limit is not None else k)]
        return pa.table(
            {
                "item": pa.array([items[i] for i in order], pa.string()),
                "cnt": pa.array(cnts[order], pa.int64()),
                "err": pa.array(
                    np.full(len(order), err, np.int64), pa.int64()
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    folded = partials.map_batches(
        lambda t: _mg_merge_table(t, k),
        batch_format="pyarrow",
        batch_size=fan_in,
    )
    return folded.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def heavy_hitter_tokens(
    docs: rd.Dataset,
    k: int = 4096,
    limit: int = 20,
    text_col: str = "text",
    lowercase: bool = True,
    fan_in: int = 64,
) -> rd.Dataset:
    """Top words across a corpus without a vocabulary shuffle: each
    block explodes its own lowercased ``\\S+`` tokens (the exploded
    stream exists only inside the batch) and folds them straight into
    an MG(k) summary. Same output/guarantees as :func:`heavy_hitters`.
    """
    import pandas as pd

    from .vocab import _token_frame

    def partial(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return _mg_summary_row([], np.zeros(0, np.int64), 0)
        e = _token_frame(df, text_col, lowercase)
        d = (
            e.drop_nulls("t")
            .rename({"t": "items"})
            .group_by("items")
            .len()
            .sort("items")
        )
        items, cnts, sub = mg_truncate(
            d["items"].to_list(), d["len"].to_numpy().astype(np.int64), k
        )
        return _mg_summary_row(items, cnts, sub)

    def finish(t: pa.Table) -> pa.Table:
        m = _mg_merge_table(t, k)
        items = m.column("items").to_pylist()[0]
        cnts = np.asarray(m.column("cnts").to_pylist()[0], np.int64)
        err = int(m.column("err").to_pylist()[0])
        order = np.lexsort((np.array(items, dtype=object), -cnts))[:limit]
        return pa.table(
            {
                "item": pa.array([items[i] for i in order], pa.string()),
                "cnt": pa.array(cnts[order], pa.int64()),
                "err": pa.array(
                    np.full(len(order), err, np.int64), pa.int64()
                ),
            }
        )

    partials = docs.map_batches(partial, batch_format="pandas")
    folded = partials.map_batches(
        lambda t: _mg_merge_table(t, k),
        batch_format="pyarrow",
        batch_size=fan_in,
    )
    return folded.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def grouped_heavy_hitter_tokens(
    docs: rd.Dataset,
    group_col: str,
    k: int = 4096,
    limit: int = 5,
    text_col: str = "text",
    lowercase: bool = True,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Misra–Gries heavy hitters PER GROUP (top words per language /
    per source) → Dataset(group_col, item, cnt, err), ≤ ``limit`` rows
    per group ordered (cnt desc, item asc). Same guarantees as
    :func:`heavy_hitters`, per group.

    Shape: each block folds its own tokens into one MG(k) summary row
    PER GROUP SEEN (combiner — a group in B blocks ships ≤ B rows of
    ≤ k pairs), then ONE keyed shuffle of summary rows and a per-group
    merge + explode. The exploded token stream never leaves its batch;
    only k-bounded summaries move."""
    import pandas as pd

    from .vocab import _token_frame

    def partial(df: pd.DataFrame) -> pa.Table:
        out = []
        if len(df) and not (
            df[group_col].map(lambda v: v is None or isinstance(v, str)).all()
        ):
            raise TypeError(
                "grouped_heavy_hitter_tokens needs a STRING group column "
                "(summary rows carry the group as string)"
            )
        if len(df):
            for g, sub in df.groupby(group_col, dropna=False, sort=False):
                # pandas groupby(dropna=False) surfaces a NULL group as
                # float NaN — normalize back to None before building the
                # string-typed summary row
                g = g if isinstance(g, str) else None
                e = _token_frame(sub, text_col, lowercase)
                d = (
                    e.drop_nulls("t")
                    .rename({"t": "items"})
                    .group_by("items")
                    .len()
                    .sort("items")
                )
                items, cnts, sub_err = mg_truncate(
                    d["items"].to_list(),
                    d["len"].to_numpy().astype(np.int64),
                    k,
                )
                row = _mg_summary_row(items, cnts, sub_err)
                out.append(row.append_column(
                    group_col, pa.array([g], pa.string())
                ))
        if not out:
            return _mg_summary_row([], np.zeros(0, np.int64), 0).append_column(
                group_col, pa.array([None], pa.string())
            ).slice(0, 0)
        return pa.concat_tables(out)

    def merge_explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_col, dropna=False, sort=False):
            g = g if isinstance(g, str) else None
            t = pa.Table.from_pandas(
                sub[["items", "cnts", "err"]], preserve_index=False
            )
            m = _mg_merge_table(t, k)
            items = m.column("items").to_pylist()[0]
            cnts = np.asarray(m.column("cnts").to_pylist()[0], np.int64)
            err = int(m.column("err").to_pylist()[0])
            order = np.lexsort((np.array(items, dtype=object), -cnts))[:limit]
            for i in order:
                rows.append((g, items[i], int(cnts[i]), err))
        out = pd.DataFrame(
            rows, columns=[group_col, "item", "cnt", "err"]
        )
        return out.astype({"cnt": "int64", "err": "int64"})

    from ..engine.distinct import ensure_hash_shuffle

    ensure_hash_shuffle(docs)
    return (
        docs.map_batches(partial, batch_format="pandas")
        .repartition(num_partitions, keys=[group_col])
        .map_batches(merge_explode, batch_format="pandas", batch_size=None)
    )
