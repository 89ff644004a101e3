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
