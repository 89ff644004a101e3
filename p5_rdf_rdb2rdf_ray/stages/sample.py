"""Deterministic hash-based sampling — consistent corpus subsetting.

A 100-TB training-data pipeline cannot use RNG sampling: re-runs, resumed
partitions and cross-stage agreement all need "is this row in the
sample?" to be a pure function of the row key. These operators hash an
int64 key with the (public-domain) MurmurHash3 fmix32 finalizer and keep
a row iff ``hash % 1e6 < rate * 1e6`` — map-only, no shuffle, no state,
every worker and every re-run agrees [brief extension; not in the
reference — RDF::RDB2RDF has no corpus ops].

The same arithmetic is expressible in ANSI SQL (xor / shifts / HUGEINT
multiply mod 2^32), so the operators are oracle-checkable bit-for-bit —
see ``pipelines/queries_data.py::_FMIX32_SQL``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_M32 = np.uint64(0xFFFFFFFF)
_C1 = np.uint64(0x85EBCA6B)
_C2 = np.uint64(0xC2B2AE35)


def fmix32(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """MurmurHash3 fmix32 finalizer over an int64 key array (vectorized).
    64-bit keys are folded to 32 bits first; ``seed`` shifts the hash
    stream so independent sampling decisions don't correlate.
    → uint64 array of values in [0, 2^32).

    Keys must be NON-NEGATIVE: the numpy fold wraps negatives mod 2^64
    while the bit-exact SQL oracle (``_FMIX32_SQL``) operates on signed
    values, so a negative-id corpus would silently disagree with the
    oracle — fail loudly instead."""
    if keys.size and int(keys.min()) < 0:
        raise ValueError(
            "hash-sampling keys must be non-negative int64 (numpy uint64 "
            "wraparound diverges from the SQL oracle on negative keys)"
        )
    k = keys.astype(np.uint64)
    h = ((k ^ (k >> np.uint64(32))) + np.uint64(seed & 0xFFFFFFFF)) & _M32
    h ^= h >> np.uint64(16)
    h = (h * _C1) & _M32
    h ^= h >> np.uint64(13)
    h = (h * _C2) & _M32
    h ^= h >> np.uint64(16)
    return h


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0, 1], got {rate}")
    return int(round(rate * 1_000_000))


def hash_sample(
    ds: rd.Dataset,
    rate: float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> rd.Dataset:
    """Keep a deterministic ~``rate`` fraction of rows, keyed on
    ``key_col`` (int64). Map-only: each block filters independently."""
    thr = _threshold(rate)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        keep = fmix32(keys, seed) % np.uint64(1_000_000) < np.uint64(thr)
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(
    ds: rd.Dataset,
    rates: dict[str, float],
    group_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> rd.Dataset:
    """Per-group sampling rates (e.g. per-language corpus balancing):
    group ``g`` keeps a deterministic ``rates[g]`` fraction, unlisted
    groups keep ``default_rate``. Still map-only — the group column
    rides in the row, so no shuffle is needed."""
    thrs = {g: _threshold(r) for g, r in rates.items()}
    dthr = _threshold(default_rate)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        groups = t.column(group_col).to_numpy(zero_copy_only=False)
        thr = np.full(t.num_rows, dthr, np.uint64)
        for g, v in thrs.items():
            thr[groups == g] = v
        keep = fmix32(keys, seed) % np.uint64(1_000_000) < thr
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def score_sample(
    ds: rd.Dataset,
    rate_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
) -> rd.Dataset:
    """IMPORTANCE sampling: each row keeps with its OWN probability —
    ``rate_col`` (float64 in [0, 1]; values clamp, NULL drops). The
    quality-weighted corpus subsetting op: score documents once, keep
    high-quality rows at higher rates, deterministically (a re-run or a
    resumed partition keeps identical rows). Map-only, no shuffle.

    Threshold is ``floor(rate · 1e6)`` — floor, not round: SQL ROUND is
    half-away-from-zero while Python round is banker's, so only floor
    twins bit-for-bit (see ``_FMIX32_SQL`` in queries_data)."""

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        rate = t.column(rate_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        rate = np.clip(np.nan_to_num(rate, nan=0.0), 0.0, 1.0)
        thr = np.floor(rate * 1_000_000.0).astype(np.uint64)
        keep = fmix32(keys, seed) % np.uint64(1_000_000) < thr
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def mix_corpora(
    sources: list[tuple[rd.Dataset, float]],
    key_col: str = "doc_id",
    seed: int = 0,
) -> rd.Dataset:
    """Weighted corpus mixture: each ``(dataset, fraction)`` source is
    hash-downsampled to its fraction, then the streams union. Source ``i``
    hashes with ``seed + i`` so the same key drawn from two corpora makes
    independent keep decisions. All schemas must match."""
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    parts = [
        hash_sample(ds, frac, key_col=key_col, seed=seed + i)
        for i, (ds, frac) in enumerate(sources)
    ]
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out


def _with_sample_hash(
    ds: rd.Dataset, key_col: str, seed: int
) -> rd.Dataset:
    def add_h(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("smp_h", pa.array([], pa.int64()))
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        # fmix32 < 2^32 always fits int64 (signed, SQL-friendly)
        h = fmix32(keys, seed).astype(np.int64)
        return t.append_column("smp_h", pa.array(h, pa.int64()))

    return ds.map_batches(add_h, batch_format="pyarrow")


def uniform_k_sample(
    ds: rd.Dataset,
    k: int,
    key_col: str = "doc_id",
    seed: int = 0,
) -> rd.Dataset:
    """EXACT-k deterministic uniform sample: rows are ranked by
    ``fmix32(key)`` and the k smallest hashes win (hash order is a
    uniform random permutation of keys, but a pure function of them —
    re-runs, resumed partitions and other stages all agree on the
    sample; a rate-based ``hash_sample`` cannot hit an exact count).
    Output keeps the ``smp_h`` rank column. Distributed as per-block
    prune + one ≤ blocks×k merge (``top_k``) — no full sort, no RNG,
    no driver loop. Ties on the (unique-per-key) hash break by key."""
    from .groupagg import top_k

    return top_k(
        _with_sample_hash(ds, key_col, seed),
        ["smp_h", key_col],
        k=k,
        descending=False,
    )


def grouped_k_sample(
    ds: rd.Dataset,
    k: int,
    group_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Exact k-PER-GROUP deterministic sample (balanced eval subsets,
    per-language spot-check corpora): hash-ranked like
    :func:`uniform_k_sample`, pruned per group block-wise, then ONE
    keyed shuffle and an exact per-group head (``grouped_top_k``)."""
    from .groupagg import grouped_top_k

    return grouped_top_k(
        _with_sample_hash(ds, key_col, seed),
        [group_col],
        ["smp_h", key_col],
        k=k,
        descending=False,
        num_partitions=num_partitions,
    )


def split_assign(
    ds: rd.Dataset,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    out: str = "split",
) -> rd.Dataset:
    """Deterministic train/val/test split assignment — the standard
    hash-split every training-data pipeline needs: ``fractions`` maps
    split name → fraction (must sum to 1.0 within 1e-9); each row gets
    ``out`` = the name of the bucket its ``fmix32(key)`` falls in, so
    membership is a pure function of the KEY (stable across runs,
    re-shards, and cluster sizes — never of scheduling). Map-only: no
    shuffle, each block assigns independently; the same fmix32 stream
    as :func:`hash_sample`, so the SQL twin (`_FMIX32_SQL`) reproduces
    assignments bit-for-bit."""
    if not fractions:
        raise ValueError("fractions must not be empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    names = list(fractions)
    # cumulative integer thresholds over the hash_sample resolution
    cuts, acc = [], 0
    for n in names:
        acc += fractions[n]
        cuts.append(int(round(acc * 1_000_000)))
    cuts[-1] = 1_000_000  # close rounding gaps: every row lands somewhere

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out, pa.array([], pa.string()))
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        h = (fmix32(keys, seed) % np.uint64(1_000_000)).astype(np.int64)
        idx = np.searchsorted(np.asarray(cuts), h, side="right")
        lab = np.asarray(names, dtype=object)[idx]
        return t.append_column(out, pa.array(lab, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")
