"""Set semantics / distinct (SURVEY §2 #22) — hash-bucketed, combiner-first.

The reference gets set semantics for free from RDF::Trine::Model
[R: RDB2RDF.pm — the model dedups identical statements]. At scale that is
the one unavoidable all-to-all exchange, so it is structured as:

1. **local combiner** — per-batch `pyarrow` hash group-by removes the bulk
   of duplicates *before* the shuffle (overlapping term maps mostly
   duplicate within a conversation, which stays within a block);
2. **bucket shuffle** — one deterministic hash bucket column over the full
   key, `groupby(bucket).map_groups` — B groups total (not one group per
   unique row!), each deduped vectorized in one task.

Bucket hash = pandas.util.hash_pandas_object (deterministic across
processes), so a resumed/retried run buckets identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..terms import TRIPLE_COLUMNS

BUCKET_COL = "__bucket"


def _unique_batch(t: pa.Table, cols: list[str]) -> pa.Table:
    """Vectorized within-batch distinct over ``cols`` (drops other cols)."""
    if t.num_rows == 0:
        return t.select(cols)
    return t.select(cols).group_by(cols, use_threads=False).aggregate([])


def _key_hash(t: pa.Table, cols: list[str], num_buckets: int) -> np.ndarray:
    s = None
    for c in cols:
        col = pd.Series(t.column(c).to_pandas(), copy=False).astype("string")
        h = pd.util.hash_pandas_object(col.fillna("\x00<null>"), index=False)
        s = h if s is None else (s * np.uint64(1000003)) ^ h
    return (s % np.uint64(num_buckets)).to_numpy()


def _make_bucketer(cols: list[str], num_buckets: int):
    def add_bucket(t: pa.Table) -> pa.Table:
        b = _key_hash(t, cols, num_buckets) if t.num_rows else np.array([], np.uint64)
        return t.append_column(BUCKET_COL, pa.array(b, pa.uint64()))

    return add_bucket


def distinct_rows(
    ds: rd.Dataset,
    cols: list[str],
    num_buckets: int = 64,
) -> rd.Dataset:
    """Global distinct over ``cols`` (output has exactly those columns)."""

    def combine(t: pa.Table) -> pa.Table:
        return _unique_batch(t, cols)

    bucketer = _make_bucketer(cols, num_buckets)

    def dedup_group(t: pa.Table) -> pa.Table:
        return _unique_batch(t, cols)

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .map_batches(bucketer, batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(dedup_group, batch_format="pyarrow")
    )


def distinct_triples(ds: rd.Dataset, num_buckets: int = 64) -> rd.Dataset:
    """RDF set semantics over the triple stream."""
    return distinct_rows(ds, TRIPLE_COLUMNS, num_buckets=num_buckets)


def first_per_group(
    ds: rd.Dataset,
    key_cols: list[str],
    order_col: str,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Exact dedup keeping, per key group, the row with the minimal
    ``order_col`` (deterministic 'first'). Same combiner→bucket structure."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_col, kind="mergesort").drop_duplicates(
            subset=key_cols, keep="first"
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _key_hash(t, key_cols, num_buckets) if t.num_rows else np.array([], np.uint64)
        return t.append_column(BUCKET_COL, pa.array(b, pa.uint64()))

    def dedup_group(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(order_col, kind="mergesort").drop_duplicates(
            subset=key_cols, keep="first"
        )
        return out.drop(columns=[BUCKET_COL])

    return (
        ds.map_batches(combine, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(dedup_group, batch_format="pandas")
    )
