"""Set semantics / distinct (SURVEY §2 #22) — hash-partitioned, combiner-first.

The reference gets set semantics for free from RDF::Trine::Model
[R: RDB2RDF.pm — the model dedups identical statements]. At scale that is
the one unavoidable all-to-all exchange, so it is structured as:

1. **local combiner** — per-batch `pyarrow` hash group-by removes the bulk
   of duplicates *before* the shuffle (overlapping term maps mostly
   duplicate within a conversation, which stays within a block);
2. **hash repartition** — `Dataset.repartition(B, keys=key_cols)` co-locates
   equal keys in one output block (Ray's hash-shuffle), then one vectorized
   whole-block dedup per block. B blocks total — never one group per unique
   row, and no reliance on `map_groups` group/block alignment.

Both phases are vectorized sort + adjacent-compare kernels — zero Python
per row (see `_unique_batch` for why not `pa.Table.group_by`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..terms import TRIPLE_COLUMNS


def cut_stats_lineage(ds: rd.Dataset) -> rd.Dataset:
    """Truncate a MATERIALIZED dataset's stats-parent chain (Ray 2.49:
    ``materialize()`` keeps the full ``DatasetStats.parents`` tree, and
    ``to_summary`` recurses through it without a depth bound — an
    ITERATIVE pipeline that materializes per round therefore grows the
    Python stack linearly and hits RecursionError around ~15 rounds,
    e.g. PageRank power iterations). Data/blocks are untouched; only the
    telemetry ancestry is dropped. Best-effort: internals drift across
    Ray versions, so failures degrade to a no-op."""
    try:
        ds._plan._in_stats.parents = []
        snap = getattr(ds._plan, "_snapshot_stats", None)
        if snap is not None:
            snap.parents = []
    except Exception:
        pass
    return ds


def ensure_hash_shuffle(ds: rd.Dataset | None = None) -> None:
    """Key-based ``repartition``/``join`` need the hash-shuffle strategy.
    Set it on the current DataContext AND on the context snapshot a Dataset
    captured at creation (plan build reads the latter).

    Log-noise note: when a shuffle's output partitions are mostly empty
    (toy inputs, many partitions) Ray 2.49 logs ``Operator produced a
    RefBundle with a different schema … new schema: .`` — the empty
    aggregator partitions carry no schema. Reproduced with a bare 4-row
    Arrow dataset; harmless and not stage-induced (the related
    'Failed to hash the schemas' warning IS stage-induced — pandas
    blocks entering a shuffle — and every shuffle-feeding stage here
    returns :func:`to_clean_arrow` for that reason)."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    ctxs = [DataContext.get_current()]
    if ds is not None and getattr(ds, "context", None) is not None:
        ctxs.append(ds.context)
    for ctx in ctxs:
        if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # One aggregator actor can own many partitions. Two failure modes on
        # small clusters with Ray's defaults: (a) 64 aggregator actors wait
        # min_hash_shuffle_aggregator_wait_time_in_s=300s to all come up;
        # (b) per-actor num_cpus = 0.0625 × (partitions/aggregator) can sum
        # to the whole cluster, starving the upstream map tasks → deadlock.
        # Cap the pool and make aggregator CPU demand nominal (they are
        # mostly network/merge; map stages own the CPU budget).
        ctx.max_hash_shuffle_aggregators = max(2, cpus)
        ctx.min_hash_shuffle_aggregator_wait_time_in_s = 10
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01


# Ray major.minor versions whose hash-shuffle reducer is PINNED (by the
# canary test `tests/test_stages.py::test_window_one_block_canary`) to
# emit ONE block per partition — the invariant every per-key exact
# stage's final relies on. An unlisted version routes through the
# slow-but-correct map_groups fallback instead of silently computing
# wrong windows; extend the list only after re-running the canary.
_ONE_BLOCK_OK = ("2.49",)


def one_block_invariant() -> bool:
    """Does this Ray emit hash-shuffle partitions as single blocks?
    Env override ``P5_KEYED_ONE_BLOCK`` = "1" (trust) / "0" (force the
    fallback, e.g. to exercise it in tests)."""
    import os

    import ray

    ov = os.environ.get("P5_KEYED_ONE_BLOCK", "")
    if ov:
        return ov != "0"
    return ray.__version__.rsplit(".", 1)[0] in _ONE_BLOCK_OK


def keyed_exact(
    ds: rd.Dataset,
    keys: list[str],
    final,
    num_partitions: int,
    batch_format: str = "pandas",
) -> rd.Dataset:
    """Apply ``final`` to KEY-COMPLETE frames: every row of a given key
    combination appears in exactly one frame ``final`` sees (the
    invariant behind every ordered-window / per-key-exact stage).

    Fast path (pinned Ray versions): ONE hash repartition on ``keys``,
    then ``map_batches(final, batch_size=None)`` — the reducer emits
    one block per partition, so a block IS a key-complete partition.

    Fallback (:func:`one_block_invariant` false — unknown Ray, or
    forced via ``P5_KEYED_ONE_BLOCK=0``): ``groupby(keys).map_groups``
    — per-KEY frames, still one shuffle but with Ray's per-group
    re-concat on top; slower (group slicing per key) but correct under
    any reducer block layout. ``final`` must therefore handle a frame
    holding any SUBSET of keys (all stages here group internally, so a
    single-key frame is just the 1-group case)."""
    keys = list(keys)
    ensure_hash_shuffle(ds)
    if not one_block_invariant():
        return ds.groupby(keys).map_groups(
            final, batch_format=batch_format
        )
    return ds.repartition(num_partitions, keys=keys).map_batches(
        final, batch_format=batch_format, batch_size=None
    )


def to_clean_arrow(df: pd.DataFrame) -> pa.Table:
    """pandas → Arrow with no pandas metadata. Stages that FEED a shuffle
    should return this instead of a DataFrame: pandas blocks carry an
    unhashable ``PandasBlockSchema`` that defeats Ray's schema
    deduplication in the hash-shuffle aggregators (the 'Failed to hash
    the schemas' warning) and force an extra conversion on the wire."""
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
        None
    )
    # empty object columns land as null-typed — cast to string so empty
    # blocks unify with their non-empty siblings
    for i, f in enumerate(t.schema):
        if pa.types.is_null(f.type):
            t = t.set_column(i, f.name, t.column(f.name).cast(pa.string()))
    return t


def row_hash(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Deterministic uint64 row hash over ``cols``.

    polars ``hash_rows`` (Rust xxhash, zero-copy from Arrow — no Python
    string materialization; ~100× faster than pandas object hashing).
    Stable across processes and runs for a fixed polars version (the
    triple-store manifests carry the engine version for exactly this)."""
    import polars as pl

    return pl.from_arrow(t.select(cols)).hash_rows(seed=0).to_numpy()


def _unique_batch(
    t: pa.Table,
    cols: list[str],
    hashes: np.ndarray | None = None,
    return_hashes: bool = False,
):
    """Vectorized within-batch distinct over ``cols`` (drops other cols).

    Strategy: sort by a single uint64 row-hash column (identical rows hash
    identically, so duplicates become adjacent), then an exact adjacent-row
    compare on the REAL columns decides — hash collisions merely place two
    different rows next to each other, never merge them. This is ~#cols×
    cheaper than a multi-string-column sort at equal exactness.

    Not ``pa.Table.group_by``: pyarrow 16.1's grouper emits duplicate
    groups on some multi-chunk layouts (observed: 164 duplicate groups on
    a 20k-row 3-chunk block), silently breaking set semantics.
    """
    if t.num_rows <= 1:
        out = t.select(cols)
        if return_hashes:
            h = row_hash(out, cols) if hashes is None else hashes
            return out, h
        return out
    k = t.select(cols).combine_chunks()
    h = row_hash(k, cols) if hashes is None else hashes
    idx = np.argsort(h, kind="stable")
    s = k.take(pa.array(idx))
    n = s.num_rows
    # cheap pre-filter: rows whose hash differs from their neighbor are
    # certainly distinct; only equal-hash neighbors need the column compare
    hs = h[idx]
    maybe_eq = hs[1:] == hs[:-1]
    eq_all = maybe_eq.copy()
    if maybe_eq.any():
        for c in cols:
            col = s.column(c).combine_chunks()
            a, b = col.slice(0, n - 1), col.slice(1, n - 1)
            eq = pc.equal(a, b)
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            same = pc.or_(pc.fill_null(eq, False), both_null)
            eq_all &= same.to_numpy(zero_copy_only=False)
            if not eq_all.any():
                break
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    np.logical_not(eq_all, out=keep[1:])
    res = s.filter(pa.array(keep))
    if return_hashes:
        # the kept rows' hashes, aligned with res — callers can ship them
        # through a shuffle and hand them back (hashes=...) to skip the
        # string re-hash in the post-shuffle dedup
        return res, hs[keep]
    return res


def distinct_rows(
    ds: rd.Dataset,
    cols: list[str],
    num_buckets: int = 64,
) -> rd.Dataset:
    """Global distinct over ``cols`` (output has exactly those columns).

    Sizing: a hash partition larger than ``DataContext.target_max_block_size``
    (128 MB default) is split into several blocks and the per-block dedup is
    then not global for that partition — pick ``num_buckets`` so partitions
    stay well under the limit (the triple-store sink sizes its buckets and
    runs a repair pass; see ``sinks/triplestore.py``).
    """

    ensure_hash_shuffle(ds)
    ROWH = "__rowh"

    def combine(t: pa.Table) -> pa.Table:
        # ship the combine-phase row hash (8 B/row) so the post-shuffle
        # dedup skips re-hashing the key columns
        out, h = _unique_batch(t, cols, return_hashes=True)
        return out.append_column(ROWH, pa.array(h))

    def dedup_block(t: pa.Table) -> pa.Table:
        h = t.column(ROWH).to_numpy().astype(np.uint64)
        return _unique_batch(t, cols, hashes=h)

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .repartition(num_buckets, keys=cols)
        # batch_size=None → whole blocks. EXACTNESS INVARIANT (verified for
        # Ray 2.49, tests/test_stages.py::test_shuffle_partition_invariant):
        # the HASH_SHUFFLE operator emits exactly ONE block per partition —
        # it constructs itself with target_max_block_size=None, so even a
        # 300 MB partition is not split — and this per-key stage is the
        # FIRST map downstream of the shuffle. Only a SECOND map stage sees
        # split blocks (map OUTPUTS are split at target_max_block_size),
        # which is why the triplestore writer — a second-map stage — has a
        # repair pass (sinks/triplestore.py).
        .map_batches(dedup_block, batch_format="pyarrow", batch_size=None)
    )


def distinct_triples(ds: rd.Dataset, num_buckets: int = 64) -> rd.Dataset:
    """RDF set semantics over the triple stream."""
    return distinct_rows(ds, TRIPLE_COLUMNS, num_buckets=num_buckets)


def _tagged_setop(
    a: rd.Dataset,
    b: rd.Dataset,
    cols: list[str],
    keep_if_in_b: bool,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Shared EXCEPT/INTERSECT machinery: per-side local dedup combiner
    (a duplicate never needs to cross the wire twice), union-tag, ONE
    hash shuffle on ``cols``, exact per-block merge (a row never spans
    blocks post-shuffle). Output = distinct rows of ``a`` that are
    (absent from | present in) ``b``."""

    ensure_hash_shuffle(a)
    ensure_hash_shuffle(b)

    def tag(kind: int):
        def f(t: pa.Table) -> pa.Table:
            # strip parquet/pandas schema metadata: an unhashable dict in
            # it defeats the shuffle aggregators' schema dedup (the
            # 'Failed to hash the schemas' warning)
            u = _unique_batch(t.replace_schema_metadata(None), cols)
            return u.append_column(
                "__kind", pa.array(np.full(u.num_rows, kind, np.int8))
            )

        return f

    def merge(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            # empty partitions from the shuffle usually still carry the
            # unified dtypes — keep them so empty blocks schema-unify
            # with populated siblings (int64 keys must not drift to
            # string); a fully schemaless block falls back to object
            if all(c in df.columns for c in cols):
                return to_clean_arrow(df[cols])
            return to_clean_arrow(pd.DataFrame({c: [] for c in cols}))
        a_rows = df[df["__kind"] == 0].drop_duplicates(cols)
        b_keys = df.loc[df["__kind"] == 1, cols].drop_duplicates()
        m = a_rows.merge(b_keys.assign(__inb=1), on=cols, how="left")
        keep = m["__inb"].notna() if keep_if_in_b else m["__inb"].isna()
        return to_clean_arrow(m.loc[keep, cols])

    return (
        a.map_batches(tag(0), batch_format="pyarrow")
        .union(b.map_batches(tag(1), batch_format="pyarrow"))
        .repartition(num_buckets, keys=cols)
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )


def except_rows(
    a: rd.Dataset, b: rd.Dataset, cols: list[str], num_buckets: int = 64
) -> rd.Dataset:
    """SQL EXCEPT: distinct rows of ``a`` over ``cols`` not in ``b``."""
    return _tagged_setop(a, b, cols, keep_if_in_b=False, num_buckets=num_buckets)


def intersect_rows(
    a: rd.Dataset, b: rd.Dataset, cols: list[str], num_buckets: int = 64
) -> rd.Dataset:
    """SQL INTERSECT: distinct rows of ``a`` over ``cols`` also in ``b``."""
    return _tagged_setop(a, b, cols, keep_if_in_b=True, num_buckets=num_buckets)


def graph_diff(a: rd.Dataset, b: rd.Dataset, num_buckets: int = 64) -> rd.Dataset:
    """Triples in graph ``a`` and not in graph ``b`` — the KG snapshot
    delta (new graph EXCEPT old graph = added triples; swap for removed).
    RDF graphs are sets, so this is exact set difference over the full
    term columns [W3C-R2RML §11 output is a set; reference gets set
    semantics from RDF::Trine::Model]."""
    return except_rows(a, b, TRIPLE_COLUMNS, num_buckets=num_buckets)


def first_per_group(
    ds: rd.Dataset,
    key_cols: list[str],
    order_col: str,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Exact dedup keeping, per key group, the row with the minimal
    ``order_col`` (deterministic 'first'). Same combiner→repartition
    structure as :func:`distinct_rows`."""

    ensure_hash_shuffle(ds)

    def combine(df: pd.DataFrame):
        return to_clean_arrow(
            df.sort_values(order_col, kind="mergesort").drop_duplicates(
                subset=key_cols, keep="first"
            )
        )

    return (
        ds.map_batches(combine, batch_format="pandas")
        .repartition(num_buckets, keys=key_cols)
        .map_batches(combine, batch_format="pandas", batch_size=None)
    )
