"""Distributed k-means over embedding columns — cluster-aware corpus
curation [brief extension; not in the reference — RDF::RDB2RDF has no
vector ops].

Training-data pipelines cluster embeddings to balance domains, pick
semantic dedup buckets and build curriculum mixtures. The scale shape
here:

- ``kmeans_fit`` — Lloyd's iterations where the WHOLE corpus streams
  through a map-only assignment whose output is already combined: each
  block emits at most k partial rows (cluster id, vector sum, count) —
  the combiner IS the one-hot matmul. Partials merge through a batched
  combine stage and one tiny keyed shuffle (≤ k rows out), so the driver
  only ever sees k × D floats per iteration. The projected (id, vector)
  dataset is materialized ONCE (object-store, spill-capable) so the
  pipeline doesn't re-read the source per iteration.
- ``kmeans_assign`` — map-only: one matmul per batch against broadcast
  centroids (``ray.put`` once, read per actor, never re-shipped).
- ``cluster_balanced_sample`` — two passes: distributed cluster sizes,
  then the deterministic fmix32 stratified sampler with per-cluster
  rates (re-runs and resumed partitions agree; see ``stages/sample``).

Determinism: centroid updates sum floats in block order, so refits on a
different block layout can differ in the last ulps — fine for
clustering (assignment under FIXED centroids is exactly reproducible
and is what the oracle checks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..engine.distinct import ensure_hash_shuffle
from .similarity import _normalize, _to_matrix

_PARTIAL_SCHEMA_COLS = ("cluster", "psum", "cnt")


def _assign_ids(m: np.ndarray, c: np.ndarray, spherical: bool) -> np.ndarray:
    """Nearest-centroid ids; ties break to the LOWEST cluster index
    (np.argmax/argmin take the first extremum)."""
    if spherical:
        return np.argmax(m @ c.T, axis=1)
    # squared euclidean via the expansion; ||m||² is constant per row
    d = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
    return np.argmin(d, axis=1)


def _merge_partials(t: pa.Table, k: int, dim: int) -> pa.Table:
    """Sum (cluster, psum, cnt) partial rows — used as the batched
    combine stage AND the per-partition finalizer (same monoid)."""
    if t.num_rows == 0:
        return t
    cl = t.column("cluster").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    ps = (
        t.column("psum")
        .combine_chunks()
        .flatten()
        .to_numpy(zero_copy_only=False)
        .reshape(-1, dim)
    )
    sums = np.zeros((k, dim), np.float64)
    counts = np.zeros(k, np.int64)
    np.add.at(sums, cl, ps)
    np.add.at(counts, cl, cnt)
    live = np.flatnonzero(counts)
    return pa.table(
        {
            "cluster": pa.array(live.astype(np.int32), pa.int32()),
            "psum": pa.FixedSizeListArray.from_arrays(
                pa.array(sums[live].ravel(), pa.float64()), dim
            ),
            "cnt": pa.array(counts[live], pa.int64()),
        }
    )


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 16,
    iters: int = 10,
    vec_col: str = "embedding",
    seed: int = 0x5EED_0007,
    spherical: bool = True,
    tol: float = 1e-6,
    init_sample: int = 4096,
) -> np.ndarray:
    """Fit k-means centroids over the FULL dataset with distributed
    Lloyd's iterations (contrast ``similarity.ivf_centroids``, which
    fits on a driver-side sample). → (k, D) float64 centroids (an
    empty cluster keeps its previous centroid between iterations, so a
    transiently-empty cluster can recover; one empty at convergence
    stays and simply attracts nothing).

    ``spherical=True`` normalizes rows and centroids (cosine geometry —
    the embedding-space default); False runs plain euclidean Lloyd's.
    Init: seeded choice from the first ``init_sample`` rows (cheap,
    reproducible — the limit() prunes the read)."""
    if k <= 0 or iters <= 0:
        raise ValueError("k and iters must be positive")
    proj = ds.map_batches(
        lambda t, _v=vec_col: t.select([_v]).replace_schema_metadata(None),
        batch_format="pyarrow",
    ).materialize()

    head = [
        b
        for b in proj.limit(init_sample).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if b.num_rows
    ]
    if not head:
        return np.zeros((0, 0), np.float64)
    m0 = _to_matrix(pa.concat_tables(head), vec_col).astype(np.float64)
    if spherical:
        m0 = _normalize(m0)
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(m0))
    c = m0[np.sort(rng.choice(len(m0), size=k_eff, replace=False))].copy()
    dim = c.shape[1]

    ensure_hash_shuffle(proj)
    for _ in range(iters):
        ref = ray.put(c)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            cc = ray.get(_ref)
            if t.num_rows == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int32()),
                        "psum": pa.array(
                            [], pa.list_(pa.float64(), dim)
                        ),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            m = _to_matrix(t, vec_col).astype(np.float64)
            if spherical:
                m = _normalize(m)
            a = _assign_ids(m, cc, spherical)
            sums = np.zeros((len(cc), dim), np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=len(cc)).astype(np.int64)
            live = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(live.astype(np.int32), pa.int32()),
                    "psum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums[live].ravel(), pa.float64()), dim
                    ),
                    "cnt": pa.array(counts[live], pa.int64()),
                }
            )

        rows = (
            proj.map_batches(partial, batch_format="pyarrow")
            # batched combine: bundles many blocks' ≤k-row partials into
            # one ≤k-row set before the shuffle (tree-reduce level 1)
            .map_batches(
                lambda t, _k=k_eff, _d=dim: _merge_partials(t, _k, _d),
                batch_format="pyarrow",
                batch_size=max(4096, 16 * k_eff),
            )
            .repartition(min(32, k_eff), keys=["cluster"])
            .map_batches(
                lambda t, _k=k_eff, _d=dim: _merge_partials(t, _k, _d),
                batch_format="pyarrow",
                batch_size=None,
            )
            .take_all()
        )
        new_c = c.copy()
        for r in rows:
            j = int(r["cluster"])
            n = int(r["cnt"])
            if n:
                new_c[j] = np.asarray(r["psum"], np.float64) / n
        if spherical:
            new_c = _normalize(new_c)
        shift = float(np.max(np.linalg.norm(new_c - c, axis=1))) if len(c) else 0.0
        c = new_c
        if shift < tol:
            break
    return c


def kmeans_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    score_col: str | None = None,
    spherical: bool = True,
    drop_vec: bool = False,
) -> rd.Dataset:
    """Map-only nearest-centroid assignment: appends ``out_col`` (int64
    cluster id = centroid row index; ties to the lowest id) and
    optionally ``score_col`` (cosine similarity, or negative squared
    euclidean distance). Centroids broadcast once via ``ray.put``;
    ``drop_vec=True`` strips the embedding column from the output (the
    id+cluster projection downstream sampling wants)."""
    if centroids.ndim != 2 or not len(centroids):
        raise ValueError("centroids must be a non-empty (k, D) matrix")
    cref = ray.put(
        _normalize(centroids.astype(np.float64))
        if spherical
        else centroids.astype(np.float64)
    )

    class Assign:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                t = t.append_column(out_col, pa.array([], pa.int64()))
                if score_col:
                    t = t.append_column(score_col, pa.array([], pa.float64()))
                return t if not drop_vec else t.drop_columns([vec_col])
            m = _to_matrix(t, vec_col).astype(np.float64)
            if spherical:
                m = _normalize(m)
            # shared tie-break/distance logic with kmeans_fit — fit and
            # assign must never diverge
            a = _assign_ids(m, self.c, spherical)
            if spherical:
                score = (m * self.c[a]).sum(axis=1)
            else:
                score = -((m - self.c[a]) ** 2).sum(axis=1)
            t = t.append_column(out_col, pa.array(a.astype(np.int64)))
            if score_col:
                t = t.append_column(score_col, pa.array(score, pa.float64()))
            return (
                t.drop_columns([vec_col]) if drop_vec else t
            ).replace_schema_metadata(None)

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 8))


def cluster_sizes(
    assigned: rd.Dataset, cluster_col: str = "cluster", num_partitions: int = 8
) -> rd.Dataset:
    """Rows per cluster (combiner-first grouped count)."""
    from .groupagg import grouped_aggregate

    return grouped_aggregate(
        assigned,
        keys=[cluster_col],
        aggs={"n": (cluster_col, "count")},
        num_partitions=num_partitions,
    )


def cluster_balanced_sample(
    ds: rd.Dataset,
    centroids: np.ndarray,
    target_per_cluster: int,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    spherical: bool = True,
    seed: int = 0,
) -> rd.Dataset:
    """Cluster-balanced corpus subsetting: assign every row to its
    nearest centroid, then keep a deterministic ≈``target_per_cluster``
    rows from each cluster (rate = target / size, capped at 1) via the
    fmix32 hash sampler — over-represented clusters downsample, small
    ones pass through whole. Two passes over the assigned dataset
    (materialized once, spill-capable): a tiny grouped count, then the
    map-only stratified filter. Deterministic end-to-end: re-runs and
    resumed partitions keep identical rows."""
    from .sample import stratified_sample

    if target_per_cluster <= 0:
        raise ValueError("target_per_cluster must be positive")
    assigned = kmeans_assign(
        ds, centroids, vec_col=vec_col, spherical=spherical
    ).materialize()
    sizes = cluster_sizes(assigned).to_pandas()
    rates = {
        int(r.cluster): min(1.0, target_per_cluster / int(r.n))
        for r in sizes.itertuples()
        if int(r.n)
    }
    return stratified_sample(
        assigned, rates, group_col="cluster", key_col=key_col, seed=seed
    )
