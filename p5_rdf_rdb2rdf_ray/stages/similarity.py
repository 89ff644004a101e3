"""Similarity search over embedding columns (graft extensions).

- :func:`ann_topk` — brute-force cosine top-k: the query matrix is put in
  the object store ONCE (``ray.put``), every batch does one numpy matmul
  against it, per-batch top-k prune, then a single tiny global merge. This
  is the exact baseline; wall-time scales linearly in corpus size and is
  embarrassingly parallel.
- :func:`lsh_topk` — random-hyperplane LSH bucketing as the scale path:
  probe only buckets the query hashes into (multi-probe over all bands).
  Approximate; used when the corpus is too large for full scans.
- :func:`embedding_neardup_pairs` — all-pairs cosine ≥ τ near-dup: the
  corpus lives in the object store as block refs; each task streams the
  other side block-by-block (no driver copy, per-task memory = one block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


_LSH_SEED = 0x5EED_0002


def _to_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    flat = np.asarray(arr.values, dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return m / nrm


class _TopKScorer:
    """Actor-pool stage: query matrix fetched once per actor."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        qids, qm = ray.get(queries_ref)
        self.qids = qids
        self.qm = _normalize(qm)  # (Q, D)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    self.id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        m = _normalize(_to_matrix(batch, self.vec_col))  # (N, D)
        ids = np.asarray(batch.column(self.id_col))
        s = self.qm @ m.T  # (Q, N)
        k = min(self.k, s.shape[1])
        # per-query local top-k (argpartition = O(N))
        idx = np.argpartition(-s, k - 1, axis=1)[:, :k]
        rows = np.repeat(self.qids, k)
        cols = ids[idx.ravel()]
        scores = np.take_along_axis(s, idx, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(rows, pa.int64()),
                self.id_col: pa.array(cols, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def ann_topk(
    ds: rd.Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency=(1, 8),
) -> rd.Dataset:
    """``queries`` = (query_ids (Q,), query_matrix (Q, D)).

    → (query_id, vec_id, rank) — rank 1..k by cosine desc, ties → min id.
    """
    qref = ray.put((np.asarray(queries[0], np.int64), np.asarray(queries[1], np.float64)))
    local = ds.map_batches(
        _TopKScorer,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "k": k,
            "vec_col": vec_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["query_id", "score", id_col], ascending=[True, False, True],
            kind="mergesort",
        )
        df["rank"] = df.groupby("query_id").cumcount() + 1
        return df[df["rank"] <= k][["query_id", id_col, "rank"]].reset_index(
            drop=True
        )

    return local.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


def lsh_topk(
    ds: rd.Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    k: int = 10,
    num_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Approximate top-k: random-hyperplane bucket signatures; only vectors
    whose signature is within Hamming ≤ 2 of the query signature are scored.
    Same output schema as :func:`ann_topk` (+score kept for diagnostics)."""
    qids = np.asarray(queries[0], np.int64)
    qm = _normalize(np.asarray(queries[1], np.float64))
    dim = qm.shape[1]
    rng = np.random.default_rng(_LSH_SEED)
    planes = rng.standard_normal((num_planes, dim))
    qsig = (qm @ planes.T > 0).astype(np.uint32)
    qsig_packed = (qsig << np.arange(num_planes, dtype=np.uint32)).sum(axis=1)
    qref = ray.put((qids, qm, planes, qsig_packed))

    class Scorer:
        def __init__(self):
            self.qids, self.qm, self.planes, self.qsig = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        id_col: pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            m = _normalize(_to_matrix(batch, vec_col))
            ids = np.asarray(batch.column(id_col))
            sig = (m @ self.planes.T > 0).astype(np.uint32)
            packed = (sig << np.arange(self.planes.shape[0], dtype=np.uint32)).sum(
                axis=1
            )
            rows_q, rows_i, rows_s = [], [], []
            for qi in range(len(self.qids)):
                x = packed ^ self.qsig[qi]
                # popcount via bit tricks (vectorized)
                ham = np.zeros_like(x)
                v = x.copy()
                while v.any():
                    ham += v & 1
                    v >>= 1
                mask = ham <= 2
                if not mask.any():
                    continue
                s = m[mask] @ self.qm[qi]
                kk = min(k, len(s))
                idx = np.argpartition(-s, kk - 1)[:kk]
                rows_q.extend([self.qids[qi]] * kk)
                rows_i.extend(ids[mask][idx].tolist())
                rows_s.extend(s[idx].tolist())
            return pa.table(
                {
                    "query_id": pa.array(rows_q, pa.int64()),
                    id_col: pa.array(rows_i, pa.int64()),
                    "score": pa.array(rows_s, pa.float64()),
                }
            )

    local = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=(1, 8))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["query_id", "score", id_col], ascending=[True, False, True],
            kind="mergesort",
        )
        df["rank"] = df.groupby("query_id").cumcount() + 1
        return df[df["rank"] <= k].reset_index(drop=True)

    return local.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


def ivf_centroids(
    ds: rd.Dataset,
    nlist: int = 16,
    sample: int = 4096,
    iters: int = 10,
    vec_col: str = "embedding",
    seed: int = 0x5EED_0003,
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer for IVF: seeded
    sample (first ``sample`` rows — cheap and reproducible), numpy Lloyd
    iterations on the driver (the quantizer is tiny; assignment is the
    distributed part). → (nlist, D) L2-normalized centroids."""
    batches = [
        b
        for b in ds.limit(sample).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if b.num_rows
    ]
    if not batches:
        return np.zeros((0, 0), np.float64)  # empty corpus → no centroids
    t = pa.concat_tables(batches)
    m = _normalize(_to_matrix(t, vec_col))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(m), size=min(nlist, len(m)), replace=False)
    c = m[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ c.T, axis=1)
        for j in range(len(c)):
            sel = m[assign == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
        c = _normalize(c)
    return c


def ivf_topk(
    ds: rd.Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
    concurrency=(1, 8),
) -> rd.Dataset:
    """IVF approximate top-k — the inverted-file scale path next to
    :func:`lsh_topk`: vectors are assigned to their nearest coarse
    centroid per batch (one matmul); each query scores only vectors
    whose centroid is among its ``nprobe`` nearest lists. Same output
    schema as :func:`ann_topk` (+score). ``nprobe == nlist`` degrades
    gracefully to the exact brute-force scan."""
    qids = np.asarray(queries[0], np.int64)
    qm = _normalize(np.asarray(queries[1], np.float64))
    c = centroids if centroids is not None else ivf_centroids(
        ds, nlist=nlist, vec_col=vec_col
    )
    if len(c) == 0:  # empty corpus → empty result, same schema as ann_topk
        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    nprobe = max(1, min(nprobe, len(c)))
    # per query: the nprobe nearest centroid ids
    qsim = qm @ c.T  # (Q, L)
    probes = np.argpartition(-qsim, nprobe - 1, axis=1)[:, :nprobe]
    ref = ray.put((qids, qm, c, probes))

    class Scorer:
        def __init__(self):
            self.qids, self.qm, self.c, self.probes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        id_col: pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            m = _normalize(_to_matrix(batch, vec_col))
            ids = np.asarray(batch.column(id_col))
            assign = np.argmax(m @ self.c.T, axis=1)  # (N,) list id
            rows_q, rows_i, rows_s = [], [], []
            for qi in range(len(self.qids)):
                mask = np.isin(assign, self.probes[qi])
                if not mask.any():
                    continue
                s = m[mask] @ self.qm[qi]
                kk = min(k, len(s))
                idx = np.argpartition(-s, kk - 1)[:kk]
                rows_q.extend([self.qids[qi]] * kk)
                rows_i.extend(ids[mask][idx].tolist())
                rows_s.extend(s[idx].tolist())
            return pa.table(
                {
                    "query_id": pa.array(rows_q, pa.int64()),
                    id_col: pa.array(rows_i, pa.int64()),
                    "score": pa.array(rows_s, pa.float64()),
                }
            )

    local = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=concurrency)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["query_id", "score", id_col], ascending=[True, False, True],
            kind="mergesort",
        )
        df["rank"] = df.groupby("query_id").cumcount() + 1
        return df[df["rank"] <= k].reset_index(drop=True)

    return local.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


def embedding_neardup_pairs(
    ds: rd.Dataset,
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency=(1, 8),
) -> rd.Dataset:
    """→ (vec_a, vec_b) with cosine ≥ τ, vec_a < vec_b. Exact all-pairs.

    The corpus is materialized into the OBJECT STORE once and each task
    streams the other side block-by-block (``ray.get`` of one block ref
    at a time — zero-copy plasma reads, per-task memory bounded by one
    block, the driver holds only refs). O(N²) work split across the
    cluster as blocked matmuls; for corpora where N² is prohibitive,
    LSH-bucket first (``lsh_topk`` machinery) and verify per bucket.
    """
    mat = ds.materialize()
    block_refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref in bundle.block_refs
    ]
    if not block_refs:
        return rd.from_arrow(
            pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            )
        )

    class Pairs:
        def __init__(self, refs):
            self.refs = refs

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "vec_a": pa.array([], pa.int64()),
                        "vec_b": pa.array([], pa.int64()),
                    }
                )
            m = _normalize(_to_matrix(batch, vec_col))
            ids = np.asarray(batch.column(id_col))
            out_a: list[np.ndarray] = []
            out_b: list[np.ndarray] = []
            for ref in self.refs:
                other = ray.get(ref)  # one corpus block at a time
                if other.num_rows == 0:
                    continue
                om = _normalize(_to_matrix(other, vec_col))
                oids = np.asarray(other.column(id_col))
                s = m @ om.T  # (n, block)
                bi, bj = np.nonzero(s >= tau)
                a = ids[bi]
                b = oids[bj]
                keep = a < b
                out_a.append(a[keep])
                out_b.append(b[keep])
            a = np.concatenate(out_a) if out_a else np.array([], np.int64)
            b = np.concatenate(out_b) if out_b else np.array([], np.int64)
            return pa.table(
                {
                    "vec_a": pa.array(a, pa.int64()),
                    "vec_b": pa.array(b, pa.int64()),
                }
            )

    return mat.map_batches(
        Pairs,
        fn_constructor_kwargs={"refs": block_refs},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def embedding_neardup_pairs_approx(
    ds: rd.Dataset,
    tau: float = 0.95,
    nlist: int = 16,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 16,
    centroids: np.ndarray | None = None,
) -> rd.Dataset:
    """Approximate (vec_a, vec_b) cosine ≥ τ pairs — the sub-quadratic
    scale path next to the exact :func:`embedding_neardup_pairs`.

    Bucket-and-verify: every vector is MULTI-PROBE assigned to its
    ``nprobe`` nearest IVF centroids (boundary pairs co-occur in some
    bucket with high probability), buckets are co-located by one hash
    shuffle, and each bucket runs an exact blocked all-pairs matmul.
    Work is ~nprobe²·N²/nlist instead of N² — pick ``nlist ≈ √N`` for
    ~N^1.5; the shuffle moves nprobe× the corpus, not O(N²) bytes.
    Cross-probe duplicate pairs are removed by a distinct pass. Each
    verify block logs its comparison count (the measurable probe work).
    """
    from ..engine.distinct import distinct_rows, ensure_hash_shuffle

    empty = pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
    )
    c = centroids if centroids is not None else ivf_centroids(
        ds, nlist=nlist, vec_col=vec_col
    )
    if len(c) == 0:
        return rd.from_arrow(empty)
    nprobe = max(1, min(nprobe, len(c)))
    cref = ray.put(c)

    class Assign:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "bkt": pa.array([], pa.int64()),
                        id_col: pa.array([], pa.int64()),
                        vec_col: pa.array([], batch.schema.field(vec_col).type),
                    }
                )
            m = _normalize(_to_matrix(batch, vec_col))
            sim = m @ self.c.T
            kk = min(nprobe, sim.shape[1])
            pr = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]  # (N, P)
            ids = np.asarray(batch.column(id_col))
            vec = batch.column(vec_col)
            if isinstance(vec, pa.ChunkedArray):
                vec = vec.combine_chunks()
            take = np.repeat(np.arange(batch.num_rows), kk)
            return pa.table(
                {
                    "bkt": pa.array(pr.ravel().astype(np.int64)),
                    id_col: pa.array(np.repeat(ids, kk), pa.int64()),
                    vec_col: vec.take(pa.array(take)),
                }
            )

    asg = ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 8))
    ensure_hash_shuffle(asg)
    part = asg.repartition(num_partitions, keys=["bkt"])

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        bkt = np.asarray(t.column("bkt"))
        order = np.argsort(bkt, kind="stable")
        m = _normalize(_to_matrix(t, vec_col))[order]
        ids = np.asarray(t.column(id_col))[order]
        b = bkt[order]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        bounds = np.r_[starts, len(b)]
        out_a, out_b = [], []
        comparisons = 0
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            seg_m, seg_ids = m[s0:s1], ids[s0:s1]
            n = s1 - s0
            comparisons += n * (n - 1) // 2
            # blocked matmul: bound temp at ~2048×n floats
            for r0 in range(0, n, 2048):
                r1 = min(r0 + 2048, n)
                s = seg_m[r0:r1] @ seg_m.T
                bi, bj = np.nonzero(s >= tau)
                a, bb = seg_ids[r0 + bi], seg_ids[bj]
                keep = a < bb
                out_a.append(a[keep])
                out_b.append(bb[keep])
        import logging

        logging.getLogger(__name__).info(
            "neardup_approx verify block: %d rows, %d buckets, %d comparisons",
            len(b), len(starts), comparisons,
        )
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        bb = np.concatenate(out_b) if out_b else np.array([], np.int64)
        return pa.table(
            {"vec_a": pa.array(a, pa.int64()), "vec_b": pa.array(bb, pa.int64())}
        )

    pairs = part.map_batches(verify, batch_format="pyarrow", batch_size=None)
    # a pair can surface in up to nprobe² shared buckets → set semantics
    return distinct_rows(pairs, ["vec_a", "vec_b"], num_buckets=num_partitions)


def embedding_near_dedup(
    ds: rd.Dataset,
    tau: float = 0.95,
    method: str = "exact",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    nprobe: int = 2,
    num_partitions: int = 16,
    driver_cc_edges: int = 2_000_000,
) -> rd.Dataset:
    """End-to-end embedding near-dedup, the vector twin of
    ``dedup.near_dedup_docs``: cosine-similarity pairs (``method`` =
    'exact' all-pairs or 'approx' IVF bucket-and-verify) → connected
    components → per component the MIN id is the canonical
    representative. → (id_col, rep_id:int64, is_kept:bool) for EVERY
    input vector. The corpus streams id-only through the final
    assignment — the embedding column never enters the CC phase."""
    from .dedup import pairs_to_verdicts

    if method == "exact":
        pairs = embedding_neardup_pairs(
            ds, tau=tau, vec_col=vec_col, id_col=id_col
        )
    elif method == "approx":
        pairs = embedding_neardup_pairs_approx(
            ds, tau=tau, nlist=nlist, nprobe=nprobe, vec_col=vec_col,
            id_col=id_col, num_partitions=num_partitions,
        )
    else:
        raise ValueError(f"unknown embedding near-dedup method {method!r}")

    return pairs_to_verdicts(
        ds.select_columns([id_col]), pairs, id_col=id_col,
        a_col="vec_a", b_col="vec_b",
        num_partitions=num_partitions, driver_cc_edges=driver_cc_edges,
    )
