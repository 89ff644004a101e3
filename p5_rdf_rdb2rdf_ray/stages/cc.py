"""Connected-components canonicalization (SURVEY §2 #24 — graft stage).

Min-label propagation over an edge Dataset:

    labels(node) ← min(node, min over neighbors' labels), iterate to fixpoint

Each round is: hash-join labels onto edges + a grouped Min aggregate. Hot
entities (one entity in 50% of turns — the FIXTURES skew case) are handled
by a per-batch pre-aggregate *before* the grouped Min: the combiner
collapses each batch to ≤ one row per node, so a node appearing in millions
of edge rows contributes at most #blocks rows to the shuffle — the same
salting effect as (node, salt)-two-phase aggregation, without a second
shuffle.

``cc_labels_small`` is the broadcast path (driver union-find) for gazetteer-
sized graphs; the flagship uses it when the alias table is tiny and the
distributed path for document-scale dedup graphs.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def cc_labels_small(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find with min-label canonical representative (driver-side;
    use only for provably small graphs, e.g. the gazetteer alias set)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {x: find(x) for x in set(parent) | {n for e in edges for n in e}}


def cc_labels_numpy(a, b):
    """Vectorized driver-side CC over int64 edge arrays ``(a, b)`` →
    ``(nodes, labels)`` int64 arrays, label = MIN node id in the
    component. Min-label propagation + pointer jumping, all numpy —
    O((E+V)·log d) total work, no Python loop over edges. The broadcast
    path for edge sets that fit one machine (e.g. a near-dup pair graph,
    small vs the corpus by construction); `connected_components` is the
    distributed twin."""
    import numpy as np

    if not len(a):
        return np.array([], np.int64), np.array([], np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a) :]
    lbl = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(lbl[ia], lbl[ib])
        np.minimum.at(lbl, ia, m)
        np.minimum.at(lbl, ib, m)
        for _ in range(64):  # pointer jumping to per-round fixpoint
            nl = lbl[lbl]
            if np.array_equal(nl, lbl):
                break
            lbl = nl
        if np.all(lbl[ia] == lbl[ib]):
            break
    return nodes, nodes[lbl]


def connected_components(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 26,
    num_partitions: int = 16,
    shortcut: bool = True,
) -> rd.Dataset:
    """→ Dataset(node:string, label:string) with label = min node id of the
    component. Min-label propagation + POINTER JUMPING (``shortcut``): each
    round first takes the grouped min over neighbor labels, then rewrites
    every node's label to its label's label (one labels⋈labels hash join —
    labels only ever decrease, so label(label(n)) ≤ label(n)). Jumping
    roughly doubles the propagation distance per round → O(log diameter)
    rounds instead of O(diameter). ``max_rounds`` is a SAFETY CAP, not the
    expected count: the loop stops early on a fixpoint (cheap convergence
    probe: the global sum of label hashes, an order-insensitive digest —
    no join needed), so the default 26 (reach ≈ 2^26 diameter) costs
    nothing on ordinary graphs."""
    from ..engine.distinct import distinct_rows, ensure_hash_shuffle, row_hash
    from ..engine.joins import hash_join
    from .groupagg import grouped_aggregate

    ensure_hash_shuffle(edges)

    def to_nodes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        t.column(src).combine_chunks().cast(pa.string()),
                        t.column(dst).combine_chunks().cast(pa.string()),
                    ]
                )
            }
        )

    und = edges.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [
                        t.column(src).combine_chunks().cast(pa.string()),
                        t.column(dst).combine_chunks().cast(pa.string()),
                    ]
                ),
                "dst": pa.concat_arrays(
                    [
                        t.column(dst).combine_chunks().cast(pa.string()),
                        t.column(src).combine_chunks().cast(pa.string()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    labels = (
        distinct_rows(
            edges.map_batches(to_nodes, batch_format="pyarrow"), ["node"],
            num_buckets=num_partitions,
        )
        .map_batches(
            lambda t: t.append_column("label", t.column("node")),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def digest(lbl: rd.Dataset) -> int:
        # order-insensitive fixpoint probe: sum of row hashes mod 2^64.
        # One int64 per block to the driver — no aggregate shuffle per
        # round. Python-int modular arithmetic: wraparound is intended.
        total = 0
        for b in lbl.map_batches(
            lambda t: pa.table(
                {"h": pa.array([int(row_hash(t, ["node", "label"]).sum())
                                if t.num_rows else 0], pa.uint64())}
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow"):
            for v in b.column("h").to_pylist():
                total = (total + v) & 0xFFFF_FFFF_FFFF_FFFF
        return total

    converged = False
    prev = digest(labels)
    for _ in range(max_rounds):
        # neighbor messages: (src,dst) ⋈ labels(src) → (dst, label)
        msgs = hash_join(
            und, labels, ["src"], ["node"], num_partitions=num_partitions
        ).map_batches(
            lambda t: pa.table(
                {"node": t.column("dst"), "label": t.column("label")}
            ),
            batch_format="pyarrow",
        )
        combined = labels.select_columns(["node", "label"]).union(msgs)
        # two-phase grouped Min (per-batch combiner = hot-node salting:
        # a hub in millions of edge rows ships ≤ one row per block)
        labels = grouped_aggregate(
            combined, keys=["node"], aggs={"label": ("label", "min")},
            num_partitions=num_partitions,
        ).materialize()
        if shortcut:
            # pointer jump: node's label ← label(label(node)). The label
            # is itself a node id, so self-join labels on label==node.
            as_parent = labels.map_batches(
                lambda t: pa.table(
                    {"pnode": t.column("node"), "plabel": t.column("label")}
                ),
                batch_format="pyarrow",
            )
            jumped = hash_join(
                labels, as_parent, ["label"], ["pnode"],
                num_partitions=num_partitions,
            )

            def jump(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                lbl = pc.coalesce(t.column("plabel"), t.column("label"))
                return pa.table({"node": t.column("node"), "label": lbl})

            labels = jumped.map_batches(
                jump, batch_format="pyarrow"
            ).materialize()
        cur = digest(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # min-label propagation needs ~diameter rounds; returning here
        # would silently yield wrong components for high-diameter graphs.
        import logging

        logging.getLogger(__name__).warning(
            "connected_components: no fixpoint after %d rounds — labels may "
            "be non-converged for high-diameter graphs; raise max_rounds "
            "(or use a pointer-doubling variant for the scale path)",
            max_rounds,
        )
    return labels


class CanonicalMapper:
    """Broadcast canonical-map application: rewrite an id column to its
    component representative. Map fetched once per actor from the object
    store."""

    def __init__(self, mapping_ref=None, mapping: dict[str, str] | None = None,
                 col: str = "entity_id", out_col: str = "canonical_id"):
        if mapping is None:
            import ray

            mapping = ray.get(mapping_ref) if mapping_ref is not None else {}
        self.mapping = mapping
        self.col = col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column(self.col).to_pandas()
        mapped = s.map(self.mapping).fillna(s)  # C-level dict lookup
        return batch.append_column(
            self.out_col, pa.Array.from_pandas(mapped, type=pa.string())
        )
