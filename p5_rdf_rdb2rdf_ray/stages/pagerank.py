"""Distributed PageRank — link-graph importance scoring [brief
extension; not in the reference]. The third iterative graph op beside
connected components (``cc.py``) and transitive closure (``paths.py``);
training-data pipelines use it to weight documents by link authority
before sampling.

Scale shape (per iteration, all-Arrow):

- the WEIGHTED edge list ``(src, dst, w=1/outdeg)`` is precomputed ONCE
  (one join + one materialize) — iterations never re-derive degrees;
- contributions = edges ⟗ ranks on ``src`` (the engine's union-tag
  co-hash join), then a combiner-first grouped SUM per ``dst`` (a hot
  destination collapses to ≤ one partial row per block before the
  shuffle — the same hot-key treatment as ``cc.py``);
- dangling mass needs NO extra join: Σ contributions equals the rank
  mass of non-dangling nodes, so ``1 − Σ`` is the dangling mass (one
  metadata-cheap ``sum()`` over the N-row materialized sums);
- new ranks = nodes ⟗ sums (left outer: zero-in-degree nodes keep the
  teleport term), materialized so the next round starts from blocks.

Total rank mass stays exactly 1 per iteration by construction.
Float sums are block-order dependent in the last ulps — refits are
reproducible only up to that; the pytest pins equality to a numpy
power-iteration reference within 1e-9.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def pagerank(
    edges: rd.Dataset,
    damping: float = 0.85,
    iters: int = 10,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 16,
) -> rd.Dataset:
    """→ Dataset(node, rank float64) over the DIRECTED graph; ranks sum
    to 1. Duplicate edges count once (the edge list is distinct-ed —
    PageRank over a multigraph is a different weighting; be explicit).
    Fixed ``iters`` rounds (power iteration converges geometrically at
    rate ``damping``; 10 rounds ≈ 0.85¹⁰ ≈ 0.2 residual factor, pass
    more for tighter tails)."""
    from ..engine.distinct import (
        cut_stats_lineage,
        distinct_rows,
        ensure_hash_shuffle,
        except_rows,
    )
    from ..engine.joins import hash_join
    from .groupagg import grouped_aggregate

    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iters <= 0:
        raise ValueError("iters must be positive")

    ensure_hash_shuffle(edges)
    e = distinct_rows(
        edges.map_batches(
            lambda t, _s=src, _d=dst: pa.table(
                {"src": t.column(_s), "dst": t.column(_d)}
            ),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
        num_buckets=num_partitions,
    ).materialize()

    nodes = distinct_rows(
        e.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t.column("src").combine_chunks()
                            if t.num_rows
                            else pa.array([], t.column("src").type),
                            t.column("dst").combine_chunks()
                            if t.num_rows
                            else pa.array([], t.column("dst").type),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        num_buckets=num_partitions,
    ).materialize()
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()),
                 "rank": pa.array([], pa.float64())}
            )
        )

    outdeg = grouped_aggregate(
        e, keys=["src"], aggs={"outdeg": ("dst", "count")},
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {"o_src": t.column("src"), "outdeg": t.column("outdeg")}
        ),
        batch_format="pyarrow",
    )
    we = hash_join(
        e, outdeg, ["src"], ["o_src"], num_partitions=num_partitions
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "w": pc.divide(
                    pa.scalar(1.0, pa.float64()),
                    t.column("outdeg").cast(pa.float64()),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    # nodes with NO in-edges get only the teleport+dangling base term —
    # precomputing the set ONCE replaces a per-iteration nodes ⟗ sums
    # join with a map-only union (2 shuffles per round, not 3)
    dsts = distinct_rows(
        e.map_batches(
            lambda t: pa.table({"node": t.column("dst")}),
            batch_format="pyarrow",
        ),
        ["node"],
        num_buckets=num_partitions,
    )
    zero_in = except_rows(
        nodes, dsts, ["node"], num_buckets=num_partitions
    ).materialize()

    ranks = nodes.map_batches(
        lambda t, _n=n: t.append_column(
            "rank", pa.array([1.0 / _n] * t.num_rows, pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()
    # setup-only datasets: release their pinned blocks before the
    # iteration loop (the full edge/node lists would otherwise stay in
    # the object store for the whole power-iteration phase)
    del e, nodes, dsts, outdeg

    for _ in range(iters):
        ren = ranks.map_batches(
            lambda t: pa.table(
                {"r_node": t.column("node"), "r_rank": t.column("rank")}
            ),
            batch_format="pyarrow",
        )
        contrib = hash_join(
            we, ren, ["src"], ["r_node"], num_partitions=num_partitions
        ).map_batches(
            lambda t: pa.table(
                {
                    "dst": t.column("dst"),
                    "cw": pc.multiply(
                        t.column("w"),
                        pc.fill_null(t.column("r_rank"), 0.0),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sums = grouped_aggregate(
            contrib, keys=["dst"], aggs={"in_sum": ("cw", "sum")},
            num_partitions=num_partitions,
        ).materialize()
        cut_stats_lineage(sums)
        # Σ contributions == rank mass of non-dangling nodes (each
        # non-dangling node's rank distributes fully: Σ_dst w = 1), so
        # the dangling mass needs no join — total mass is exactly 1
        got = sums.sum("in_sum")
        dangling = max(0.0, 1.0 - (got or 0.0))
        base = (1.0 - damping) / n + damping * dangling / n

        new = sums.map_batches(
            lambda t, _b=base, _d=damping: pa.table(
                {
                    "node": t.column("dst"),
                    "rank": pc.add(
                        pa.scalar(_b, pa.float64()),
                        pc.multiply(
                            pa.scalar(_d, pa.float64()),
                            t.column("in_sum"),
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).union(
            zero_in.map_batches(
                lambda t, _b=base: t.append_column(
                    "rank",
                    pa.array([_b] * t.num_rows, pa.float64()),
                ),
                batch_format="pyarrow",
            )
        )
        # `new` stays LAZY: it is map-only over the MATERIALIZED sums
        # (+ the static zero_in set), consumed exactly once by the next
        # round's contrib join — materializing it would add a third
        # ~fixed-cost execution per round for nothing. Lineage depth
        # stays O(1) because sums materializes (and gets its stats
        # ancestry cut: Ray keeps the full stats parent tree through
        # materialize(), and its unbounded-depth to_summary recursion
        # caps iterative pipelines at ~15 rounds otherwise).
        ranks = new
    return cut_stats_lineage(ranks.materialize())
