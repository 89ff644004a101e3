"""Store-lookup scale smoke: unbound / predicate-only ``lookup_store``
must STREAM (lazy Dataset, round-4 change) — the round-3 version
concatenated the whole store into one driver table, which at 100 TB is a
driver OOM.

Protocol: build (or reuse) a multi-million-triple store from the scaling
corpus, then in THIS process run the unbound and predicate-only lookups,
consuming them with streaming aggregates only. Report store size on disk
vs driver maxRSS — the lazy contract holds iff driver RSS stays a small
constant, not ∝ store size. Bound-subject point lookups stay eager
(one pruned bucket) and are timed for contrast.

Usage: python tools/store_lookup_smoke.py [n_convs]  (default 300k)
"""

from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray
    import ray.data as rd

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    tx = f"/tmp/graft_scale_tx_{n_convs}"
    store = f"/tmp/graft_lookup_store_{n_convs}"
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from p5_rdf_rdb2rdf_ray.pipelines.flagship import BASE, build_kg
    from p5_rdf_rdb2rdf_ray.pipelines.transcripts import write_transcripts
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        lookup_store,
        write_triplestore,
    )

    if not os.path.isdir(tx):
        write_transcripts(tx, n_convs=n_convs, num_files=64, seed=42)
    if not os.path.isdir(store):
        write_triplestore(
            build_kg(rd.read_parquet(tx), distinct=False), store,
            num_buckets=64, input_fp="smoke", resume=False,
        )
    disk_gb = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(store) for f in fs
    ) / 1e9

    # unbound: lazy Dataset, consumed by a streaming count
    t0 = time.time()
    ds_all = lookup_store(store)
    n_all = ds_all.count()
    t_all = time.time() - t0

    # predicate-only: parquet-filter pushdown, streaming count
    t0 = time.time()
    n_role = lookup_store(store, predicate=BASE + "role").count()
    t_role = time.time() - t0

    # bound subject: eager point lookup (one pruned bucket)
    t0 = time.time()
    pt = lookup_store(store, BASE + "conv/c000001/turn/0")
    t_pt = time.time() - t0

    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        f"store={disk_gb:.2f} GB on disk  triples={n_all}  "
        f"unbound_count={t_all:.1f}s  pred_only={n_role} rows {t_role:.1f}s  "
        f"point={pt.num_rows} rows {t_pt * 1000:.0f}ms  "
        f"driver_maxRSS={rss:.2f} GB"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
