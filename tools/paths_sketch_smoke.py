"""Scale smoke for the round-4 additions: the SPARQL path algebra
(seq composition + zero-or-more over a multi-million-triple store),
the Misra–Gries heavy-hitters sketch, PMI collocations, and exact-k
hash-rank sampling.

Protocol (same as tools/analytics_smoke.py): synthesize inputs IN RAY
(deterministic per block, nothing materializes on the driver), run each
operator, consume with a streaming count, report wall time + driver
maxRSS. Pass = flat driver RSS and walls that scale with input size.

Usage: python tools/paths_sketch_smoke.py [n_docs] [n_nodes]
       (defaults 200_000 docs / 1_000_000 graph nodes)
"""

from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    blocks = 64

    # --- path algebra over a synthetic store: a forest (i → i//2 via
    # <p>) + a name literal per node (via <q>) — n_nodes nodes,
    # 2·n_nodes triples. seq = one co-hash join; star = closure
    # (log-depth doubling) + the all-terms identity.
    N = "http://n/"
    P, Q = N + "p", N + "q"

    def gen_triples(b):
        import pyarrow as pa

        i = int(b["id"][0])
        m = n_nodes // blocks
        lo = i * m
        ids = np.arange(lo, lo + m)
        subj = np.char.add(N, ids.astype(str))
        parent = np.char.add(N, (ids // 2).astype(str))
        name = np.char.add("node ", ids.astype(str))
        return pa.table(
            {
                "subj": np.concatenate([subj, subj]),
                "pred": [P] * m + [Q] * m,
                "obj": np.concatenate([parent, name]),
                "obj_kind": pa.array([0] * m + [2] * m, type="uint8"),
                "lang": pa.nulls(2 * m, "string"),
                "datatype": pa.nulls(2 * m, "string"),
                "graph": pa.nulls(2 * m, "string"),
            }
        )

    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore
    from p5_rdf_rdb2rdf_ray.stages.paths import eval_path

    store = f"/tmp/paths_smoke_store_{n_nodes}"
    if not os.path.exists(os.path.join(store, "_MANIFESTS")):
        t0 = time.time()
        trips = rd.range(blocks).map_batches(
            gen_triples, batch_format="numpy", batch_size=1
        )
        write_triplestore(trips, store, num_buckets=32, input_fp="smoke")
        print(
            f"store: {2 * n_nodes:,} triples written in {time.time()-t0:.1f}s,"
            f" RSS {rss_gb():.2f} GB"
        )

    t0 = time.time()
    n = eval_path(store, f"<{P}>/<{Q}>", num_partitions=32).count()
    print(f"path seq <p>/<q>: {n:,} pairs in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    t0 = time.time()
    n = eval_path(store, f"^<{P}>|<{Q}>", num_partitions=32).count()
    print(f"path ^<p>|<q>: {n:,} pairs in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    # opt = identity over ALL terms (~3·n_nodes) + the <q> edges — the
    # zero-length node-set path (star's cost is closure + this; the
    # closure itself is already smoked by path_reach/transitive_closure)
    t0 = time.time()
    n = eval_path(store, f"<{Q}>?", num_partitions=32).count()
    print(f"path <q>?: {n:,} pairs in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    # --- corpus: zipf-ish docs for the sketch + collocations
    words = [f"w{i:04d}" for i in range(5000)]
    wa = np.array(words)
    zipf_p = 1.0 / np.arange(1, len(words) + 1)
    zipf_p /= zipf_p.sum()

    def gen_docs(b):
        i = int(b["id"][0])
        rng = np.random.default_rng(2000 + i)
        m = n_docs // blocks
        return pd.DataFrame(
            {
                "doc_id": np.arange(i * m, i * m + m),
                "lang": rng.choice(["en", "de", "fr"], m),
                "text": [
                    " ".join(rng.choice(wa, rng.integers(20, 120), p=zipf_p))
                    for _ in range(m)
                ],
            }
        )

    docs = rd.range(blocks).map_batches(
        gen_docs, batch_format="numpy", batch_size=1
    ).materialize()
    print(f"docs: {docs.count():,} rows, driver RSS {rss_gb():.2f} GB")

    from p5_rdf_rdb2rdf_ray.stages.sketches import heavy_hitter_tokens
    from p5_rdf_rdb2rdf_ray.stages.sample import (
        grouped_k_sample,
        uniform_k_sample,
    )
    from p5_rdf_rdb2rdf_ray.stages.vocab import collocations

    t0 = time.time()
    top = heavy_hitter_tokens(docs, k=256, limit=10).take_all()
    print(
        f"heavy_hitter_tokens(k=256): top={top[0]['item']}/{top[0]['cnt']:,} "
        f"err={top[0]['err']:,} in {time.time()-t0:.1f}s, "
        f"RSS {rss_gb():.2f} GB"
    )

    t0 = time.time()
    n = collocations(docs, k=50, min_count=10, num_partitions=32).count()
    print(f"collocations: top-{n} in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    t0 = time.time()
    n = uniform_k_sample(docs, k=1000).count()
    print(f"uniform_k_sample(1000): {n:,} rows in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    t0 = time.time()
    n = grouped_k_sample(docs, k=500, group_col="lang",
                         num_partitions=16).count()
    print(f"grouped_k_sample(500/lang): {n:,} rows in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    ray.shutdown()


if __name__ == "__main__":
    main()
