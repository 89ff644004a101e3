"""Scale smoke for the round-4 analytics operators: rolling windows,
grouped ranks, funnel conversion, cohort retention, cross-doc shingle
sharing, and the inverted index.

Protocol: synthesize a multi-million-row event stream and a multi-
hundred-thousand-doc corpus IN RAY (deterministic, seeded per block;
nothing materializes on the driver), run each operator, consume with a
streaming count, and report wall time plus driver maxRSS. The pass
criterion is the shape, not the clock: driver RSS must stay a small
constant (no operator collects its input), and the per-op wall should
scale with input, not with group count × Python overhead.

Usage: python tools/analytics_smoke.py [n_events] [n_docs]
       (defaults 3_000_000 events / 200_000 docs)
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

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )

    n_users = max(1, n_events // 100)
    blocks = 64

    def gen_events(b):
        i = b["id"][0]
        rng = np.random.default_rng(1000 + i)
        m = n_events // blocks
        return pd.DataFrame(
            {
                "user_id": rng.integers(0, n_users, m),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 300 * 86400, m), unit="s"),
                "event_type": rng.choice(
                    ["view", "purchase", "click"], m, p=[0.5, 0.05, 0.45]
                ),
                "value": rng.integers(0, 500, m).astype("float64"),
                "event_id": np.arange(i * m, i * m + m),
            }
        ).astype({"ts": "datetime64[us]"})

    ev = rd.range(blocks).map_batches(
        lambda b: gen_events(b), batch_format="numpy", batch_size=1
    ).materialize()
    print(f"events: {ev.count():,} rows, driver RSS {rss_gb():.2f} GB")

    from p5_rdf_rdb2rdf_ray.stages.sessions import (
        cohort_retention,
        funnel_conversion,
    )
    from p5_rdf_rdb2rdf_ray.stages.windows import grouped_rank, rolling_aggregate

    t0 = time.time()
    n = rolling_aggregate(
        ev,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        aggs={"mv_min": ("value", "min", 5), "mv_cnt": ("value", "count", 5)},
        num_partitions=64,
    ).count()
    print(f"rolling_aggregate: {n:,} rows in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    t0 = time.time()
    n = grouped_rank(
        ev,
        keys=["event_type"],
        order_by=["value", "event_id"],
        ranks={"rk": ("rank", None), "prk": ("percent_rank", None)},
        num_partitions=64,
    ).count()
    print(f"grouped_rank: {n:,} rows in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    t0 = time.time()
    out = funnel_conversion(
        ev, "view", "purchase", within_s=3600.0, num_partitions=64
    )
    conv = out.sum("converted")
    print(f"funnel_conversion: {conv:,} converting users of {n_users:,} "
          f"in {time.time()-t0:.1f}s, RSS {rss_gb():.2f} GB")

    t0 = time.time()
    n = cohort_retention(ev, num_partitions=64).count()
    print(f"cohort_retention: {n:,} matrix cells in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    # --- corpus ops ---
    words = [f"w{i:04d}" for i in range(5000)]
    wa = np.array(words)

    def gen_docs(b):
        i = b["id"][0]
        rng = np.random.default_rng(2000 + i)
        m = n_docs // blocks
        return pd.DataFrame(
            {
                "doc_id": np.arange(i * m, i * m + m),
                "text": [
                    " ".join(rng.choice(wa, rng.integers(20, 120)))
                    for _ in range(m)
                ],
            }
        )

    docs = rd.range(blocks).map_batches(
        lambda b: gen_docs(b), batch_format="numpy", batch_size=1
    ).materialize()
    print(f"docs: {docs.count():,} rows, driver RSS {rss_gb():.2f} GB")

    from p5_rdf_rdb2rdf_ray.stages.dedup import shared_shingle_stats
    from p5_rdf_rdb2rdf_ray.stages.vocab import inverted_index, oov_stats

    t0 = time.time()
    n = shared_shingle_stats(docs, n=3, num_partitions=64).count()
    print(f"shared_shingle_stats: {n:,} rows in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    t0 = time.time()
    n = inverted_index(docs, min_df=2, num_partitions=64).count()
    print(f"inverted_index: {n:,} terms in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    t0 = time.time()
    n = oov_stats(docs, vocab_k=1000, num_partitions=64).count()
    print(f"oov_stats: {n:,} rows in {time.time()-t0:.1f}s, "
          f"RSS {rss_gb():.2f} GB")

    ray.shutdown()


if __name__ == "__main__":
    main()
