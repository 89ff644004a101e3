"""Vocabulary-build scale smoke: corpus-wide bigram counts over the
3.5M-turn scaling corpus (same input as `bench.py --scaling`).

Checks the combiner shape holds at scale: shuffle rows ≈ distinct grams
per block (not token occurrences), flat driver memory, wall time
reported as turns/s.

Usage: python tools/vocab_smoke.py [tx_dir]
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

    tx = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_scale_tx_1000000"
    if not os.path.isdir(tx):
        from p5_rdf_rdb2rdf_ray.pipelines.transcripts import write_transcripts

        write_transcripts(tx, n_convs=1_000_000, num_files=64, seed=42)
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from p5_rdf_rdb2rdf_ray.stages.vocab import ngram_counts

    ds = rd.read_parquet(tx, columns=["text"])
    n_turns = ds.count()
    t0 = time.time()
    vocab = ngram_counts(ds, n=2, min_count=2, num_partitions=64)
    n_grams = vocab.count()
    total = vocab.map_batches(
        lambda t: t.select(["count"]), batch_format="pyarrow"
    ).sum("count")
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        f"turns={n_turns} distinct_bigrams(min2)={n_grams} "
        f"occurrences={total} wall={dt:.1f}s "
        f"({n_turns / dt:.0f} turns/s) driver_maxRSS={rss:.2f} GB"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
