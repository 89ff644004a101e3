"""Incremental-ingest scale smoke: base store build vs delta merge.

Builds a store from a base transcript corpus, then merges a ~10% delta
(disjoint conversations) and compares: (a) merge wall vs full-rebuild
wall, (b) result equality with a one-shot build over base ∪ delta.

Usage: python tools/merge_smoke.py [n_base_convs] (default 100_000)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray
    import ray.data as rd

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_delta = max(1, n_base // 10)

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from p5_rdf_rdb2rdf_ray.pipelines.flagship import build_kg
    from p5_rdf_rdb2rdf_ray.pipelines.transcripts import write_transcripts
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        merge_triplestore,
        read_triplestore,
        write_triplestore,
    )

    corpus_dir = "/tmp/merge_smoke_corpus"
    store_inc, store_full = "/tmp/merge_smoke_inc", "/tmp/merge_smoke_full"
    for d in (store_inc, store_full):
        shutil.rmtree(d, ignore_errors=True)
    # ONE corpus split into disjoint base/delta conversation ranges (ids
    # are fixed-width c%06d → lexicographic compare = numeric compare)
    write_transcripts(corpus_dir, n_convs=n_base + n_delta, num_files=16, seed=1)
    cut = f"c{n_base:06d}"

    def _slice(lo: bool):
        import pyarrow.compute as pc

        def f(t):
            cmp = pc.less if lo else pc.greater_equal
            return t.filter(cmp(t.column("conv_id"), cut))

        return rd.read_parquet(corpus_dir).map_batches(f, batch_format="pyarrow")

    nb = max(16, n_base // 2000)
    t0 = time.time()
    m0 = write_triplestore(
        build_kg(_slice(True), distinct=False),
        store_inc, num_buckets=nb, input_fp="base", resume=False,
    )
    t_base = time.time() - t0

    t0 = time.time()
    m1 = merge_triplestore(
        build_kg(_slice(False), distinct=False),
        store_inc, input_fp="delta",
    )
    t_merge = time.time() - t0

    t0 = time.time()
    m2 = write_triplestore(
        build_kg(rd.read_parquet(corpus_dir), distinct=False),
        store_full, num_buckets=nb, input_fp="full", resume=False,
    )
    t_full = time.time() - t0

    n_inc = read_triplestore(store_inc).count()
    n_full = read_triplestore(store_full).count()
    print(
        f"base: {m0['rows_written']} triples in {t_base:.1f}s | "
        f"merge(+{n_delta} convs): +{m1['rows_added']} triples in "
        f"{t_merge:.1f}s | full rebuild: {m2['rows_written']} in "
        f"{t_full:.1f}s | merge/rebuild wall = {t_merge / t_full:.2f}"
    )
    assert n_inc == n_full, (n_inc, n_full)
    print(f"equality: incremental store == one-shot store ({n_inc} rows)")
    ray.shutdown()


if __name__ == "__main__":
    main()
