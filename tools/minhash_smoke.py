"""10⁶-doc MinHash scale smoke (BASELINE.md evidence, reproducible).

Synthesizes N docs (100 random vocab words each) with P planted
near-dup pairs (partner = same doc with one word swapped → shingle
Jaccard ≈ 0.94), runs ``minhash_pairs`` and checks every planted pair
(and nothing else) is found, reporting wall time, docs/s and driver
maxRSS. ``--distributed`` uses the semi-join verify
(``broadcast_verify=False``); default is the broadcast verify.

Usage: python tools/minhash_smoke.py [--docs 1000000] [--pairs 20000]
       [--cpus 32] [--distributed]
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gen_corpus(out_dir: str, n_docs: int, n_pairs: int, shards: int = 16) -> None:
    """Deterministic corpus: docs 0..n_base-1 random; docs n_base+2i and
    n_base+2i+1 are a planted near-dup pair. Vectorized via numpy word
    indices + polars string concat (no per-doc Python)."""
    import polars as pl

    marker = os.path.join(out_dir, f"docs-{shards - 1:05d}.parquet")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    n_base = n_docs - 2 * n_pairs
    words_per_doc = 100
    vocab = 50_000
    doc_id = 0
    per_shard = -(-n_docs // shards)
    for s in range(shards):
        take = min(per_shard, n_docs - s * per_shard)
        base_take = max(0, min(take, n_base - s * per_shard))
        ids, texts_idx = [], []
        # base docs in this shard
        if base_take > 0:
            w = rng.integers(0, vocab, size=(base_take, words_per_doc))
            for row in range(base_take):
                ids.append(doc_id)
                doc_id += 1
            texts_idx.append(w)
        # pair docs fill the remainder of this shard
        rest = take - base_take
        if rest > 0:
            n_p = rest // 2
            w = rng.integers(0, vocab, size=(n_p, words_per_doc))
            w2 = w.copy()
            w2[:, 50] = (w2[:, 50] + 1) % vocab  # one word differs
            inter = np.empty((2 * n_p, words_per_doc), dtype=w.dtype)
            inter[0::2], inter[1::2] = w, w2
            for _ in range(2 * n_p):
                ids.append(doc_id)
                doc_id += 1
            texts_idx.append(inter)
        allw = np.vstack(texts_idx)
        # vectorized "w<idx>" join per row in polars
        df = pl.DataFrame({f"c{j}": ("w" + pl.Series(allw[:, j]).cast(pl.Utf8)) for j in range(words_per_doc)})
        text = df.select(pl.concat_str(pl.all(), separator=" ").alias("text"))["text"]
        pl.DataFrame(
            {"doc_id": pl.Series(ids, dtype=pl.Int64), "text": text}
        ).write_parquet(os.path.join(out_dir, f"docs-{s:05d}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--pairs", type=int, default=20_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--distributed", action="store_true")
    args = ap.parse_args()

    d = f"/tmp/minhash_smoke_{args.docs}_{args.pairs}"
    gen_corpus(d, args.docs, args.pairs)
    n_base = args.docs - 2 * args.pairs
    expected = {(n_base + 2 * i, n_base + 2 * i + 1) for i in range(args.pairs)}

    import ray
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.stages.dedup import minhash_pairs

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus, include_dashboard=False,
            logging_level="ERROR",
        )
    ds = rd.read_parquet(d)
    t0 = time.time()
    got = set()
    pairs = minhash_pairs(
        ds, tau=0.6, num_partitions=max(16, args.cpus),
        broadcast_verify=not args.distributed,
    )
    for b in pairs.iter_batches(batch_format="pyarrow"):
        got.update(zip(b.column("doc_a").to_pylist(), b.column("doc_b").to_pylist()))
    dt = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    missing = len(expected - got)
    extra = len(got - expected)
    print(
        f"mode={'distributed' if args.distributed else 'broadcast'} "
        f"docs={args.docs} wall={dt:.1f}s docs/s={args.docs / dt:,.0f} "
        f"pairs={len(got)}/{len(expected)} missing={missing} extra={extra} "
        f"driver_maxrss={rss_gb:.2f}GB"
    )
    ray.shutdown()
    assert missing == 0, f"{missing} planted pairs missed"


if __name__ == "__main__":
    main()
