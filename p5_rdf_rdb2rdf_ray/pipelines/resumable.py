"""Checkpoint-resumable flagship run (SURVEY §4; north-rule
"resumable from checkpoint with per-partition lineage + metrics").

Two checkpointed stages:

- **Stage A (map-only, per input shard)**: transcripts shard → expanded
  triples (turn/conv/mention/link), written to
  ``work/stageA/shard=NNNNN/part-*.parquet`` + ``_MANIFEST.json`` carrying
  the input file fingerprint. Deterministic per shard (skolem bnodes,
  seeded scorer) ⇒ a finished shard is never recomputed on resume.
- **Stage B (global)**: stage-A output → sort-free hash-bucketed distinct →
  partitioned triple store with per-bucket manifests
  (:mod:`..sinks.triplestore`). Bucket contents are a pure function of the
  full stage-A output, so finished buckets are skipped on resume.

Kill the driver at any point; rerunning ``run_flagship_resumable`` redoes
only the missing shards/buckets.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..sinks.triplestore import (
    ENGINE_VERSION,
    fingerprint_files,
    write_triplestore,
)
from .flagship import build_kg

SHARD_COL = "__shard"


def _shard_fp(path: str) -> str:
    h = hashlib.sha1()
    h.update(os.path.basename(path).encode())
    h.update(str(os.path.getsize(path)).encode())
    return h.hexdigest()


def _stage_a_done(stage_dir: str, shard_id: int, fp: str) -> bool:
    m = os.path.join(stage_dir, f"shard={shard_id:05d}", "_MANIFEST.json")
    if not os.path.exists(m):
        return False
    try:
        d = json.load(open(m))
    except (json.JSONDecodeError, OSError):
        return False
    return d.get("input_fp") == fp and d.get("version") == ENGINE_VERSION


class _ShardWriter:
    """Stage-A writer bound to ONE shard directory: one parquet part per
    block; the driver writes the manifest only after the shard's pipeline
    fully succeeds (manifest-last = atomic completion)."""

    def __init__(self, shard_dir: str):
        self.shard_dir = shard_dir

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        os.makedirs(self.shard_dir, exist_ok=True)
        pq.write_table(
            t, os.path.join(self.shard_dir, f"part-{uuid.uuid4().hex}.parquet")
        )
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})


def run_flagship_resumable(
    tx_dir: str,
    out_dir: str,
    *,
    num_buckets: int = 32,
    **kg_kwargs,
) -> dict:
    """→ metrics dict; idempotent and resumable at shard/bucket level."""
    shards = sorted(glob.glob(os.path.join(tx_dir, "*.parquet")))
    stage_dir = os.path.join(out_dir, "stageA")
    store_dir = os.path.join(out_dir, "store")
    fps = {i: _shard_fp(p) for i, p in enumerate(shards)}

    todo = [
        (i, p) for i, p in enumerate(shards)
        if not _stage_a_done(stage_dir, i, fps[i])
    ]
    # one pipeline per shard, run SEQUENTIALLY: each run gets the whole
    # cluster (no N× actor-pool minimums competing for CPUs), and a crash
    # mid-run leaves every completed shard checkpointed — the resume unit
    # is exactly the unit of work lost
    kg_kwargs.setdefault("scorer_concurrency", (1, 8))
    for i, p in todo:
        d = os.path.join(stage_dir, f"shard={i:05d}")
        # stale partial output from a crashed attempt: overwrite-safe
        # because the manifest is only written below, after success
        if os.path.isdir(d):
            for old in glob.glob(os.path.join(d, "part-*.parquet")):
                os.remove(old)
        kg = build_kg(rd.read_parquet(p), distinct=False, **kg_kwargs)
        results = kg.map_batches(
            _ShardWriter(d), batch_format="pyarrow"
        ).take_all()
        manifest = {
            "shard": i,
            "input_file": os.path.basename(p),
            "input_fp": fps[i],
            "rows": sum(int(r["rows"]) for r in results),
            "version": ENGINE_VERSION,
        }
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "._MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "_MANIFEST.json"))

    # stage B: global distinct + partitioned store, keyed on stage-A output
    a_parts = sorted(glob.glob(os.path.join(stage_dir, "shard=*", "part-*.parquet")))
    input_fp = fingerprint_files(a_parts)
    triples = rd.read_parquet(a_parts)
    metrics = write_triplestore(
        triples,
        store_dir,
        num_buckets=num_buckets,
        input_fp=input_fp,
        resume=True,
        distinct=True,
    )
    metrics["stage_a_shards_run"] = [i for i, _ in todo]
    metrics["stage_a_shards_skipped"] = [
        i for i in fps if i not in {j for j, _ in todo}
    ]
    with open(os.path.join(out_dir, "_METRICS.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics
