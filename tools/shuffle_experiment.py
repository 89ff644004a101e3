"""Shuffle-bytes experiment (VERDICT round-1 item #2).

Question: is the 8→32-cpu scaling wall DRAM-bandwidth from shuffling full
IRI strings, and does dictionary-encoding the repetitive term columns
(subj/pred/lang/datatype/graph) before the bucket shuffle move it?

Protocol:
1. measure the bytes ENTERING the bucket shuffle (bucketer-output block
   nbytes summed) for plain vs dict-encoded blocks on the 3.5M-turn
   corpus — the encoded/plain ratio is the traffic cut;
2. run the flagship (transcripts → KG → partitioned store) in FRESH
   processes at 8 and 32 cpus for both variants (bench.py --flagship-json
   with GRAFT_ENCODE_SHUFFLE) and compare the 8→32 efficiency.

Results land in BASELINE.md.

Usage: python tools/shuffle_experiment.py [--bytes-only]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_shuffle_bytes(tx_dir: str) -> dict:
    import ray

    ray.init(
        address="local", num_cpus=16, include_dashboard=False,
        logging_level="ERROR",
    )
    import pyarrow as pa
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.pipelines.flagship import build_kg
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        _dict_encode,
        add_bucket_column,
    )

    out = {}
    for variant in ("plain", "dict"):
        kg = build_kg(
            rd.read_parquet(tx_dir), distinct=False,
            scorer_concurrency=(1, 16), scorer_batch_size=65536,
        )

        def pre_shuffle(t: pa.Table, _v=variant) -> pa.Table:
            t = add_bucket_column(t, 128)
            if _v == "dict":
                t = _dict_encode(t)
            # serialized size proxy: sum of all buffer sizes
            return pa.table({"nbytes": pa.array([t.nbytes], pa.int64()),
                             "rows": pa.array([t.num_rows], pa.int64())})

        sizes = kg.map_batches(pre_shuffle, batch_format="pyarrow").take_all()
        out[variant] = {
            "bytes": int(sum(r["nbytes"] for r in sizes)),
            "rows": int(sum(r["rows"] for r in sizes)),
        }
    ray.shutdown()
    out["ratio"] = round(out["plain"]["bytes"] / out["dict"]["bytes"], 2)
    return out


def run_scaling_pair(tx_dir: str, encode: bool) -> dict:
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env["GRAFT_SCALING_TX"] = tx_dir
        env["GRAFT_ENCODE_SHUFFLE"] = "1" if encode else "0"
        p = subprocess.run(
            [sys.executable, "bench.py", "--flagship-json"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = p.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    eff = (results[8]["sec"] / results[32]["sec"]) / 4.0
    return {
        "t8_sec": round(results[8]["sec"], 1),
        "t32_sec": round(results[32]["sec"], 1),
        "triples_per_s_8": round(results[8]["triples_per_s"]),
        "triples_per_s_32": round(results[32]["triples_per_s"]),
        "eff_8_32": round(eff, 3),
    }


def main() -> None:
    from bench import _scaling_tx_dir

    tx = _scaling_tx_dir()
    report = {"bytes": measure_shuffle_bytes(tx)}
    print(json.dumps({"shuffle_bytes": report["bytes"]}))
    if "--bytes-only" not in sys.argv:
        report["plain"] = run_scaling_pair(tx, encode=False)
        print(json.dumps({"plain": report["plain"]}))
        report["dict"] = run_scaling_pair(tx, encode=True)
        print(json.dumps({"dict": report["dict"]}))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
