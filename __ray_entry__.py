"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (SURVEY §3.4): synthetic transcripts (the driver's
    input_hint shape, generated deterministically — no transcript table
    ships in /root/testdata) → KG triples Dataset."""
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.pipelines.flagship import build_kg
    from p5_rdf_rdb2rdf_ray.pipelines.transcripts import write_transcripts

    tx_dir = "/tmp/graft_entry_transcripts"
    marker = os.path.join(tx_dir, "transcripts-00007.parquet")
    if not os.path.exists(marker):
        write_transcripts(tx_dir, n_convs=200, num_files=8, seed=42)
    ds = rd.read_parquet(tx_dir)
    return build_kg(ds, distinct_buckets=8)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY §2 (+ the
    training-data graft extensions). See
    ``p5_rdf_rdb2rdf_ray/pipelines/queries.py`` for the builders."""
    from p5_rdf_rdb2rdf_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents (same column names). Keys absent here
    (langid_docs, simhash_pairs_docs) are non-SQL-expressible → the driver
    records the weaker rows-only check."""
    from p5_rdf_rdb2rdf_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
