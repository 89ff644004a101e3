"""run_mapping — compile a MappingSpec into a streaming Ray Data pipeline.

Mirrors the reference's execute loop [R: Simple.pm :: process — per mapping
entry: build SELECT, iterate rows, mint triples] as:

    per triples map:
        read_parquet(table, columns=<referenced only>)     # prune at the read
        [join stage if a RefObjectMap needs parent data]   # fast path: none
        map_batches(CompiledMap, batch_format="pyarrow")   # triple expansion
    union over maps → distinct (set semantics) → caller sinks

The whole thing is lazy; Ray's streaming executor pipelines the stages.
"""

from __future__ import annotations

import logging
import os
from dataclasses import replace

import pyarrow as pa
import ray.data as rd

from ..mapping.spec import (
    BNODE,
    MappingSpec,
    PredObjSpec,
    TermMapSpec,
    TriplesMapSpec,
)
from ..sources.catalog import ROWID_COL, Catalog
from .distinct import distinct_triples
from .executor import CompiledMap
from .joins import PARENT_PREFIX, broadcast_join, hash_join, is_fast_path

logger = logging.getLogger(__name__)

DEFAULT_BROADCAST_LIMIT = 256 << 20  # bytes of parquet on disk


def _resolve_subject(tmap: TriplesMapSpec, catalog: Catalog) -> tuple[TermMapSpec, bool]:
    """Resolve per-row skolem bnodes to concrete key columns.

    Prefers the declared primary key (stable row identity); falls back to a
    deterministic parquet (file, offset) rowid (SURVEY §2 #16).
    Returns (subject, needs_rowid).
    """
    subj = tmap.subject
    if subj.kind == BNODE and subj.skolem_scope is not None and not subj.skolem_cols:
        pk = catalog.layout(tmap.table).pkey
        if pk:
            return replace(subj, skolem_cols=tuple(pk)), False
        return replace(subj, skolem_cols=(ROWID_COL,)), True
    return subj, False


def _parent_size_bytes(catalog: Catalog, table: str) -> int:
    if table in catalog.tables:
        return catalog.tables[table].nbytes
    try:
        return sum(os.path.getsize(f) for f in catalog.files(table))
    except OSError:
        return 1 << 62


def plan_triples_map(
    tmap: TriplesMapSpec,
    spec: MappingSpec,
    catalog: Catalog,
    *,
    broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
    hash_join_partitions: int = 32,
) -> rd.Dataset:
    """One triples map → a Dataset of triple rows (no distinct yet)."""
    subj, needs_rowid = _resolve_subject(tmap, catalog)
    tmap = replace(tmap, subject=subj)

    extra_pos: list[PredObjSpec] = []
    join_needed: list[tuple] = []  # (parent_table, parent_cols, join)

    for ref in tmap.refs:
        parent_map = spec.maps[ref.parent]
        parent_subj, parent_needs_rowid = _resolve_subject(parent_map, catalog)
        psub_cols = parent_subj.referenced_columns()

        if not ref.join:
            # same logical table, no join condition ⇒ parent subject of the
            # SAME row (W3C-R2RML §8) — evaluate parent subject on child batch
            obj = parent_subj
        elif is_fast_path(psub_cols, ref.join) and not parent_needs_rowid:
            # parent IRI derivable from child join columns alone → map-only
            rename = {p: c for c, p in ref.join}
            obj = parent_subj.rename_columns(rename)
        else:
            # general path: join parent projection onto the child stream
            rename = {c: PARENT_PREFIX + c for c in psub_cols}
            obj = parent_subj.rename_columns(rename)
            join_needed.append(
                (parent_map, psub_cols, ref.join, parent_needs_rowid)
            )
        extra_pos.append(
            PredObjSpec(pred=ref.pred, obj=obj, rev=ref.rev, graphs=ref.graphs)
        )

    tmap = replace(tmap, pos=tuple(tmap.pos) + tuple(extra_pos), refs=())

    # column pruning: everything the compiled map reads, minus post-join
    # prefixed parent columns, plus child-side join keys
    cols = [c for c in tmap.referenced_columns() if not c.startswith(PARENT_PREFIX)]
    for _, _, join, _ in join_needed:
        for c, _p in join:
            if c not in cols:
                cols.append(c)
    if needs_rowid and ROWID_COL in cols:
        cols = [c for c in cols if c != ROWID_COL]

    ds = catalog.load(tmap.table, columns=cols or None, sql=tmap.sql, rowid=needs_rowid)

    for parent_map, psub_cols, join, parent_needs_rowid in join_needed:
        child_keys = [c for c, _ in join]
        parent_keys = [p for _, p in join]
        pcols = list(dict.fromkeys(parent_keys + psub_cols))
        if parent_needs_rowid:
            pcols = [c for c in pcols if c != ROWID_COL]
        parent_ds = catalog.load(
            parent_map.table,
            columns=pcols,
            sql=parent_map.sql,
            rowid=parent_needs_rowid,
        )
        # prefix parent subject columns so they can't collide with child's
        prefix_map = {c: PARENT_PREFIX + c for c in psub_cols}

        def _prefix(t: pa.Table, _pm=dict(prefix_map), _keys=list(parent_keys)) -> pa.Table:
            names = [
                _pm.get(c, c) if c not in _keys or c in _pm else c
                for c in t.column_names
            ]
            # a join key that is also a subject column must exist under both
            # names: keep key col AND add prefixed copy
            out = t
            for c, p in _pm.items():
                out = out.append_column(p, t.column(c))
            keep = _keys + list(_pm.values())
            return out.select(list(dict.fromkeys(keep)))

        if _parent_size_bytes(catalog, parent_map.table) <= broadcast_limit:
            parent_tbl = pa.concat_tables(
                [
                    b
                    for b in parent_ds.map_batches(
                        _prefix, batch_format="pyarrow"
                    ).iter_batches(batch_format="pyarrow", batch_size=None)
                ]
            )
            ds = broadcast_join(ds, parent_tbl, child_keys, parent_keys)
        else:
            parent_pref = parent_ds.map_batches(_prefix, batch_format="pyarrow")
            ds = hash_join(
                ds, parent_pref, child_keys, parent_keys,
                num_partitions=hash_join_partitions,
            )

    compiled = CompiledMap(tmap)
    return ds.map_batches(
        compiled, batch_format="pyarrow", zero_copy_batch=True
    )


def run_mapping(
    spec: MappingSpec,
    catalog: Catalog,
    *,
    distinct: bool = True,
    distinct_buckets: int = 64,
    broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
    hash_join_partitions: int = 32,
    only_maps: list[str] | None = None,
) -> rd.Dataset:
    """Execute a full MappingSpec → Dataset of triple rows (TRIPLE_SCHEMA).

    Equivalent of the reference's ``$mapper->process($dbh)`` returning the
    populated model [R: RDB2RDF.pm :: process], as a lazy streaming Dataset.

    ``only_maps`` restricts which triples maps EXECUTE while the full spec
    stays visible for RefObjectMap parent resolution (a map can reference a
    parent whose own triples are not wanted).
    """
    run = (
        list(spec.maps.values())
        if only_maps is None
        else [spec.maps[n] for n in only_maps]
    )
    parts = [
        plan_triples_map(
            tm,
            spec,
            catalog,
            broadcast_limit=broadcast_limit,
            hash_join_partitions=hash_join_partitions,
        )
        for tm in run
    ]
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    if distinct:
        ds = distinct_triples(ds, num_buckets=distinct_buckets)
    return ds
