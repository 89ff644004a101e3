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
    post_batch=None,
    row_filter=None,
) -> rd.Dataset:
    """One triples map → a Dataset of triple rows (no distinct yet).

    ``post_batch`` (pa.Table → pa.Table) fuses a consumer into the SAME
    map UDF as the triple expansion. This is the only way a downstream
    step can rely on row-locality of the expansion: Ray splits map
    OUTPUT blocks at ``target_max_block_size``, and the expansion emits
    pattern-major, so a split can separate one source row's triples
    across blocks — inside the UDF the full expansion of the batch is
    still in hand (the BGP star pivot depends on this)."""
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

    # ``row_filter``: a pruning-only pyarrow expression on CHILD columns
    # (the BGP planner pushes FILTER constraints here; the binding-level
    # filter still runs, so this may only drop rows it would drop too)
    ds = catalog.load(
        tmap.table, columns=cols or None, sql=tmap.sql, rowid=needs_rowid,
        row_filter=row_filter if tmap.sql is None and not needs_rowid else None,
    )

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
    if post_batch is None:
        return ds.map_batches(
            compiled, batch_format="pyarrow", zero_copy_batch=True
        )

    def fused(t: pa.Table, _c=compiled, _p=post_batch) -> pa.Table:
        return _p(_c(t))

    return ds.map_batches(fused, batch_format="pyarrow", zero_copy_batch=True)


_IRI_SAFE_ALPHABET = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~%"
)


def _injective_subject(tm: TriplesMapSpec, catalog: Catalog) -> bool:
    """True iff distinct logical rows provably mint distinct subjects."""
    from ..functions.scalars import Template

    sub = tm.subject
    if sub.udf is not None:
        return False
    if sub.kind == BNODE:
        # fresh-per-row skolem bnode (label embeds row identity); a
        # VALUE-based bnode (template/column label) is not row-unique,
        # and neither are explicit skolem_cols (caller-chosen columns
        # with no uniqueness guarantee — e.g. the flagship's mention
        # bnodes): only the pk/rowid-resolved scope-only form qualifies
        return (
            sub.skolem_scope is not None
            and not sub.skolem_cols
            and sub.template is None
            and sub.column is None
            and sub.constant is None
        )
    if sub.kind != "iri":
        return False
    if tm.sql is not None:
        return False  # view rows carry no key guarantee
    try:
        layout = catalog.layout(tm.table)
    except Exception:
        return False
    pk = set(layout.pkey or ())
    if not pk:
        return False
    if sub.column is not None:
        return set(layout.pkey) == {sub.column}
    if sub.template is None:
        return False
    segs = Template(sub.template).segments
    cols = {c for k, c in segs if k == "col"}
    if not pk <= cols:
        return False
    # adjacent placeholders must be separated by literal text containing
    # an ASCII character OUTSIDE the IRI-safe output alphabet
    # (unreserved + %), so the filled string decomposes unambiguously →
    # value equality. ASCII-only test: iri_safe_encode leaves RFC 3987
    # ucschar (non-ASCII) verbatim in VALUES, so a non-ASCII separator
    # can also appear inside a value and does not delimit.
    def _hard_sep(text: str) -> bool:
        return any(
            ord(ch) < 128 and ch not in _IRI_SAFE_ALPHABET for ch in text
        )

    for i, (k, _) in enumerate(segs):
        if k != "col" or i + 1 >= len(segs):
            continue
        nk, ntext = segs[i + 1]
        if nk == "col":
            return False
        if i + 2 < len(segs) and segs[i + 2][0] == "col":
            if not _hard_sep(ntext):
                return False
    return True


def _subject_signature(tm: TriplesMapSpec) -> tuple[str, str]:
    """(kind, constant-prefix) used for the cross-map disjointness test."""
    from ..functions.scalars import Template

    sub = tm.subject
    if sub.kind == BNODE:
        return ("bnode", sub.skolem_scope or "")
    if sub.template is not None:
        segs = Template(sub.template).segments
        prefix = segs[0][1] if segs and segs[0][0] == "lit" else ""
        return ("iri", prefix)
    return ("iri", "")


def _map_preds(tm: TriplesMapSpec) -> list[str] | None:
    """All predicate constants a map emits; None if any is non-constant."""
    from ..terms import RDF_TYPE

    preds: list[str] = []
    for p in tm.pos:
        if p.pred.constant is None:
            return None
        preds.append(p.pred.constant)
    for r in tm.refs:
        if r.pred.constant is None:
            return None
        preds.append(r.pred.constant)
    if tm.classes:
        preds.append(RDF_TYPE)
    return preds


def is_duplicate_free(
    spec: MappingSpec, catalog: Catalog, only_maps: list[str] | None = None
) -> bool:
    """Compile-time proof that a mapping run cannot emit the same
    triple twice, so ``distinct="auto"`` may skip the set-semantics
    shuffle entirely (the Trine model's dedup would be a no-op).

    Conservative sufficient conditions (any doubt → False):

    - per map: subject injective over logical rows (PK-covering
      IRI-safe template with unambiguous separators, PK column, or a
      fresh-per-row skolem bnode); every predicate a distinct constant
      (rdf:type counted once via ``classes``); distinct class IRIs; no
      ``rev``, no UDF object terms, no graph maps (W3C §11.1 union
      duplicates are exactly what the distinct exists for);
    - per RefObjectMap: the parent map's subject is itself injective
      (two matching parent rows then mint two DIFFERENT objects —
      distinct triples, never duplicates);
    - across maps: a pair may share predicates only if their subject
      spaces are provably disjoint (different term kinds, different
      skolem scopes, or IRI template prefixes where neither is a
      prefix of the other).

    The Direct Mapping compiler's output satisfies all of these for
    PK/no-PK tables, which is why the DM paths skip the shuffle.
    """
    names = list(spec.maps) if only_maps is None else list(only_maps)
    maps = [spec.maps[n] for n in names]
    sigs: list[tuple[str, str]] = []
    pred_sets: list[set[str]] = []
    for tm in maps:
        if tm.graphs or any(p.graphs for p in tm.pos) or any(
            r.graphs for r in tm.refs
        ):
            return False
        if any(p.rev for p in tm.pos) or any(r.rev for r in tm.refs):
            return False
        if any(p.obj.udf is not None for p in tm.pos):
            return False
        if not _injective_subject(tm, catalog):
            return False
        preds = _map_preds(tm)
        if preds is None or len(set(preds)) != len(preds):
            return False
        if len(set(tm.classes)) != len(tm.classes):
            return False
        for r in tm.refs:
            parent = spec.maps.get(r.parent)
            if parent is None or not _injective_subject(parent, catalog):
                return False
        sigs.append(_subject_signature(tm))
        pred_sets.append(set(preds))
    for i in range(len(maps)):
        for j in range(i + 1, len(maps)):
            if not (pred_sets[i] & pred_sets[j]):
                continue  # no shared predicate → no shared triple
            (k1, p1), (k2, p2) = sigs[i], sigs[j]
            if k1 != k2:
                continue  # bnode vs IRI subjects never collide
            if k1 == "bnode":
                if p1 != p2:
                    continue  # skolem scope is embedded in the label
                return False
            if p1.startswith(p2) or p2.startswith(p1):
                return False  # overlapping IRI spaces, shared preds
    return True


def run_mapping(
    spec: MappingSpec,
    catalog: Catalog,
    *,
    distinct: bool | str = True,
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

    ``distinct="auto"`` runs :func:`is_duplicate_free` at compile time
    and skips the set-semantics shuffle when the spec provably cannot
    emit a duplicate triple — the biggest single shuffle of a mapping
    run, elided for free on the common PK-subject mapping shape.
    """
    if distinct == "auto":
        distinct = not is_duplicate_free(spec, catalog, only_maps)
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
