"""RefObjectMap joins (SURVEY §2 #21) — fast path, broadcast, hash.

The reference pushes RefObjectMap joins into the RDBMS as a joint SQL query
[R: R2RML.pm — child×parent SELECT per W3C-R2RML §8]. Distributed
strategies, chosen per join by :func:`choose_strategy`:

- **fast** (map-only, zero shuffle): when the parent subject template's
  columns are all covered by the join condition, the parent IRI is derivable
  from child columns alone — no parent data needed. This is the dominant
  case at scale (turn→conversation on conv_id; every Direct-Mapping FK→PK
  ref by construction).
- **broadcast**: parent side small (≤ ``broadcast_limit`` bytes estimated
  from parquet metadata) → materialize parent's (join cols + subject cols)
  once into the object store (``ray.put``) and left-join each child batch
  against it with the vectorized ``pyarrow.Table.join`` (Acero) inside
  ``map_batches``. No shuffle; the parent projection ships once per node,
  not once per batch.
- **hash**: big×big → ``Dataset.join`` (hash-partitioned shuffle on the
  join columns; Ray ≥ 2.47).

All joins are left-outer: a child row with no parent match keeps its other
triples and its ref-triple is NULL-suppressed; multiple matches duplicate
child rows, which the RDF set semantics (distinct stage) collapses — the
same observable behavior as the reference's per-POMap joint SQL.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import ray
import ray.data as rd

PARENT_PREFIX = "__p_"


def parent_cols_needed(parent_subject_cols: Sequence[str]) -> list[str]:
    return list(parent_subject_cols)


def is_fast_path(
    parent_subject_cols: Sequence[str],
    join: Sequence[tuple[str, str]],
) -> bool:
    """True if every column the parent subject references is supplied by the
    join condition (parent_col side)."""
    supplied = {p for _, p in join}
    return all(c in supplied for c in parent_subject_cols)


class _BroadcastJoiner:
    """Actor-pool stage: left-join child batches against a broadcast parent
    projection. The parent table is fetched from the object store once per
    actor (zero-copy plasma read), not per batch."""

    def __init__(self, parent_ref, child_keys, parent_keys):
        self.parent: pa.Table = ray.get(parent_ref)
        self.child_keys = list(child_keys)
        self.parent_keys = list(parent_keys)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = list(batch.column_names) + [
                c for c in self.parent.column_names if c not in self.parent_keys
            ]
            return batch  # empty; schema fixed downstream by null masks
        return batch.join(
            self.parent,
            keys=self.child_keys,
            right_keys=self.parent_keys,
            join_type="left outer",
        )


def broadcast_join(
    child: rd.Dataset,
    parent_proj: pa.Table,
    child_keys: Sequence[str],
    parent_keys: Sequence[str],
) -> rd.Dataset:
    """Left-join ``child`` against a small, already-projected parent table.

    ``parent_proj`` columns other than the keys should already carry the
    ``__p_`` prefix so they cannot collide with child columns.
    """
    ref = ray.put(parent_proj)
    return child.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs={
            "parent_ref": ref,
            "child_keys": list(child_keys),
            "parent_keys": list(parent_keys),
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def hash_join(
    child: rd.Dataset,
    parent: rd.Dataset,
    child_keys: Sequence[str],
    parent_keys: Sequence[str],
    num_partitions: int = 32,
    join_type: str = "left outer",
    salt: int | None = None,
) -> rd.Dataset:
    """Big×big equi-join: union-tag single hash shuffle + one
    per-partition Acero join. ``join_type`` ∈ left outer (default) /
    inner / full outer / left semi / left anti — all correct
    per-partition because the co-hash shuffle puts every occurrence of
    a key in ONE partition (unmatched rows of either side are local to
    that key's partition). Semi/anti keep only the child columns.

    ``salt`` (hot-key defense): with ``salt=S`` the shuffle key becomes
    ``(key, salt)`` — each child row gets a deterministic salt in
    ``[0, S)`` (hash of its block-local position, so a hot key's rows
    spread over S partitions instead of melting one aggregator) and
    each parent row is REPLICATED S times (parent is the smaller side
    by contract, same as the broadcast path's assumption; shuffle bytes
    grow by S×parent, not S×child). Results are identical to the
    unsalted join for inner / left outer / left semi / left anti;
    ``full outer`` is rejected (a right-only row would surface once per
    salt bucket).

    Deliberately NOT ``Dataset.join``: Ray 2.49's distributed join
    crashes with ``ArrowInvalid: No match … for key field`` whenever a
    partition on either side is empty (schemaless empty blocks) — which
    happens not just on toy inputs but at scale whenever the join key
    has fewer distinct values than partitions (e.g. converged CC labels).
    Here both sides are tagged into ONE unified schema (explicit types,
    so empty blocks stay typed), co-hash-shuffled once on the join key,
    and each whole partition runs an in-memory ``pa.Table.join`` — same
    shuffle bytes, no schemaless edge case. The per-key merge is the
    FIRST map after the shuffle, so it sees whole partitions (invariant
    pinned in ``engine/distinct.py``).

    Parent payload column names must not collide with child columns
    (the refobject runner prefixes them with ``__p_``).

    Type note: datasets with PANDAS block lineage expose ``object``
    dtypes, which this mapper treats as strings (the only object columns
    the engine produces); bytes/Decimal object columns are unsupported
    here — read such data through Arrow (parquet) blocks instead.
    """
    import pyarrow.compute as pc

    from .distinct import ensure_hash_shuffle

    def _arrow_schema(ds: rd.Dataset) -> pa.Schema:
        s = ds.schema().base_schema
        if isinstance(s, pa.Schema):
            return s
        # PandasBlockSchema (pandas-format lineage): names + numpy dtypes
        return pa.schema(
            [
                pa.field(
                    n,
                    pa.string() if str(t) == "object" else pa.from_numpy_dtype(t),
                )
                for n, t in zip(s.names, s.types)
            ]
        )

    allowed = {"left outer", "inner", "full outer", "left semi", "left anti"}
    if join_type not in allowed:
        raise ValueError(f"join_type {join_type!r} not in {sorted(allowed)}")
    if salt is not None:
        if salt < 2:
            raise ValueError("salt must be >= 2 (or None)")
        if join_type == "full outer":
            raise ValueError(
                "salt is incompatible with full outer (right-only rows "
                "would duplicate per salt bucket)"
            )
    child_keys = list(child_keys)
    parent_keys = list(parent_keys)
    cs, ps = _arrow_schema(child), _arrow_schema(parent)
    c_cols = list(cs.names)
    p_payload = [n for n in ps.names if n not in parent_keys]
    clash = set(p_payload) & set(c_cols)
    if clash:
        raise ValueError(f"parent payload collides with child columns: {clash}")
    key_of_parent = dict(zip(child_keys, parent_keys))
    types = {n: cs.field(n).type for n in c_cols}
    types.update({n: ps.field(n).type for n in p_payload})
    semi = join_type in ("left semi", "left anti")
    cols_u = c_cols + p_payload
    out_cols = c_cols if semi else cols_u
    out_schema = pa.schema([pa.field(n, types[n]) for n in out_cols])

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            arrays = []
            for n in cols_u:
                if side == 0:
                    src = n if n in t.column_names else None
                else:
                    src = key_of_parent.get(n, n if n in p_payload else None)
                if src is not None and src in t.column_names:
                    arrays.append(t.column(src).combine_chunks().cast(types[n]))
                else:
                    arrays.append(pa.nulls(t.num_rows, types[n]))
            arrays.append(pa.repeat(pa.scalar(side, pa.int8()), t.num_rows))
            out = pa.Table.from_arrays(arrays, names=cols_u + ["__side"])
            if salt is None:
                return out
            if side == 0:
                import numpy as np

                s = pa.array(
                    (np.arange(out.num_rows, dtype=np.int64) % salt).astype(
                        np.int32
                    )
                )
                return out.append_column("__salt", s)
            # parent: replicate once per salt bucket
            reps = []
            for k in range(salt):
                reps.append(
                    out.append_column(
                        "__salt", pa.repeat(pa.scalar(k, pa.int32()), out.num_rows)
                    )
                )
            return pa.concat_tables(reps)

        return f

    u = child.map_batches(tag(0), batch_format="pyarrow").union(
        parent.map_batches(tag(1), batch_format="pyarrow")
    )
    ensure_hash_shuffle(u)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.nulls(0, types[n]) for n in out_cols], schema=out_schema
            )
        side = t.column("__side")
        # salted: __salt joins along too (several salt buckets can land
        # in one hash partition; without it a left row would match every
        # replica of its parent row)
        jk = child_keys + (["__salt"] if salt is not None else [])
        lcols = c_cols + (["__salt"] if salt is not None else [])
        left = t.filter(pc.equal(side, 0)).select(lcols)
        right = t.filter(pc.equal(side, 1)).select(jk + p_payload)
        return left.join(
            right, keys=jk, join_type=join_type
        ).select(out_cols)

    part_keys = child_keys + (["__salt"] if salt is not None else [])
    return u.repartition(num_partitions, keys=part_keys).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )
