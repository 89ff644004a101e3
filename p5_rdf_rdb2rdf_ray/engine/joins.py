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
) -> rd.Dataset:
    """Big×big path: Ray Data's hash-partitioned join."""
    return child.join(
        parent,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=tuple(child_keys),
        right_on=tuple(parent_keys),
    )
