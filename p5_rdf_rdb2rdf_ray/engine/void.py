"""VoID-style dataset statistics [graft extension — the reference
ecosystem (RDF::Trine-era toolchains) publishes VoID descriptions of
RDF datasets; the reference itself exposes no statistics API]: per
predicate, the triple count and the distinct subject / distinct object
counts — the numbers a VoID ``void:propertyPartition`` carries.

Scale shape: one pass tags (pred, subj) and (pred, obj⊕kind) rows; the
two distinct counts run through the engine's ``distinct_rows`` hash
shuffle keyed on (pred, term) — never a driver set — and the per-pred
counts are combiner-first ``grouped_aggregate``s. The three per-pred
tables are PREDICATE-sized (vocabulary-small by nature: a schema has
tens of predicates, not millions), so the final alignment is one tiny
single-partition merge.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def void_statistics(source, num_partitions: int = 16) -> rd.Dataset:
    """→ Dataset(pred, n_triples:int64, n_subjects:int64,
    n_objects:int64), per predicate of the graph ``source`` (a
    materialized-store directory or the ``(catalog, base)`` DM virtual
    graph — same dispatch as the path evaluator). Distinct objects
    count TERMS: the object's kind is folded into the distinct key so a
    literal spelling an IRI stays a separate object."""
    from ..stages.groupagg import grouped_aggregate
    from ..stages.paths import _source_statements
    from .distinct import distinct_rows

    trips = _source_statements(source)

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pred": t.column("pred"),
                "subj": t.column("subj"),
                "obj": t.column("obj"),
                "obj_kind": t.column("obj_kind"),
            }
        )

    slim = trips.map_batches(proj, batch_format="pyarrow")
    n_triples = grouped_aggregate(
        slim,
        keys=["pred"],
        aggs={"n_triples": ("subj", "count")},
        num_partitions=num_partitions,
    )
    n_subj = grouped_aggregate(
        distinct_rows(slim, ["pred", "subj"], num_buckets=num_partitions),
        keys=["pred"],
        aggs={"n_subjects": ("subj", "count")},
        num_partitions=num_partitions,
    )
    n_obj = grouped_aggregate(
        distinct_rows(
            slim, ["pred", "obj", "obj_kind"], num_buckets=num_partitions
        ),
        keys=["pred"],
        aggs={"n_objects": ("obj", "count")},
        num_partitions=num_partitions,
    )

    def pad(name: str):
        def f(t: pa.Table) -> pa.Table:
            cols = {"pred": t.column("pred")}
            for c in ("n_triples", "n_subjects", "n_objects"):
                cols[c] = (
                    t.column(name)
                    if c == name
                    else pa.nulls(t.num_rows, pa.int64())
                )
            return pa.table(cols)

        return f

    unioned = (
        n_triples.map_batches(pad("n_triples"), batch_format="pyarrow")
        .union(n_subj.map_batches(pad("n_subjects"), batch_format="pyarrow"))
        .union(n_obj.map_batches(pad("n_objects"), batch_format="pyarrow"))
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("pred", sort=False, dropna=False)
            .max(numeric_only=False)
            .reset_index()
        )
        for c in ("n_triples", "n_subjects", "n_objects"):
            out[c] = out[c].astype("int64")
        return out

    return unioned.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )
