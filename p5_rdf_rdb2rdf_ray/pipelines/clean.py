"""End-to-end corpus cleaning: quality → language → exact dedup → near
dedup, one verdict row per input document.

The composition a training-data pipeline actually runs over the
``documents`` table, built from the already-tested stages [brief
extension; not in the reference — RDF::RDB2RDF has no corpus ops]:

1. **Flags** (map-only actor pool, ONE pass over the text): token/punct
   quality gates + the n-gram language-ID actor (`stages.textstats
   .LanguageID`) fused into a single batch function so the text is
   scanned once. → ``status ∈ {quality, language, NULL}``.
2. **Exact dedup** (ids-only shuffle): fingerprint hash + doc id are the
   ONLY columns shuffled (16 B/row; the text never moves), per-partition
   min-id representative — the ``exact_dedup`` pattern, widened to emit a
   verdict for EVERY survivor, not just winners.
3. **Near dedup on unique texts** (``stages.dedup.near_dedup_docs``):
   exact winners' text is recovered with the union-tag semi join (one
   text shuffle) and fed to MinHash-LSH → pair verify → connected
   components → min-id representative. Running near-dup AFTER exact
   dedup keeps identical docs from inflating LSH buckets quadratically.

Scale note (multi-consumer re-read): the flags stage feeds three
consumers (dropped verdicts, the fingerprint shuffle, the semi-join
text side). Ray re-executes a lazy Dataset per consumer, so by default
the map-only flags pass runs three times — the streaming-friendly trade
for small/medium corpora. For the 100-TB shape pass ``scratch_dir``: the
flagged survivors are written ONCE as partitioned parquet and the three
consumers re-read from disk (column-pruned — two of the three never read
the text column), exactly like the resumable store sink's spill model.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..engine.distinct import ensure_hash_shuffle, to_clean_arrow
from ..stages.dedup import _FP2_KEY, _hash_series, _semi_join, near_dedup_docs
from ..stages.textstats import TOKEN_RX, LanguageID


class CleanFlags:
    """Fused quality + language verdict, one text scan per batch.
    Thresholds and language profiles are actor state (built once in
    ``__init__``), scoring is polars/numpy — no per-row Python."""

    def __init__(
        self,
        text_col: str,
        id_col: str,
        min_words: int,
        max_punct_ratio: float,
        langs: tuple[str, ...] | None,
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.min_words = min_words
        self.max_punct_ratio = max_punct_ratio
        self.langs = tuple(langs) if langs else None
        self.lid = LanguageID(text_col, id_col) if langs else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl

        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    self.id_col: batch.column(self.id_col),
                    self.text_col: batch.column(self.text_col),
                    "status": pa.array([], pa.string()),
                }
            )
        s = pl.Series("t", batch.column(self.text_col)).fill_null("")
        n_words = s.str.count_matches(TOKEN_RX).to_numpy()
        n_chars = np.maximum(s.str.len_chars().to_numpy(), 1)
        n_punct = s.str.count_matches(r"[^\w\s]").to_numpy()
        bad_q = (n_words < self.min_words) | (
            n_punct / n_chars > self.max_punct_ratio
        )
        status = np.where(bad_q, "quality", None)
        if self.lid is not None:
            preds = self.lid(batch).column("pred_lang").to_numpy(
                zero_copy_only=False
            )
            bad_l = ~bad_q & ~np.isin(preds, self.langs)
            status = np.where(bad_l, "language", status)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                self.text_col: batch.column(self.text_col),
                "status": pa.array(status.tolist(), pa.string()),
            }
        )


def _exact_verdicts(
    surv: rd.Dataset, text_col: str, id_col: str, num_partitions: int
) -> rd.Dataset:
    """(id_col, rep_id) for EVERY survivor — min doc id per identical
    text. Only the 128-bit fingerprint (fp_h, fp_h2) + id cross the
    shuffle; partitioning on fp_h alone still co-locates every group
    (fp_h2 only refines WITHIN a partition), so the per-block min is
    global. Two independent siphashes because 64-bit birthday collisions
    are no longer negligible at the 10^9-doc design point."""

    def fp(df: pd.DataFrame) -> pa.Table:
        t = df[text_col].fillna("")
        return to_clean_arrow(
            pd.DataFrame(
                {
                    "fp_h": _hash_series(t),
                    "fp_h2": _hash_series(t, _FP2_KEY),
                    id_col: df[id_col],
                }
            )
        )

    def rep(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return to_clean_arrow(
                pd.DataFrame({id_col: df.get(id_col, []), "rep_id": []})
            )
        out = pd.DataFrame(
            {
                id_col: df[id_col],
                "rep_id": df.groupby(["fp_h", "fp_h2"])[id_col].transform(
                    "min"
                ),
            }
        )
        return to_clean_arrow(out)

    shuffled = surv.map_batches(fp, batch_format="pandas")
    ensure_hash_shuffle(shuffled)
    return shuffled.repartition(num_partitions, keys=["fp_h"]).map_batches(
        rep, batch_format="pandas", batch_size=None
    )


def clean_corpus(
    docs: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_punct_ratio: float = 0.5,
    langs: tuple[str, ...] | None = None,
    neardup_tau: float = 0.6,
    neardup_method: str = "minhash",
    num_partitions: int = 16,
    concurrency=(1, 8),
    batch_size: int = 4096,
    scratch_dir: str | None = None,
    materialize_flags: bool = False,
) -> rd.Dataset:
    """→ one row per input doc: ``(id_col, status, rep_id)`` with
    ``status ∈ {kept, quality, language, exact_dup, near_dup}``;
    ``rep_id`` = own id for kept docs, NULL for quality/language drops,
    the stage-local representative otherwise. Chain note: an
    ``exact_dup`` row's rep_id names its exact-dedup winner, which may
    itself have been eliminated as ``near_dup`` downstream — chains have
    depth ≤ 2 by construction; :func:`resolve_rep_chain` collapses them
    to the final surviving doc when a consumer needs that (attribution,
    semi-joining dup docs to the kept corpus). The kept corpus is
    ``clean.filter(status == 'kept')`` semi-joined back to the source.
    """
    if langs is None:
        # no language profiles to hold → stateless: plain task pool, no
        # actor ramp (the lazy DAG below re-executes this stage once per
        # consumer, so actor spin-up would be paid three times)
        flags_fn = CleanFlags(text_col, id_col, min_words, max_punct_ratio, None)
        flagged = docs.map_batches(
            flags_fn, batch_format="pyarrow", batch_size=batch_size
        )
    else:
        flagged = docs.map_batches(
            CleanFlags,
            fn_constructor_kwargs={
                "text_col": text_col,
                "id_col": id_col,
                "min_words": min_words,
                "max_punct_ratio": max_punct_ratio,
                "langs": langs,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    if scratch_dir is not None:
        # one flags pass; the three consumers below re-read from disk
        # (column-pruned: only the semi-join side reads the text back)
        flagged.write_parquet(scratch_dir)
        flagged = rd.read_parquet(scratch_dir)
    elif materialize_flags:
        # one flags pass into the OBJECT STORE (spill-capable): the three
        # consumers read plasma blocks instead of re-executing the scan +
        # flags. The Ray-native middle ground between full lazy re-exec
        # (default) and the parquet scratch spill above.
        flagged = flagged.materialize()

    def dropped_verdicts(t: pa.Table) -> pa.Table:
        m = t.column("status").is_valid()
        sel = t.filter(m)
        return pa.table(
            {
                id_col: sel.column(id_col),
                "status": sel.column("status"),
                "rep_id": pa.nulls(sel.num_rows, pa.int64()),
            }
        )

    dropped = flagged.map_batches(dropped_verdicts, batch_format="pyarrow")

    def survivors(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.is_null(t.column("status")))

    surv = flagged.map_batches(survivors, batch_format="pyarrow")
    exact = _exact_verdicts(surv, text_col, id_col, num_partitions)

    def exact_losers(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = t.filter(pc.invert(pc.equal(t.column(id_col), t.column("rep_id"))))
        return pa.table(
            {
                id_col: sel.column(id_col),
                "status": pa.array(["exact_dup"] * sel.num_rows, pa.string()),
                "rep_id": sel.column("rep_id"),
            }
        )

    losers = exact.map_batches(exact_losers, batch_format="pyarrow")

    def winner_ids(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = t.filter(pc.equal(t.column(id_col), t.column("rep_id")))
        return sel.select([id_col])

    winners = exact.map_batches(winner_ids, batch_format="pyarrow")
    winner_docs = _semi_join(
        surv.map_batches(
            lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
        ),
        winners,
        keys=[id_col],
        payload={text_col: pa.string()},
        num_partitions=num_partitions,
    )

    near = near_dedup_docs(
        winner_docs,
        tau=neardup_tau,
        method=neardup_method,
        text_col=text_col,
        id_col=id_col,
        num_partitions=num_partitions,
    )

    def near_verdicts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = t.column("is_kept")
        return pa.table(
            {
                id_col: t.column(id_col),
                "status": pc.if_else(kept, "kept", "near_dup"),
                "rep_id": t.column("rep_id"),
            }
        )

    return dropped.union(
        losers, near.map_batches(near_verdicts, batch_format="pyarrow")
    )


def resolve_rep_chain(
    verdicts: rd.Dataset,
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Collapse the depth-≤2 representative chain in a
    :func:`clean_corpus` verdict set: an ``exact_dup`` whose winner was
    itself dropped as ``near_dup`` gets that winner's final rep instead.
    One union-tag shuffle: verdict rows co-partition with the rep-map
    rows they point at (key = rep_id vs doc_id), then a per-block
    dictionary hop. Output schema unchanged; ``rep_id`` now always names
    a doc with ``status == 'kept'`` (or NULL for quality/language
    drops)."""
    import numpy as np

    def to_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        key = pc.coalesce(t.column("rep_id"), t.column(id_col))
        return pa.table(
            {
                "key": key,  # partition key: who this row points at / is
                id_col: t.column(id_col),
                "status": t.column("status"),
                "rep_id": t.column("rep_id"),
                "kind": pa.array(np.zeros(n, np.int8)),  # 0 = verdict row
            }
        ).append_column(
            "map_rep", pa.nulls(n, pa.int64())
        )

    def to_map(t: pa.Table) -> pa.Table:
        # one map row per doc: doc_id -> its own final rep
        n = t.num_rows
        return pa.table(
            {
                "key": t.column(id_col).cast(pa.int64()),
                id_col: t.column(id_col),
                "status": t.column("status"),
                "rep_id": t.column("rep_id"),
                "kind": pa.array(np.ones(n, np.int8)),
                "map_rep": t.column("rep_id"),
            }
        )

    ensure_hash_shuffle(verdicts)
    tagged = verdicts.map_batches(to_edges, batch_format="pyarrow").union(
        verdicts.map_batches(to_map, batch_format="pyarrow")
    )

    def hop(df: pd.DataFrame) -> pa.Table:
        cols = [id_col, "status", "rep_id"]
        if not len(df):
            if all(c in df.columns for c in cols):
                return to_clean_arrow(df[cols])
            return to_clean_arrow(
                pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "status": pd.Series([], dtype="object"),
                        "rep_id": pd.Series([], dtype="float64"),
                    }
                )
            )
        rep_of = (
            df[df["kind"] == 1].set_index("key")["map_rep"].to_dict()
        )
        out = df[df["kind"] == 0][cols].copy()
        has = out["rep_id"].notna()
        out.loc[has, "rep_id"] = out.loc[has, "rep_id"].map(
            lambda r: rep_of.get(r, r)
        )
        return to_clean_arrow(out)

    return tagged.repartition(num_partitions, keys=["key"]).map_batches(
        hop, batch_format="pandas", batch_size=None
    )
