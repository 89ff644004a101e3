"""Corpus vocabulary statistics and document chunking for training-data
pipelines [brief extensions; the reference (RDF::RDB2RDF) has no corpus
operators].

- :func:`ngram_counts` — corpus-wide n-gram frequency table. The shape of
  any vocabulary / term-frequency build at 100 TB: a per-batch combiner
  (polars tokenize + explode + group count, no per-row Python) so a term
  appearing T times in a block ships as ONE partial row, then a single
  hash shuffle on the n-gram and an exact per-block merge.
- :func:`tfidf_top_terms` — per-document top-k terms by tf-idf. tf is
  row-local (one doc = one row); df reuses the ``ngram_counts`` shape;
  tf⨝df is a union-tag merge on the term key (one shuffle, a term never
  spans blocks post-shuffle); top-k rides :func:`..stages.groupagg
  .grouped_top_k`. Scores are ``tf * (N / df)`` with exactly this
  operation order — two IEEE-exact ops, bit-identical in numpy and the
  DuckDB oracle (no transcendental log in the gated score).
- :func:`chunk_docs` — split each document into fixed-size token chunks
  (sequence packing's first half): vectorized explode → ``pos // size``
  → per-(doc, chunk) string join; flat-map done batch-wise, never per
  row.

Tokenization everywhere: lowercased ``\\S+`` runs, matching the DuckDB
oracle's ``regexp_extract_all(lower(text), '\\S+')``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..engine.distinct import ensure_hash_shuffle, to_clean_arrow


def _token_frame(df: pd.DataFrame, text_col: str, lowercase: bool = True):
    """polars (r, t) exploded token frame for a pandas batch — the shared
    tokenizer kernel (Rust regex, no per-row Python)."""
    import polars as pl

    s = pl.Series("t", df[text_col].fillna("").astype(str))
    if lowercase:
        s = s.str.to_lowercase()
    return (
        pl.DataFrame({"r": pl.int_range(0, len(s), eager=True), "t": s})
        .with_columns(pl.col("t").str.extract_all(r"\S+"))
        .explode("t", empty_as_null=True)
        .drop_nulls()
    )


def _ngram_partial(
    df: pd.DataFrame, n: int, text_col: str, lowercase: bool
) -> pa.Table:
    """Per-batch n-gram count partial (the ngram_counts combiner) —
    module-level so the kernel is directly property-testable."""
    import polars as pl

    e = _token_frame(df, text_col, lowercase)
    if n > 1:
        exprs = [
            pl.col("t").shift(-i).over("r").alias(f"_s{i}") for i in range(1, n)
        ]
        e = (
            e.with_columns(exprs)
            .drop_nulls()
            .select(
                "r",
                t=pl.concat_str(
                    [pl.col("t")] + [pl.col(f"_s{i}") for i in range(1, n)],
                    separator=" ",
                ),
            )
        )
    g = e.group_by("t").len()
    if not len(g):
        return pa.table(
            {"ngram": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "ngram": g["t"].to_arrow(),
            "count": g["len"].cast(pl.Int64).to_arrow(),
        }
    )


def ngram_counts(
    ds: rd.Dataset,
    n: int = 1,
    text_col: str = "text",
    min_count: int = 1,
    num_partitions: int = 32,
    lowercase: bool = True,
) -> rd.Dataset:
    """→ ``(ngram:string, count:int64)``, global frequencies of word
    ``n``-grams (tokens joined by one space). n-grams never cross
    document boundaries."""
    if n < 1:
        raise ValueError("n must be >= 1")

    def partial(df: pd.DataFrame) -> pa.Table:
        return _ngram_partial(df, n, text_col, lowercase)

    def final(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {"ngram": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
            )
        out = df.groupby("ngram", sort=False, dropna=False)["count"].sum().reset_index()
        if min_count > 1:
            out = out[out["count"] >= min_count]
        return to_clean_arrow(out)

    ensure_hash_shuffle(ds)
    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(num_partitions, keys=["ngram"])
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def tfidf_top_terms(
    ds: rd.Dataset,
    n_docs: int,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> rd.Dataset:
    """→ ``(id_col, term, tf:int64, df:int64, tfidf:float64)`` — the top-k
    terms per document by ``tf * (n_docs / df)``, ties broken by term
    (ascending). ``n_docs`` is passed in (callers already know it or get
    it from ``ds.count()`` — a parquet metadata read, not a scan)."""

    TERM_SHUFFLE = max(num_partitions, 32)

    def tf_partial(df: pd.DataFrame) -> pa.Table:
        """ONE tokenize pass emits BOTH row kinds: per-(doc, term) tf rows
        (kind=1) and per-term df partials (kind=0; (doc, term) is unique
        within the group result, so the per-term row count is a valid
        document-frequency partial). Avoids a second pass over the text —
        at 100 TB a union of two consumers of the same map re-executes
        it."""
        import polars as pl

        def arr(s, typ):
            a = s.to_arrow()
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            return a.cast(typ)

        e = _token_frame(df, text_col)
        ids = pl.Series(
            "id", df[id_col].to_numpy()
        )  # row index -> doc id (one doc per row; a doc never spans batches)
        g = e.group_by(["r", "t"]).len()
        d = g.group_by("t").len()
        m = len(d)
        return pa.table(
            {
                id_col: pa.concat_arrays(
                    [arr(ids.gather(g["r"]), pa.int64()), pa.nulls(m, pa.int64())]
                ),
                "term": pa.concat_arrays(
                    [arr(g["t"], pa.string()), arr(d["t"], pa.string())]
                ),
                "tf": pa.concat_arrays(
                    [arr(g["len"], pa.int64()), arr(d["len"], pa.int64())]
                ),
                "kind": pa.array(
                    np.r_[np.ones(len(g), np.int8), np.zeros(m, np.int8)]
                ),
            }
        )

    tf = ds.map_batches(tf_partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pa.Table:
        cols = {
            id_col: pd.Series([], dtype="int64"),
            "term": pd.Series([], dtype="object"),
            "tf": pd.Series([], dtype="int64"),
            "df": pd.Series([], dtype="int64"),
            "tfidf": pd.Series([], dtype="float64"),
        }
        if not len(df):
            return to_clean_arrow(pd.DataFrame(cols))
        dfc = (
            df[df["kind"] == 0].groupby("term", sort=False)["tf"].sum()
        )  # term -> df
        tfr = df[df["kind"] == 1]
        if not len(tfr):
            return to_clean_arrow(pd.DataFrame(cols))
        d = tfr["term"].map(dfc).astype("int64")
        out = pd.DataFrame(
            {
                id_col: tfr[id_col].astype("int64"),
                "term": tfr["term"],
                "tf": tfr["tf"],
                "df": d,
                # EXACT op order for the oracle: tf * (N / df)
                "tfidf": tfr["tf"].to_numpy()
                * (float(n_docs) / d.to_numpy()),
            }
        )
        return to_clean_arrow(out)

    ensure_hash_shuffle(ds)
    scored = (
        tf.repartition(TERM_SHUFFLE, keys=["term"])
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )
    from .groupagg import grouped_top_k

    return grouped_top_k(
        scored,
        keys=[id_col],
        sort_cols=["tfidf", "term"],
        k=k,
        descending=[True, False],
        num_partitions=num_partitions,
    )


def _pack_bounds(tok: np.ndarray, budget: int) -> np.ndarray:
    """Greedy pack boundaries over a token-count sequence → monotone
    index array ``[0, b1, …, n]``: each segment's sum ≤ budget unless it
    is a single oversized chunk, and each segment is maximal (adding the
    next chunk would exceed the budget). O(#packs · log n)."""
    n = len(tok)
    if n == 0:
        return np.array([0])
    cs = np.r_[0, np.cumsum(tok)]
    starts = [0]
    while True:
        s = starts[-1]
        e = int(np.searchsorted(cs, cs[s] + budget, side="right")) - 1
        if e <= s:
            e = s + 1  # single chunk larger than the budget
        if e >= n:
            break
        starts.append(e)
    return np.array(starts + [n])


def pack_chunks(
    chunks: rd.Dataset,
    budget_tokens: int = 2048,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "n_tokens",
    num_partitions: int = 32,
) -> rd.Dataset:
    """Greedy sequence packing (the second half of chunk-then-pack
    pretraining prep): consecutive chunks — ordered by (doc, chunk) —
    are packed into sequences whose token sum stays ≤ ``budget_tokens``
    (an oversized single chunk gets its own pack). → one row per input
    chunk: ``(pack_id:string, id_col, idx_col, tok_col)``.

    Determinism/retry-safety: chunks are hash-partitioned by ``id_col``
    (a doc's chunks never straddle packs' partitions) and each partition
    is sorted before packing, so pack membership is a pure function of
    the input, not of scheduling; ``pack_id`` is the first chunk's
    ``"{doc}:{idx}"``. Packing is per-partition — global packing would
    serialize; the waste is ≤ one partial pack per partition.
    The per-pack boundary search is O(#packs · log n) numpy
    ``searchsorted`` — no per-row Python."""

    def pack(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {
                    "pack_id": pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    idx_col: pa.array([], pa.int64()),
                    tok_col: pa.array([], pa.int64()),
                }
            )
        df = df.sort_values([id_col, idx_col], kind="mergesort")
        tok = df[tok_col].to_numpy()
        bounds = _pack_bounds(tok, budget_tokens)
        lengths = np.diff(bounds)
        ids = df[id_col].to_numpy()
        idxs = df[idx_col].to_numpy()
        pack_ids = np.repeat(
            np.array(
                [f"{ids[s]}:{idxs[s]}" for s in bounds[:-1]], dtype=object
            ),
            lengths,
        )
        return pa.table(
            {
                "pack_id": pa.array(pack_ids, pa.string()),
                id_col: pa.array(ids, pa.int64()),
                idx_col: pa.array(idxs, pa.int64()),
                tok_col: pa.array(tok.astype(np.int64)),
            }
        )

    ensure_hash_shuffle(chunks)
    return chunks.repartition(num_partitions, keys=[id_col]).map_batches(
        pack, batch_format="pandas", batch_size=None
    )


def chunk_docs(
    ds: rd.Dataset,
    chunk_tokens: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """→ ``(id_col, chunk_idx:int64, chunk_text:string, n_tokens:int64)``
    — each document split into consecutive ``chunk_tokens``-token chunks
    (tokens re-joined with single spaces; the LLM-pretraining "split long
    docs before packing" step). Zero-token docs yield zero chunks. Pure
    batch-wise flat map — output rows ≈ input tokens / chunk_tokens, so
    batches stay bounded; no shuffle."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")

    def f(df: pd.DataFrame) -> pa.Table:
        import polars as pl

        e = _token_frame(df, text_col, lowercase=False)
        if not len(e):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        ids = pl.Series("id", df[id_col].to_numpy())
        g = (
            e.with_columns(
                (pl.col("t").cum_count().over("r") - 1).alias("pos")
            )
            .with_columns((pl.col("pos") // chunk_tokens).alias("chunk_idx"))
            .group_by(["r", "chunk_idx"], maintain_order=False)
            .agg(
                pl.col("t").str.join(" ").alias("chunk_text"),
                pl.len().cast(pl.Int64).alias("n_tokens"),
            )
        )
        return pa.table(
            {
                id_col: ids.gather(g["r"]).to_arrow(),
                "chunk_idx": g["chunk_idx"].cast(pl.Int64).to_arrow(),
                "chunk_text": g["chunk_text"].to_arrow(),
                "n_tokens": g["n_tokens"].to_arrow(),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def oov_stats(
    docs: rd.Dataset,
    vocab_k: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    lowercase: bool = True,
) -> rd.Dataset:
    """Per-document out-of-vocabulary statistics against the corpus's own
    top-``vocab_k`` unigram vocabulary — the vocabulary-coverage quality
    filter of an LLM data pipeline (drop docs whose token mass is mostly
    rare/garbage terms).

    Two passes over the text, both combiner-first:

    1. vocabulary: :func:`ngram_counts` (n=1) → distributed top-k by
       ``(count DESC, term ASC)`` (total order ⇒ deterministic vocab) →
       the k terms land on the driver and broadcast via ``ray.put`` —
       the documented small side (k ≤ ~1e6 terms ≈ tens of MB; the
       count table itself never materializes on the driver);
    2. scoring: map-only — polars tokenize + ``is_in(vocab)`` per batch,
       no shuffle.

    → ``(id_col, n_tokens:int64, n_oov:int64, oov_rate:float64)``, one
    row per document that has ≥1 token (tokenless docs are skipped, like
    a SQL twin built on the exploded token table). ``oov_rate`` is one
    IEEE divide — bit-identical to ``CAST(n_oov AS DOUBLE)/n_tokens``.
    """
    import ray

    from .groupagg import top_k

    vocab_tbl = top_k(
        ngram_counts(
            docs, n=1, text_col=text_col,
            num_partitions=num_partitions, lowercase=lowercase,
        ),
        ["count", "ngram"],
        k=vocab_k,
        descending=[True, False],
    )
    vocab = [r["ngram"] for r in vocab_tbl.take(vocab_k)]
    ref = ray.put(frozenset(vocab))

    class Score:
        def __init__(self):
            import polars as pl

            self.vocab = pl.Series("v", sorted(ray.get(ref)))

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            import polars as pl

            e = _token_frame(df, text_col, lowercase)
            ids = pl.Series(id_col, df[id_col].to_numpy())
            g = (
                e.with_columns(
                    (~pl.col("t").is_in(self.vocab)).cast(pl.Int64).alias("oov")
                )
                .group_by("r")
                .agg(
                    pl.len().cast(pl.Int64).alias("n_tokens"),
                    pl.col("oov").sum().alias("n_oov"),
                )
            )
            return pa.table(
                {
                    id_col: ids.gather(g["r"]).to_arrow(),
                    "n_tokens": g["n_tokens"].to_arrow(),
                    "n_oov": g["n_oov"].to_arrow(),
                    "oov_rate": (
                        g["n_oov"].cast(pl.Float64) / g["n_tokens"]
                    ).to_arrow(),
                }
            )

    return docs.map_batches(Score, batch_format="pandas", concurrency=(1, 8))


def inverted_index(
    docs: rd.Dataset,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    lowercase: bool = True,
) -> rd.Dataset:
    """Inverted index (posting lists): one row per term with its document
    frequency and the comma-joined sorted doc ids —
    ``(term:string, df:int64, postings:string)``. The retrieval-side
    build every dedup/contamination audit wants next to the corpus.

    Scale shape: per-batch DISTINCT (doc, term) pairs (polars tokenize +
    unique — the combiner: a term repeated T× in a doc ships once), ONE
    hash shuffle on the term, then a per-block sort + join (a term never
    spans blocks after the keyed repartition). ``min_df`` prunes the
    long tail at the finalize step, BEFORE the strings are built.

    Posting lists are strings, not ``list<int64>``, so the row set is
    hashable against a ``string_agg(... ORDER BY ...)`` SQL twin; at
    real scale you would write the Arrow list column instead (one flag
    flip in ``finalize``).
    """

    def pairs(df: pd.DataFrame):
        e = _token_frame(df, text_col, lowercase)
        import polars as pl

        ids = pl.Series("__id", df[id_col].to_numpy())
        u = (
            pl.DataFrame({"term": e["t"], id_col: ids.gather(e["r"])})
            .unique()
        )
        return u.to_arrow().replace_schema_metadata(None)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "term": pd.Series([], dtype="object"),
                    "df": pd.Series([], dtype="int64"),
                    "postings": pd.Series([], dtype="object"),
                }
            )
        df = df.sort_values(["term", id_col], kind="mergesort")
        g = df.groupby("term", sort=False)[id_col]
        out = pd.DataFrame(
            {
                "df": g.size().astype("int64"),
                "postings": g.agg(
                    lambda s: ",".join(s.astype(str))
                ),
            }
        ).reset_index()
        if min_df > 1:
            out = out[out["df"] >= min_df]
        return out[["term", "df", "postings"]].reset_index(drop=True)

    ensure_hash_shuffle(docs)
    return (
        docs.map_batches(pairs, batch_format="pandas")
        .repartition(num_partitions, keys=["term"])
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def collocations(
    ds: rd.Dataset,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    num_partitions: int = 32,
    lowercase: bool = True,
) -> rd.Dataset:
    """PMI-style collocation mining → top-``k``
    ``(w1, w2, c12, c1, c2, lift)`` bigrams by association lift
    ``(c12/Nb) / ((c1/Nu)·(c2/Nu))`` (PMI = log2(lift) — the log is
    monotone, so ranking by lift IS ranking by PMI while keeping the
    score a single IEEE division of exactly-represented integers:
    multiplication/division are exact-rounded and bit-deterministic
    across engines, unlike transcendental log implementations, so the
    score is SQL-hash-comparable).

    Shape: two ``ngram_counts`` passes (combiner + one keyed shuffle
    each) → the aggregated unigram/bigram tables are materialized once
    in the object store (each is consumed twice: total + join) → two
    co-hash joins attach c1/c2 → per-block lift + distributed top-k.
    ``Nb`` counts ALL bigrams (before the ``min_count`` support
    filter), per the standard PMI estimator.

    Memory note: the unigram table is vocabulary-sized; the PRE-filter
    bigram table is the larger side (distinct bigrams ≈ corpus-scale on
    diverse text) — its materialization lives in the object store,
    which SPILLS to disk rather than holding worker heap, and is the
    price of computing ``Nb`` without a second corpus pass. If bigram
    vocabulary outgrows disk, trade it for the extra pass: count
    ``n_big`` with a tiny separate aggregate and let the filtered
    pairs recompute their lineage."""
    import pyarrow.compute as _pc

    from ..engine.joins import hash_join
    from .groupagg import top_k

    uni = ngram_counts(
        ds, n=1, text_col=text_col,
        num_partitions=num_partitions, lowercase=lowercase,
    ).materialize()
    big = ngram_counts(
        ds, n=2, text_col=text_col,
        num_partitions=num_partitions, lowercase=lowercase,
    ).materialize()
    n_uni = float(uni.sum("count") or 0)
    n_big = float(big.sum("count") or 0)

    def split_b(t: pa.Table) -> pa.Table:
        s = t.filter(
            _pc.greater_equal(t.column("count"), min_count)
        )
        ng = s.column("ngram").combine_chunks()
        parts = _pc.split_pattern(ng, " ")
        return pa.table(
            {
                "w1": _pc.list_element(parts, 0)
                if s.num_rows
                else pa.array([], pa.string()),
                "w2": _pc.list_element(parts, 1)
                if s.num_rows
                else pa.array([], pa.string()),
                "c12": s.column("count"),
            }
        )

    pairs = big.map_batches(split_b, batch_format="pyarrow")
    u1 = uni.map_batches(
        lambda t: pa.table(
            {"u1_w": t.column("ngram"), "c1": t.column("count")}
        ),
        batch_format="pyarrow",
    )
    u2 = uni.map_batches(
        lambda t: pa.table(
            {"u2_w": t.column("ngram"), "c2": t.column("count")}
        ),
        batch_format="pyarrow",
    )
    j = hash_join(
        pairs, u1, ["w1"], ["u1_w"],
        num_partitions=num_partitions, join_type="inner",
    )
    j = hash_join(
        j, u2, ["w2"], ["u2_w"],
        num_partitions=num_partitions, join_type="inner",
    )

    def lift_fn(t: pa.Table) -> pa.Table:
        c12 = t.column("c12").cast(pa.float64())
        c1 = t.column("c1").cast(pa.float64())
        c2 = t.column("c2").cast(pa.float64())
        # fixed association: ((c12·Nu)·Nu) / ((c1·c2)·Nb) — the SQL twin
        # spells the identical tree, so the doubles match bit-for-bit
        num = _pc.multiply(_pc.multiply(c12, n_uni), n_uni)
        den = _pc.multiply(_pc.multiply(c1, c2), n_big)
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "c12": t.column("c12"),
                "c1": t.column("c1"),
                "c2": t.column("c2"),
                "lift": _pc.divide(num, den),
            }
        )

    lifted = j.map_batches(lift_fn, batch_format="pyarrow")
    return top_k(
        lifted, ["lift", "w1", "w2"], k=k, descending=[True, False, False]
    )
