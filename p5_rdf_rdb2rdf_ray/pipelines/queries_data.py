"""Training-data pipeline registry entries (brief §extras): dedup,
similarity / ANN, text stats, vocab / chunking, sampling, multimodal.
Builders + DuckDB oracle SQL twins; assembled in ``pipelines.queries``."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from ..stages.dedup import (
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..stages.groupagg import grouped_aggregate
from ..stages.similarity import ann_topk, embedding_neardup_pairs
from ..stages.textstats import (
    fingerprints,
    language_id,
    quality_features,
    token_counts,
)
from ..engine.runner import run_mapping
from ..mapping.spec import (
    IRI,
    LITERAL,
    MappingSpec,
    PredObjSpec,
    TermMapSpec,
    TriplesMapSpec,
)
from ..sinks.ntriples import to_term_columns
from .queries_kg import BASE, RDF_TYPE, _read, catalog_for

# ---------------------------------------------------------------------------
# training-data extras: dedup / similarity / text analysis


def q_dedup_exact_docs(sf_dir: str) -> rd.Dataset:
    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_DEDUP_EXACT_DOCS = """
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY text
"""


def q_token_counts_docs(sf_dir: str) -> rd.Dataset:
    return token_counts(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_TOKEN_COUNTS_DOCS = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))
            AS BIGINT) AS n_bpe_tokens
FROM documents
"""


def q_redact_docs(sf_dir: str) -> rd.Dataset:
    """Regex redaction scrub (emails → <EMAIL>, then long digit runs →
    <NUM>); ASCII-explicit classes so polars (Rust regex) and the DuckDB
    RE2 twin agree byte-for-byte. Map-only."""
    from ..stages.textstats import redact_text

    return redact_text(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        patterns=[
            (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
            (r"[0-9]{7,}", "<NUM>"),
        ],
    )


SQL_REDACT_DOCS = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '[0-9]{7,}', '<NUM>', 'g') AS text
FROM documents
"""


def q_quality_docs(sf_dir: str) -> rd.Dataset:
    return quality_features(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_QUALITY_DOCS = r"""
WITH t AS (
  SELECT doc_id, text, regexp_extract_all(text, '\S+') AS w FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(w) AS BIGINT) AS n_words,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq_words,
       CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
         / greatest(length(text), 1) AS punct_ratio,
       CAST(len(list_filter(w, x -> x IN
         ('the','a','and','of','to','in','is','it'))) AS DOUBLE)
         / greatest(len(w), 1) AS stop_ratio
FROM t
"""


def q_user_sessions(sf_dir: str) -> rd.Dataset:
    """Gap-based sessionization over the events stream (windowed custom
    operator: repartition by user + vectorized in-block windowing)."""
    from ..stages.sessions import sessionize

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return sessionize(ev, gap_s=1800.0, num_partitions=8)


SQL_USER_SESSIONS = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM o
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS t_start, max(ts) AS t_end
FROM s GROUP BY user_id, session_idx
"""


def q_window_events(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window aggregate per user (windowed custom op —
    combiner + one grouped shuffle; window id is row-local). The value
    sum runs over integer cents so the result is order-independent
    (float sums are not associative — the hash gate needs exactness)."""
    import numpy as np
    import pandas as pd

    from ..stages.sessions import tumbling_window

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["value_cents"] = np.floor(
            df["value"].to_numpy() * 100 + 0.5
        ).astype("int64")
        return df[["user_id", "ts", "value_cents"]]

    return tumbling_window(
        ev.map_batches(cents, batch_format="pandas"),
        window_s=3600, value_col="value_cents", value_dtype="int64",
        num_partitions=8,
    )


SQL_WINDOW_EVENTS = """
SELECT user_id,
       to_timestamp((epoch_us(ts) // 3600000000) * 3600) AT TIME ZONE 'UTC'
         AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value
FROM events GROUP BY 1, 2
"""


def q_hopping_window_events(sf_dir: str) -> rd.Dataset:
    """Overlapping 1-hour windows hopping every 15 min (each event lands
    in 4 windows) — the sliding-window aggregate; same integer-cents
    exactness trick as ``window_events``."""
    import numpy as np
    import pandas as pd

    from ..stages.sessions import hopping_window

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["value_cents"] = np.floor(
            df["value"].to_numpy() * 100 + 0.5
        ).astype("int64")
        return df[["user_id", "ts", "value_cents"]]

    return hopping_window(
        ev.map_batches(cents, batch_format="pandas"),
        window_s=3600, hop_s=900,
        value_col="value_cents", value_dtype="int64",
        num_partitions=8,
    )


SQL_HOPPING_WINDOW_EVENTS = """
SELECT user_id,
       to_timestamp(((epoch_us(ts) // 900000000) - j) * 900)
         AT TIME ZONE 'UTC' AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value
FROM events, LATERAL (SELECT unnest(range(0, 4)) AS j) t
GROUP BY 1, 2
"""


def q_ngram_counts_docs(sf_dir: str) -> rd.Dataset:
    """Corpus-wide word-bigram vocabulary (combiner + one shuffle on the
    n-gram), min_count=2."""
    from ..stages.vocab import ngram_counts

    return ngram_counts(
        _read(sf_dir, "documents", ["text"]),
        n=2, min_count=2, num_partitions=16,
    )


def q_collocations_docs(sf_dir: str) -> rd.Dataset:
    """Top-20 PMI-lift collocations (`stages.vocab.collocations`):
    two combiner-first count passes, vocabulary-sized joins, exact
    integer counts, one bit-deterministic IEEE division for the score
    (PMI = log2(lift); log omitted so the hash compare stays exact)."""
    from ..stages.vocab import collocations

    return collocations(
        _read(sf_dir, "documents", ["text"]), k=20, min_count=5,
        num_partitions=8,
    )


SQL_COLLOCATIONS_DOCS = r"""
WITH arrs AS (
  SELECT regexp_extract_all(lower(text), '\S+') AS arr FROM documents
),
uni AS (
  SELECT word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(arr) AS word FROM arrs) GROUP BY word
),
big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM (
    SELECT arr[i] AS w1, arr[i+1] AS w2
    FROM arrs, LATERAL (SELECT unnest(range(1, len(arr))) AS i) t
  ) GROUP BY w1, w2
),
tot AS (
  SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS nu,
         (SELECT CAST(sum(c12) AS DOUBLE) FROM big) AS nb
)
SELECT w1, w2, c12, c1, c2,
       ((CAST(c12 AS DOUBLE) * nu) * nu)
       / ((CAST(c1 AS DOUBLE) * c2) * nb) AS lift
FROM big
JOIN uni u1 ON big.w1 = u1.word
JOIN uni u2 ON big.w2 = u2.word
CROSS JOIN tot
, LATERAL (SELECT u1.c AS c1, u2.c AS c2) x
WHERE c12 >= 5
ORDER BY lift DESC, w1, w2
LIMIT 20
"""


def q_bpe_merges_docs(sf_dir: str):
    """Distributed BPE vocabulary learning: ONE corpus pass builds the
    distinct-word frequency table; merge rounds run over that (small)
    table with combiner-first pair counts + distributed top-k. Rows-only
    (the merge sequence is deterministic but not SQL-expressible;
    merges_per_round=1 equality with the textbook algorithm is pinned
    by tests/test_stages.py::test_learn_bpe_matches_reference)."""
    from ..stages.bpe import learn_bpe

    return learn_bpe(
        _read(sf_dir, "documents", ["text"]),
        num_merges=16,
        merges_per_round=8,
        min_freq=2,
    )


def q_bpe_encode_docs(sf_dir: str) -> rd.Dataset:
    """The APPLY half of BPE: learn a small merge table, then tokenize
    every document with the `_BpeEncoder` actor pool (rank dict built
    once per actor from a `ray.put` broadcast; Zipfian word cache).
    Rows-only (tokenization is not SQL-expressible; per-word equality
    with a sequential reference encoder is pinned by
    tests/test_stages.py::test_bpe_encode_matches_reference)."""
    from ..stages.bpe import bpe_encode, learn_bpe

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # one merge round keeps the entry inside the driver's per-entry
    # wall budget; the encode pool is the part under test here
    merges = learn_bpe(
        _read(sf_dir, "documents", ["text"]),
        num_merges=8, merges_per_round=8, min_freq=2,
    )
    return bpe_encode(docs, merges)


def q_approx_users_per_event(sf_dir: str) -> rd.Dataset:
    """Per-group HLL: approximate distinct users per event type — one
    2^p-byte register row per (group, block) ships instead of every
    (group, user) pair. Rows-only (HLL estimates are not
    SQL-reproducible; the ≤5% error bound and block-layout independence
    are pinned by tests/test_stages.py::test_grouped_approx_distinct)."""
    from ..stages.sketches import grouped_approx_distinct

    return grouped_approx_distinct(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        keys=["event_type"],
        col="user_id",
        p=12,
        num_partitions=4,
    )


def q_heavy_hitters_docs(sf_dir: str) -> rd.Dataset:
    """Misra–Gries top-20 corpus words (`stages.sketches.
    heavy_hitter_tokens`) — per-block token fold → MG(k) summaries →
    bundled fan-in merge; NO vocabulary shuffle. k=4096 exceeds the
    corpus vocabulary, so no truncation fires anywhere and the counts
    are EXACT with err=0 — the SQL-checkable mode (truncated estimates
    carry their bound in ``err``; the guarantee is pinned by
    tests/test_stages.py::test_heavy_hitters_bounds)."""
    from ..stages.sketches import heavy_hitter_tokens

    return heavy_hitter_tokens(
        _read(sf_dir, "documents", ["text"]), k=4096, limit=20
    )


SQL_HEAVY_HITTERS_DOCS = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS item
  FROM documents
)
SELECT item, count(*) AS cnt, CAST(0 AS BIGINT) AS err
FROM toks GROUP BY item
ORDER BY cnt DESC, item
LIMIT 20
"""


def q_top_words_per_lang(sf_dir: str) -> rd.Dataset:
    """Misra–Gries heavy hitters PER GROUP (`sketches.
    grouped_heavy_hitter_tokens`): top-5 words per language — per-block
    per-group summaries (combiner), one keyed shuffle of k-bounded
    rows, per-group merge. k=4096 ≥ vocabulary ⇒ exact, err=0 (the
    SQL-checkable mode)."""
    from ..stages.sketches import grouped_heavy_hitter_tokens

    return grouped_heavy_hitter_tokens(
        _read(sf_dir, "documents", ["lang", "text"]),
        group_col="lang", k=4096, limit=5, num_partitions=8,
    )


SQL_TOP_WORDS_PER_LANG = r"""
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '\S+')) AS item
  FROM documents
),
cnt AS (
  SELECT lang, item, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY lang, item
)
SELECT lang, item, cnt, CAST(0 AS BIGINT) AS err FROM cnt
QUALIFY row_number() OVER (
  PARTITION BY lang ORDER BY cnt DESC, item
) <= 5
"""


def q_approx_vocab_docs(sf_dir: str) -> rd.Dataset:
    """HyperLogLog estimate of the distinct-bigram vocabulary size —
    the shuffle-free scale companion of ``ngram_counts`` (rows-only:
    a register-array estimator is not SQL-expressible; accuracy vs the
    exact vocabulary is pinned by tests/test_stages.py::
    test_approx_vocab_matches_exact_vocab)."""
    from ..stages.sketches import approx_ndistinct_ngrams

    return approx_ndistinct_ngrams(
        _read(sf_dir, "documents", ["text"]), n=2, p=12,
    )


SQL_NGRAM_COUNTS_DOCS = """
SELECT ngram, "count" FROM (
  SELECT arr[i] || ' ' || arr[i+1] AS ngram, CAST(count(*) AS BIGINT) AS "count"
  FROM (SELECT regexp_extract_all(lower(text), '\\S+') AS arr FROM documents) d,
       LATERAL (SELECT unnest(range(1, len(arr))) AS i) t
  GROUP BY 1
) WHERE "count" >= 2
"""


def q_tfidf_docs(sf_dir: str) -> rd.Dataset:
    """Per-document top-3 terms by tf-idf (tf row-local; df via one term
    shuffle; score ``tf * (N / df)`` — IEEE-exact, no log)."""
    import pyarrow.parquet as _pq

    from ..stages.vocab import tfidf_top_terms

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return tfidf_top_terms(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        n_docs=n_docs, k=3, num_partitions=16,
    )


SQL_TFIDF_DOCS = """
WITH toks AS (
  SELECT doc_id, arr[i] AS term
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS arr
        FROM documents) d,
       LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS i) t
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY 1, 2),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
SELECT doc_id, term, tf, df, tfidf FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * (n.n / df.df) AS tfidf,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * (n.n / df.df) DESC, tf.term
         ) AS rn
  FROM tf JOIN df USING (term), n
) WHERE rn <= 3
"""


def q_chunk_docs(sf_dir: str) -> rd.Dataset:
    """Fixed-64-token document chunking (sequence-packing prep) — pure
    batch-wise flat map, no shuffle."""
    from ..stages.vocab import chunk_docs

    return chunk_docs(
        _read(sf_dir, "documents", ["doc_id", "text"]), chunk_tokens=64
    )


SQL_CHUNK_DOCS = """
SELECT doc_id, i AS chunk_idx,
       array_to_string(arr[(i * 64 + 1):((i + 1) * 64)], ' ') AS chunk_text,
       CAST(least(64, len(arr) - i * 64) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS arr FROM documents) d,
     LATERAL (SELECT unnest(range(0, (len(arr) + 63) // 64)) AS i) t
"""


def q_join_orders_customer(sf_dir: str) -> rd.Dataset:
    """The general big×big LEFT OUTER equi-join surface
    (`engine.joins.hash_join`: union-tag, ONE co-hash shuffle, whole-
    partition Acero join — no Dataset.join empty-partition crash),
    exercised directly rather than through a refObjectMap."""
    from ..engine.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    return hash_join(
        orders, cust, ["o_custkey"], ["c_custkey"], num_partitions=16
    )


SQL_JOIN_ORDERS_CUSTOMER = """
SELECT o_orderkey, o_custkey, c_name, c_nationkey
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


def q_anti_join_customers(sf_dir: str) -> rd.Dataset:
    """Anti-join: customers with no events (`engine.distinct.except_rows`
    — per-side dedup combiner, union-tag, one hash shuffle)."""
    import pyarrow as pa

    from ..engine.distinct import except_rows

    cust = _read(sf_dir, "customer", ["c_custkey"])
    active = _read(sf_dir, "events", ["user_id"]).map_batches(
        lambda t: pa.table({"c_custkey": t.column("user_id")}),
        batch_format="pyarrow",
    )
    return except_rows(cust, active, ["c_custkey"], num_buckets=8)


SQL_ANTI_JOIN_CUSTOMERS = """
SELECT DISTINCT c_custkey FROM customer
EXCEPT
SELECT user_id FROM events
"""


def q_multimodal_features(sf_dir: str) -> rd.Dataset:
    """Multimodal binary-column pipeline with a REAL decode: each doc id
    deterministically mints a well-formed PNG / JPEG / GIF header
    payload (opaque ``binary`` column through the real MEDIA_SCHEMA),
    and the engine's dependency-free header probe parses format, width
    and height back out of the BYTES. The oracle predicts the same
    fields from the doc-id arithmetic — so the Ray side only matches if
    the byte-level container parsing is correct. (The feature-extractor
    / frame-sampler / resizer actor-pool stages remain pinned by pytest;
    their sha256-derived stub features are not SQL-expressible.)"""
    import pyarrow as pa

    from ..stages.multimodal import (
        MEDIA_SCHEMA,
        probe_headers,
        synth_image_payload,
    )

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        n = len(ids)
        fmts = [("png", "jpeg", "gif")[i % 3] for i in ids]
        payloads = [
            synth_image_payload(f, i % 640 + 1, i % 480 + 1)
            for f, i in zip(fmts, ids)
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["image"] * n),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array([f"image/{f}" for f in fmts]),
                "width": pa.array([-1] * n, pa.int32()),  # unknown pre-probe
                "height": pa.array([-1] * n, pa.int32()),
                "duration_ms": pa.array([0] * n, pa.int32()),
            },
            schema=MEDIA_SCHEMA,
        )

    media = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        to_media, batch_format="pyarrow"
    )
    return probe_headers(media)


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END
           AS fmt,
       CAST(doc_id % 640 + 1 AS INTEGER) AS width,
       CAST(doc_id % 480 + 1 AS INTEGER) AS height
FROM documents
"""


def q_quantiles_docs(sf_dir: str):
    """Token-count quantiles over the corpus (threshold selection for
    quality filters) — distributed value histogram, driver-side pick,
    DuckDB quantile_disc semantics."""
    from ..stages.groupagg import column_quantiles

    tc = token_counts(_read(sf_dir, "documents", ["doc_id", "text"]))
    df = column_quantiles(
        tc, "n_tokens", [0.1, 0.5, 0.9, 0.99], num_partitions=8
    )
    df["value"] = df["value"].astype("int64")
    return df


SQL_QUANTILES_DOCS = """
WITH t AS (
  SELECT CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS v
  FROM documents
)
SELECT CAST(0.10 AS DOUBLE) AS q, quantile_disc(v, 0.10) AS value FROM t
UNION ALL
SELECT CAST(0.50 AS DOUBLE), quantile_disc(v, 0.50) FROM t
UNION ALL
SELECT CAST(0.90 AS DOUBLE), quantile_disc(v, 0.90) FROM t
UNION ALL
SELECT CAST(0.99 AS DOUBLE), quantile_disc(v, 0.99) FROM t
"""


def q_approx_quantiles_docs(sf_dir: str):
    """Mergeable quantile summary over document byte lengths — the
    fixed-size scale path beside the exact ``quantiles_docs`` histogram
    (which assumes distinct values ≪ rows). With n ≤ s the summary
    keeps every value, so the sf0.01 gate compares EXACT quantile_disc
    values; the bounded rank error at n ≫ s is pinned by
    tests/test_stages.py::test_approx_quantiles_rank_error."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.sketches import approx_quantiles

    lens = _read(sf_dir, "documents", ["text"]).map_batches(
        lambda t: pa.table(
            {"blen": pc.binary_length(t.column("text")).cast(pa.float64())}
        ),
        batch_format="pyarrow",
    )
    return approx_quantiles(lens, "blen", [0.1, 0.5, 0.9], s=1024)


SQL_APPROX_QUANTILES_DOCS = """
WITH t AS (SELECT CAST(strlen(text) AS DOUBLE) AS v FROM documents)
SELECT CAST(0.10 AS DOUBLE) AS q, quantile_disc(v, 0.10) AS value FROM t
UNION ALL
SELECT CAST(0.50 AS DOUBLE), quantile_disc(v, 0.50) FROM t
UNION ALL
SELECT CAST(0.90 AS DOUBLE), quantile_disc(v, 0.90) FROM t
"""


def q_pack_chunks_docs(sf_dir: str) -> rd.Dataset:
    """Chunk-then-pack sequence prep: 64-token chunks greedily packed
    into ≤256-token sequences. Greedy packing is iterative (each pack
    boundary depends on the previous one) — no SQL oracle; invariants
    (budget, consecutiveness, determinism) are pinned by pytest."""
    from ..stages.vocab import chunk_docs, pack_chunks

    ch = chunk_docs(
        _read(sf_dir, "documents", ["doc_id", "text"]), chunk_tokens=64
    )
    return pack_chunks(ch, budget_tokens=256, num_partitions=8)


def q_graph_diff_events(sf_dir: str) -> rd.Dataset:
    """KG snapshot delta: triples of the full events graph EXCEPT the
    graph built over the non-click slice (rr:sqlQuery logical table) —
    exactly the click-event triples. One union-tag shuffle
    (`engine.distinct.graph_diff`)."""
    from ..engine.distinct import graph_diff

    cat = catalog_for(sf_dir)

    def spec_for(sql: str | None) -> MappingSpec:
        tm = TriplesMapSpec(
            name="ev",
            table="events" if sql is None else "__sql__",
            sql=sql,
            subject=TermMapSpec(kind=IRI, template=BASE + "ev/{event_id}"),
            classes=(BASE + "Event",),
            pos=(
                PredObjSpec(
                    pred=TermMapSpec(kind=IRI, constant=BASE + "etype"),
                    obj=TermMapSpec(kind=LITERAL, column="event_type"),
                ),
            ),
        )
        return MappingSpec(maps={"ev": tm}, base=BASE)

    # distinct=False on both sides: graph_diff's tagged set-op dedups
    # each side itself (per-block combiner + post-shuffle merge), so the
    # upstream set-semantics shuffles would be two redundant exchanges
    new = run_mapping(spec_for(None), cat, distinct=False)
    old = run_mapping(
        spec_for(
            "SELECT event_id, event_type FROM events"
            " WHERE event_type <> 'click'"
        ),
        cat,
        distinct=False,
    )
    return to_term_columns(graph_diff(new, old, num_buckets=8))


SQL_GRAPH_DIFF_EVENTS = f"""
SELECT subj, pred, obj FROM (
  SELECT '<{BASE}ev/' || event_id || '>' AS subj,
         '<{RDF_TYPE}>' AS pred, '<{BASE}Event>' AS obj FROM events
  UNION ALL
  SELECT '<{BASE}ev/' || event_id || '>', '<{BASE}etype>',
         '"' || event_type || '"' FROM events
) a
EXCEPT
SELECT subj, pred, obj FROM (
  SELECT '<{BASE}ev/' || event_id || '>' AS subj,
         '<{RDF_TYPE}>' AS pred, '<{BASE}Event>' AS obj
  FROM events WHERE event_type <> 'click'
  UNION ALL
  SELECT '<{BASE}ev/' || event_id || '>', '<{BASE}etype>',
         '"' || event_type || '"' FROM events WHERE event_type <> 'click'
) b
"""


def q_asof_events_orders(sf_dir: str) -> rd.Dataset:
    """As-of join (backward): each event matched to the customer's
    latest order placed at-or-before the event timestamp. The right
    side is first reduced to one row per (custkey, orderdate) — max
    orderkey — so the as-of pick is deterministic on both engines."""
    from ..stages.asof import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    od = grouped_aggregate(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"]),
        keys=["o_custkey", "o_orderdate"],
        aggs={"o_orderkey": ("o_orderkey", "max")},
        num_partitions=8,
    )
    return asof_join(
        ev, od,
        key_left="user_id", key_right="o_custkey",
        ts_left="ts", ts_right="o_orderdate",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["o_orderkey", "o_orderdate"],
        num_partitions=8,
        out_dtypes={
            "event_id": "int64",
            "user_id": "int64",
            "o_orderkey": "int64",
        },
    )


SQL_ASOF_EVENTS_ORDERS = """
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
FROM events e ASOF JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_range_join_orders(sf_dir: str) -> rd.Dataset:
    """Range (interval) join: each order matched to the price band
    whose [lo, hi) contains its total price. Bands are derived from
    nation keys (25 disjoint 20k-wide cells covering the price domain)
    so the oracle runs over the same stock tables."""
    import pyarrow as pa

    from ..stages.asof import range_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    bands = _read(sf_dir, "nation", ["n_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "band_id": t.column("n_nationkey").cast(pa.int64()),
                "lo": pc_mul(t.column("n_nationkey"), 20000.0),
                "hi": pc_mul(
                    pa.compute.add(t.column("n_nationkey"), 1), 20000.0
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return range_join(
        orders, bands,
        value_col="o_totalprice", lo_col="lo", hi_col="hi",
        left_cols=["o_orderkey"], right_cols=["band_id"],
        bucket_width=20000.0, num_partitions=8,
        out_dtypes={"o_orderkey": "int64", "band_id": "int64"},
    )


def pc_mul(arr, x: float):
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.multiply(arr.cast(pa.float64()), x)


SQL_RANGE_JOIN_ORDERS = """
SELECT o.o_orderkey, b.band_id
FROM orders o JOIN (
  SELECT CAST(n_nationkey AS BIGINT) AS band_id,
         CAST(n_nationkey AS DOUBLE) * 20000.0 AS lo,
         (CAST(n_nationkey AS DOUBLE) + 1) * 20000.0 AS hi
  FROM nation
) b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
"""


def q_path_reach_docs(sf_dir: str) -> rd.Dataset:
    """SPARQL ``p+``-style arbitrary-length reachability
    (`stages.paths.transitive_closure` — PATH DOUBLING: O(log diameter)
    rounds, each one union-tag co-hash self-join + one distinct
    shuffle) over a deterministic parent relation derived from the
    documents table: ``doc_id → doc_id // 2`` is a binary-tree edge
    set of depth ~log₂(n), so the closure genuinely exercises the
    multi-round fixpoint (5 doubling rounds at sf0.1), not a one-hop
    join. Oracle: DuckDB recursive CTE over the same derived edges."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.paths import transitive_closure

    docs = _read(sf_dir, "documents", ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        s = ids.filter(pc.greater_equal(ids, 1))
        # integer divide truncates = floor for the non-negative ids
        return pa.table({"src": s, "dst": pc.divide(s, 2)})

    return transitive_closure(
        docs.map_batches(edges, batch_format="pyarrow"), num_partitions=8
    )


SQL_PATH_REACH_DOCS = """
WITH RECURSIVE e AS (
  SELECT doc_id AS src, doc_id // 2 AS dst FROM documents WHERE doc_id >= 1
), r AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src
)
SELECT src, dst FROM r
"""


def q_winnow_fp_docs(sf_dir: str) -> rd.Dataset:
    """Winnowing rolling-hash fingerprints — rows-only (not SQL)."""
    from ..stages.textstats import winnow_fingerprints

    return winnow_fingerprints(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_fingerprint_docs(sf_dir: str) -> rd.Dataset:
    return fingerprints(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_FINGERPRINT_DOCS = "SELECT doc_id, md5(text) AS fp FROM documents"


def q_langid_docs(sf_dir: str) -> rd.Dataset:
    # heuristic model — rows-only check (no SQL oracle)
    return language_id(_read(sf_dir, "documents", ["doc_id", "text"]))


_SHINGLE_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS s
  FROM toks, unnest(generate_series(1, len(w) - 2)) AS u(g)
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da AS doc_a, db AS doc_b,
       CAST(n AS DOUBLE) / (sa.sz + sb.sz - n) AS jacc
FROM inter
JOIN sz sa ON sa.doc_id = da
JOIN sz sb ON sb.doc_id = db
WHERE CAST(n AS DOUBLE) / (sa.sz + sb.sz - n) >= {tau}
"""


def q_jaccard_pairs_docs(sf_dir: str) -> rd.Dataset:
    return ngram_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), tau=0.6
    )


SQL_JACCARD_PAIRS_DOCS = _SHINGLE_SQL.format(tau=0.6)


def q_minhash_pairs_docs(sf_dir: str) -> rd.Dataset:
    # LSH (32 bands × 2 rows) recall at τ=0.6 is 1 - (1-τ²)^32 ≈ 1 - 6e-7:
    # the verified output equals the exact-Jaccard oracle in practice
    return minhash_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), tau=0.6
    )


SQL_MINHASH_PAIRS_DOCS = SQL_JACCARD_PAIRS_DOCS


def q_near_dedup_docs(sf_dir: str) -> rd.Dataset:
    """End-to-end near-dedup: MinHash+LSH pairs → connected components →
    canonical min-id representative per component, one row per doc.
    Oracle: the exact-Jaccard pair graph closed by a recursive CTE."""
    from ..stages.dedup import near_dedup_docs

    return near_dedup_docs(
        _read(sf_dir, "documents", ["doc_id", "text"]), tau=0.6
    )


SQL_NEAR_DEDUP_DOCS = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS s
  FROM toks, unnest(generate_series(1, len(w) - 2)) AS u(g)
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT da AS doc_a, db AS doc_b
  FROM inter
  JOIN sz sa ON sa.doc_id = da
  JOIN sz sb ON sb.doc_id = db
  WHERE CAST(n AS DOUBLE) / (sa.sz + sb.sz - n) >= 0.6
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
rep AS (
  SELECT a AS doc_id, least(min(b), a) AS rep_id FROM reach GROUP BY a
)
SELECT d.doc_id,
       CAST(coalesce(r.rep_id, d.doc_id) AS BIGINT) AS rep_id,
       coalesce(r.rep_id, d.doc_id) = d.doc_id AS is_kept
FROM documents d LEFT JOIN rep r ON r.doc_id = d.doc_id
"""


def q_simhash_pairs_docs(sf_dir: str) -> rd.Dataset:
    # rows-only: 64-bit SimHash bucketing is not SQL-expressible
    return simhash_pairs(_read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3)


def _query_vectors(sf_dir: str, n: int = 5):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id"))
    mask = ids < n
    m = np.vstack(
        [np.asarray(v, np.float64) for v, keep in zip(t.column("embedding").to_pylist(), mask) if keep]
    )
    return ids[mask], m


def q_ann_topk(sf_dir: str) -> rd.Dataset:
    qs = _query_vectors(sf_dir, 5)
    return ann_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), qs, k=10
    )


SQL_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 5
),
s AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS sim
  FROM q, embeddings e
),
r AS (
  SELECT qid AS query_id, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
  FROM s
)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank FROM r WHERE rnk <= 10
"""


def q_lsh_topk(sf_dir: str) -> rd.Dataset:
    """Approximate (LSH-bucketed) top-k — the scale path of ann_topk;
    rows-only check (bucketing is not SQL-expressible)."""
    from ..stages.similarity import lsh_topk

    qs = _query_vectors(sf_dir, 5)
    return lsh_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), qs, k=10
    )


def q_ivf_topk(sf_dir: str) -> rd.Dataset:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    path beside lsh_topk; rows-only check (k-means buckets are not
    SQL-expressible)."""
    from ..stages.similarity import ivf_topk

    qs = _query_vectors(sf_dir, 5)
    return ivf_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), qs,
        k=10, nlist=16, nprobe=8,
    )


def q_neardup_embeddings(sf_dir: str) -> rd.Dataset:
    return embedding_neardup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), tau=0.46
    )


SQL_NEARDUP_EMBEDDINGS = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.46
"""


def q_clean_corpus_docs(sf_dir: str) -> rd.Dataset:
    """Composed corpus-cleaning pipeline: quality gate → exact dedup →
    MinHash near-dedup, one verdict row per input doc. The language gate
    is off here (language-ID is not SQL-expressible; it is exercised by
    ``langid_docs`` and the pytest corpus). min_words=16 drops ~5% of the
    synthetic docs so the quality branch is live in the oracle compare."""
    from .clean import clean_corpus

    return clean_corpus(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_words=16,
        max_punct_ratio=0.5,
        langs=None,
        neardup_tau=0.6,
        neardup_method="minhash",
        materialize_flags=True,  # flags pass runs once, not per consumer
    )


SQL_CLEAN_CORPUS_DOCS = r"""
WITH RECURSIVE q AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '\S+')) AS n_words,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
           / greatest(length(text), 1) AS punct_ratio
  FROM documents
),
dropped AS (
  SELECT doc_id, 'quality' AS status, CAST(NULL AS BIGINT) AS rep_id
  FROM q WHERE n_words < 16 OR punct_ratio > 0.5
),
surv AS (
  SELECT doc_id, text FROM q
  WHERE NOT (n_words < 16 OR punct_ratio > 0.5)
),
ex AS (
  SELECT doc_id, text,
         min(doc_id) OVER (PARTITION BY text) AS rep_id
  FROM surv
),
losers AS (
  SELECT doc_id, 'exact_dup' AS status, rep_id
  FROM ex WHERE doc_id <> rep_id
),
winners AS (SELECT doc_id, text FROM ex WHERE doc_id = rep_id),
toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM winners
),
sh AS (
  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS s
  FROM toks, unnest(generate_series(1, len(w) - 2)) AS u(g)
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT da AS doc_a, db AS doc_b
  FROM inter
  JOIN sz sa ON sa.doc_id = da
  JOIN sz sb ON sb.doc_id = db
  WHERE CAST(n AS DOUBLE) / (sa.sz + sb.sz - n) >= 0.6
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
nrep AS (SELECT a AS doc_id, least(min(b), a) AS rep_id FROM reach GROUP BY a)
SELECT doc_id, status, rep_id FROM dropped
UNION ALL
SELECT doc_id, status, CAST(rep_id AS BIGINT) AS rep_id FROM losers
UNION ALL
SELECT w.doc_id,
       CASE WHEN coalesce(r.rep_id, w.doc_id) = w.doc_id
            THEN 'kept' ELSE 'near_dup' END AS status,
       CAST(coalesce(r.rep_id, w.doc_id) AS BIGINT) AS rep_id
FROM winners w LEFT JOIN nrep r ON r.doc_id = w.doc_id
"""


def q_repetition_docs(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition quality signals (dup-line fraction,
    top-bigram share) per document."""
    from ..stages.textstats import repetition_stats

    return repetition_stats(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_REPETITION_DOCS = r"""
WITH l AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
),
lines AS (
  SELECT doc_id, len(ls) AS n_lines, len(list_distinct(ls)) AS n_uniq
  FROM l
),
t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
bg AS (
  SELECT doc_id, w[g] || ' ' || w[g+1] AS b
  FROM t, unnest(generate_series(1, len(w) - 1)) AS u(g)
),
bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
tops AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM bc GROUP BY 1)
SELECT d.doc_id,
       CAST(li.n_lines AS BIGINT) AS n_lines,
       1.0 - CAST(li.n_uniq AS DOUBLE) / li.n_lines AS dup_line_frac,
       coalesce(CAST(tp.mx AS DOUBLE) / tp.tot, 0.0) AS top_bigram_frac
FROM documents d
JOIN lines li ON li.doc_id = d.doc_id
LEFT JOIN tops tp ON tp.doc_id = d.doc_id
"""


def q_decontaminate_docs(sf_dir: str) -> rd.Dataset:
    """Train/eval decontamination: flag corpus docs sharing ≥2 distinct
    5-gram shingles with a reference set (here the src0 sub-corpus) —
    broadcast ref-set mode (map-only over the corpus; the distributed
    semi-join mode is pinned equal by pytest)."""
    from ..stages.dedup import decontaminate_docs

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    ref = docs.filter(expr="source == 'src0'").select_columns(
        ["doc_id", "text"]
    )
    return decontaminate_docs(
        docs.select_columns(["doc_id", "text"]), ref, n=5, min_hits=2
    )


SQL_DECONTAMINATE_DOCS = r"""
WITH corpus AS (SELECT doc_id, text FROM documents),
refset AS (SELECT text FROM documents WHERE source = 'src0'),
ta AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM corpus),
sa AS (
  SELECT DISTINCT doc_id,
         w[g]||' '||w[g+1]||' '||w[g+2]||' '||w[g+3]||' '||w[g+4] AS s
  FROM ta, unnest(generate_series(1, len(w) - 4)) AS u(g)
),
tb AS (SELECT regexp_extract_all(text, '\S+') AS w FROM refset),
sb AS (
  SELECT DISTINCT
         w[g]||' '||w[g+1]||' '||w[g+2]||' '||w[g+3]||' '||w[g+4] AS s
  FROM tb, unnest(generate_series(1, len(w) - 4)) AS u(g)
),
hits AS (
  SELECT a.doc_id, count(*) AS n FROM sa a JOIN sb b ON a.s = b.s GROUP BY 1
)
SELECT c.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
       coalesce(h.n, 0) < 2 AS is_clean
FROM corpus c LEFT JOIN hits h ON h.doc_id = c.doc_id
"""


def q_emb_near_dedup(sf_dir: str) -> rd.Dataset:
    """End-to-end embedding near-dedup (exact pairs → CC → min-id
    representative) — the vector twin of near_dedup_docs."""
    from ..stages.similarity import embedding_near_dedup

    return embedding_near_dedup(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        tau=0.46, method="exact",
    )


SQL_EMB_NEAR_DEDUP = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.embedding::DOUBLE[],
                               b.embedding::DOUBLE[]) >= 0.46
),
edges AS (
  SELECT va AS a, vb AS b FROM pairs UNION SELECT vb, va FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
rep AS (SELECT a AS vec_id, least(min(b), a) AS rep_id FROM reach GROUP BY a)
SELECT e.vec_id,
       CAST(coalesce(r.rep_id, e.vec_id) AS BIGINT) AS rep_id,
       coalesce(r.rep_id, e.vec_id) = e.vec_id AS is_kept
FROM embeddings e LEFT JOIN rep r ON r.vec_id = e.vec_id
"""


# fmix32 (MurmurHash3 finalizer) in SQL — bit-identical to
# stages/sample.fmix32 for non-negative int64 keys: fold to 32 bits,
# add seed, then xor-shift/multiply rounds with HUGEINT intermediates.
_FMIX32_SQL = """
  SELECT *, CAST(xor(h2, h2 >> 16) AS BIGINT) AS smp_h
  FROM (
    SELECT * EXCLUDE (h1),
           CAST((CAST(xor(h1, h1 >> 13) AS HUGEINT) * 3266489909)
                % 4294967296 AS BIGINT) AS h2
    FROM (
      SELECT * EXCLUDE (h0),
             CAST((CAST(xor(h0, h0 >> 16) AS HUGEINT) * 2246822507)
                  % 4294967296 AS BIGINT) AS h1
      FROM (
        SELECT *, (xor({key} % 4294967296, {key} // 4294967296) + {seed})
                  % 4294967296 AS h0
        FROM {src}
      )
    )
  )
"""


def q_sample_docs(sf_dir: str) -> rd.Dataset:
    """Deterministic hash sampling (consistent ~25% subset, map-only)."""
    from ..stages.sample import hash_sample

    return hash_sample(
        _read(sf_dir, "documents", ["doc_id", "text"]), rate=0.25, seed=42
    )


SQL_SAMPLE_DOCS = f"""
SELECT doc_id, text FROM (
{_FMIX32_SQL.format(key="doc_id", seed=42, src="documents")}
) WHERE smp_h % 1000000 < 250000
"""


def q_split_docs(sf_dir: str) -> rd.Dataset:
    """Deterministic train/val/test split assignment
    (`stages.sample.split_assign`): membership is a pure function of
    fmix32(doc_id) — stable across runs, re-shards and cluster sizes;
    map-only, bit-exact SQL twin via the shared `_FMIX32_SQL` stream."""
    from ..stages.sample import split_assign

    return split_assign(
        _read(sf_dir, "documents", ["doc_id"]),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=7,
    )


SQL_SPLIT_DOCS = f"""
SELECT doc_id,
       CASE WHEN smp_h % 1000000 < 800000 THEN 'train'
            WHEN smp_h % 1000000 < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM (
{_FMIX32_SQL.format(key="doc_id", seed=7, src="documents")}
)
"""


def q_normalize_docs(sf_dir: str) -> rd.Dataset:
    """Unicode canonicalization pass (`stages.textstats.normalize_text`:
    NFC + lowercase + whitespace collapse, all Arrow kernels, map-only)
    — byte-exact SQL twin."""
    from ..stages.textstats import normalize_text

    return normalize_text(
        _read(sf_dir, "documents", ["doc_id", "text"]), out_col="norm"
    )


SQL_NORMALIZE_DOCS = r"""
SELECT doc_id, text,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
       AS norm
FROM documents
"""


def q_fuzzy_names_customers(sf_dir: str) -> rd.Dataset:
    """Blocked fuzzy (edit-distance) join (`stages.fuzzy.fuzzy_join`):
    customer names against a deterministically-perturbed copy
    (``m → n``, distance 1), blocked on the last-6-char key — ONE
    co-hash shuffle, per-block batched Levenshtein DP (numpy across
    all pairs, no per-pair Python)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.fuzzy import fuzzy_join

    cust = _read(sf_dir, "customer", ["c_name"])
    pert = cust.map_batches(
        lambda t: pa.table(
            {
                "p_name": pc.replace_substring(
                    t.column("c_name").combine_chunks(), "m", "n"
                )
            }
        ),
        batch_format="pyarrow",
    )
    return fuzzy_join(
        cust, pert, "c_name", "p_name",
        max_dist=2, block_last=6, num_partitions=8,
    )


SQL_FUZZY_NAMES_CUSTOMERS = """
WITH r AS (SELECT replace(c_name, 'm', 'n') AS p_name FROM customer)
SELECT c_name, p_name,
       CAST(levenshtein(c_name, p_name) AS BIGINT) AS dist
FROM customer JOIN r ON right(c_name, 6) = right(p_name, 6)
WHERE levenshtein(c_name, p_name) <= 2
"""


def q_json_props_events(sf_dir: str) -> rd.Dataset:
    """Vectorized JSON field extraction (`stages.jsonx.
    json_extract_fields`: polars Rust JSON path match, map-only) from
    the events ``props`` payload column, composed with a grouped
    aggregate — the semi-structured-column ingestion shape."""
    from ..stages.groupagg import grouped_aggregate
    from ..stages.jsonx import json_extract_fields

    ev = json_extract_fields(
        _read(sf_dir, "events", ["event_type", "props"]),
        "props",
        {"k": ("$.k", "int64")},
    )
    return grouped_aggregate(
        ev,
        keys=["event_type"],
        aggs={"sum_k": ("k", "sum"), "n": ("k", "count")},
        num_partitions=4,
    )


SQL_JSON_PROPS_EVENTS = """
SELECT event_type,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(count(props->>'$.k') AS BIGINT) AS n
FROM events GROUP BY event_type
"""


def q_corr_docs(sf_dir: str) -> rd.Dataset:
    """Single-pass Pearson correlation between document length
    (n_chars) and whitespace token count (`stages.profile.pearson_corr`
    — six integer partials per block, exact Python-int fold, one fixed
    IEEE expression tree for the float so the SQL hash matches)."""
    import pandas as pd

    from ..stages.profile import pearson_corr

    def xy(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "x": df["n_chars"].astype("int64"),
                "y": df["text"].fillna("").str.count(r"\S+").astype("int64"),
            }
        )

    docs = _read(sf_dir, "documents", ["n_chars", "text"]).map_batches(
        xy, batch_format="pandas"
    )
    return pearson_corr(docs, "x", "y")


SQL_CORR_DOCS = r"""
WITH t AS (
  SELECT CAST(n_chars AS HUGEINT) AS x,
         CAST(len(regexp_extract_all(text, '\S+')) AS HUGEINT) AS y
  FROM documents
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM t
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
FROM m
"""


def q_uniform_k_docs(sf_dir: str) -> rd.Dataset:
    """EXACT-k deterministic uniform sample (`stages.sample.
    uniform_k_sample`): fmix32-hash-ranked, per-block prune + one tiny
    merge — no RNG, no full sort; bit-exact SQL twin."""
    from ..stages.sample import uniform_k_sample

    return uniform_k_sample(
        _read(sf_dir, "documents", ["doc_id", "lang"]), k=12, seed=7
    )


SQL_UNIFORM_K_DOCS = f"""
SELECT doc_id, lang, smp_h FROM (
{_FMIX32_SQL.format(key="doc_id", seed=7, src="(SELECT doc_id, lang FROM documents)")}
) ORDER BY smp_h, doc_id LIMIT 12
"""


def q_per_lang_k_docs(sf_dir: str) -> rd.Dataset:
    """Exact k-PER-GROUP deterministic sample (`stages.sample.
    grouped_k_sample`): 3 docs per language, hash-ranked — block-wise
    per-group prune, ONE keyed shuffle, exact per-group head."""
    from ..stages.sample import grouped_k_sample

    return grouped_k_sample(
        _read(sf_dir, "documents", ["doc_id", "lang"]),
        k=3, group_col="lang", seed=7, num_partitions=8,
    )


SQL_PER_LANG_K_DOCS = f"""
SELECT doc_id, lang, smp_h FROM (
{_FMIX32_SQL.format(key="doc_id", seed=7, src="(SELECT doc_id, lang FROM documents)")}
)
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY smp_h, doc_id) <= 3
"""


def q_importance_sample_docs(sf_dir: str) -> rd.Dataset:
    """Per-ROW importance sampling: longer documents keep with higher
    probability (rate = min(1, n_chars/2000)); deterministic fmix32
    threshold, map-only, bit-exact SQL twin (floor, not round — SQL
    ROUND is half-away-from-zero, Python round is banker's)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.sample import score_sample

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    rated = docs.map_batches(
        lambda t: t.append_column(
            "rate",
            pc.min_element_wise(
                pa.scalar(1.0, pa.float64()),
                pc.divide(
                    t.column("n_chars").cast(pa.float64()),
                    pa.scalar(2000.0, pa.float64()),
                ),
            ),
        ),
        batch_format="pyarrow",
    )
    return score_sample(rated, "rate", key_col="doc_id", seed=11).map_batches(
        lambda t: t.select(["doc_id", "n_chars"]), batch_format="pyarrow"
    )


SQL_IMPORTANCE_SAMPLE_DOCS = f"""
SELECT doc_id, n_chars FROM (
{_FMIX32_SQL.format(key="doc_id", seed=11, src="documents")}
) WHERE smp_h % 1000000 <
        CAST(FLOOR(LEAST(1.0, n_chars / 2000.0) * 1000000) AS BIGINT)
"""


def q_stratified_sample_docs(sf_dir: str) -> rd.Dataset:
    """Per-language sampling rates (corpus rebalancing), still map-only."""
    from ..stages.sample import stratified_sample

    return stratified_sample(
        _read(sf_dir, "documents", ["doc_id", "lang"]),
        rates={"en": 0.5, "de": 0.1},
        group_col="lang",
        default_rate=0.2,
        seed=7,
    )


SQL_STRATIFIED_SAMPLE_DOCS = f"""
SELECT doc_id, lang FROM (
{_FMIX32_SQL.format(key="doc_id", seed=7, src="documents")}
) WHERE smp_h % 1000000 <
    CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 100000 ELSE 200000 END
"""


def q_mix_docs_sources(sf_dir: str) -> rd.Dataset:
    """Weighted mixture of two sub-corpora (80% of src0-4, 30% of
    src5-9) — per-source seeds keep the keep decisions independent."""
    from ..stages.sample import mix_corpora

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    a = docs.filter(
        expr="source in ['src0', 'src1', 'src2', 'src3', 'src4']"
    )
    b = docs.filter(
        expr="source in ['src5', 'src6', 'src7', 'src8', 'src9']"
    )
    return mix_corpora([(a, 0.8), (b, 0.3)], seed=0)


SQL_MIX_DOCS_SOURCES = f"""
SELECT doc_id, source FROM (
{_FMIX32_SQL.format(key="doc_id", seed=0, src="documents")}
) WHERE source IN ('src0','src1','src2','src3','src4')
  AND smp_h % 1000000 < 800000
UNION ALL
SELECT doc_id, source FROM (
{_FMIX32_SQL.format(key="doc_id", seed=1, src="documents")}
) WHERE source IN ('src5','src6','src7','src8','src9')
  AND smp_h % 1000000 < 300000
"""


def _fixed_centroids(sf_dir: str, n: int = 4) -> "np.ndarray":
    """The first ``n`` embedding vectors, ORDERED by vec_id, as a fixed
    centroid matrix — centroid row index == vec_id, so the SQL twin can
    name clusters by vec_id."""
    ids, m = _query_vectors(sf_dir, n)
    return m[np.argsort(ids)]


def q_kmeans_assign_fixed(sf_dir: str) -> rd.Dataset:
    """Nearest-centroid assignment under FIXED centroids (the exactly
    reproducible half of k-means — the Lloyd's fit is float-order
    dependent and checked by pytest instead): every embedding joins its
    most-cosine-similar centroid (ties to the lowest id), then a grouped
    count per cluster. Map-only assignment against broadcast centroids +
    one tiny aggregate."""
    from ..stages.cluster import cluster_sizes, kmeans_assign

    assigned = kmeans_assign(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        _fixed_centroids(sf_dir, 4),
        spherical=True,
        drop_vec=True,
    )
    return cluster_sizes(assigned, num_partitions=4)


SQL_KMEANS_ASSIGN_FIXED = """
WITH c AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
  FROM embeddings WHERE vec_id < 4
),
s AS (
  SELECT e.vec_id, c.cid,
         list_cosine_similarity(c.ce, e.embedding::DOUBLE[]) AS sim
  FROM embeddings e CROSS JOIN c
),
r AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rnk
  FROM s
)
SELECT cid AS cluster, count(*) AS n FROM r WHERE rnk = 1 GROUP BY cid
"""


def q_kmeans_embeddings(sf_dir: str) -> rd.Dataset:
    """Full distributed k-means (Lloyd's over the whole corpus with
    per-block combiner partials) + assignment + cluster sizes — rows-only
    (float-sum order makes refits differ in last ulps; blob-recovery
    exactness is pinned by tests/test_stages.py::test_kmeans_blobs)."""
    from ..stages.cluster import cluster_sizes, kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # iters=2: each Lloyd pass is a full corpus scan + k×D driver fold;
    # two passes exercise the iterate-and-refit path at a fraction of
    # the verification-window cost (full-convergence exactness is the
    # pytest blob test's job, not the driver's)
    c = kmeans_fit(ds, k=8, iters=2, seed=0x5EED_0011)
    return cluster_sizes(
        kmeans_assign(ds, c, drop_vec=True), num_partitions=4
    )


def q_cluster_sample_embeddings(sf_dir: str) -> rd.Dataset:
    """Cluster-balanced corpus subsetting: assign to fixed centroids,
    then keep a deterministic ~120 rows per cluster via the fmix32
    stratified sampler — the semantic-balancing op a pretraining mixture
    needs. Rows-only (the composition is deterministic but the
    per-cluster rate threshold arithmetic is pinned by the
    sample_docs/stratified oracles instead)."""
    from ..stages.cluster import cluster_balanced_sample

    return cluster_balanced_sample(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        _fixed_centroids(sf_dir, 4),
        target_per_cluster=120,
        key_col="vec_id",
    ).select_columns(["vec_id", "cluster"])


def q_pagerank_docs(sf_dir: str) -> rd.Dataset:
    """Distributed PageRank over the deterministic doc-tree edges
    (``doc_id → doc_id // 2``, the path_reach graph) — link-authority
    weighting for sampling. Rows-only (float power iterations are
    block-order dependent in the last ulps; numpy-reference equality to
    1e-9 is pinned by tests/test_stages.py::test_pagerank_power_iteration)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.pagerank import pagerank

    docs = _read(sf_dir, "documents", ["doc_id"])
    edges = docs.map_batches(
        lambda t: (
            lambda s: pa.table(
                {
                    "src": s.column("doc_id"),
                    "dst": pc.divide(s.column("doc_id"), 2),
                }
            )
        )(t.filter(pc.greater(t.column("doc_id"), 0))),
        batch_format="pyarrow",
    )
    # small iteration budget + few partitions: per-round cost at test
    # scale is shuffle fixed overhead (aggregator actor spin-up), not
    # data; 3 rounds already rank the depth-~16 tree distinctly and keep
    # the entry inside the driver's per-round verification budget
    return pagerank(edges, damping=0.85, iters=3, num_partitions=4)


def q_neardup_embeddings_approx(sf_dir: str) -> rd.Dataset:
    """IVF bucket-and-verify approximate near-dup pairs — the
    sub-quadratic scale path of neardup_embeddings; rows-only check
    (k-means buckets are not SQL-expressible; recall vs the exact pairs
    is pinned by tests/test_stages.py::test_neardup_approx_recall)."""
    from ..stages.similarity import embedding_neardup_pairs_approx

    return embedding_neardup_pairs_approx(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), tau=0.46,
        nlist=16, nprobe=4,
    )




def q_oov_rate_docs(sf_dir: str) -> rd.Dataset:
    """Vocabulary-coverage quality signal: per-doc OOV token count/rate
    against the corpus's own top-16 unigram vocabulary (two passes:
    combiner-first vocab build + broadcast top-k set, then a map-only
    score — see ``stages/vocab.oov_stats``)."""
    from ..stages.vocab import oov_stats

    return oov_stats(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        vocab_k=16,
        num_partitions=16,
    )


SQL_OOV_RATE_DOCS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
  FROM documents
),
cnt AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
vocab AS (SELECT term FROM cnt ORDER BY c DESC, term LIMIT 16)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN term NOT IN (SELECT term FROM vocab)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(sum(CASE WHEN term NOT IN (SELECT term FROM vocab)
                THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS oov_rate
FROM toks GROUP BY doc_id
"""


def q_shared_shingle_docs(sf_dir: str) -> rd.Dataset:
    """Cross-document duplication: per-doc count/rate of distinct
    3-gram shingles that appear in other docs too (C4-style duplicated-
    span signal; see ``stages/dedup.shared_shingle_stats``)."""
    from ..stages.dedup import shared_shingle_stats

    return shared_shingle_stats(
        _read(sf_dir, "documents", ["doc_id", "text"]), n=3,
        num_partitions=16,
    )


SQL_SHARED_SHINGLE_DOCS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS s
  FROM toks, unnest(generate_series(1, len(w) - 2)) AS u(g)
),
cnt AS (SELECT s, count(*) AS df FROM sh GROUP BY 1)
SELECT doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS shared_rate
FROM sh JOIN cnt USING (s) GROUP BY doc_id
"""


def q_zscore_docs(sf_dir: str) -> rd.Dataset:
    """Z-score feature scaling of the integer n_chars column (exact
    integer moments, fixed IEEE op sequence — see
    ``stages/profile.zscore_column``)."""
    from ..stages.profile import zscore_column

    return zscore_column(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        col="n_chars",
        id_cols=["doc_id"],
    )


SQL_ZSCORE_DOCS = """
WITH stats AS (
  SELECT CAST(sum(n_chars) AS DOUBLE) AS s,
         CAST(sum(n_chars * n_chars) AS DOUBLE) AS ss,
         CAST(count(n_chars) AS DOUBLE) AS n
  FROM documents
),
m AS (SELECT s / n AS mean, sqrt(ss / n - (s / n) * (s / n)) AS std
      FROM stats)
SELECT doc_id, n_chars,
       (CAST(n_chars AS DOUBLE) - mean) / std AS z
FROM documents, m
"""


def q_funnel_events(sf_dir: str) -> rd.Dataset:
    """Two-step funnel (view → purchase within 1 h) per user: one keyed
    shuffle + per-user searchsorted match (the SQL twin's a×b self-join
    is quadratic per user — exactly what the native operator avoids)."""
    from ..stages.sessions import funnel_conversion

    return funnel_conversion(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        step_a="view",
        step_b="purchase",
        within_s=3600.0,
        num_partitions=16,
    )


SQL_FUNNEL_EVENTS = """
WITH conv AS (
  SELECT DISTINCT a.user_id
  FROM events a JOIN events b USING (user_id)
  WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
)
SELECT user_id,
  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_a,
  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_b,
  CAST(user_id IN (SELECT user_id FROM conv) AS BIGINT) AS converted
FROM events GROUP BY user_id
"""


def q_cohort_events(sf_dir: str) -> rd.Dataset:
    """Cohort retention matrix (first-event month × active month →
    distinct users): one user-keyed shuffle emitting per-user month
    pairs (the combiner), then a tiny grouped count."""
    from ..stages.sessions import cohort_retention

    return cohort_retention(
        _read(sf_dir, "events", ["user_id", "ts"]), num_partitions=16
    )


SQL_COHORT_EVENTS = """
WITH first AS (
  SELECT user_id, date_trunc('month', min(ts)) AS cohort_month
  FROM events GROUP BY 1
),
act AS (
  SELECT DISTINCT user_id, date_trunc('month', ts) AS active_month
  FROM events
)
SELECT cohort_month, active_month, count(*) AS n_users
FROM first JOIN act USING (user_id)
GROUP BY 1, 2
"""


def q_postings_docs(sf_dir: str) -> rd.Dataset:
    """Inverted index over the corpus: term → document frequency +
    comma-joined sorted posting list (distinct per-batch (doc, term)
    pairs, one term-keyed shuffle)."""
    from ..stages.vocab import inverted_index

    return inverted_index(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_df=2,
        num_partitions=16,
    )


SQL_POSTINGS_DOCS = r"""
WITH pairs AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
)
SELECT term, count(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY term
HAVING count(*) >= 2
"""
