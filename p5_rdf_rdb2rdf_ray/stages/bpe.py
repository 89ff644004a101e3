"""Distributed BPE (byte-pair-encoding) vocabulary learning [brief
extension; not in the reference — the tokenizer-training op of a
training-data pipeline].

The classic trick makes this tractable at corpus scale: BPE statistics
depend only on the DISTINCT-WORD frequency table, so the corpus is
touched exactly ONCE (a combiner-first token count); every merge round
then runs over the word table — orders of magnitude smaller, and still
a distributed Dataset (web-scale corpora have ~10⁸ distinct words;
nothing collects on the driver except the per-round top pairs).

Round structure (rounds = ceil(num_merges / merges_per_round)):

1. pair counts — map over word-table blocks: each word's adjacent
   symbol pairs weighted by word frequency, pre-aggregated per block
   (the combiner), then a keyed shuffle + exact sum;
2. top pairs — the distributed ``top_k`` prune (count DESC, pair ASC
   for deterministic ties) → ≤ ``merges_per_round`` rows on the driver;
   of those, only mutually NON-INTERACTING pairs apply together (no
   shared symbol — applying (a,b) cannot change (c,d)'s count). This is
   the standard batched-BPE approximation: it can defer a merge
   involving a freshly created symbol by one round, which sequential
   BPE would take immediately;
3. apply — map-only rewrite of each word's symbol sequence, then
   materialize (+ stats-lineage cut) so the next round starts from
   blocks.

The per-word symbol rewrite is a Python loop over DISTINCT WORDS (the
vocabulary-sized derived table), never over corpus rows — the same
documented scale assumption as the exact-quantile histogram. With
``merges_per_round=1`` the learned merge sequence equals the textbook
sequential algorithm exactly (pinned by pytest).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..engine.distinct import cut_stats_lineage, ensure_hash_shuffle, to_clean_arrow


def _pairs_of(syms: list[str]) -> zip:
    return zip(syms[:-1], syms[1:])


def learn_bpe(
    ds: rd.Dataset,
    num_merges: int = 32,
    merges_per_round: int = 8,
    text_col: str = "text",
    min_freq: int = 2,
    lowercase: bool = True,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges → DataFrame
    ``(rank:int64, left:string, right:string, freq:int64)`` in merge
    order. Words are whitespace tokens split to characters (no
    end-of-word marker — merges stay within words). Deterministic:
    ties break on (count DESC, left ASC, right ASC)."""
    if num_merges < 1 or merges_per_round < 1:
        raise ValueError("num_merges and merges_per_round must be >= 1")
    from .groupagg import grouped_aggregate, top_k
    from .vocab import ngram_counts

    # ONE corpus pass: the distinct-word frequency table
    words = ngram_counts(
        ds, n=1, text_col=text_col, min_count=min_freq,
        num_partitions=num_partitions, lowercase=lowercase,
    )

    def to_syms(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {
                    "syms": pa.array([], pa.list_(pa.string())),
                    "freq": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "syms": pa.array(
                    [list(w) for w in df["ngram"].astype(str)],
                    pa.list_(pa.string()),
                ),
                "freq": pa.array(df["count"].astype("int64")),
            }
        )

    table = words.map_batches(to_syms, batch_format="pandas").materialize()
    cut_stats_lineage(table)
    ensure_hash_shuffle(table)

    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges:
        def pair_counts(t: pa.Table) -> pa.Table:
            from collections import Counter

            c: Counter = Counter()
            if t.num_rows:
                freqs = t.column("freq").to_pylist()
                for syms, f in zip(t.column("syms").to_pylist(), freqs):
                    for pr in _pairs_of(syms):
                        c[pr] += f
            return pa.table(
                {
                    "left": pa.array([a for a, _ in c], pa.string()),
                    "right": pa.array([b for _, b in c], pa.string()),
                    "cnt": pa.array(list(c.values()), pa.int64()),
                }
            )

        counts = grouped_aggregate(
            table.map_batches(pair_counts, batch_format="pyarrow"),
            keys=["left", "right"],
            aggs={"cnt": ("cnt", "sum")},
            num_partitions=min(num_partitions, 8),
        )
        want = min(merges_per_round, num_merges - len(merges))
        cand = top_k(
            counts, ["cnt", "left", "right"], k=max(want * 4, want),
            descending=[True, False, False],
        ).to_pandas()
        if not len(cand):
            break  # vocabulary exhausted (every word is one symbol)
        # keep mutually NON-INTERACTING pairs (no shared symbol): their
        # counts are unaffected by each other's application
        chosen: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in cand.itertuples():
            if len(chosen) >= want:
                break
            if r.left in used or r.right in used:
                continue
            chosen.append((r.left, r.right, int(r.cnt)))
            used.update((r.left, r.right, r.left + r.right))
        if not chosen:
            break
        merges.extend(chosen)
        pairset = {(a, b): a + b for a, b, _ in chosen}

        def apply_merges(t: pa.Table, _m=dict(pairset)) -> pa.Table:
            out = []
            for syms in t.column("syms").to_pylist():
                i, res = 0, []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) in _m
                    ):
                        res.append(_m[(syms[i], syms[i + 1])])
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            return pa.table(
                {
                    "syms": pa.array(out, pa.list_(pa.string())),
                    "freq": t.column("freq"),
                }
            )

        table = table.map_batches(
            apply_merges, batch_format="pyarrow"
        ).materialize()
        cut_stats_lineage(table)

    return pd.DataFrame(
        {
            "rank": pd.Series(range(1, len(merges) + 1), dtype="int64"),
            "left": [a for a, _b, _c in merges],
            "right": [b for _a, b, _c in merges],
            "freq": pd.Series([c for _a, _b, c in merges], dtype="int64"),
        }
    )


def reference_bpe(
    word_freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Textbook sequential BPE (one merge per round) for tests: same
    tie-break (count DESC, pair ASC)."""
    from collections import Counter

    table = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        c: Counter = Counter()
        for w, syms in table.items():
            f = word_freqs[w]
            for pr in _pairs_of(syms):
                c[pr] += f
        if not c:
            break
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        m = {best: best[0] + best[1]}
        for w, syms in table.items():
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) in m:
                    res.append(m[(syms[i], syms[i + 1])])
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            table[w] = res
    return merges


class _BpeEncoder:
    """Actor-pool BPE tokenizer: the learned merge table is built into
    a rank dict ONCE per actor (``__init__`` receives the broadcast
    object-ref — `ray.put` once, read per actor, never re-shipped per
    batch); ``__call__`` encodes a batch with a per-actor word cache
    (corpora are Zipfian — the hot words hit the cache, so the greedy
    per-word merge loop runs once per DISTINCT word per actor)."""

    def __init__(self, merges_ref, text_col: str, lowercase: bool):
        import ray

        merges = ray.get(merges_ref)
        self.ranks = {
            (l, r): i
            for i, (l, r) in enumerate(
                zip(merges["left"], merges["right"])
            )
        }
        self.text_col = text_col
        self.lowercase = lowercase
        self.cache: dict[str, list[str]] = {}

    def _encode_word(self, w: str) -> list[str]:
        hit = self.cache.get(w)
        if hit is not None:
            return hit
        syms = list(w)
        ranks = self.ranks
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            # merge EVERY occurrence of the chosen pair (rank order ==
            # learn order, matching learn_bpe's apply_merges pass)
            pair = (syms[best], syms[best + 1])
            i, res = 0, []
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == pair
                ):
                    res.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        if len(self.cache) < 500_000:  # bound actor heap
            self.cache[w] = syms
        return syms

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        counts, firsts = [], []
        for txt in texts:
            txt = (txt or "")
            if self.lowercase:
                txt = txt.lower()
            n = 0
            first: list[str] = []
            for w in txt.split():
                toks = self._encode_word(w)
                if len(first) < 8:
                    # first 8 tokens of the DOCUMENT, across words —
                    # not just the first word's tokens
                    first.extend(toks[: 8 - len(first)])
                n += len(toks)
            counts.append(n)
            firsts.append(first)
        out = t.drop_columns([self.text_col])
        out = out.append_column("n_tokens", pa.array(counts, pa.int64()))
        return out.append_column(
            "head_tokens", pa.array(firsts, pa.list_(pa.string()))
        )


def bpe_encode(
    ds: rd.Dataset,
    merges: pd.DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    concurrency: int = 4,
) -> rd.Dataset:
    """Tokenize a corpus with a LEARNED merge table (the apply half of
    :func:`learn_bpe` — a training pipeline learns once, then encodes
    every shard): → Dataset(input cols minus ``text_col``, n_tokens,
    head_tokens). Merge table broadcast via ``ray.put``; encoding is an
    actor pool so the rank dict builds once per actor."""
    import ray

    ref = ray.put(
        {
            "left": list(merges["left"].astype(str)),
            "right": list(merges["right"].astype(str)),
        }
    )
    return ds.map_batches(
        _BpeEncoder,
        fn_constructor_args=(ref, text_col, lowercase),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
