"""Text-analysis stages for training-data pipelines (graft extensions).

All are stateless, vectorized ``map_batches`` transforms over a text column:
token counting, quality features, document fingerprinting, and a
deterministic n-gram/stopword language-ID heuristic (actor-pool stage: the
language profiles are built once per actor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

TOKEN_RX = r"\S+"
# BPE-ish subword split: words, numbers, punctuation runs (public GPT-2-style
# pattern simplified to what `re`/pandas supports)
BPE_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_counts(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """→ (id_col, n_tokens:int64, n_bpe_tokens:int64)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("")
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_tokens": s.str.count(TOKEN_RX).astype("int64"),
                "n_bpe_tokens": s.str.count(BPE_RX).astype("int64"),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def quality_features(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """→ (id_col, n_chars, n_words, n_uniq_words, punct_ratio, stop_ratio).

    Ratios are exact rational divisions of int counts — deterministic and
    reproducible in SQL for the oracle compare.
    """
    stop = {"the", "a", "and", "of", "to", "in", "is", "it"}

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("")
        words = s.str.findall(TOKEN_RX)
        n_words = words.str.len().astype("int64")
        n_uniq = words.map(lambda w: len(set(w))).astype("int64")
        n_stop = words.map(lambda w: sum(1 for x in w if x in stop)).astype("int64")
        n_chars = s.str.len().astype("int64")
        n_punct = s.str.count(r"[^\w\s]").astype("int64")
        nz = n_words.replace(0, 1)
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_chars": n_chars,
                "n_words": n_words,
                "n_uniq_words": n_uniq,
                "punct_ratio": n_punct / n_chars.replace(0, 1),
                "stop_ratio": n_stop / nz,
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def fingerprints(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """→ (id_col, fp:string) — md5 content fingerprint (matches SQL md5())."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        fp = df[text_col].fillna("").map(
            lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
        )
        return pd.DataFrame({id_col: df[id_col], "fp": fp})

    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# language ID — deterministic stopword/character profiles, actor pool


_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"},
    "fr": {"le", "la", "et", "de", "un", "une", "est", "dans", "que", "pour"},
    "es": {"el", "la", "y", "de", "un", "una", "es", "en", "que", "por"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
    "zh": set(),  # CJK detected by codepoint range
}


class LanguageID:
    """Actor-pool stage: profiles compiled once per actor in ``__init__``
    (stands in for loading a fasttext-style model), vectorized batch
    scoring in ``__call__`` (polars tokenize/explode + per-language
    stopword hits; CJK by codepoint-range regex — no per-row Python).
    Deterministic: ties broken by language code order; no signal → the
    first language alphabetically among the zero-score ties ('de')."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.profiles = sorted(
            (lang, prof) for lang, prof in _PROFILES.items() if prof
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    self.id_col: batch.column(self.id_col),
                    "pred_lang": pa.array([], pa.string()),
                }
            )
        texts = pl.Series("t", batch.column(self.text_col)).fill_null("")
        is_cjk = texts.str.contains(r"[一-鿿]").to_numpy()
        # distinct lowercase tokens per row → per-language hit counts
        e = (
            pl.DataFrame(
                {"r": pl.int_range(0, n, eager=True), "t": texts.str.to_lowercase()}
            )
            .with_columns(pl.col("t").str.extract_all(r"\S+"))
            .explode("t")
            .drop_nulls()
            .unique()
        )
        scores = np.zeros((n, len(self.profiles)), np.int64)
        rows = e["r"].to_numpy()
        for li, (_lang, prof) in enumerate(self.profiles):
            hit = e["t"].is_in(list(prof)).to_numpy()
            np.add.at(scores[:, li], rows[hit], 1)
        best = np.argmin(-scores, axis=1)  # argmax, first (alphabetical) tie
        langs = np.array([l for l, _ in self.profiles])
        preds = langs[best]
        preds[is_cjk] = "zh"
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "pred_lang": pa.array(preds.tolist(), pa.string()),
            }
        )


def language_id(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> rd.Dataset:
    return ds.map_batches(
        LanguageID,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def winnow_fingerprints(
    ds: rd.Dataset,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Winnowing document fingerprints (Schleimer et al. 2003): rolling
    Rabin-Karp hashes of k-grams, one minimum per window of w — the
    classic near-dup/plagiarism sketch. → (id_col, n_fp, fp_xor) summary
    (fp_xor = order-insensitive digest of the selected fingerprints)."""
    B = np.uint64(1000003)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids, n_fp, fp_xor = [], [], []
        for i, t in zip(df[id_col], df[text_col].fillna("")):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            if len(b) < k:
                ids.append(i); n_fp.append(0); fp_xor.append(0)
                continue
            # vectorized rolling polynomial hash over all k-grams
            powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
            h = (win * powers).sum(axis=1)  # wraparound mod 2^64
            if len(h) >= w:
                mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
            else:
                mins = np.array([h.min()], np.uint64)
            sel = np.unique(mins)
            ids.append(i)
            n_fp.append(len(sel))
            fp_xor.append(int(np.bitwise_xor.reduce(sel)) - 2**63)
        return pd.DataFrame(
            {id_col: ids, "n_fp": pd.array(n_fp, "int64"),
             "fp_xor": pd.array(fp_xor, "int64")}
        )

    return ds.map_batches(f, batch_format="pandas")
