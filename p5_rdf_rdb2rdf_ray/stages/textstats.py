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


def redact_text(
    ds: rd.Dataset,
    patterns: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str | None = None,
) -> rd.Dataset:
    """Sequential regex redaction — the PII-style scrub pass every
    training corpus runs (emails/ids/numbers → placeholder tokens).
    Map-only, no shuffle; the whole batch goes through polars
    ``str.replace_all`` (Rust regex, compiled once per pattern, no
    per-row Python).

    ``patterns`` apply IN ORDER — earlier replacements are visible to
    later patterns, exactly like nested SQL ``regexp_replace(…, 'g')``.
    Keep patterns to the RE2-compatible subset with EXPLICIT ASCII
    classes (``[0-9]`` not ``\\d`` — Rust regex makes ``\\d`` Unicode,
    RE2/DuckDB keep it ASCII) so SQL twins agree byte-for-byte.
    ``out_col`` defaults to replacing ``text_col`` in place."""
    out = out_col or text_col

    def f(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        expr = pl.col("t")
        for pat, rep in patterns:
            expr = expr.str.replace_all(pat, rep)
        red = (
            pl.DataFrame(
                {"t": pl.from_pandas(df[text_col], include_index=False)}
            )
            .select(r=expr)["r"]
            .to_pandas()
        )
        df[out] = red.set_axis(df.index)
        return df

    return ds.map_batches(f, batch_format="pandas")


def quality_features(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """→ (id_col, n_chars, n_words, n_uniq_words, punct_ratio, stop_ratio).

    Ratios are exact rational divisions of int counts — deterministic and
    reproducible in SQL for the oracle compare.
    """
    stop = ["the", "a", "and", "of", "to", "in", "is", "it"]

    def f(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        s = df[text_col].fillna("")
        # token stats fully in polars (Rust list kernels, no per-row Python)
        tok = pl.col("t").str.extract_all(TOKEN_RX)
        st = (
            pl.DataFrame({"t": pl.from_pandas(s, include_index=False)})
            .select(
                n_words=tok.list.len().cast(pl.Int64),
                n_uniq=tok.list.n_unique().cast(pl.Int64),
                n_stop=tok.list.eval(
                    pl.element().is_in(stop).cast(pl.Int64)
                ).list.sum().fill_null(0).cast(pl.Int64),
            )
        )
        n_words = pd.Series(st["n_words"].to_numpy(), index=df.index)
        n_uniq = pd.Series(st["n_uniq"].to_numpy(), index=df.index)
        n_stop = pd.Series(st["n_stop"].to_numpy(), index=df.index)
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
            .explode("t", empty_as_null=True)
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
    if k < 2:
        # the whole-batch boundary masking relies on the k-1 invalid
        # k-gram positions between consecutive docs; with k=1 there are
        # none and windows would silently span documents
        raise ValueError("winnowing requires k >= 2")
    B = np.uint64(1000003)
    powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    swv = np.lib.stride_tricks.sliding_window_view

    def f(df: pd.DataFrame) -> pd.DataFrame:
        """One vectorized pass over the WHOLE batch (no per-doc loop):
        all docs' bytes are concatenated, the rolling k-gram hash runs
        once over the buffer, and windows that cross a doc boundary are
        masked out (any such window contains an invalid k-gram position —
        there are k-1 of them between consecutive docs)."""
        n = len(df)
        ids = df[id_col].to_numpy()
        n_fp = np.zeros(n, np.int64)
        fp_xor = np.zeros(n, np.int64)
        enc = [t.encode("utf-8") for t in df[text_col].fillna("")]
        lens = np.array([len(b) for b in enc], np.int64)
        buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
        M = len(buf)
        if M >= k:
            ends = lens.cumsum()
            h = (swv(buf, k).astype(np.uint64) * powers).sum(axis=1)
            pos = np.arange(M - k + 1)
            doc_of = np.searchsorted(ends, pos, side="right")
            valid = (pos + k) <= ends[doc_of]
            # full windows of w consecutive valid positions (⇒ same doc)
            if len(h) >= w:
                wins_ok = swv(valid, w).all(axis=1)
                sel_doc = doc_of[: len(h) - w + 1][wins_ok]
                sel_min = swv(h, w).min(axis=1)[wins_ok]
            else:
                sel_doc = np.array([], np.int64)
                sel_min = np.array([], np.uint64)
            # docs with 0 < #positions < w: single min over their k-grams
            vd, vh = doc_of[valid], h[valid]
            if len(vd):
                st = np.flatnonzero(np.r_[True, vd[1:] != vd[:-1]])
                cnt = np.diff(np.r_[st, len(vd)])
                small = cnt < w
                if small.any():
                    sel_doc = np.r_[sel_doc, vd[st][small]]
                    sel_min = np.r_[sel_min, np.minimum.reduceat(vh, st)[small]]
            if len(sel_doc):
                # unique mins per doc, then segmented count + xor digest
                order = np.lexsort((sel_min, sel_doc))
                d2, m2 = sel_doc[order], sel_min[order]
                keep = np.r_[True, (d2[1:] != d2[:-1]) | (m2[1:] != m2[:-1])]
                d3, m3 = d2[keep], m2[keep]
                seg = np.flatnonzero(np.r_[True, d3[1:] != d3[:-1]])
                n_fp[d3[seg]] = np.diff(np.r_[seg, len(d3)])
                # x - 2**63 (the signed bit-flip) vectorized
                fp_xor[d3[seg]] = (
                    np.bitwise_xor.reduceat(m3, seg) ^ np.uint64(1 << 63)
                ).view(np.int64)
        return pd.DataFrame(
            {id_col: ids, "n_fp": n_fp, "fp_xor": fp_xor}
        )

    return ds.map_batches(f, batch_format="pandas")


def repetition_stats(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Gopher-style repetition quality signals, one row per doc:
    ``n_lines``, ``dup_line_frac`` (1 − distinct/total lines) and
    ``top_bigram_frac`` (most frequent word bigram's share of all
    bigrams; 0.0 for docs with < 2 tokens). High values flag boilerplate
    and degenerate repetition. Whole-batch vectorized: polars line
    split / token explode + one group_by per batch, no per-doc Python
    [brief extension; repetition filters per Rae et al. 2021 (Gopher)].
    """

    def f(df: pd.DataFrame) -> pa.Table:
        import polars as pl

        n = len(df)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "dup_line_frac": pa.array([], pa.float64()),
                    "top_bigram_frac": pa.array([], pa.float64()),
                }
            )
        texts = pl.Series("t", df[text_col].fillna("").astype(str))
        lines = pl.DataFrame({"t": texts}).with_columns(
            pl.col("t").str.split("\n")
        )
        n_lines = lines["t"].list.len().to_numpy().astype(np.int64)
        n_uniq = lines["t"].list.n_unique().to_numpy().astype(np.int64)
        dup_frac = 1.0 - n_uniq / n_lines

        # word bigram counts: token hash + within-row rolling combine,
        # then (row, bigram-hash) → count → per-row max/sum
        e = (
            pl.DataFrame(
                {
                    "r": pl.Series(np.arange(n, dtype=np.int64)),
                    "t": texts,
                }
            )
            .with_columns(pl.col("t").str.extract_all(r"\S+"))
            .explode("t", empty_as_null=True)
        )
        h = e["t"].hash(seed=0).to_numpy().astype(np.uint64)
        valid = e["t"].is_not_null().to_numpy()
        rows = e["r"].to_numpy()
        m = len(e)
        nxt = np.zeros(m, np.uint64)
        ok = np.zeros(m, bool)
        if m > 1:
            nxt[:-1] = h[1:]
            ok[:-1] = (rows[1:] == rows[:-1]) & valid[1:] & valid[:-1]
        bh = h * np.uint64(1000003) + nxt
        top_frac = np.zeros(n, np.float64)
        if ok.any():
            per = (
                pl.DataFrame({"r": rows[ok], "bh": bh[ok]})
                .group_by(["r", "bh"])
                .len()
                .group_by("r")
                .agg(
                    pl.col("len").max().alias("mx"),
                    pl.col("len").sum().alias("tot"),
                )
            )
            rr = per["r"].to_numpy()
            top_frac[rr] = per["mx"].to_numpy() / per["tot"].to_numpy()
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
                "n_lines": pa.array(n_lines),
                "dup_line_frac": pa.array(dup_frac),
                "top_bigram_frac": pa.array(top_frac),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def normalize_text(
    ds: rd.Dataset,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    lowercase: bool = True,
    collapse_ws: bool = True,
) -> rd.Dataset:
    """Unicode text canonicalization — the first pass of every corpus
    cleaner (NFC so byte-different equal strings dedup together, then
    optional lowercase + whitespace collapse/trim). Lower/collapse are
    Arrow kernels; normalization is HYBRID: ASCII rows (the bulk of
    most corpora) are NFC-invariant and skip it entirely, only rows
    containing non-ASCII take the per-value ``unicodedata.normalize``
    path — pyarrow 16.1's ``utf8_normalize(form="NFC")`` does NOT
    compose combining sequences (``e`` + U+0301 stays decomposed), so
    it cannot be used: DuckDB's ``nfc_normalize`` composes, and the
    byte-exact oracle contract is the point. The identical transform
    is ANSI-SQL-expressible (``nfc_normalize``/``lower``/
    ``regexp_replace(…, 'g')``/``trim``), so oracle-checkable
    byte-for-byte. ``out_col`` defaults to replacing ``text_col``."""
    import unicodedata

    import pyarrow as _pa
    import pyarrow.compute as _pc

    out = out_col or text_col

    def _nfc(arr):
        # only rows that actually contain non-ASCII pay the Python
        # normalize (the N-Triples escaper's escape-hatch pattern)
        nonascii = _pc.fill_null(
            _pc.match_substring_regex(arr, r"[^\x00-\x7F]"), False
        )
        if not _pc.any(nonascii).as_py():
            return arr
        vals = arr.to_pylist()
        mask = nonascii.to_pylist()
        return _pa.array(
            [
                unicodedata.normalize(form, v)
                if (m and v is not None)
                else v
                for v, m in zip(vals, mask)
            ],
            _pa.string(),
        )

    def f(t: _pa.Table) -> _pa.Table:
        v = _nfc(t.column(text_col).combine_chunks())
        if lowercase:
            v = _pc.utf8_lower(v)
        if collapse_ws:
            v = _pc.utf8_trim_whitespace(
                _pc.replace_substring_regex(v, r"\s+", " ")
            )
        if out in t.column_names:
            t = t.set_column(t.schema.get_field_index(out), out, v)
        else:
            t = t.append_column(out, v)
        return t

    return ds.map_batches(f, batch_format="pyarrow")
