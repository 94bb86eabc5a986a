"""Actor-pool text-analysis stage over the documents table.

Regexes and language profiles compile once per actor (``__init__``);
each batch is scored in ``__call__`` — the canonical stateful
``map_batches(Cls, concurrency=N)`` pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class TextAnalyzer:
    """documents(text, ...) -> + lang_pred, lang_score, token counts,
    quality features, fingerprint."""

    def __init__(self, features=("lang", "tokens", "quality", "fingerprint")):
        # import here so regex compilation happens once per actor
        from grass_ray.functions import textstats as T

        self.T = T
        self.features = set(features)

    def __call__(self, batch: pa.Table) -> pa.Table:
        T = self.T
        texts = batch.column("text").to_pylist()
        out = dict(zip(batch.column_names, batch.columns))
        if not texts:
            feats = self.features
            empty_cols = []
            if "lang" in feats:
                empty_cols += [("lang_pred", pa.string()), ("lang_score", pa.float64())]
            if "tokens" in feats:
                empty_cols += [("n_tok_ws", pa.int64()), ("n_tok_bpe", pa.int64())]
            if "quality" in feats:
                empty_cols += [("n_words", pa.int64())] + [
                    (k, pa.float64())
                    for k in (
                        "mean_word_len", "punct_ratio", "stopword_ratio",
                        "alpha_ratio", "unique_word_ratio", "quality_score",
                    )
                ]
            if "repetition" in feats:
                empty_cols += [
                    (k, pa.float64())
                    for k in (
                        "top_word_frac", "dup_bigram_frac", "dup_trigram_frac",
                    )
                ]
            if "fingerprint" in feats:
                empty_cols += [("fingerprint", pa.int64())]
            for k, typ in empty_cols:
                out[k] = pa.array([], type=typ)
            return pa.table(out)
        # one vectorized pass over the batch (parity-tested against the
        # per-row reference functions)
        b = T.analyze_batch(texts, features=tuple(self.features))
        if "lang" in self.features:
            out["lang_pred"] = pa.array(b["lang_pred"].tolist(), type=pa.string())
            out["lang_score"] = pa.array(b["lang_score"], type=pa.float64())
        if "tokens" in self.features:
            out["n_tok_ws"] = pa.array(b["n_tok_ws"], type=pa.int64())
            out["n_tok_bpe"] = pa.array(b["n_tok_bpe"], type=pa.int64())
        if "quality" in self.features:
            out["n_words"] = pa.array(b["n_words"], type=pa.int64())
            for k in (
                "mean_word_len",
                "punct_ratio",
                "stopword_ratio",
                "alpha_ratio",
                "unique_word_ratio",
                "quality_score",
            ):
                out[k] = pa.array(b[k], type=pa.float64())
        if "repetition" in self.features:
            for k in ("top_word_frac", "dup_bigram_frac", "dup_trigram_frac"):
                out[k] = pa.array(b[k], type=pa.float64())
        if "fingerprint" in self.features:
            out["fingerprint"] = pa.array(b["fingerprint"], type=pa.int64())
        return pa.table(out)


_ANALYZERS: dict = {}


def _analyze_kernel(batch: pa.Table, features) -> pa.Table:
    """Task-pool kernel: per-worker-process memoized TextAnalyzer (the
    compiled-regex state lives at module scope and Ray worker processes
    persist across tasks, so setup happens once per process without the
    actor-pool's spin-up cost or its concurrency cap)."""
    key = tuple(sorted(features))
    a = _ANALYZERS.get(key)
    if a is None:
        a = _ANALYZERS.setdefault(key, TextAnalyzer(features))
    return a(batch)


def analyze_text(ds, features=("lang", "tokens", "quality", "fingerprint"), concurrency=None):
    feats = tuple(features)
    return ds.map_batches(
        lambda b: _analyze_kernel(b, feats),
        batch_format="pyarrow",
        batch_size=1024,
        **({"concurrency": concurrency} if concurrency else {}),
    )


#: default redaction patterns (RE2 syntax — identical semantics in
#: pyarrow and DuckDB): email, IPv4, long digit runs (ids/phones)
DEFAULT_SCRUB = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{7,}\b", "<NUM>"),
)


def scrub_text(
    ds,
    patterns=DEFAULT_SCRUB,
    *,
    text_col: str = "text",
    out_col: str | None = None,
    count_col: str = "n_redactions",
):
    """PII/noise redaction: replace every match of each (regex,
    replacement) pair and count redactions per document — one chained
    pass of Arrow's RE2 kernels per batch (`replace_substring_regex` +
    `count_substring_regex`), no Python per row.  RE2 is also DuckDB's
    regex engine, so the operator is exactly SQL-checkable."""
    import pyarrow.compute as pc

    out_col = out_col or text_col
    pats = tuple(patterns)

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        total = np.zeros(batch.num_rows, dtype=np.int64)
        for pat, _rep in pats:
            total += (
                pc.count_substring_regex(col, pat)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        for pat, rep in pats:
            col = pc.replace_substring_regex(col, pat, rep)
        cols = dict(zip(batch.column_names, batch.columns))
        cols[out_col] = col
        cols[count_col] = pa.array(total, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow")


def normalize_text(
    ds,
    *,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
    collapse_ws: bool = True,
    strip: bool = True,
):
    """Unicode + whitespace normalization (the C4/RefinedWeb cleanup
    step): canonical composition (``unicodedata.normalize`` — this
    build's ``pc.utf8_normalize`` is a NO-OP, it returns decomposed
    input unchanged for every form; the CPython UCD implementation
    matches DuckDB's utf8proc by the standard), ASCII-whitespace-run
    collapse (RE2 ``\\s+`` — DuckDB's regex engine too, so the oracle
    is bit-identical), and edge trim.  ASCII rows skip the per-row
    normalize entirely (``pc.string_is_ascii`` mask — web corpora are
    ASCII-dominated, so the hot path stays vectorized).  Adds
    ``out_col`` and a ``norm_changed`` flag; zero-shuffle map stage."""
    import unicodedata

    import pyarrow.compute as pc

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        is_ascii = pc.string_is_ascii(pc.fill_null(col, ""))
        if pc.min(is_ascii).as_py() is False:
            flags = is_ascii.to_numpy(zero_copy_only=False)
            n = pa.array(
                [
                    t if (t is None or f) else unicodedata.normalize(form, t)
                    for t, f in zip(col.to_pylist(), flags)
                ],
                type=pa.string(),
            )
        else:
            n = col
        if collapse_ws:
            n = pc.replace_substring_regex(n, pattern=r"\s+", replacement=" ")
        if strip:
            n = pc.utf8_trim_whitespace(n)
        changed = pc.fill_null(pc.not_equal(n, col), False)
        return batch.append_column(out_col, n).append_column(
            "norm_changed", changed
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
