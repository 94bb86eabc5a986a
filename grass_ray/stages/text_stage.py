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
        if "lang" in self.features:
            langs, scores = zip(*(T.detect_language(t) for t in texts)) if texts else ((), ())
            out["lang_pred"] = pa.array(list(langs), type=pa.string())
            out["lang_score"] = pa.array(list(scores), type=pa.float64())
        if "tokens" in self.features:
            out["n_tok_ws"] = pa.array(
                [T.count_tokens_ws(t) for t in texts], type=pa.int64()
            )
            out["n_tok_bpe"] = pa.array(
                [T.count_tokens_bpe(t) for t in texts], type=pa.int64()
            )
        if "quality" in self.features:
            feats = [T.quality_features(t) for t in texts]
            for k in (
                "n_words",
                "mean_word_len",
                "punct_ratio",
                "stopword_ratio",
                "alpha_ratio",
                "unique_word_ratio",
                "quality_score",
            ):
                typ = pa.int64() if k == "n_words" else pa.float64()
                out[k] = pa.array([f[k] for f in feats], type=typ)
        if "fingerprint" in self.features:
            out["fingerprint"] = pa.array(
                T.fingerprint_batch(texts), type=pa.int64()
            )
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
