"""Corpus ingestion from additional source formats + a real tokenizer.

The reference ingests through per-module readers (`t.register` file
lists, `t.rast.import` archives); the engine equivalently accepts any
source Ray Data can read and normalizes it to the corpus schema
``(doc_id, tokens, n_tok, source)``:

* :func:`read_corpus_parquet` — canonical path (column-pruned).
* :func:`read_corpus_jsonl` — JSONL rows with either a ``tokens`` list
  or raw ``text`` (tokenized on ingest).
* :func:`read_corpus_csv` — CSV with a text column.
* :func:`read_corpus_textdir` — one document per file (file name is the
  doc_id).
* :class:`HashTokenizer` — deterministic word tokenizer (stable 64-bit
  word hash modulo a vocab size; compiled regex per actor), the real
  text→tokens path used when sources carry text instead of tokens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class HashTokenizer:
    """text -> tokens: list<int32> via process-stable word hashing.

    Actor-pool stage: regex compiled once per actor; per batch the text
    column is tokenized and the corpus columns emitted.  Deterministic
    across processes/machines (blake2b word hash % vocab).

    ``hash_fn="md5"`` selects the lower-64-bit little-endian MD5 word
    hash instead — bit-identical to DuckDB's ``md5_number_lower``, so
    the whole text→tokens→rollup chain becomes exactly
    SQL-replicable (★tokenize_rollup_md5).  blake2b stays the default
    (faster, and the committed hash of every existing query).
    """

    def __init__(self, vocab_size: int = 50257, text_col: str = "text",
                 id_col: str = "doc_id", source_col: str = "source",
                 hash_fn: str = "blake2b"):
        import re

        from grass_ray.functions.textstats import _md5_hash64, _stable_hash64

        self.word = re.compile(r"\w+|[^\w\s]", re.UNICODE)
        if hash_fn == "blake2b":
            self.hash = _stable_hash64
        elif hash_fn == "md5":
            self.hash = _md5_hash64
        else:
            raise ValueError(f"unknown hash_fn {hash_fn!r}")
        self.vocab = vocab_size
        self.text_col = text_col
        self.id_col = id_col
        self.source_col = source_col
        self.cache: dict[str, int] = {}

    def _tok(self, text: str) -> list[int]:
        out = []
        cache = self.cache
        for w in self.word.findall(text.lower()):
            t = cache.get(w)
            if t is None:
                t = self.hash(w) % self.vocab
                if len(cache) < 262144:
                    cache[w] = t
            out.append(t)
        return out

    def _tok_batch(self, texts: list) -> pa.ListArray:
        """Vectorized batch tokenizer, identical output to per-row
        :meth:`_tok`: word/punct spans found by code-point runs over the
        concatenated lowered stream, token ids resolved per UNIQUE span
        hash (blake2b runs once per unique word, not once per word)."""
        from grass_ray.functions.textstats import (
            _classify_codepoints,
            _span_hashes,
        )

        lowered = [(t or "").lower() for t in texts]
        big = "".join(lowered)
        cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
        lens = np.fromiter(map(len, lowered), dtype=np.int64, count=len(lowered))
        doc_starts = np.zeros(len(lowered), dtype=np.int64)
        np.cumsum(lens[:-1], out=doc_starts[1:])
        bounds = np.concatenate([doc_starts, [len(cp)]])
        if len(cp) == 0:
            return pa.ListArray.from_arrays(
                pa.array(np.zeros(len(texts) + 1, dtype=np.int32)),
                pa.array([], type=pa.int32()),
            )
        from grass_ray.functions.textstats import _run_starts

        _alpha, space, word = _classify_codepoints(cp)
        # token spans in position order: \w+ runs and single [^\w\s] chars
        starts = np.union1d(
            _run_starts(word, doc_starts), np.flatnonzero(~word & ~space)
        ).astype(np.int64)
        nonw = np.flatnonzero(~word)
        at = np.searchsorted(nonw, starts)
        run_end = np.where(
            at < len(nonw), nonw[np.minimum(at, len(nonw) - 1)], len(cp)
        ) if len(nonw) else np.full(len(starts), len(cp), dtype=np.int64)
        doc_of = np.searchsorted(bounds, starts, side="right") - 1
        is_word_tok = word[starts]
        ends = np.where(is_word_tok, np.minimum(run_end, bounds[doc_of + 1]), starts + 1)
        h = _span_hashes(cp, starts, ends)
        uniqh, first_idx, inv = np.unique(h, return_index=True, return_inverse=True)
        cache = self.cache
        utok = np.empty(len(uniqh), dtype=np.int64)
        for j, fi in enumerate(first_idx):
            w = big[starts[fi] : ends[fi]]
            t = cache.get(w)
            if t is None:
                t = self.hash(w) % self.vocab
                if len(cache) < 262144:
                    cache[w] = t
            utok[j] = t
        vals = utok[inv].astype(np.int32)
        counts = np.bincount(doc_of, minlength=len(texts))
        offsets = np.zeros(len(texts) + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        return pa.ListArray.from_arrays(pa.array(offsets), pa.array(vals))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        toks = self._tok_batch(texts)
        ids = batch.column(self.id_col).to_pylist() if self.id_col in batch.column_names else range(len(texts))
        srcs = (
            batch.column(self.source_col).to_pylist()
            if self.source_col in batch.column_names
            else ["unknown"] * len(texts)
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    [i if isinstance(i, str) else f"d{int(i):07d}" for i in ids]
                ),
                "tokens": toks.cast(pa.list_(pa.int32())),
                "n_tok": toks.value_lengths().cast(pa.int32()),
                "source": pa.array([str(s) for s in srcs]),
            }
        )


def sized_num_blocks(
    total_bytes: int,
    *,
    cpus: int | None = None,
    small_target: int = 4 << 20,
    large_target: int = 64 << 20,
) -> int:
    """Bytes-driven block count for a read.

    Ray's default parallelism heuristic has a CPU-count floor, which
    splits tiny inputs into dozens of near-empty blocks — every
    downstream exchange then pays per-block fixed costs that dwarf the
    data (measured: a 5k-row groupby-aggregate drops 1.25s → 0.26s when
    the read emits 1 block instead of 64).  Policy, smooth across 1000×
    data growth:

    * small inputs split at ``small_target`` (4 MB) per block, capped at
      2×CPUs — enough parallelism for CPU-heavy kernels, no empty blocks;
    * large inputs split at ``large_target`` (64 MB) per block — block
      count grows with bytes, never with cluster size, so a 100 TB read
      yields ~1.6M well-sized blocks regardless of node count.
    """
    if cpus is None:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
    small = max(1, -(-total_bytes // small_target))
    large = -(-total_bytes // large_target)
    # mid-size occupancy term: up to 4 waves per cpu as long as blocks
    # stay >= 12 MB (measured sweet spot for the pipelined
    # read->kernel->write build: 8 cpus prefer 32 blocks over 16 for a
    # 760 MB input, 32 cpus prefer 48-64 over 128)
    mid = min(4 * cpus, max(1, -(-total_bytes // (12 << 20))))
    return max(large, mid, min(small, 2 * cpus), 1)


def _local_file_sizes(paths) -> list[int] | None:
    """Per-file sizes of local files/dirs; None if any path is unsized."""
    import os

    sizes: list[int] = []
    for p in [paths] if isinstance(paths, str) else list(paths):
        if os.path.isfile(p):
            sizes.append(os.path.getsize(p))
        elif os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                sizes.extend(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
        else:
            return None
    return sizes


def snap_blocks_to_files(num_blocks: int, sizes: list[int]) -> int:
    """Align a block count to file boundaries when files are uniform.

    A read of F same-sized files split into N < F blocks hands some
    tasks ceil(F/N) files and others one fewer — in a fused
    read->kernel->write pipeline the fat tasks become 2× stragglers
    (measured at sf0.1: 64 blocks over 120 files ran 8 tasks at half
    load and the rest at full; snapping to 60 evened the wave).  Snap N
    down to ceil(F / ceil(F/N)) so every task gets the same file count.
    Skewed file sizes (max > 2×min) make the even-file-count assumption
    wrong, so leave N alone there, as when files already split (F < N).
    """
    f = len(sizes)
    if f == 0 or num_blocks <= 0 or f < num_blocks:
        return num_blocks
    if max(sizes) > 2 * min(sizes):
        return num_blocks
    per_block = -(-f // num_blocks)
    return -(-f // per_block)


def read_parquet_sized(paths, *, columns=None, size_multiplier: float = 1.0, **kw):
    """``ray.data.read_parquet`` with a bytes-driven block count (see
    :func:`sized_num_blocks`) and parquet-borne schema metadata stripped
    (the unhashable ``pandas`` key trips Ray's block-schema dedup into
    per-batch warnings).  Falls back to Ray's default parallelism when
    the input size can't be determined locally.  ``size_multiplier``
    accounts for known downstream expansion (e.g. a read whose map stage
    synthesizes a token list per row sizes blocks by the EXPANDED
    bytes)."""
    import ray.data

    if "override_num_blocks" not in kw:
        sizes = _local_file_sizes(paths)
        if sizes is not None:
            kw["override_num_blocks"] = snap_blocks_to_files(
                sized_num_blocks(int(sum(sizes) * size_multiplier)), sizes
            )
    ds = ray.data.read_parquet(paths, columns=columns, **kw)
    return ds.map_batches(
        _strip_schema_metadata, batch_format="pyarrow", batch_size=None
    )


def read_json_sized(paths, *, size_multiplier: float = 1.0, **kw):
    """``ray.data.read_json`` with a bytes-driven block count.  Ray's
    default parallelism hands a megabyte-scale JSONL directory dozens
    of near-empty blocks, and every downstream two-pass stage then pays
    per-block dispatch twice; sizing by bytes keeps block count
    proportional to data, exactly like :func:`read_parquet_sized`."""
    import ray.data

    if "override_num_blocks" not in kw:
        sizes = _local_file_sizes(paths)
        if sizes is not None:
            kw["override_num_blocks"] = snap_blocks_to_files(
                sized_num_blocks(int(sum(sizes) * size_multiplier)), sizes
            )
    return ray.data.read_json(paths, **kw)


def read_csv_sized(paths, *, size_multiplier: float = 1.0, **kw):
    """``ray.data.read_csv`` with a bytes-driven block count (see
    :func:`read_json_sized`)."""
    import ray.data

    if "override_num_blocks" not in kw:
        sizes = _local_file_sizes(paths)
        if sizes is not None:
            kw["override_num_blocks"] = snap_blocks_to_files(
                sized_num_blocks(int(sum(sizes) * size_multiplier)), sizes
            )
    return ray.data.read_csv(paths, **kw)


def _strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Drop parquet-borne schema metadata (the 'pandas' key makes the
    schema unhashable, which trips Ray Data's block-schema dedup into a
    per-batch warning).  Zero-copy."""
    if batch.schema.metadata:
        return batch.replace_schema_metadata(None)
    return batch


_TOKENIZERS: dict = {}


def _tokenize_kernel(batch: pa.Table, key) -> pa.Table:
    """Task-pool kernel: per-worker-process memoized HashTokenizer (the
    word cache lives at module scope and Ray worker processes persist
    across tasks — actor-style setup amortization without the actor
    pool's spin-up latency, which costs more than the whole sf0.1
    tokenize at this batch scale)."""
    tk = _TOKENIZERS.get(key)
    if tk is None:
        vocab_size, kw_items = key
        tk = _TOKENIZERS.setdefault(
            key, HashTokenizer(vocab_size=vocab_size, **dict(kw_items))
        )
    return tk(batch)


def tokenize_text(ds, vocab_size: int = 50257, concurrency=None, **kw):
    """documents-with-text -> corpus via the memoized tokenizer kernel."""
    ds = ds.map_batches(
        _strip_schema_metadata, batch_format="pyarrow", batch_size=None
    )
    key = (vocab_size, tuple(sorted(kw.items())))
    return ds.map_batches(
        lambda b, _k=key: _tokenize_kernel(b, _k),
        batch_format="pyarrow",
        batch_size=512,
        **({"concurrency": concurrency} if concurrency else {}),
    )


def _normalize(ds):
    """Ensure corpus schema/dtypes on a source that already has tokens."""

    def kernel(batch: pa.Table) -> pa.Table:
        toks = batch.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        toks = toks.cast(pa.list_(pa.int32()))
        n = toks.value_lengths().cast(pa.int32())
        ids = batch.column("doc_id")
        if not pa.types.is_string(ids.type):
            ids = pa.array(
                [f"d{int(i):07d}" for i in ids.to_pylist()], type=pa.string()
            )
        src = (
            batch.column("source")
            if "source" in batch.column_names
            else pa.array(["unknown"] * batch.num_rows)
        )
        return pa.table(
            {"doc_id": ids, "tokens": toks, "n_tok": n, "source": src}
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def read_corpus_parquet(path, **kw):
    import ray.data

    return _normalize(ray.data.read_parquet(path, **kw))


def read_corpus_jsonl(path, vocab_size: int = 50257):
    """JSONL docs: rows with `tokens` pass through; rows with `text`
    are tokenized on ingest."""
    import ray.data

    ds = read_json_sized(path)
    names = ds.schema().names
    if "tokens" in names:
        return _normalize(ds)
    return tokenize_text(ds, vocab_size=vocab_size)


def read_corpus_csv(path, vocab_size: int = 50257, **kw):
    import ray.data

    return tokenize_text(read_csv_sized(path, **kw), vocab_size=vocab_size)


def read_corpus_textdir(path, vocab_size: int = 50257, source: str = "files"):
    """Directory of text files: one doc per file, doc_id = file name."""
    import os

    import ray.data

    ds = ray.data.read_binary_files(path, include_paths=True)

    def to_docs(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(
                    [os.path.splitext(os.path.basename(p))[0] for p in paths]
                ),
                "text": pa.array(
                    [b.decode("utf-8", "ignore") for b in blobs]
                ),
                "source": pa.array([source] * len(paths)),
            }
        )

    return tokenize_text(
        ds.map_batches(to_docs, batch_format="pyarrow"), vocab_size=vocab_size
    )
