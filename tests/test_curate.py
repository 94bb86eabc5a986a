"""Curation ops: stratified sampling, sequence packing, composed pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from grass_ray.sources.corpus import synth_corpus_table
from grass_ray.stages.curate import curate, pack_sequences, sample_stratified


def test_sample_stratified_deterministic(ray_session):
    import ray.data

    t = synth_corpus_table(200, seed=9, n_tok=50)
    ds = ray.data.from_arrow(t)
    rates = {"src0": 1.0, "src1": 0.5}
    out1 = sample_stratified(ds, rates, default_rate=0.1).to_pandas()
    out2 = sample_stratified(
        ray.data.from_arrow(t), rates, default_rate=0.1
    ).to_pandas()
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])  # reproducible
    # all src0 kept; others follow the modulus rule
    df = t.to_pandas()
    src0 = set(df[df["source"] == "src0"]["doc_id"])
    assert src0 <= set(out1["doc_id"])
    for _, r in out1.iterrows():
        idx = int(r["doc_id"][1:])
        rate = {"src0": 100, "src1": 50}.get(r["source"], 10)
        assert idx % 100 < rate


def test_pack_sequences_spans_and_nulls(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "tokens": pa.array(
                [[1, 2, 3], [4, None, 5, 6], [7, 8]], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([3, 4, 2], type=pa.int32()),
            "source": pa.array(["s"] * 3),
        }
    )
    out = pack_sequences(ray.data.from_arrow(t), block_len=4).to_pandas()
    out = out.sort_values("block_id").reset_index(drop=True)
    # stream after null drop: 1,2,3,4,5,6,7,8 -> blocks [1..4], [5..8]
    assert len(out) == 2
    assert list(out["tokens"][0]) == [1, 2, 3, 4]
    assert list(out["tokens"][1]) == [5, 6, 7, 8]
    assert list(out["n_tok"]) == [4, 4]
    # block 0 spans docs a(3)+b(1); block 1 spans b(2)+c(2)
    assert list(out["n_docs"]) == [2, 2]
    assert list(out["span_doc_ids"][0]) == ["a", "b"]
    assert list(out["span_starts"][0]) == [0, 3]
    assert list(out["span_lens"][0]) == [3, 1]
    assert list(out["span_doc_ids"][1]) == ["b", "c"]
    assert list(out["span_lens"][1]) == [2, 2]


def test_pack_drop_remainder(ray_session):
    import ray.data

    t = synth_corpus_table(10, seed=4, n_tok=100)
    full = pack_sequences(
        ray.data.from_arrow(t), block_len=64, drop_remainder=True
    ).to_pandas()
    assert (full["n_tok"] == 64).all()


def test_curate_pipeline(ray_session):
    import ray.data

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    packed, report = curate(ds, min_quality=0.2, dedup_threshold=0.7, block_len=512)
    df = packed.to_pandas()
    assert len(df) > 0
    assert (df["n_tok"] <= 512).all()
    assert "near_dup_pairs" in report


def test_curate_global_pack_consistent_with_local(ray_session):
    """pack='global' must keep the same survivor token stream as the
    per-Ray-block pack: identical total tokens, every block full except
    at most the last, and md5 vs blake2b near-dedup agree on this
    corpus (both hashes drive the same Jaccard-verified drop rule)."""
    import ray.data

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    loc, _ = curate(ds, min_quality=0.2, dedup_threshold=0.7, block_len=512)
    glo, _ = curate(
        ds, min_quality=0.2, dedup_threshold=0.7, block_len=512,
        hash_fn="md5", pack="global",
    )
    dl, dg = loc.to_pandas(), glo.to_pandas()
    assert int(dl["n_tok"].sum()) == int(dg["n_tok"].sum())
    dg = dg.sort_values("block_id").reset_index(drop=True)
    assert (dg["n_tok"].iloc[:-1] == 512).all()
    assert 0 < int(dg["n_tok"].iloc[-1]) <= 512


def test_curate_v2_bpe_tokenizer(ray_session):
    """tokenizer='bpe' must keep the identical survivor/split set as
    the rank tokenizer (same filter stages), with valid subword ids."""
    import ray.data

    from grass_ray.stages.curate import curate_v2

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "source", "text"],
    )
    rank = curate_v2(ds, min_logprob=-5.0).to_pandas()
    bpe = curate_v2(
        ds, min_logprob=-5.0, tokenizer="bpe", bpe_merges=50
    ).to_pandas()
    a = rank[["doc_id", "split"]].sort_values("doc_id").reset_index(drop=True)
    b = bpe[["doc_id", "split"]].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert (bpe["n_tok"] > 0).all()
    assert all(min(t) >= 0 for t in bpe["tokens"] if len(t))


def test_sample_stratified_nonnumeric_ids(ray_session):
    """The vectorized kernel (r4 VERDICT weak #1) must keep the old
    per-row rule on one mixed batch: numeric string tails use
    int(tail), non-numeric ids fall back to crc32, integer ids use the
    id itself — all modulo 100 against the stratum rate."""
    import zlib

    import ray.data

    ids = ["dabc", "x!!", "d0042", "d7", "qzt9x", "x"]
    srcs = ["src0", "src1", "src1", "other", "src1", "src1"]
    t = pa.table({"doc_id": pa.array(ids), "source": pa.array(srcs)})
    out = sample_stratified(
        ray.data.from_arrow(t), {"src0": 1.0, "src1": 0.5}, default_rate=0.1
    ).to_pandas()

    def idx(i):
        tail = i[1:]
        return int(tail) if tail.isdigit() else zlib.crc32(i.encode())

    want = [
        i
        for i, s in zip(ids, srcs)
        if idx(i) % 100 < {"src0": 100, "src1": 50}.get(s, 10)
    ]
    assert sorted(out["doc_id"]) == sorted(want)
    # integer ids: the modulus applies to the id value directly
    t2 = pa.table(
        {
            "doc_id": pa.array([5, 55, 105], type=pa.int64()),
            "source": pa.array(["src1"] * 3),
        }
    )
    out2 = sample_stratified(
        ray.data.from_arrow(t2), {"src1": 0.5}
    ).to_pandas()
    assert sorted(out2["doc_id"]) == [5, 105]


def test_gopher_filter_rule_mask_vs_reference(ray_session):
    """Rule wiring vs the per-row reference feature functions: the
    bitmask must equal the same comparisons applied to
    quality_features()/repetition_features() outputs row by row."""
    import ray.data

    from grass_ray.functions.textstats import (
        quality_features,
        repetition_features,
    )
    from grass_ray.stages.curate import gopher_filter

    good = (
        "the quick brown fox jumps over the lazy dog and then walks "
        "through the quiet forest while morning light falls between "
        "tall trees onto soft ground where small animals move about "
        "looking for food and water near the old stone bridge which "
        "has stood there for many long years without any repair at all"
    )
    docs = {
        "good": good,
        "short": "tiny doc",
        "spam": ("spam " * 80).strip(),
        "punct": "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) @@@ !!! ???",
        "longwords": " ".join(["pneumonoultramicroscopic"] * 60),
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs)),
            "text": pa.array(list(docs.values())),
        }
    )
    out = (
        gopher_filter(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
    )

    for did, text in docs.items():
        q = quality_features(text)
        r = repetition_features(text)
        want = 0
        want |= (q["n_words"] < 50) << 0
        want |= (q["n_words"] > 100_000) << 1
        want |= (
            q["mean_word_len"] < 3.0 or q["mean_word_len"] > 10.0
        ) << 2
        want |= (q["alpha_ratio"] < 0.6) << 3
        want |= (q["stopword_ratio"] < 0.02) << 4
        want |= (r["top_word_frac"] > 0.3) << 5
        want |= (r["dup_bigram_frac"] > 0.2) << 6
        want |= (r["dup_trigram_frac"] > 0.18) << 7
        assert out.loc[did, "fail_mask"] == want, did
        assert out.loc[did, "keep"] == (want == 0), did
    # the crafted docs exercise the interesting corners
    assert out.loc["good", "fail_mask"] == 0
    assert out.loc["short", "fail_mask"] & 1
    assert out.loc["spam", "fail_mask"] & (32 | 64 | 128)
    assert out.loc["punct", "fail_mask"] & 8
    assert out.loc["longwords", "fail_mask"] & 4

    kept = gopher_filter(
        ray.data.from_arrow(t), keep_only=True
    ).to_pandas()
    assert list(kept["doc_id"]) == ["good"]


def test_quantile_filter_by_vs_reference(ray_session):
    """Per-group percentile cut vs a literal per-group rank reference
    (rule: keep v >= value at rank max(1, ceil(q*n_group)); NULL vals
    and empty groups drop), plus layout invariance."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from grass_ray.stages.curate import quantile_filter_by

    rng = np.random.default_rng(53)
    ids, grp, val = [], [], []
    for g, (n, scale) in enumerate([(40, 1.0), (25, 10.0), (7, 0.1), (1, 5.0)]):
        for i in range(n):
            ids.append(g * 1000 + i)
            grp.append(f"g{g}")
            v = float(np.round(rng.normal(0, scale), 3))
            val.append(None if rng.random() < 0.1 else v)
    t = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "source": pa.array(grp),
            "v": pa.array(val, type=pa.float64()),
        }
    )
    # literal reference
    keep_ids = set()
    thr_ref = {}
    df = pd.DataFrame({"doc_id": ids, "source": grp, "v": val})
    for g, sub in df.groupby("source"):
        vv = sorted(sub["v"].dropna())  # None became NaN in the frame
        if not vv:
            continue
        thr = vv[max(1, math.ceil(0.2 * len(vv))) - 1]
        thr_ref[g] = thr
        keep_ids |= set(
            sub[sub["v"].notna() & (sub["v"] >= thr)]["doc_id"]
        )
    for parts in (1, 5):
        kept, thr = quantile_filter_by(
            ray.data.from_arrow(t).repartition(parts),
            val_col="v",
            q=0.2,
            by="source",
        )
        out = kept.to_pandas()
        assert set(out["doc_id"]) == keep_ids
        assert thr == thr_ref
