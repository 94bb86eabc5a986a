"""Command-line surface — the engine's analog of the reference's
per-module CLIs (``t.rast.aggregate``, ``t.info``, ``t.rast.list``,
``t.rast.export`` ...).  Every subcommand owns its Ray session (guarded
init; never initialised when imported as a library).

Examples::

    python -m grass_ray build  --corpus /data/corpus --out /data/tiers
    python -m grass_ray info   --store /data/tiers --tier 1m
    python -m grass_ray list   --store /data/tiers --tier 1h --fmt csv --limit 20
    python -m grass_ray gapfill --store /data/tiers --tier 1m --out /data/filled
    python -m grass_ray export --store /data/tiers --tier 1d --dest /backup/1d
    python -m grass_ray merge  --store /data/tiers --sources 1m minute2 --dest merged
    python -m grass_ray topology --store /data/tiers --tier 1m
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_build(args):
    ray = _ray()
    from grass_ray.pipelines.tiers import build_tiers, build_tiers_waves

    tier_specs = tuple(
        (name, int(f)) for name, f in (s.split(":") for s in args.tiers)
    )
    if args.waves:
        res = build_tiers_waves(
            args.corpus,
            args.out,
            tier_specs=tier_specs,
            docs_per_partition=args.docs_per_partition,
            partitions_per_wave=args.waves,
        )
    else:
        import ray.data

        res = build_tiers(
            ray.data.read_parquet(args.corpus),
            args.out,
            tier_specs=tier_specs,
            docs_per_partition=args.docs_per_partition,
        )
    print(json.dumps({t: len(p) for t, p in res.items()}))
    ray.shutdown()


def cmd_info(args):
    from grass_ray.state.manifest import TierStore

    store = TierStore(args.store)
    tiers = [args.tier] if args.tier else store.tiers()
    out = {t: store.info(t) for t in tiers}
    for t in tiers:
        md = store.get_metadata(t)
        if md:
            out[t]["metadata"] = md
    print(json.dumps(out, indent=2, default=str))


def cmd_list(args):
    ray = _ray()
    from grass_ray.pipelines.catalog import list_tier
    from grass_ray.state.manifest import TierStore

    res = list_tier(
        TierStore(args.store),
        args.tier,
        fmt=args.fmt,
        limit=args.limit,
    )
    if args.fmt == "table":
        print(res.to_pandas().to_string(index=False))
    else:
        print(res)
    ray.shutdown()


def cmd_gapfill(args):
    ray = _ray()
    from grass_ray.pipelines.tiers import read_tier
    from grass_ray.stages.gapfill import gapfill
    from grass_ray.state.manifest import TierStore

    ds = read_tier(TierStore(args.store), args.tier)
    gapfill(ds, value_cols=tuple(args.value_cols)).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()


def cmd_algebra(args):
    """t.rast.algebra analog: evaluate an expression over named tiers.

    Bindings are ``NAME=store_root:tier``; ``--common-granularity``
    is the reference's ``-g`` mode — every operand is refined (value
    replication) to the gcd of the operand granularities before
    evaluation (temporal_raster_base_algebra.setup_common_granularity).
    """
    import math as _math

    ray = _ray()
    from grass_ray.pipelines.tiers import read_tier
    from grass_ray.stages.algebra import algebra
    from grass_ray.stages.cascade import refine
    from grass_ray.state.manifest import TierStore

    tiers = {}
    for b in args.tier:
        name, _, spec = b.partition("=")
        root, _, tname = spec.rpartition(":")
        if not (name and root and tname):
            raise SystemExit(f"binding {b!r} is not NAME=store_root:tier")
        tiers[name] = read_tier(TierStore(root), tname)
    if args.common_granularity:
        grans = {
            n: int(ds.limit(1).take(1)[0]["gran"]) for n, ds in tiers.items()
        }
        g = _math.gcd(*grans.values()) if len(grans) > 1 else next(
            iter(grans.values())
        )
        tiers = {
            n: (refine(ds, grans[n] // g) if grans[n] != g else ds)
            for n, ds in tiers.items()
        }
    out_name, res = algebra(args.expr, tiers, value_col=args.value_col)
    res.write_parquet(args.out)
    print(json.dumps({"result": out_name, "out": args.out}))
    ray.shutdown()


def cmd_export(args):
    from grass_ray.pipelines.catalog import export_tier
    from grass_ray.state.manifest import TierStore

    print(export_tier(TierStore(args.store), args.tier, args.dest))


def cmd_import(args):
    from grass_ray.pipelines.catalog import import_tier
    from grass_ray.state.manifest import TierStore

    parts = import_tier(TierStore(args.store), args.src, args.tier)
    print(json.dumps({"tier": args.tier, "partitions": len(parts)}))


def cmd_merge(args):
    ray = _ray()
    from grass_ray.pipelines.catalog import merge_tiers
    from grass_ray.state.manifest import TierStore

    parts = merge_tiers(TierStore(args.store), args.sources, args.dest)
    print(json.dumps({"dest": args.dest, "partitions": len(parts)}))
    ray.shutdown()


def cmd_remove(args):
    from grass_ray.state.manifest import TierStore

    TierStore(args.store).remove_tier(args.tier)
    print(json.dumps({"removed": args.tier}))


def cmd_retention(args):
    from grass_ray.pipelines.retention import apply_retention
    from grass_ray.state.manifest import TierStore

    res = apply_retention(TierStore(args.store), args.tier, args.min_window)
    print(json.dumps(res))


def cmd_compact(args):
    ray = _ray()
    from grass_ray.pipelines.retention import compact_tier
    from grass_ray.state.manifest import TierStore

    done = compact_tier(
        TierStore(args.store), args.tier, min_files=args.min_files
    )
    print(json.dumps({"tier": args.tier, "compacted": done}))
    ray.shutdown()


def cmd_topology(args):
    ray = _ray()
    from grass_ray.pipelines.tiers import read_tier
    from grass_ray.stages.sample import topology_report
    from grass_ray.state.manifest import TierStore

    rep = topology_report(read_tier(TierStore(args.store), args.tier))
    print(json.dumps(rep, default=str))
    ray.shutdown()


def cmd_vocab(args):
    ray = _ray()
    import ray.data

    from grass_ray.stages.vocab import vocab_topn

    ds = ray.data.read_parquet(args.docs, columns=[args.text_col])
    t = vocab_topn(ds, args.top, text_col=args.text_col).to_pandas()
    print(t.to_csv(index=False))
    ray.shutdown()


def cmd_analyze(args):
    """Text analysis / curation features over a documents parquet:
    language-ID, quality + repetition filters, token counts,
    fingerprints, optional PII scrub — written back as parquet."""
    ray = _ray()

    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.text_stage import analyze_text, scrub_text

    ds = read_parquet_sized(args.docs)
    feats = tuple(args.features.split(","))
    out = analyze_text(ds, features=feats)
    if args.scrub:
        out = scrub_text(out)
    out.write_parquet(args.out)
    print(f"wrote {args.out} (features={','.join(feats)}, scrub={args.scrub})")
    ray.shutdown()


def cmd_decontaminate(args):
    ray = _ray()
    import pyarrow.parquet as _pq

    import ray.data

    from grass_ray.stages.vocab import decontaminate

    train = ray.data.read_parquet(args.train)
    bench = ray.data.read_parquet(args.bench)
    kept, _bad = decontaminate(
        train, bench, k=args.k, id_col=args.id_col, text_col=args.text_col
    )
    kept.write_parquet(args.out)
    # contaminated count = train - kept, both from parquet metadata —
    # avoids a second full gram-extraction pass over the train side
    # (the broadcast regimes return BOTH outputs as lazy probes)
    import os as _os

    n_kept = sum(
        _pq.read_metadata(_os.path.join(r, f)).num_rows
        for r, _d, fs in _os.walk(args.out)
        for f in fs
        if f.endswith(".parquet")
    )
    n_bad = train.count() - n_kept
    print(json.dumps({"kept_dir": args.out, "contaminated": n_bad}))
    ray.shutdown()


def cmd_dedup_segments(args):
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.dedup import segment_dedup

    ds = read_parquet_sized(args.docs)
    out = segment_dedup(
        ds, k=args.k, id_col=args.id_col, text_col=args.text_col
    )
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "k": args.k}))
    ray.shutdown()


def cmd_lm_score(args):
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.vocab import lm_score

    ds = read_parquet_sized(args.docs)
    lm_score(ds, id_col=args.id_col, text_col=args.text_col).write_parquet(
        args.out
    )
    print(json.dumps({"out": args.out}))
    ray.shutdown()


def cmd_mix(args):
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.mix import mix_sources

    rates = dict(
        (s, float(r)) for s, r in (x.split(":") for x in args.rates)
    )
    ds = read_parquet_sized(args.docs)
    out = mix_sources(
        ds, rates, default_rate=args.default_rate, strat_col=args.strat_col,
        seed=args.seed,
    )
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rates": rates}))
    ray.shutdown()


def cmd_shuffle(args):
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.mix import deterministic_shuffle

    ds = read_parquet_sized(args.docs)
    deterministic_shuffle(
        ds, id_col=args.id_col, seed=args.seed
    ).write_parquet(args.out)
    print(json.dumps({"out": args.out, "seed": args.seed}))
    ray.shutdown()


def cmd_tokenize(args):
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.vocab import tokenize_by_rank

    ds = read_parquet_sized(args.docs)
    tokenize_by_rank(
        ds, id_col=args.id_col, text_col=args.text_col
    ).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()


def cmd_kmeans(args):
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.similarity import kmeans

    ds = read_parquet_sized(args.vectors).materialize()
    kmeans(
        ds, n_clusters=args.k, vec_col=args.vec_col, id_col=args.id_col,
        iters=args.iters,
    ).write_parquet(args.out)
    print(json.dumps({"out": args.out, "k": args.k}))
    ray.shutdown()


def cmd_ann(args):
    """Cosine top-k over an embedding parquet: queries are the stored
    vectors of the given ids; ``--rerank`` switches to the two-stage
    int8 quantized path (integer-dot candidates + exact float
    re-rank)."""
    ray = _ray()
    import numpy as np
    import pyarrow.parquet as pq

    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.similarity import ann_topk, ann_topk_rerank

    import pyarrow as pa
    import pyarrow.compute as pc

    qids = sorted(int(x) for x in args.query_ids)
    t = pq.read_table(args.vectors, columns=[args.id_col, args.vec_col])
    sel = t.filter(
        pc.is_in(t.column(args.id_col), value_set=pa.array(qids))
    ).sort_by(args.id_col)
    q = np.stack(
        [np.asarray(v, dtype=np.float64) for v in sel.column(args.vec_col).to_pylist()]
    )
    ds = read_parquet_sized(args.vectors)
    if args.rerank:
        out = ann_topk_rerank(
            ds, q, k=args.k, rerank=args.rerank,
            id_col=args.id_col, vec_col=args.vec_col,
        )
    else:
        out = ann_topk(
            ds, q, k=args.k, id_col=args.id_col, vec_col=args.vec_col
        )
    print(out.to_pandas().to_csv(index=False))
    ray.shutdown()


def cmd_histogram(args):
    """Fixed-width value histogram of the token stream per source
    (r.stats analog) over a corpus parquet."""
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.univar import value_histogram

    import pyarrow.parquet as pq

    import os as _os
    schema_path = args.corpus
    if _os.path.isdir(schema_path):
        import glob as _glob

        schema_path = sorted(_glob.glob(_os.path.join(args.corpus, "*.parquet")))[0]
    names = set(pq.read_schema(schema_path).names)
    if "tokens" not in names and "n_chars" in names:
        # a documents table: derive the deterministic corpus on the fly
        from grass_ray.sources.corpus import corpus_from_documents

        ds = corpus_from_documents(_os.path.dirname(schema_path) or ".")
    else:
        ds = read_parquet_sized(args.corpus)
    t = (
        value_histogram(
            ds, lo=args.lo, hi=args.hi, n_bins=args.bins, by=args.by
        )
        .to_pandas()
        .sort_values([args.by, "bin"])
    )
    print(t.to_csv(index=False))
    ray.shutdown()


def cmd_bpe(args):
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.bpe import bpe_encode, bpe_train

    ds = read_parquet_sized(args.docs).materialize()
    merges, alphabet = bpe_train(
        ds, n_merges=args.merges, max_words=args.max_words
    )
    bpe_encode(ds, merges, alphabet).write_parquet(args.out)
    print(json.dumps({"out": args.out, "n_merges": len(merges),
                      "alphabet": len(alphabet)}))
    ray.shutdown()


def cmd_semdedup(args):
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.similarity import semdedup

    ds = read_parquet_sized(args.vectors).materialize()
    kept, drops = semdedup(
        ds, eps=args.eps, n_clusters=args.k, vec_col=args.vec_col,
        id_col=args.id_col,
    )
    kept.write_parquet(args.out)
    n_drop = drops.count()
    print(json.dumps({"out": args.out, "dropped": n_drop}))
    ray.shutdown()


def cmd_normalize(args):
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.text_stage import normalize_text

    ds = read_parquet_sized(args.docs)
    normalize_text(ds, text_col=args.text_col).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()


def cmd_split(args):
    ray = _ray()
    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.mix import split_dataset

    fr = dict((s, float(r)) for s, r in (x.split(":") for x in args.fractions))
    ds = read_parquet_sized(args.docs)
    split_dataset(ds, fr, id_col=args.id_col, seed=args.seed).write_parquet(
        args.out
    )
    print(json.dumps({"out": args.out, "fractions": fr}))
    ray.shutdown()


def main(argv=None):
    p = argparse.ArgumentParser(prog="grass_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build retention tiers from a corpus")
    b.add_argument("--corpus", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--tiers", nargs="+", default=["1m:60", "1h:60", "1d:24"])
    b.add_argument("--docs-per-partition", type=int, default=2000)
    b.add_argument("--waves", type=int, default=0, help="partitions per wave (0 = single pass)")
    b.set_defaults(fn=cmd_build)

    i = sub.add_parser("info", help="tier catalog info (t.info)")
    i.add_argument("--store", required=True)
    i.add_argument("--tier")
    i.set_defaults(fn=cmd_info)

    l = sub.add_parser("list", help="list tier keys (t.rast.list)")
    l.add_argument("--store", required=True)
    l.add_argument("--tier", required=True)
    l.add_argument("--fmt", default="table", choices=["table", "csv", "json"])
    l.add_argument("--limit", type=int, default=20)
    l.set_defaults(fn=cmd_list)

    al = sub.add_parser(
        "algebra", help="evaluate a temporal-algebra expression "
        "(t.rast.algebra; --common-granularity = the -g mode)"
    )
    al.add_argument("expr", help='e.g. "R = A + B"')
    al.add_argument(
        "--tier", action="append", required=True,
        help="binding NAME=store_root:tier (repeatable)",
    )
    al.add_argument("--out", required=True)
    al.add_argument("--value-col", default="average")
    al.add_argument(
        "--common-granularity", action="store_true",
        help="refine all operands to the gcd granularity first",
    )
    al.set_defaults(fn=cmd_algebra)

    g = sub.add_parser("gapfill", help="gap-fill a tier (t.rast.gapfill)")
    g.add_argument("--store", required=True)
    g.add_argument("--tier", required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--value-cols", nargs="+", default=["average"])
    g.set_defaults(fn=cmd_gapfill)

    e = sub.add_parser("export", help="export a tier (t.rast.export)")
    e.add_argument("--store", required=True)
    e.add_argument("--tier", required=True)
    e.add_argument("--dest", required=True)
    e.set_defaults(fn=cmd_export)

    im = sub.add_parser("import", help="import a tier (t.rast.import)")
    im.add_argument("--store", required=True)
    im.add_argument("--src", required=True)
    im.add_argument("--tier", required=True)
    im.set_defaults(fn=cmd_import)

    m = sub.add_parser("merge", help="merge tiers (t.merge)")
    m.add_argument("--store", required=True)
    m.add_argument("--sources", nargs="+", required=True)
    m.add_argument("--dest", required=True)
    m.set_defaults(fn=cmd_merge)

    r = sub.add_parser("remove", help="remove a tier (t.remove)")
    r.add_argument("--store", required=True)
    r.add_argument("--tier", required=True)
    r.set_defaults(fn=cmd_remove)

    rt = sub.add_parser("retention", help="age out windows below a cutoff")
    rt.add_argument("--store", required=True)
    rt.add_argument("--tier", required=True)
    rt.add_argument("--min-window", type=int, required=True)
    rt.set_defaults(fn=cmd_retention)

    cp = sub.add_parser(
        "compact", help="merge fragmented partition files (segment merge)"
    )
    cp.add_argument("--store", required=True)
    cp.add_argument("--tier", required=True)
    cp.add_argument("--min-files", type=int, default=2)
    cp.set_defaults(fn=cmd_compact)

    t = sub.add_parser("topology", help="gap/granularity report (t.topology)")
    t.add_argument("--store", required=True)
    t.add_argument("--tier", required=True)
    t.set_defaults(fn=cmd_topology)

    an = sub.add_parser(
        "analyze", help="text features (+ optional PII scrub) -> parquet"
    )
    an.add_argument("--docs", required=True)
    an.add_argument("--out", required=True)
    an.add_argument(
        "--features",
        default="lang,tokens,quality,repetition,fingerprint",
    )
    an.add_argument("--scrub", action="store_true")
    an.set_defaults(fn=cmd_analyze)

    v = sub.add_parser("vocab", help="top-N corpus word frequencies")
    v.add_argument("--docs", required=True, help="documents parquet path")
    v.add_argument("--top", type=int, default=100)
    v.add_argument("--text-col", default="text")
    v.set_defaults(fn=cmd_vocab)

    d = sub.add_parser(
        "decontaminate", help="drop train docs sharing k-grams with a benchmark"
    )
    d.add_argument("--train", required=True)
    d.add_argument("--bench", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--k", type=int, default=8)
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.set_defaults(fn=cmd_decontaminate)

    sd = sub.add_parser(
        "dedup-segments",
        help="corpus-wide exact k-word-segment dedup (first occurrence wins)",
    )
    sd.add_argument("--docs", required=True)
    sd.add_argument("--out", required=True)
    sd.add_argument("--k", type=int, default=8)
    sd.add_argument("--id-col", default="doc_id")
    sd.add_argument("--text-col", default="text")
    sd.set_defaults(fn=cmd_dedup_segments)

    lm = sub.add_parser(
        "lm-score", help="unigram LM quality score per document"
    )
    lm.add_argument("--docs", required=True)
    lm.add_argument("--out", required=True)
    lm.add_argument("--id-col", default="doc_id")
    lm.add_argument("--text-col", default="text")
    lm.set_defaults(fn=cmd_lm_score)

    mx = sub.add_parser(
        "mix", help="deterministic per-source rate sampling (domain mixing)"
    )
    mx.add_argument("--docs", required=True)
    mx.add_argument("--out", required=True)
    mx.add_argument(
        "--rates", nargs="+", required=True, help="source:rate pairs"
    )
    mx.add_argument("--default-rate", type=float, default=1.0)
    mx.add_argument("--strat-col", default="source")
    mx.add_argument("--seed", type=int, default=17)
    mx.set_defaults(fn=cmd_mix)

    sh = sub.add_parser(
        "shuffle", help="seeded reproducible global shuffle ranks"
    )
    sh.add_argument("--docs", required=True)
    sh.add_argument("--out", required=True)
    sh.add_argument("--id-col", default="doc_id")
    sh.add_argument("--seed", type=int, default=17)
    sh.set_defaults(fn=cmd_shuffle)

    tk = sub.add_parser(
        "tokenize", help="frequency-rank vocabulary tokenization"
    )
    tk.add_argument("--docs", required=True)
    tk.add_argument("--out", required=True)
    tk.add_argument("--id-col", default="doc_id")
    tk.add_argument("--text-col", default="text")
    tk.set_defaults(fn=cmd_tokenize)

    km = sub.add_parser(
        "kmeans", help="distributed spherical k-means over an embedding column"
    )
    km.add_argument("--vectors", required=True)
    km.add_argument("--out", required=True)
    km.add_argument("--k", type=int, default=16)
    km.add_argument("--iters", type=int, default=10)
    km.add_argument("--vec-col", default="embedding")
    km.add_argument("--id-col", default="vec_id")
    km.set_defaults(fn=cmd_kmeans)

    sdd = sub.add_parser(
        "semdedup", help="semantic dedup: k-means + within-cluster cosine pruning"
    )
    sdd.add_argument("vectors")
    sdd.add_argument("out")
    sdd.add_argument("--eps", type=float, default=0.95)
    sdd.add_argument("--k", type=int, default=16)
    sdd.add_argument("--vec-col", default="embedding")
    sdd.add_argument("--id-col", default="vec_id")
    sdd.set_defaults(fn=cmd_semdedup)

    bp = sub.add_parser(
        "bpe", help="train BPE merges and subword-tokenize a document table"
    )
    bp.add_argument("docs")
    bp.add_argument("out")
    bp.add_argument("--merges", type=int, default=1000)
    bp.add_argument("--max-words", type=int, default=1_000_000)
    bp.set_defaults(fn=cmd_bpe)

    ann = sub.add_parser(
        "ann", help="cosine top-k over an embedding parquet (optional int8 rerank)"
    )
    ann.add_argument("vectors")
    ann.add_argument("query_ids", nargs="+")
    ann.add_argument("--k", type=int, default=10)
    ann.add_argument("--rerank", type=int, default=0,
                     help="int8 candidate depth (0 = brute float path)")
    ann.add_argument("--vec-col", default="embedding")
    ann.add_argument("--id-col", default="vec_id")
    ann.set_defaults(fn=cmd_ann)

    hg = sub.add_parser(
        "histogram", help="fixed-width token-value histogram per group (r.stats)"
    )
    hg.add_argument("corpus")
    hg.add_argument("--lo", type=float, required=True)
    hg.add_argument("--hi", type=float, required=True)
    hg.add_argument("--bins", type=int, default=32)
    hg.add_argument("--by", default="source")
    hg.set_defaults(fn=cmd_histogram)

    nm = sub.add_parser(
        "normalize", help="unicode NFC + whitespace normalization"
    )
    nm.add_argument("--docs", required=True)
    nm.add_argument("--out", required=True)
    nm.add_argument("--text-col", default="text")
    nm.set_defaults(fn=cmd_normalize)

    sp = sub.add_parser(
        "split", help="deterministic train/val/test split labels"
    )
    sp.add_argument("--docs", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument(
        "--fractions", nargs="+", default=["train:0.9", "val:0.05", "test:0.05"]
    )
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--seed", type=int, default=17)
    sp.set_defaults(fn=cmd_split)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
