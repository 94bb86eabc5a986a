"""grass_ray — a Ray-Data-native time-series rollup / downsample /
retention engine with the query capabilities of GRASS's temporal
framework (TGRASS), re-expressed over Parquet corpora of pre-tokenized
training sequences.

Data model: corpus rows ``(doc_id, tokens: list<int32>, n_tok, source)``
where (source, doc_id) is the granule key and token position is sample
time.  See SURVEY.md for the full reference mapping.
"""

from grass_ray.functions.codec import (
    decode_floats,
    decode_windows,
    encode_floats,
    encode_windows,
)
from grass_ray.functions.reducers import METHODS, reduce_segments
from grass_ray.sources.corpus import (
    corpus_from_documents,
    corpus_sql,
    synth_corpus,
    synth_corpus_table,
)
from grass_ray.stages.cascade import cascade, explode_nested, refine
from grass_ray.stages.gapfill import find_gaps, gapfill
from grass_ray.stages.grouped import rollup_events, rollup_points, rollup_points_holistic
from grass_ray.stages.rollup import explode_tokens, rollup, series_collapse
from grass_ray.stages.accumulate import accdetect, accumulate
from grass_ray.stages.algebra import (
    algebra,
    algebra_program,
    tier_expr,
    tier_hash,
    tier_topo,
)
from grass_ray.stages.dedup import (
    connected_components,
    exact_dedup,
    minhash_dedup,
    minhash_verified_pairs,
    segment_dedup,
    verify_pairs_jaccard,
    simhash_candidates,
)
from grass_ray.stages.extract import apply_mapcalc, extract, tier_arith, tier_select
from grass_ray.stages.grouped import (
    hop_windows,
    sessionize,
    sessionize_multi,
    topk_per_group,
)
from grass_ray.stages.interp import interp_positions
from grass_ray.stages.join import (
    anti_join,
    asof_join,
    attach_column,
    bucket_join,
    distinct_keys,
    interval_join,
    semi_join,
)
from grass_ray.stages.chunk import chunk_stats, chunk_tokens, doc_offsets
from grass_ray.stages.curate import curate, curate_v2, gopher_filter, pack_sequences, quantile_filter, quantile_filter_by, sample_stratified
from grass_ray.functions.sketch import HyperLogLog, KLLSketch, SpaceSaving
from grass_ray.functions.topology import (
    compute_datetime_delta,
    infer_granularity_absolute,
)
from grass_ray.stages.grouped import approx_distinct, approx_quantiles, regression_points
from grass_ray.stages.neighbors import neighbors
from grass_ray.stages.multimodal import frame_sample
from grass_ray.stages.seriesops import delta_rollup, ffill_rollup, zscore_anomalies
from grass_ray.stages.sample import events_time_report
from grass_ray.stages.bpe import bpe_encode, bpe_train, bpe_vocab
from grass_ray.stages.similarity import (
    ann_topk,
    ann_topk_int8,
    ann_topk_rerank,
    quantize_embeddings,
    embedding_dedup,
    semdedup,
    ivf_build,
    ivf_search,
    ivf_topk,
    kmeans,
    kmeans_fit,
)
from grass_ray.stages.vocab import (
    decontaminate,
    ngram_source_overlap,
    decontaminate_report,
    lm_score,
    rank_vocab,
    rank_vocab_ds,
    pmi_collocations,
    tfidf_top,
    tokenize_by_rank,
    vocab_coverage,
    vocab_heavy_hitters,
    vocab_topn,
    word_counts,
)
from grass_ray.stages.mix import deterministic_shuffle, mix_sources, plan_mixture, split_dataset, upsample_sources
from grass_ray.stages.text_stage import analyze_text, normalize_text, scrub_text
from grass_ray.sources.readers import read_parquet_sized, sized_num_blocks, tokenize_text
from grass_ray.stages.univar import attr_univar, univar, value_histogram
from grass_ray.stages.what import what, what_col, what_timerow
from grass_ray.pipelines.catalog import export_tier, import_tier, list_tier, merge_tiers
from grass_ray.pipelines.retention import apply_retention, apply_retention_policy
from grass_ray.pipelines.tiers import build_tiers, read_tier
from grass_ray.state.manifest import TierStore

__version__ = "0.1.0"

__all__ = [
    "METHODS",
    "TierStore",
    "accdetect",
    "accumulate",
    "algebra",
    "attr_univar",
    "chunk_stats",
    "chunk_tokens",
    "doc_offsets",
    "algebra_program",
    "scrub_text",
    "tokenize_text",
    "sized_num_blocks",
    "read_parquet_sized",
    "vocab_heavy_hitters",
    "SpaceSaving",
    "attach_column",
    "tier_topo",
    "analyze_text",
    "approx_quantiles",
    "asof_join",
    "bucket_join",
    "anti_join",
    "compute_datetime_delta",
    "connected_components",
    "curate",
    "decontaminate",
    "distinct_keys",
    "events_time_report",
    "hop_windows",
    "infer_granularity_absolute",
    "interval_join",
    "ivf_build",
    "ivf_search",
    "minhash_verified_pairs",
    "semi_join",
    "tier_expr",
    "tier_hash",
    "topk_per_group",
    "verify_pairs_jaccard",
    "vocab_coverage",
    "vocab_topn",
    "word_counts",
    "KLLSketch",
    "pack_sequences",
    "sample_stratified",
    "apply_retention",
    "apply_retention_policy",
    "ann_topk",
    "ann_topk_int8",
    "ann_topk_rerank",
    "apply_mapcalc",
    "build_tiers",
    "cascade",
    "refine",
    "embedding_dedup",
    "bpe_train",
    "bpe_encode",
    "bpe_vocab",
    "semdedup",
    "exact_dedup",
    "mix_sources",
    "normalize_text",
    "split_dataset",
    "delta_rollup",
    "ffill_rollup",
    "curate_v2",
    "decontaminate_report",
    "gopher_filter",
    "quantile_filter",
    "quantile_filter_by",
    "quantize_embeddings",
    "plan_mixture",
    "upsample_sources",
    "frame_sample",
    "regression_points",
    "ngram_source_overlap",
    "zscore_anomalies",
    "value_histogram",
    "HyperLogLog",
    "approx_distinct",
    "tfidf_top",
    "pmi_collocations",
    "deterministic_shuffle",
    "tokenize_by_rank",
    "rank_vocab",
    "rank_vocab_ds",
    "lm_score",
    "kmeans_fit",
    "kmeans",
    "segment_dedup",
    "export_tier",
    "extract",
    "import_tier",
    "interp_positions",
    "ivf_topk",
    "list_tier",
    "merge_tiers",
    "minhash_dedup",
    "neighbors",
    "sessionize",
    "sessionize_multi",
    "simhash_candidates",
    "tier_arith",
    "tier_select",
    "corpus_from_documents",
    "corpus_sql",
    "decode_floats",
    "decode_windows",
    "encode_floats",
    "encode_windows",
    "explode_nested",
    "explode_tokens",
    "find_gaps",
    "gapfill",
    "read_tier",
    "reduce_segments",
    "rollup",
    "rollup_events",
    "rollup_points",
    "rollup_points_holistic",
    "series_collapse",
    "synth_corpus",
    "synth_corpus_table",
    "univar",
    "what",
    "what_col",
    "what_timerow",
]
