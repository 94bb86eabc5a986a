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
from grass_ray.stages.cascade import cascade, explode_nested
from grass_ray.stages.gapfill import find_gaps, gapfill
from grass_ray.stages.grouped import rollup_events, rollup_points, rollup_points_holistic
from grass_ray.stages.rollup import explode_tokens, rollup, series_collapse
from grass_ray.stages.univar import univar
from grass_ray.stages.what import what
from grass_ray.pipelines.tiers import build_tiers, read_tier
from grass_ray.state.manifest import TierStore

__version__ = "0.1.0"

__all__ = [
    "METHODS",
    "TierStore",
    "build_tiers",
    "cascade",
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
]
