from .aggregate import (
    SketchSpec,
    SketchResult,
    build_partials,
    keyed_sketch_aggregate,
    merge_partials,
    sketch_aggregate,
)
from .emerging import (
    bloom_semi_join,
    candidate_token_counts,
    emerging_heavy_hitters,
    estimate_tokens_udf,
)

__all__ = [
    "SketchSpec",
    "SketchResult",
    "build_partials",
    "keyed_sketch_aggregate",
    "merge_partials",
    "sketch_aggregate",
    "emerging_heavy_hitters",
    "bloom_semi_join",
    "candidate_token_counts",
    "estimate_tokens_udf",
]
