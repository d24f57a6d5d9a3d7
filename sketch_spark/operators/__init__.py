from .aggregate import (
    SketchSpec,
    SketchResult,
    build_partials,
    keyed_sketch_aggregate,
    merge_partials,
    sketch_aggregate,
)
from .emerging import emerging_heavy_hitters, candidate_token_counts, estimate_tokens_udf

__all__ = [
    "SketchSpec",
    "SketchResult",
    "build_partials",
    "keyed_sketch_aggregate",
    "merge_partials",
    "sketch_aggregate",
    "emerging_heavy_hitters",
    "candidate_token_counts",
    "estimate_tokens_udf",
]
