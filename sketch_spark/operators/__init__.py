from .aggregate import SketchSpec, SketchResult, build_partials, merge_partials, sketch_aggregate
from .emerging import emerging_heavy_hitters, candidate_token_counts, estimate_tokens_udf

__all__ = [
    "SketchSpec",
    "SketchResult",
    "build_partials",
    "merge_partials",
    "sketch_aggregate",
    "emerging_heavy_hitters",
    "candidate_token_counts",
    "estimate_tokens_udf",
]
