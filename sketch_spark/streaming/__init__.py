from .dedup_stream import streaming_exact_dedup
from .emerging_stream import streaming_emerging_hh
from .sketch_stream import streaming_sketch_query

__all__ = ["streaming_sketch_query", "streaming_exact_dedup", "streaming_emerging_hh"]
