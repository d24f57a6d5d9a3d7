from .sketch_stream import streaming_sketch_query

__all__ = ["streaming_sketch_query"]
