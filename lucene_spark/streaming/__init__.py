from lucene_spark.streaming.incremental import (
    IncrementalIndexWriter,
    maybe_compact,
    merge_delta,
    promote_delta,
    recover_merge,
    stream_into_index,
)

__all__ = [
    "IncrementalIndexWriter",
    "maybe_compact",
    "merge_delta",
    "promote_delta",
    "recover_merge",
    "stream_into_index",
]
