from lucene_spark.streaming.incremental import (
    IncrementalIndexWriter,
    merge_delta,
    stream_into_index,
)

__all__ = ["IncrementalIndexWriter", "merge_delta", "stream_into_index"]
