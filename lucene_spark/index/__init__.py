from lucene_spark.index.builder import (
    IndexConfig,
    assign_doc_ids,
    build_index,
    load_index,
    SparkIndex,
)

__all__ = [
    "IndexConfig",
    "assign_doc_ids",
    "build_index",
    "load_index",
    "SparkIndex",
]
