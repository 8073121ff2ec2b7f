from lucene_spark.index.builder import (
    IndexConfig,
    assign_doc_ids,
    assign_doc_ids_dense,
    build_index,
    load_index,
    SparkIndex,
)
from lucene_spark.index.lifecycle import (
    delete_docs,
    deleted_count,
    optimize_index,
    undelete_all,
)

__all__ = [
    "IndexConfig",
    "assign_doc_ids_dense",
    "delete_docs",
    "deleted_count",
    "optimize_index",
    "undelete_all",
    "assign_doc_ids",
    "build_index",
    "load_index",
    "SparkIndex",
]
