from lucene_spark.search.query import (
    Term,
    Query,
    TermQuery,
    MultiTermQuery,
    BooleanQuery,
    PhraseQuery,
    WildcardQuery,
    FuzzyQuery,
    RangeQuery,
    PrepTermQuery,
    PrepPhraseQuery,
    Insignificant,
    EmptyResult,
    IndexReader,
)
from lucene_spark.search.parser import parse_query
from lucene_spark.search.executor import SparkSearcher, dump_postings, topk_term_pruned
from lucene_spark.search.multi import MultiSearcher
from lucene_spark.search.highlight import highlight, highlight_column, highlight_terms
from lucene_spark.search.similarity import (
    classic_tf,
    classic_idf,
    bm25_idf,
    bm25_partial,
    BM25_K1,
    BM25_B,
)

__all__ = [
    "Term",
    "Query",
    "TermQuery",
    "MultiTermQuery",
    "BooleanQuery",
    "PhraseQuery",
    "WildcardQuery",
    "FuzzyQuery",
    "RangeQuery",
    "PrepTermQuery",
    "PrepPhraseQuery",
    "Insignificant",
    "EmptyResult",
    "IndexReader",
    "parse_query",
    "SparkSearcher",
    "MultiSearcher",
    "dump_postings",
    "topk_term_pruned",
    "highlight",
    "highlight_column",
    "highlight_terms",
    "classic_tf",
    "classic_idf",
    "bm25_idf",
    "bm25_partial",
    "BM25_K1",
    "BM25_B",
]
