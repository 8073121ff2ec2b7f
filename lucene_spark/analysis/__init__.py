from lucene_spark.analysis.analyzers import (
    Analyzer,
    Token,
    TEXT,
    TEXT_NUM,
    UTF8,
    UTF8_NUM,
    text_ci,
    text_num_ci,
    utf8_ci,
    utf8_num_ci,
    default_analyzer,
    ENGLISH_STOP_WORDS,
)

__all__ = [
    "Analyzer",
    "Token",
    "TEXT",
    "TEXT_NUM",
    "UTF8",
    "UTF8_NUM",
    "text_ci",
    "text_num_ci",
    "utf8_ci",
    "utf8_num_ci",
    "default_analyzer",
    "ENGLISH_STOP_WORDS",
]
