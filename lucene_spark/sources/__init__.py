from lucene_spark.sources.html import html_fields, parse_html
from lucene_spark.sources.table import TRANSCRIPT_COLUMNS, read_transcripts
from lucene_spark.sources.openxml import (
    docx_fields,
    openxml_fields,
    pptx_fields,
    xlsx_fields,
)

__all__ = [
    "read_transcripts",
    "TRANSCRIPT_COLUMNS",
    "parse_html",
    "html_fields",
    "openxml_fields",
    "docx_fields",
    "xlsx_fields",
    "pptx_fields",
]
