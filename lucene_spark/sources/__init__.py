from lucene_spark.sources.html import html_fields, parse_html
from lucene_spark.sources.openxml import (
    docx_fields,
    openxml_fields,
    pptx_fields,
    xlsx_fields,
)

__all__ = [
    "parse_html",
    "html_fields",
    "openxml_fields",
    "docx_fields",
    "xlsx_fields",
    "pptx_fields",
]
