"""OpenXML (DOCX / XLSX / PPTX) ingest (reference S5).

Reference behavior (src/Document/Docx.php:40-135, Xlsx.php, Pptx.php,
AbstractOpenXML.php metadata): unzip the package, follow
``_rels/.rels`` to the office document part, concatenate the text runs
— docx: ``//w:body/w:p`` paragraphs' ``w:t``/``w:br`` runs with a space
per paragraph; xlsx: shared strings + inline cell strings; pptx: slide
``a:t`` runs — plus the ``docProps/core.xml`` core properties (title,
subject, creator, keywords, description, ...). Pure stdlib
(zipfile + xml.etree), no external dependencies.

Spark surface: :func:`openxml_fields` maps a binary payload column to a
struct(body, title, description, props) in one Arrow-batched pass.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
)

_NS = {
    "rels": "http://schemas.openxmlformats.org/package/2006/relationships",
    "w": "http://schemas.openxmlformats.org/wordprocessingml/2006/main",
    "a": "http://schemas.openxmlformats.org/drawingml/2006/main",
    "x": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    "cp": "http://schemas.openxmlformats.org/package/2006/metadata/core-properties",
    "dc": "http://purl.org/dc/elements/1.1/",
}
SCHEMA_OFFICEDOCUMENT = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"
)


def _core_properties(z: zipfile.ZipFile) -> dict[str, str]:
    """docProps/core.xml → {title, subject, creator, keywords,
    description, ...} (reference AbstractOpenXML::extractMetaData)."""
    try:
        data = z.read("docProps/core.xml")
    except KeyError:
        return {}
    props: dict[str, str] = {}
    for el in ET.fromstring(data):
        tag = el.tag.rsplit("}", 1)[-1]
        if el.text:
            props[tag] = el.text
    return props


def _office_document_path(z: zipfile.ZipFile) -> str | None:
    rels = ET.fromstring(z.read("_rels/.rels"))
    for rel in rels.findall("rels:Relationship", _NS):
        if rel.get("Type") == SCHEMA_OFFICEDOCUMENT:
            return rel.get("Target").lstrip("/")
    return None


def _docx_body(z: zipfile.ZipFile) -> str:
    target = _office_document_path(z) or "word/document.xml"
    root = ET.fromstring(z.read(target))
    parts: list[str] = []
    for p in root.iter(f"{{{_NS['w']}}}p"):  # //w:body/w:p paragraphs
        for run in p.iter():
            tag = run.tag.rsplit("}", 1)[-1]
            if tag == "t":
                parts.append(run.text or "")
            elif tag == "br":
                parts.append(" ")
        parts.append(" ")  # space per paragraph (Docx.php:95-97)
    return "".join(parts)


def _xlsx_body(z: zipfile.ZipFile) -> str:
    # shared strings (incl. rich-text runs — Xlsx.php:_parseRichText)
    shared: list[str] = []
    try:
        ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in ss.findall("x:si", _NS):
            t = si.find("x:t", _NS)
            if t is not None:
                shared.append(t.text or "")
            else:
                shared.append(
                    "".join((r.findtext("x:t", "", _NS) or "") for r in si.findall("x:r", _NS))
                )
    except KeyError:
        pass
    parts: list[str] = []
    for name in z.namelist():
        if not re.match(r"xl/worksheets/sheet[0-9]+\.xml$", name):
            continue
        sheet = ET.fromstring(z.read(name))
        for c in sheet.iter(f"{{{_NS['x']}}}c"):
            v = c.find("x:v", _NS)
            if v is None or v.text is None:
                continue
            if c.get("t") == "s":
                idx = int(v.text)
                if 0 <= idx < len(shared):
                    parts.append(shared[idx])
            else:
                parts.append(v.text)
    return " ".join(parts)


def _pptx_body(z: zipfile.ZipFile) -> str:
    parts: list[str] = []
    for name in sorted(z.namelist()):
        if not re.match(r"ppt/slides/slide[0-9]+\.xml$", name):
            continue
        slide = ET.fromstring(z.read(name))
        for t in slide.iter(f"{{{_NS['a']}}}t"):
            if t.text:
                parts.append(t.text)
    return " ".join(parts)


_KINDS = {"docx": _docx_body, "xlsx": _xlsx_body, "pptx": _pptx_body}


def openxml_fields(blob: bytes, kind: str) -> dict:
    """One package → {body, title, description, props}. ``title``
    falls back to '' when core properties lack it (the reference falls
    back to the filename — not available from a blob)."""
    if kind not in _KINDS:
        raise ValueError(f"unsupported OpenXML kind {kind!r}")
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        body = _KINDS[kind](z)
        props = _core_properties(z)
    return {
        "body": body,
        "title": props.get("title", ""),
        "description": props.get("description", ""),
        "props": props,
    }


def docx_fields(blob: bytes) -> dict:
    return openxml_fields(blob, "docx")


def xlsx_fields(blob: bytes) -> dict:
    return openxml_fields(blob, "xlsx")


def pptx_fields(blob: bytes) -> dict:
    return openxml_fields(blob, "pptx")


OPENXML_STRUCT = StructType(
    [
        StructField("body", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("props", MapType(StringType(), StringType())),
    ]
)


def openxml_fields_df(
    df: DataFrame, blob_col: str, kind_col: str, out_col: str = "doc"
) -> DataFrame:
    """DataFrame surface: binary payload + kind columns → parsed struct
    (Arrow-batched; the unzip/XML parse is the unavoidable Python)."""
    schema = StructType(df.schema.fields + [StructField(out_col, OPENXML_STRUCT)])

    def kernel(batches):
        for pdf in batches:
            parsed = [
                None if b is None else openxml_fields(bytes(b), k)
                for b, k in zip(pdf[blob_col], pdf[kind_col])
            ]
            yield pdf.assign(**{out_col: parsed})

    return df.mapInPandas(kernel, schema)
