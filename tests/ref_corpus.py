"""Golden corpus loader — re-ingests the reference's 10-doc HTML test
corpus exactly the way tests/IndexTest.php:254-295 does: ``path`` Text
field, ``modified`` Keyword field, ``contents`` = RAW FILE BYTES as a
Text field (the reference indexes the raw HTML source, tags included).

Insertion order is pinned to the docIds of the checked-in golden index,
recovered from tests/SearchTest.php expected hit lists.
"""

from __future__ import annotations

import os

from lucene_spark.model import PyIndex

REF_FILES_DIR = "/root/reference/tests/_indexSource/_files"

# docId → filename (from SearchTest.php expected (id, path) pairs;
# id 6 is the only file never listed → contributing.newpackage.html)
GOLDEN_ORDER = [
    "contributing.documentation.html",
    "contributing.wishlist.html",
    "contributing.patches.html",
    "about-pear.html",
    "copyright.html",
    "authors.html",
    "contributing.newpackage.html",
    "contributing.bugs.html",
    "contributing.html",
    "core.html",
]


def have_corpus() -> bool:
    return os.path.isdir(REF_FILES_DIR)


def load_docs() -> list[dict]:
    docs = []
    for i, name in enumerate(GOLDEN_ORDER):
        with open(os.path.join(REF_FILES_DIR, name), "rb") as f:
            data = f.read().decode("iso-8859-1")
        docs.append(
            {
                "path": "IndexSource/" + name,
                "modified": str(1100000000 + i),  # fake mtime (keyword)
                "contents": data,
            }
        )
    return docs


def build_model_index() -> PyIndex:
    ix = PyIndex(
        field_policy={"path": "text", "modified": "keyword", "contents": "text"}
    )
    for d in load_docs():
        ix.add_document(d)
    # the golden sample index has doc 6 (contributing.newpackage.html)
    # logically deleted (_3.del): it stays in the dictionary (df counts
    # it) but never appears in hits
    ix.delete(6)
    return ix
