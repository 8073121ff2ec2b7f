"""Front-coded term dictionary blocks: round-trip + size + Spark pack."""

import random
import string

from hypothesis import given, settings, strategies as st


def test_roundtrip_simple():
    from lucene_spark.codec.frontcode import decode_term_block, encode_term_block

    terms = ["apple", "applesauce", "apply", "banana", "band", "bandana"]
    assert decode_term_block(encode_term_block(terms)) == terms


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet=string.ascii_lowercase + "0123456789é中", min_size=0, max_size=24),
        min_size=1,
        max_size=300,
    )
)
def test_roundtrip_property(terms):
    from lucene_spark.codec.frontcode import decode_term_block, encode_term_block

    terms = sorted(set(terms))
    assert decode_term_block(encode_term_block(terms)) == terms


def test_compression_on_shared_prefixes():
    from lucene_spark.codec.frontcode import encode_term_block

    rng = random.Random(7)
    terms = sorted(
        "commonprefix_" + "".join(rng.choices(string.ascii_lowercase, k=6))
        for _ in range(128)
    )
    packed = len(encode_term_block(terms))
    raw = sum(len(t) for t in terms)
    assert packed < raw * 0.5  # shared prefixes mostly elided


def test_pack_runs_boundaries():
    from lucene_spark.codec.frontcode import decode_term_block, pack_term_runs

    terms = sorted(f"t{i:05d}" for i in range(300))
    runs = pack_term_runs(terms, block_size=128)
    assert [r[1] for r in runs] == [128, 128, 44]
    assert [r[0] for r in runs] == [terms[0], terms[128], terms[256]]
    rebuilt = [t for _f, _n, blob in runs for t in decode_term_block(blob)]
    assert rebuilt == terms


def test_write_dict_blocks_spark(spark_index):
    from lucene_spark.codec.frontcode import decode_term_block, write_dict_blocks

    blocks = write_dict_blocks(spark_index).collect()
    by_field = {}
    for r in sorted(blocks, key=lambda r: (r["field"], r["first_term"])):
        by_field.setdefault(r["field"], []).extend(decode_term_block(r["terms_bin"]))
    td = spark_index.term_dict.select("field", "term").collect()
    expected = {}
    for r in td:
        expected.setdefault(r["field"], []).append(r["term"])
    for f in expected:
        assert by_field[f] == sorted(expected[f])

def test_assume_sorted_parity(spark):
    """assume_sorted=True over a builder-shaped td (repartitionByRange +
    sortWithinPartitions on (field, term)) must yield the same decoded
    dictionary as the default self-shuffling path, with disjoint,
    monotonically keyed blocks — the invariant terms_from paging relies
    on (lucene_spark/index/builder.py term_dict phase)."""
    from pyspark.sql import functions as F

    from lucene_spark.codec.frontcode import decode_term_block, write_dict_blocks

    # two fields, interleaved unsorted input, enough rows for several
    # partitions and >1 Arrow batch per partition
    rng = __import__("random").Random(11)
    rows = [("text", f"t{rng.randrange(10**9):09d}") for _ in range(9000)]
    rows += [("title", f"s{rng.randrange(10**6):06d}") for _ in range(3000)]
    raw = (
        __import__("pyspark").sql.SparkSession.getActiveSession()
        or spark
    ).createDataFrame(rows, "field string, term string").dropDuplicates()
    td = raw.repartitionByRange(7, "field", "term").sortWithinPartitions(
        "field", "term"
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
    try:
        fast = write_dict_blocks(td, assume_sorted=True).collect()
        slow = write_dict_blocks(raw).collect()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    def rebuild(blocks):
        out = {}
        for r in sorted(blocks, key=lambda r: (r["field"], r["first_term"])):
            out.setdefault(r["field"], []).extend(decode_term_block(r["terms_bin"]))
        return out

    assert rebuild(fast) == rebuild(slow)
    # disjoint + monotone block key ranges per field
    for fld in ("text", "title"):
        spans = sorted(
            (decode_term_block(r["terms_bin"])[0], decode_term_block(r["terms_bin"])[-1])
            for r in fast
            if r["field"] == fld
        )
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert lo1 <= hi1 < lo2
