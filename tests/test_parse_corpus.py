"""The reference's 36-query parse+rewrite corpus
(tests/SearchTest.php:20-110): each query string must parse and rewrite
to EXACTLY the reference's rewritten string against the golden corpus
dictionary (wildcard/fuzzy/range expansions included)."""

import pytest

CORPUS = [
    ('title:"The Right Way" AND text:go',
     '+(title:"the right way") +(text:go)'),
    ('title:"Do it right" AND right',
     '+(title:"do it right") +(path:right modified:right contents:right)'),
    ('title:Do it right',
     '(title:do) (path:it modified:it contents:it) '
     '(path:right modified:right contents:right)'),
    ('te?t', '(contents:test contents:text)'),
    ('test*', '(contents:test contents:tested)'),
    ('te*t', '(contents:test contents:text)'),
    ('?Ma*', '(contents:amazon contents:email)'),
    ('test~', '((contents:test) (contents:text^0.5))'),
    ('test~0.4',
     '((contents:test) (contents:text^0.5833) (contents:latest^0.1667) '
     '(contents:left^0.1667) (contents:list^0.1667) (contents:meet^0.1667) '
     '(contents:must^0.1667) (contents:next^0.1667) (contents:post^0.1667) '
     '(contents:sect^0.1667) (contents:task^0.1667) (contents:tested^0.1667) '
     '(contents:that^0.1667) (contents:tort^0.1667))'),
    ('"jakarta apache"~10',
     '((path:"jakarta apache"~10) (modified:"jakarta apache"~10) '
     '(contents:"jakarta apache"~10))'),
    ('contents:[business TO by]',
     '(contents:business contents:but contents:buy contents:buying contents:by)'),
    ('{wish TO zzz}',
     '(path:wishlist contents:wishlist contents:wishlists contents:with '
     'contents:without contents:won contents:work contents:would '
     'contents:write contents:writing contents:written contents:www '
     'contents:xml contents:xmlrpc contents:you contents:your)'),
    ('jakarta apache',
     '(path:jakarta modified:jakarta contents:jakarta) '
     '(path:apache modified:apache contents:apache)'),
    ('jakarta^4 apache',
     '((path:jakarta modified:jakarta contents:jakarta)^4) '
     '(path:apache modified:apache contents:apache)'),
    ('"jakarta apache"^4 "Apache Lucene"',
     '(((path:"jakarta apache") (modified:"jakarta apache") '
     '(contents:"jakarta apache"))^4) ((path:"apache lucene") '
     '(modified:"apache lucene") (contents:"apache lucene"))'),
    ('"jakarta apache" jakarta',
     '((path:"jakarta apache") (modified:"jakarta apache") '
     '(contents:"jakarta apache")) '
     '(path:jakarta modified:jakarta contents:jakarta)'),
    ('"jakarta apache" OR jakarta',
     '((path:"jakarta apache") (modified:"jakarta apache") '
     '(contents:"jakarta apache")) '
     '(path:jakarta modified:jakarta contents:jakarta)'),
    ('"jakarta apache" || jakarta',
     '((path:"jakarta apache") (modified:"jakarta apache") '
     '(contents:"jakarta apache")) '
     '(path:jakarta modified:jakarta contents:jakarta)'),
    ('"jakarta apache" AND "Apache Lucene"',
     '+((path:"jakarta apache") (modified:"jakarta apache") '
     '(contents:"jakarta apache")) +((path:"apache lucene") '
     '(modified:"apache lucene") (contents:"apache lucene"))'),
    ('"jakarta apache" && "Apache Lucene"',
     '+((path:"jakarta apache") (modified:"jakarta apache") '
     '(contents:"jakarta apache")) +((path:"apache lucene") '
     '(modified:"apache lucene") (contents:"apache lucene"))'),
    ('+jakarta apache',
     '+(path:jakarta modified:jakarta contents:jakarta) '
     '(path:apache modified:apache contents:apache)'),
    ('"jakarta apache" AND NOT "Apache Lucene"',
     '+((path:"jakarta apache") (modified:"jakarta apache") '
     '(contents:"jakarta apache")) -((path:"apache lucene") '
     '(modified:"apache lucene") (contents:"apache lucene"))'),
    ('"jakarta apache" && !"Apache Lucene"',
     '+((path:"jakarta apache") (modified:"jakarta apache") '
     '(contents:"jakarta apache")) -((path:"apache lucene") '
     '(modified:"apache lucene") (contents:"apache lucene"))'),
    ('\\ ', '(<InsignificantQuery>)'),
    ('NOT "jakarta apache"', '<InsignificantQuery>'),
    ('!"jakarta apache"', '<InsignificantQuery>'),
    ('"jakarta apache" -"Apache Lucene"',
     '((path:"jakarta apache") (modified:"jakarta apache") '
     '(contents:"jakarta apache")) -((path:"apache lucene") '
     '(modified:"apache lucene") (contents:"apache lucene"))'),
    ('(jakarta OR apache) AND website',
     '+((path:jakarta modified:jakarta contents:jakarta) '
     '(path:apache modified:apache contents:apache)) '
     '+(path:website modified:website contents:website)'),
    ('(jakarta || apache) && website',
     '+((path:jakarta modified:jakarta contents:jakarta) '
     '(path:apache modified:apache contents:apache)) '
     '+(path:website modified:website contents:website)'),
    ('title:(+return +"pink panther")',
     '(+(title:return) +(title:"pink panther"))'),
    ('title:(+re\\turn\\ value +"pink panther\\"" +body:cool)',
     '(+(+title:return +title:value) +(title:"pink panther") +(body:cool))'),
    ('+contents:apache +type:1 +id:5',
     '+(contents:apache) +(<InsignificantQuery>) +(<InsignificantQuery>)'),
    ('contents:apache AND type:1 AND id:5',
     '+(contents:apache) +(<InsignificantQuery>) +(<InsignificantQuery>)'),
    ('f1:word1 f1:word2 and f1:word3',
     '(f1:word) (+(f1:word) +(f1:word))'),
    ('f1:word1 not f1:word2 and f1:word3',
     '(f1:word) (-(f1:word) +(f1:word))'),
]


@pytest.fixture(scope="module")
def ordered_golden_model(zero_prefix_corpus):
    from lucene_spark.model import PyIndex
    from tests.test_reference_golden import DELETED, ORDER, _docs

    ix = PyIndex(
        field_policy={"path": "text", "modified": "keyword", "contents": "text"}
    )
    for d in _docs():
        ix.add_document(d)
    ix.delete(DELETED)
    return ix


@pytest.fixture(scope="module")
def zero_prefix_corpus():
    from lucene_spark.search.query import FuzzyQuery, WildcardQuery

    wp, fp = WildcardQuery.min_prefix_length, FuzzyQuery.default_prefix_length
    WildcardQuery.min_prefix_length = 0
    FuzzyQuery.default_prefix_length = 0
    yield
    WildcardQuery.min_prefix_length = wp
    FuzzyQuery.default_prefix_length = fp


@pytest.mark.parametrize("query,expected", CORPUS, ids=[q for q, _ in CORPUS])
def test_parse_rewrite_corpus(ordered_golden_model, query, expected):
    from lucene_spark.search.parser import parse_query

    q = parse_query(query)
    got = str(q.rewrite(ordered_golden_model))
    assert got == expected
