"""The end-to-end composition property, in the suite: every major
subsystem (sessionize → PII redact → boilerplate removal → token
filter → exact-substring span dedup → MinHash LSH dedup → lang-ID →
index build → search) chained over ONE corpus whose every stage output
has a closed form — the small-n twin of `tools/pipeline_smoke.py`
(measured at 4M docs in BASELINE §9.23). All asserts live inside
``run_pipeline``; planted needle terms prove the set algebra end to
end (a needle hidden in a redacted email must be unsearchable, a
deduped family yields exactly one hit, the shared disclaimer paragraph
survives in exactly its global-first doc, junk/boilerplate never reach
the index)."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

import pipeline_smoke  # noqa: E402


def test_pipeline_composes_end_to_end(spark, tmp_path):
    out = pipeline_smoke.run_pipeline(spark, 20_000, str(tmp_path / "ix"))
    # run_pipeline asserts every closed form internally; pin the
    # headline counts here so the test documents them
    assert out["n_survivors"] == 4 * 20_000 // 5 + 500
    assert out["lang_acc"]["es"] >= 0.9
    assert out["lang_acc"]["en"] >= 0.9
