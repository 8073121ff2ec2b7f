"""Round-4 regression tests: ADVICE fixes (NaN guard in the sloppy
closed form with a custom Similarity, dedicated queue-budget exception,
AQE restore) and the cosine_pairs quadratic guard."""

import numpy as np
import pytest


class TestSloppyClosedFormNaN:
    def test_custom_sf_zero_inwindow_no_nan(self):
        """A custom sf returning 0.0 for an in-window distance combined
        with inf-overflowed 2^i multiplicities (anchor i >= 1026) must
        not produce NaN (= silent doc dropout). ADVICE r3 item 1."""
        from lucene_spark.search.phrase import _sloppy_2slot_closed

        A = np.arange(1100, dtype=np.int64)
        B = np.array([1099], dtype=np.int64)

        def sf_np(d):
            # zero weight exactly where the last (inf-multiplicity)
            # anchor lands in-window at d == 0
            return np.where(d == 0, 0.0, 1.0 / (d + 1.0))

        out = _sloppy_2slot_closed(A, B, 0, 2, sf_np=sf_np)
        assert not np.isnan(out)
        # anchors 1097/1098 are in-window with nonzero sf and inf
        # multiplicity -> total clamps at the finite max
        assert out == 1.7e308

    def test_default_sf_parity_unchanged(self):
        """The zero-indexing rewrite must not change the default-path
        value (cross-check vs the reference queue on a small case)."""
        from lucene_spark.search.phrase import (
            _sloppy_2slot_closed,
            sloppy_phrase_freq,
        )

        rng = np.random.default_rng(7)
        for _ in range(50):
            a = np.sort(rng.choice(60, size=rng.integers(1, 8), replace=False))
            b = np.sort(rng.choice(60, size=rng.integers(1, 8), replace=False))
            slop = int(rng.integers(0, 6))
            want = sloppy_phrase_freq([list(a), list(b)], [0, 1], slop)
            got = _sloppy_2slot_closed(
                a.astype(np.int64), b.astype(np.int64), 1, slop
            )
            assert got == pytest.approx(want, rel=1e-9, abs=1e-12)


class TestQueueBudgetException:
    def test_dedicated_type(self, monkeypatch):
        import lucene_spark.search.phrase as ph

        monkeypatch.setattr(ph, "QUEUE_CANDIDATE_BUDGET", 4)
        positions = [[1, 5, 9, 13], [2, 6, 10, 14], [3, 7, 11, 15]]
        with pytest.raises(ph.PhraseQueueBudgetExceeded):
            ph.sloppy_phrase_freq(positions, [0, 1, 2], slop=50)
        # still a RuntimeError so broad pre-existing handlers keep working
        assert issubclass(ph.PhraseQueueBudgetExceeded, RuntimeError)


class TestCosinePairsGuard:
    def test_refuses_large_input(self, spark, monkeypatch):
        import lucene_spark.ops.similarity as sim

        monkeypatch.setattr(sim, "COSINE_PAIRS_MAX_ROWS", 10)
        df = spark.range(25).selectExpr(
            "id", "array(cast(id as double), 1.0d) as v"
        )
        with pytest.raises(ValueError, match="rp_lsh_pairs"):
            sim.cosine_pairs(df, "id", "v", 0.5)
        # explicit opt-in still runs
        out = sim.cosine_pairs(df, "id", "v", 0.99, allow_quadratic=True)
        assert out.count() > 0

    def test_small_input_unaffected(self, spark):
        from lucene_spark.ops.similarity import cosine_pairs

        df = spark.range(5).selectExpr(
            "id", "array(1.0d, cast(id as double)) as v"
        )
        assert cosine_pairs(df, "id", "v", threshold=-1.0).count() == 10
