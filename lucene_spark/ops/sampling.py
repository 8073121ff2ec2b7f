"""Deterministic dataset splitting / sampling for training pipelines.

Everything is driven by the shared md5-int64 primitive (``md5_long``),
so assignments are (a) reproducible across runs, clusters and engines,
(b) independent of partitioning/row order — a doc's split follows its
id, never its position, and (c) exactly mirrorable as ANSI SQL for the
DuckDB oracle. One projection per op — no shuffle, no sampling RNG
state, scales as a pure map at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.ops.dedup import md5_long

HASH_SPACE = 1_000_000  # split thresholds quantized to ppm


def _unit_hash(id_col: str, salt: str):
    """Deterministic value in [0, 1e6) from (salt, id) — the shared
    md5-int64 reduced mod the ppm space."""
    return md5_long(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    ) % F.lit(HASH_SPACE)


def hash_split(
    df: DataFrame,
    id_col: str,
    ratios: dict[str, float],
    salt: str = "split",
    rest_name: str | None = None,
) -> DataFrame:
    """Assign every row to a named split (train/val/test…) by hashed id.

    ``ratios`` maps split name → fraction. Fractions must sum to ~1.0;
    a shortfall is an error UNLESS ``rest_name`` names an explicit
    catch-all split for the remainder — silently inflating the last
    named split (e.g. {train: .8, val: .1} quietly making val 20%)
    is exactly the kind of eval-set contamination this op exists to
    prevent. Assignment is a pure function of (salt, id): stable under
    re-runs, re-partitioning, appends — a doc never migrates between
    splits when the corpus grows, which is the property that keeps
    eval sets uncontaminated across dataset versions.
    """
    for name, r in ratios.items():
        if not 0 <= r <= 1:
            raise ValueError(f"ratio for {name!r} must be in [0, 1], got {r}")
    total = sum(ratios.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"ratios must sum to <= 1, got {total}")
    if rest_name is None:
        if abs(total - 1.0) > 1e-6:
            raise ValueError(
                f"ratios sum to {total}, not 1.0 — name the remainder "
                f"explicitly via rest_name to allocate the other "
                f"{1.0 - total:.6g} instead of silently inflating the "
                f"last split"
            )
        names = list(ratios)
    else:
        if rest_name in ratios:
            raise ValueError(f"rest_name {rest_name!r} is already a ratio key")
        names = list(ratios) + [rest_name]
    h = _unit_hash(id_col, salt)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += ratios[name]
        cond = h < int(round(acc * HASH_SPACE))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.select(F.col(id_col).alias("id"), split.alias("split"))


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~``fraction`` subsample by hashed id (the rows
    whose hash falls under the threshold — stable across runs and
    growth, unlike ``DataFrame.sample``'s partition-seeded RNG)."""
    if not 0 <= fraction <= 1:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    h = _unit_hash(id_col, salt)
    return df.where(h < int(round(fraction * HASH_SPACE)))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps ~fractions[s]
    of its rows (``default_fraction`` for unlisted strata). The usual
    rebalancing tool — e.g. downsample boilerplate-heavy sources while
    keeping rare ones whole — with the same id-stable guarantees as
    :func:`hash_sample`."""
    h = _unit_hash(id_col, salt)
    thr = F.lit(int(round(default_fraction * HASH_SPACE)))
    for s, f in fractions.items():
        if not 0 <= f <= 1:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
        thr = F.when(
            F.col(strata_col) == s, F.lit(int(round(f * HASH_SPACE)))
        ).otherwise(thr)
    return df.where(h < thr)
