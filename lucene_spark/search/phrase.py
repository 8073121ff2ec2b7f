"""Phrase frequency algorithms, shared by the pure-Python model and the
Spark executor's pandas UDF (single source of truth for parity).

Reference: exact — Phrase.php:378-415; sloppy — Phrase.php:425-491 with
sloppyFreq(d)=1/(d+1) accumulation (DefaultSimilarity.php:62-65).
"""

from __future__ import annotations

from lucene_spark.search.similarity import sloppy_freq


def exact_phrase_freq(positions: list[list[int]], offsets: list[int]) -> float:
    """Count alignments anchored on the rarest term's positions."""
    low = min(range(len(positions)), key=lambda i: len(positions[i]))
    others = [
        (i, set(positions[i])) for i in range(len(positions)) if i != low
    ]
    freq = 0
    for p in positions[low]:
        ok = True
        for i, pset in others:
            if p + (offsets[i] - offsets[low]) not in pset:
                ok = False
                break
        if ok:
            freq += 1
    return float(freq)


def sloppy_phrase_freq(
    positions: list[list[int]], offsets: list[int], slop: int
) -> float:
    """Candidate-tuple construction + min-shift distance, verbatim
    semantics of the reference's incremental phrase queue."""
    phrase_queue: list[dict[int, int]] = [{}]
    last_term: int | None = None
    for term_id in range(len(positions)):
        first_pass = True
        for pos in positions[term_id]:
            if first_pass:
                for cand in phrase_queue:
                    cand[term_id] = pos
            else:
                for cand in list(phrase_queue):
                    if last_term is not None and abs(
                        pos - cand[last_term] - (offsets[term_id] - offsets[last_term])
                    ) > slop:
                        continue
                    new = dict(cand)
                    new[term_id] = pos
                    phrase_queue.append(new)
            first_pass = False
        last_term = term_id
    freq = 0.0
    for cand in phrase_queue:
        min_distance = None
        for shift in range(-slop, slop + 1):
            distance = 0
            start = next(iter(cand.values())) - offsets[0] + shift
            for term_id in range(len(positions)):
                distance += abs(cand[term_id] - offsets[term_id] - start)
                if distance > slop:
                    break
            if min_distance is None or distance < min_distance:
                min_distance = distance
        if min_distance is not None and min_distance <= slop:
            freq += sloppy_freq(min_distance)
    return freq


def phrase_freq(
    positions: list[list[int]], offsets: list[int], slop: int
) -> float:
    if slop == 0:
        return exact_phrase_freq(positions, offsets)
    return sloppy_phrase_freq(positions, offsets, slop)
