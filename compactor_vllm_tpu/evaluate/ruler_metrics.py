"""RULER scoring (reference: evaluate/ruler_metrics.py:11-36, NVIDIA-derived).

Both metrics score a prediction against the list of reference answers; RULER
tasks use `string_match_all` for multi-needle tasks and `string_match_part`
otherwise.
"""

from __future__ import annotations


def string_match_part(pred: str, refs: list[str]) -> float:
    """1.0 if any reference string appears in the prediction."""
    pred = pred.lower()
    score = max(
        (1.0 if str(r).lower() in pred else 0.0) for r in refs
    )
    return score


def string_match_all(pred: str, refs: list[str]) -> float:
    """Fraction of reference strings that appear in the prediction."""
    pred = pred.lower()
    hits = sum(1.0 for r in refs if str(r).lower() in pred)
    return hits / max(len(refs), 1)


METRICS = {
    "string_match_part": string_match_part,
    "string_match_all": string_match_all,
}
