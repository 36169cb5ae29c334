"""Octopi evaluation: property ranking and encoder classification metrics.

Equivalent of ``/root/reference/octopi/octopi_s/evaluate_llm.py`` (ranking
Kendall-tau + accuracy vs ground truth, ``:9-115``) and the encoder test
harness (``test_encoder.py:42-109``: threshold classification accuracy and
pairwise comparison success).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import numpy as np
from scipy.stats import kendalltau


def parse_ranking(text: str, items: Sequence[str]) -> Optional[list]:
    """Extract a ranking of ``items`` from generated text: the order of first
    mention of each item (the reference parses 'object A > object B'-style
    outputs; first-mention order is its fallback)."""
    positions = {}
    low = text.lower()
    for it in items:
        m = re.search(re.escape(it.lower()), low)
        if m is None:
            return None
        positions[it] = m.start()
    return sorted(items, key=lambda it: positions[it])


def evaluate_ranking(predicted: Sequence[Sequence[str]],
                     ground_truth: Sequence[Sequence[str]]) -> dict:
    """Kendall-tau + exact-match accuracy over ranking pairs
    (evaluate_llm.py:9-115)."""
    taus, exact = [], []
    for pred, gt in zip(predicted, ground_truth):
        if pred is None or set(pred) != set(gt):
            exact.append(0.0)
            continue
        rank_gt = {item: i for i, item in enumerate(gt)}
        pred_ranks = [rank_gt[item] for item in pred]
        tau, _ = kendalltau(pred_ranks, list(range(len(gt))))
        taus.append(tau)
        exact.append(1.0 if list(pred) == list(gt) else 0.0)
    return {
        "kendall_tau": float(np.mean(taus)) if taus else 0.0,
        "accuracy": float(np.mean(exact)) if exact else 0.0,
        "num_evaluated": len(exact),
    }


def evaluate_reasoning(predictions: Sequence[str],
                       targets: Sequence[str]) -> dict:
    """Scenario-reasoning accuracy (evaluate_llm.py:116+): a prediction is
    correct when it names the target object (first object mentioned wins
    when several appear)."""
    correct = 0
    for pred, target in zip(predictions, targets):
        m = re.search(r"object\s+([A-Za-z0-9_]+)", pred or "", re.IGNORECASE)
        named = (f"object {m.group(1)}".lower() if m else (pred or "").lower())
        if target.lower() in named or named in target.lower():
            correct += 1
    return {"accuracy": correct / max(len(targets), 1),
            "num_evaluated": len(targets)}


def threshold_classification_accuracy(preds: np.ndarray, labels: np.ndarray,
                                      threshold: float) -> float:
    """Scalar-property binary classification by threshold
    (test_encoder.py:42-109: e.g. soft/hard at a hardness cut)."""
    p = np.asarray(preds).reshape(-1) > threshold
    l = np.asarray(labels).reshape(-1) > threshold
    return float(np.mean(p == l))


def pairwise_comparison_success(preds: np.ndarray, labels: np.ndarray) -> float:
    """Fraction of ordered pairs whose predicted property ordering matches
    ground truth (the 'N of M comparisons correct' metric)."""
    p = np.asarray(preds).reshape(-1)
    l = np.asarray(labels).reshape(-1)
    n = len(p)
    correct, total = 0, 0
    for i in range(n):
        for j in range(i + 1, n):
            if l[i] == l[j]:
                continue
            total += 1
            if (p[i] > p[j]) == (l[i] > l[j]):
                correct += 1
    return correct / total if total else 1.0
