"""Segmented-range helpers shared by the pair-generation kernels."""

from __future__ import annotations

import numpy as np


def segmented_arange(span: np.ndarray) -> np.ndarray:
    """``concatenate([arange(s) for s in span])`` without the Python loop.

    The in-run pair-generation idiom used by the phash Hamming near-dup,
    the triangle-count wedge builder and the FastSS bucket verifier:
    ``np.arange(total) - np.repeat(cumsum(span) - span, span)``.
    """
    span = np.asarray(span, dtype=np.int64)
    if not len(span):
        return np.zeros(0, dtype=np.int64)
    total = int(span.sum())
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(span) - span, span
    )
