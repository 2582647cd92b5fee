"""Metric-scalar coercion shared by logs consumers.

With ``--steps-per-call`` K>1 (train/multi.py) each logged metric entry is
a stacked ``(K,)`` device array rather than a 0-d scalar; consumers want
"the latest step's value" either way. ``float(np.asarray(...))`` is the
host sync point — callers invoke this only when they actually emit
(reference keeps the same contract via per-batch tqdm floats,
trainers/trainer.py:100-104).
"""
from __future__ import annotations

import numpy as np


def last_scalar(value) -> float:
    """Latest per-step value of a logged metric entry: a python number,
    a 0-d device scalar, or a (K,) stacked chunk (last element)."""
    arr = np.ravel(np.asarray(value))
    return float(arr[-1])
