"""Token sampling: softmax -> logit bias -> top-p nucleus -> temperature.

Behavior contract from the reference (sampling.py:10-52): temperature 0 means
argmax; top_p 0 is treated as 1 (disabled); logit bias is applied in log space;
temperature is applied as probs**(1/T) after the nucleus cut.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32)
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def sample_logits(
    logits,
    temperature: float = 1.0,
    top_p: float = 0.8,
    logit_bias: Optional[Dict[int, float]] = None,
    rng: Optional[np.random.Generator] = None,
) -> int:
    return sample_probs(softmax(np.asarray(logits)), temperature, top_p, logit_bias, rng)


def sample_probs(
    probs: np.ndarray,
    temperature: float = 1.0,
    top_p: float = 0.8,
    logit_bias: Optional[Dict[int, float]] = None,
    rng: Optional[np.random.Generator] = None,
) -> int:
    if temperature < 0.0:
        raise ValueError("temperature")
    if not (0.0 <= top_p <= 1.0):
        raise ValueError("top_p")
    probs = np.asarray(probs, dtype=np.float32).copy()

    if top_p == 0.0:
        top_p = 1.0

    if logit_bias:
        logp = np.log(probs)
        ids = list(logit_bias.keys())
        logp[ids] += np.asarray(list(logit_bias.values()), dtype=np.float32)
        logp -= logp.max()
        e = np.exp(logp)
        probs = e / e.sum()

    if temperature == 0.0:
        return int(np.argmax(probs))

    if top_p < 1.0:
        sorted_probs = np.sort(probs)[::-1]
        cum = np.cumsum(sorted_probs)
        cutoff = float(sorted_probs[np.argmax(cum > top_p)])
        probs[probs < cutoff] = 0.0

    if temperature != 1.0:
        probs = np.power(probs, 1.0 / temperature)

    probs /= probs.sum()
    rng = rng if rng is not None else np.random.default_rng()
    return int(rng.choice(len(probs), p=probs))
