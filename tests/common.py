"""Shared helpers for the golden-oracle tests.

The reference repo's tiny-model fixtures and expected-logits binaries
(/root/reference/tests) are the numeric oracles — same protocol as
tests/logit_difference_validator.inc: feed the 3-byte prompt '"in'
(tokens 34, 105, 110), sum logits[i] - expected[i] over the 256-token byte
vocab, assert |sum| <= |expected_sum| * 1.05.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

FIXTURE_DIR = os.environ.get("RWKV_TPU_FIXTURES", "/root/reference/tests")

PROMPT = [34, 105, 110]  # '"in'
N_VOCAB = 256

VERSIONS = ["4v0-660K", "5v1-730K", "5v2-730K", "6v0-3m", "7v0-834K"]


def fixture(name: str) -> str:
    path = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not available")
    return path


def expected_logits(version: str) -> np.ndarray:
    return np.fromfile(fixture(f"expected-logits-{version}.bin"), dtype=np.float32)


def logit_diff_sum(logits, expected) -> float:
    return float(np.sum(np.asarray(logits, dtype=np.float32) - expected))


def assert_diff_ok(diff_sum: float, expected_sum: float, what: str = ""):
    assert abs(diff_sum) <= abs(expected_sum) * 1.05, (
        f"{what}: logit difference sum {diff_sum:+.6f} exceeds "
        f"|{expected_sum:+.6f}| * 1.05"
    )
