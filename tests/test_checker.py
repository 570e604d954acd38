"""Meta-tests of the correctness gate itself: a comparator that can't
fail is worse than no comparator."""

from __future__ import annotations

import pandas as pd

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check import compare  # noqa: E402


def test_compare_passes_on_equal_frames_any_order():
    a = pd.DataFrame({"k": [1, 2, 3], "v": [0.1, 0.2, 0.3]})
    b = pd.DataFrame({"v": [0.3, 0.1, 0.2], "k": [3, 1, 2]})  # shuffled rows+cols
    assert compare("t", a, b) == []


def test_compare_catches_value_drift():
    a = pd.DataFrame({"k": [1, 2], "v": [0.1, 0.2]})
    b = pd.DataFrame({"k": [1, 2], "v": [0.1, 0.2000000001]})
    assert compare("t", a, b) != []


def test_compare_catches_rowcount_and_schema():
    a = pd.DataFrame({"k": [1, 2]})
    assert compare("t", a, pd.DataFrame({"k": [1]})) != []
    assert compare("t", a, pd.DataFrame({"kk": [1, 2]})) != []


def test_compare_handles_nulls_and_nans():
    a = pd.DataFrame({"v": [None, 1.0]})
    b = pd.DataFrame({"v": [None, 1.0]})
    assert compare("t", a, b) == []
    c = pd.DataFrame({"v": [0.5, 1.0]})
    assert compare("t", a, c) != []
