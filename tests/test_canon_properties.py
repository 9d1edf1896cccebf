"""Property tests (hypothesis) for the pure canonicalization layer the
parity hash depends on — if _canon is wrong, every hash comparison is
built on sand (SURVEY.md §6 layer 3)."""

from __future__ import annotations

import decimal
import math

from hypothesis import given
from hypothesis import strategies as st

from tools.parity import _canon


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_canon_float_rounding_idempotent(x):
    # _canon compares floats at 9 decimals; a value and its 9-decimal
    # rounding must therefore canonicalize identically.
    assert _canon(x) == _canon(round(x, 9))


def test_canon_zero_signs_collapse():
    assert _canon(0.0) == _canon(-0.0) == "0.0"
    assert _canon(decimal.Decimal("0")) == _canon(decimal.Decimal("-0")) == "0.0"


@given(st.decimals(allow_nan=False, allow_infinity=False, places=6,
                   min_value=-10**12, max_value=10**12))
def test_canon_decimal_matches_equal_float(d):
    f = float(d)
    if math.isfinite(f) and abs(f) < 1e15:
        assert _canon(d) == _canon(f)


@given(st.integers(min_value=-2**63, max_value=2**63 - 1))
def test_canon_int_is_repr(n):
    assert _canon(n) == str(n)


def test_canon_nan_and_null():
    assert _canon(None) == "NULL"
    assert _canon(float("nan")) == "NaN"
