"""Mutation tests for the oracle comparator itself: the gate must FAIL
on wrong answers, flag knife-edge floats as RISKY, and stay
order-insensitive — guarding against a silently-vacuous correctness
harness."""

import importlib.util
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    "check_contract",
    os.path.join(os.path.dirname(__file__), "..", "tools", "check_contract.py"),
)
cc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cc)


def _base():
    return pd.DataFrame(
        {"k": ["a", "b", "c"], "n": [1, 2, 3], "v": [0.25, 0.5, np.nan]}
    )


def test_identical_frames_pass():
    assert cc.compare("q", _base(), _base())[0] == "OK"


def test_row_and_column_order_insensitive():
    shuffled = _base().iloc[[2, 0, 1]][["v", "k", "n"]]
    assert cc.compare("q", _base(), shuffled)[0] == "OK"


def test_nan_equals_nan():
    a, b = _base(), _base()
    assert a["v"].isna().any()
    assert cc.compare("q", a, b)[0] == "OK"


def test_changed_int_fails():
    b = _base()
    b.loc[1, "n"] = 99
    assert cc.compare("q", _base(), b)[0] == "FAIL"


def test_changed_string_fails():
    b = _base()
    b.loc[0, "k"] = "zzz"
    assert cc.compare("q", _base(), b)[0] == "FAIL"


def test_float_ulp_drift_is_risky_not_ok():
    b = _base()
    b.loc[0, "v"] = 0.25 + 1e-12
    status, msg = cc.compare("q", _base(), b)
    assert status == "RISKY" and "v" in msg


def test_float_real_difference_fails():
    b = _base()
    b.loc[0, "v"] = 0.251
    assert cc.compare("q", _base(), b)[0] == "FAIL"


def test_missing_row_fails():
    assert cc.compare("q", _base(), _base().iloc[:2])[0] == "FAIL"


def test_renamed_column_fails():
    b = _base().rename(columns={"n": "cnt"})
    assert cc.compare("q", _base(), b)[0] == "FAIL"
