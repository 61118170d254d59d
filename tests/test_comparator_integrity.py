"""Harness-integrity tests: the DuckDB comparator must FAIL when results
genuinely differ. Every green row in CORRECTNESS_r*.json is only as
strong as compare()'s ability to reject corruption — a canonicalizer bug
that silently passes everything would look identical to a perfect
engine. These tests mutate known-good results in each failure dimension
(values, rows, columns, dtypes, cell shapes) and assert detection, plus
pin the tolerances that must NOT reject (row order, sub-1e-9 float
noise).
"""

from __future__ import annotations

import pandas as pd

from hive_test_spark.oracle import compare
from tests.conftest import SF_DIR


def _base():
    return pd.DataFrame(
        {"k": [1, 2, 3], "name": ["a", "b", "c"], "v": [1.5, 2.5, 3.5]}
    )


def test_identical_frames_pass_bitwise():
    r = compare("t", _base(), _base())
    assert r["ok"] and r["bitwise"]


def test_row_order_is_canonicalized_away():
    shuffled = _base().iloc[[2, 0, 1]].reset_index(drop=True)
    assert compare("t", _base(), shuffled)["ok"]


def test_value_mutation_detected():
    m = _base()
    m.loc[1, "v"] = 2.6
    r = compare("t", _base(), m)
    assert not r["ok"] and any(n.startswith("row ") for n in r["notes"])


def test_string_mutation_detected():
    m = _base()
    m.loc[0, "name"] = "z"
    assert not compare("t", _base(), m)["ok"]


def test_dropped_row_detected():
    assert not compare("t", _base(), _base().iloc[:2])["ok"]


def test_renamed_column_detected():
    m = _base().rename(columns={"v": "value"})
    r = compare("t", _base(), m)
    assert not r["ok"] and any("columns" in n for n in r["notes"])


def test_int_float_dtype_drift_detected():
    # The driver hashes 28 != 28.0 — the local gate must reject what the
    # driver would reject, even though values are numerically equal.
    m = _base()
    m["k"] = m["k"].astype("float64")
    r = compare("t", _base(), m)
    assert not r["ok"] and any("dtype divergence" in n for n in r["notes"])


def test_non_scalar_cell_detected():
    m = _base().astype({"name": object})
    m.at[0, "name"] = ["a"]
    r = compare("t", _base(), m)
    assert not r["ok"] and any("non-scalar" in n for n in r["notes"])


def test_float_noise_within_tolerance_passes_but_flags_nonbitwise():
    m = _base()
    m["v"] = m["v"] + 1e-12
    r = compare("t", _base(), m)
    assert r["ok"] and not r["bitwise"]


def test_float_difference_beyond_tolerance_detected():
    m = _base()
    m["v"] = m["v"] + 1e-6
    assert not compare("t", _base(), m)["ok"]


def test_null_vs_value_detected():
    m = _base()
    m.loc[2, "v"] = None
    assert not compare("t", _base(), m)["ok"]


# --- end-to-end: a mutated ORACLE must fail against the real query ------
# (spark/duck/registry are the session-scoped conftest fixtures)


def test_mutated_oracle_fails_end_to_end(spark, registry, duck):
    """Run flagship Spark-side against a sabotaged oracle (every sum
    shifted by 1): the full verify path must reject it — proving the
    green sweeps exercise a comparator that can actually say no."""
    qs, oracles = registry
    key = "flagship_pricing_summary"
    spark_pdf = qs[key](spark, SF_DIR).toPandas()
    good = duck.execute(oracles[key]).df()
    assert compare(key, spark_pdf, good)["ok"], "sanity: unmutated passes"
    mutated = good.copy()
    num_cols = [c for c in mutated.columns if mutated[c].dtype.kind in "if"]
    mutated[num_cols[0]] = mutated[num_cols[0]] + 1
    assert not compare(key, spark_pdf, mutated)["ok"]
