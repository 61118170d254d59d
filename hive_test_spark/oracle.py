"""DuckDB-oracle comparison helpers (SURVEY.md §5.2-5.3) shared by
tools/verify_local.py and the pytest suite.

Mirrors the driver's gate: row count + column names + order-insensitive
canonical value compare (exact for non-floats, exact-then-1e-9-tolerant
for floats, with a bitwise flag so rounding gaps surface early).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from hive_test_spark.io import TABLES, table_path


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.floor("us").isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_df(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def _float_close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isinf(a) or math.isinf(b):
            return a == b
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return False


def rows_equal(a: tuple, b: tuple) -> tuple[bool, bool]:
    """(equal, bitwise) — equal allows float tolerance."""
    if len(a) != len(b):
        return False, False
    bitwise = True
    for x, y in zip(a, b):
        if isinstance(x, tuple) and isinstance(y, tuple):
            eq, bw = rows_equal(x, y)
            if not eq:
                return False, False
            bitwise = bitwise and bw
            continue
        if x == y:
            continue
        if _float_close(x, y):
            bitwise = False
            continue
        return False, False
    return True, bitwise


def _driver_hazards(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Divergences the DRIVER's canonicalizer rejects even though the
    tolerant compare below would pass (diagnosed from CORRECTNESS_r01):
    (a) numeric-kind drift — DuckDB HUGEINT/NULL-able ints surface as
    float64 while Spark stays int64; the driver hashes 28 != 28.0;
    (b) non-scalar cells (ndarray/list/dict/Row) — the driver's pandas
    sort_values crashes with 'unhashable type'. Both must FAIL locally."""
    notes = []
    for c in spark_pdf.columns:
        if c not in duck_pdf.columns:
            continue
        sk, dk = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
        if sk != dk and {sk, dk} <= {"i", "u", "f"} | {"O"} and {sk, dk} != {"O"}:
            notes.append(
                f"dtype divergence on '{c}': spark={spark_pdf[c].dtype} "
                f"duck={duck_pdf[c].dtype} — driver hash mismatch; CAST to align"
            )
    for side, pdf in (("spark", spark_pdf), ("duck", duck_pdf)):
        for c in pdf.columns:
            if pdf[c].dtype.kind != "O":
                continue
            v = next((x for x in pdf[c] if x is not None), None)
            if isinstance(v, (list, tuple, dict)) or type(v).__name__ in ("ndarray", "Row"):
                notes.append(
                    f"non-scalar cells in {side}.'{c}' ({type(v).__name__}) — "
                    "driver canonicalizer crash; serialize to string"
                )
    return notes


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> dict:
    res = {"key": name, "ok": False, "bitwise": True, "notes": []}
    if len(spark_pdf) != len(duck_pdf):
        res["notes"].append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return res
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        res["notes"].append(f"columns spark={sc} duck={dc}")
        return res
    hazards = _driver_hazards(spark_pdf, duck_pdf)
    if hazards:
        res["notes"].extend(hazards)
        return res
    a, b = canon_df(spark_pdf), canon_df(duck_pdf)
    for i, (ra, rb) in enumerate(zip(a, b)):
        eq, bw = rows_equal(ra, rb)
        if not eq:
            res["notes"].append(f"row {i} differs:\n  spark={ra}\n  duck ={rb}")
            if len(res["notes"]) > 3:
                break
            continue
        res["bitwise"] = res["bitwise"] and bw
    if not any(n.startswith("row ") for n in res["notes"]):
        res["ok"] = True
        if not res["bitwise"]:
            res["notes"].append("float-tolerant match only (add rounding?)")
    return res
