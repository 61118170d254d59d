"""Randomized differential testing (SURVEY.md §5.5): hypothesis generates
typed query specs (filters + grouping + aggregates) over the TPC-H-ish
fixtures; each spec is rendered TWICE — once through the DataFrame API
(the engine under test) and once as ANSI SQL for DuckDB — and the results
are compared with the same canonicalizer the driver-mirror gate uses.

This covers the combinatorial space BETWEEN the 270 hand-written oracle
pairs: random predicate/aggregate combinations that no fixed key
exercises, catching wiring bugs (wrong null semantics, precision drift,
filter/projection mix-ups) where both renderings must agree.

Determinism: ``derandomize=True`` makes hypothesis replay the same
example set every run — this is a regression net, not a flaky explorer.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hive_test_spark.io import load_table
from hive_test_spark.oracle import compare, duck_connect
from tests.conftest import SF_DIR

# Typed column inventory per table: (numeric cols, categorical cols with
# their value domains, integer key cols). Domains mirror TESTDATA.md.
TABLES = {
    "lineitem": {
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "cat": {
            "l_returnflag": ["A", "N", "R"],
            "l_linestatus": ["F", "O"],
        },
        "key": ["l_orderkey", "l_partkey", "l_suppkey"],
    },
    "orders": {
        "num": ["o_totalprice"],
        "cat": {
            "o_orderstatus": ["F", "O", "P"],
            "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        },
        "key": ["o_orderkey", "o_custkey"],
    },
    "customer": {
        "num": ["c_acctbal"],
        "cat": {"c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]},
        "key": ["c_custkey", "c_nationkey"],
    },
}

_NUM_OPS = ["<", "<=", ">", ">=", "!="]  # = on doubles is fragile; skip


@st.composite
def query_specs(draw):
    table = draw(st.sampled_from(sorted(TABLES)))
    t = TABLES[table]

    preds = []
    for _ in range(draw(st.integers(0, 2))):
        kind = draw(st.sampled_from(["num", "cat", "cat_in", "key_mod"]))
        if kind == "num":
            col = draw(st.sampled_from(t["num"]))
            op = draw(st.sampled_from(_NUM_OPS))
            lit = round(draw(st.floats(0.0, 100.0, allow_nan=False)), 2)
            preds.append(("num", col, op, lit))
        elif kind == "cat":
            col = draw(st.sampled_from(sorted(t["cat"])))
            val = draw(st.sampled_from(t["cat"][col]))
            preds.append(("cat_eq", col, draw(st.sampled_from(["=", "!="])), val))
        elif kind == "cat_in":
            col = draw(st.sampled_from(sorted(t["cat"])))
            vals = draw(
                st.lists(st.sampled_from(t["cat"][col]), min_size=1, unique=True)
            )
            preds.append(("cat_in", col, sorted(vals)))
        else:
            col = draw(st.sampled_from(t["key"]))
            mod = draw(st.integers(2, 7))
            rem = draw(st.integers(0, 1))
            preds.append(("key_mod", col, mod, rem))

    group = draw(
        st.lists(st.sampled_from(sorted(t["cat"])), max_size=2, unique=True)
    )

    aggs = [("count", None)]  # always present: pins the row multiplicity
    for _ in range(draw(st.integers(1, 3))):
        fn = draw(st.sampled_from(["sum", "min", "max", "avg", "count_distinct"]))
        col = draw(
            st.sampled_from(t["key"] if fn == "count_distinct" else t["num"])
        )
        agg = (fn, col)
        if agg not in aggs:
            aggs.append(agg)

    return {"table": table, "preds": preds, "group": group, "aggs": aggs}


def _pred_sql(p) -> str:
    if p[0] == "num":
        return f"{p[1]} {p[2]} {p[3]}"
    if p[0] == "cat_eq":
        return f"{p[1]} {p[2]} '{p[3]}'"
    if p[0] == "cat_in":
        vals = ", ".join(f"'{v}'" for v in p[2])
        return f"{p[1]} IN ({vals})"
    return f"{p[1]} % {p[2]} = {p[3]}"


def _pred_col(p):
    if p[0] == "num":
        c = F.col(p[1])
        return {"<": c < p[3], "<=": c <= p[3], ">": c > p[3], ">=": c >= p[3], "!=": c != p[3]}[p[2]]
    if p[0] == "cat_eq":
        c = F.col(p[1])
        return c == p[3] if p[2] == "=" else c != p[3]
    if p[0] == "cat_in":
        return F.col(p[1]).isin(p[2])
    return F.col(p[1]) % p[2] == p[3]


def _agg_name(fn, col) -> str:
    return f"{fn}_{col}" if col else "n_rows"


def _agg_sql(fn, col) -> str:
    a = _agg_name(fn, col)
    if fn == "count":
        return f"COUNT(*) AS {a}"
    if fn == "count_distinct":
        return f"COUNT(DISTINCT {col}) AS {a}"
    if fn == "avg":
        return f"ROUND(AVG({col}), 6) AS {a}"
    if fn == "sum":
        return f"ROUND(SUM({col}), 6) AS {a}"
    return f"{fn.upper()}({col}) AS {a}"


def _agg_col(fn, col):
    a = _agg_name(fn, col)
    if fn == "count":
        return F.count(F.lit(1)).alias(a)
    if fn == "count_distinct":
        return F.count_distinct(F.col(col)).alias(a)
    if fn == "avg":
        return F.round(F.avg(col), 6).alias(a)
    if fn == "sum":
        return F.round(F.sum(col), 6).alias(a)
    return getattr(F, fn)(F.col(col)).alias(a)


def _render_sql(spec) -> str:
    where = (
        " WHERE " + " AND ".join(_pred_sql(p) for p in spec["preds"])
        if spec["preds"]
        else ""
    )
    aggs = ", ".join(_agg_sql(fn, col) for fn, col in spec["aggs"])
    if spec["group"]:
        keys = ", ".join(spec["group"])
        return f"SELECT {keys}, {aggs} FROM {spec['table']}{where} GROUP BY {keys}"
    return f"SELECT {aggs} FROM {spec['table']}{where}"


def _render_df(spark, spec):
    df = load_table(spark, SF_DIR, spec["table"])
    for p in spec["preds"]:
        df = df.filter(_pred_col(p))
    aggs = [_agg_col(fn, col) for fn, col in spec["aggs"]]
    if spec["group"]:
        return df.groupBy(*spec["group"]).agg(*aggs)
    return df.agg(*aggs)


@pytest.fixture(scope="module")
def duck(spark):
    return duck_connect(SF_DIR)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=query_specs())
def test_random_query_spec_matches_duckdb(spark, duck, spec):
    spark_pdf = _render_df(spark, spec).toPandas()
    duck_pdf = duck.execute(_render_sql(spec)).df()
    r = compare("fuzz", spark_pdf, duck_pdf)
    assert r["ok"], f"spec={spec}\nsql={_render_sql(spec)}\nnotes={r['notes']}"
