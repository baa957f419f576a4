"""Differential fuzz of JSONFilter (P1) coercion semantics.

The reference coerces BOTH sides to float64 when both parse
(``json_filter.go:339-412``): eq/ne fall back to string comparison
otherwise; ordered ops (gt/gte/lt/lte) require numeric coercion and are
false otherwise; contains is pure string; rules AND implicitly. Spark's
``json_filter`` compiles that to try_cast Columns; this module
re-expresses the semantics independently in DuckDB SQL and drives both
with Hypothesis over coercion-adversarial tables, plus a deterministic
exhaustive op × value sweep (every config every run, not just what
Hypothesis samples).

Engine-parity corners verified before trusting the oracle: try_cast of
'inf'/'NaN'/'Infinity'/' 1'/'1e0'/'.5'/'5.'/'+1'/'01'/'' is identical
across Spark 4 and DuckDB; both treat NaN = NaN as TRUE and NaN as
greater than any float; contains(x, '') is TRUE in both; a NULL
predicate drops the row in both.
"""

from __future__ import annotations

from functools import reduce

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from semstreams_spark.operators.transforms import FilterRule, json_filter

FIELDS = ["f1", "f2", "f3"]
# same coercion-adversarial pool as tests/test_rules_fuzz.py (kept in
# sync by the parity probes in the module docstring)
VALUES = [
    "1", "1.0", "01", "+1", " 1", "1e0", ".5", "5.", "0.5", "-3", "10",
    "9.99", "abc", "", "a1", "1a", "abcdef", "abx", "xbc", "NaN", "inf",
]
OPS = ["eq", "ne", "lt", "lte", "gt", "gte", "contains"]


def _sql_cond(r: FilterRule) -> str:
    col = f'"{r.field}"'
    v = r.value.replace("'", "''")
    tc, tv = f"try_cast({col} AS DOUBLE)", f"try_cast('{v}' AS DOUBLE)"
    both = f"({tc} IS NOT NULL AND {tv} IS NOT NULL)"
    if r.op in ("eq", "ne"):
        sym = "=" if r.op == "eq" else "<>"
        return f"(CASE WHEN {both} THEN {tc} {sym} {tv} ELSE {col} {sym} '{v}' END)"
    if r.op in ("gt", "gte", "lt", "lte"):
        sym = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}[r.op]
        return f"({both} AND {tc} {sym} {tv})"
    assert r.op == "contains"
    return f"contains({col}, '{v}')"


def _run_both(spark, rows, rule_lists):
    """One Spark action for ALL rule lists (tagged union), one DuckDB
    query per list; compares surviving row-id sets per list."""
    pdf = pd.DataFrame(rows, columns=FIELDS)
    pdf.insert(0, "id", range(len(pdf)))
    sdf = spark.createDataFrame(pdf)
    parts = [
        json_filter(sdf, rl).select(F.lit(i).alias("g"), "id")
        for i, rl in enumerate(rule_lists)
    ]
    got: dict[int, set[int]] = {i: set() for i in range(len(rule_lists))}
    for r in reduce(lambda a, b: a.unionByName(b), parts).collect():
        got[r["g"]].add(r["id"])

    con = duckdb.connect()
    con.register("t", pdf)
    want = {}
    for i, rl in enumerate(rule_lists):
        cond = " AND ".join(_sql_cond(r) for r in rl)
        want[i] = {x[0] for x in con.execute(f"SELECT id FROM t WHERE {cond}").fetchall()}
    con.close()
    return got, want


rule_strategy = st.builds(
    FilterRule,
    field=st.sampled_from(FIELDS),
    op=st.sampled_from(OPS),
    value=st.sampled_from(VALUES),
)
rows_strategy = st.lists(
    st.tuples(*(st.sampled_from(VALUES) for _ in FIELDS)), min_size=1, max_size=25
)
rule_lists_strategy = st.lists(
    st.lists(rule_strategy, min_size=1, max_size=3), min_size=1, max_size=4
)


@given(rows=rows_strategy, rule_lists=rule_lists_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_json_filter_differential_fuzz(spark, rows, rule_lists):
    got, want = _run_both(spark, rows, rule_lists)
    assert got == want


def test_json_filter_exhaustive_sweep(spark):
    """Every op × value single-rule config (147) plus a two-rule AND
    grid, ONE Spark pass, over a table that pairs every value with
    every field."""
    rows = [
        (VALUES[i % len(VALUES)], VALUES[(i * 5 + 3) % len(VALUES)], VALUES[(i * 11 + 7) % len(VALUES)])
        for i in range(40)
    ]
    singles = [[FilterRule(FIELDS[i % 3], op, v)] for i, (op, v) in
               enumerate((op, v) for op in OPS for v in VALUES)]
    pairs = [
        [FilterRule("f1", op1, "1"), FilterRule("f2", op2, "abc")]
        for op1 in OPS
        for op2 in OPS
    ]
    got, want = _run_both(spark, rows, singles + pairs)
    assert got == want
