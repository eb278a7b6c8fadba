"""Regression gate for the driver contract: every queries() entry runs, and a
fast subset is compared against its DuckDB oracle at sf0.001 exactly the way
the driver does (column names, row count, order-insensitive values).
The full comparison at sf0.01 is tools/check_oracle.py.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

FAST_ORACLE_SUBSET = [
    "cdc_assembly",
    "cdc_assembly_pandas",
    "cdc_final_state",
    "agg_pricing_summary",
    "dedup_exact",
    "ann_topk_dot",
    "text_quality",
    "multimodal_meta",
]


def _norm_cell(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted((tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr)
    return [cols[i] for i in order], out


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "ts_str"]


def test_all_queries_run_and_oracles_exist(spark):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 25
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # SQL-expressible coverage: at most a couple rows-only entries
    assert len(set(qs) - set(oracles)) <= 2


@pytest.mark.parametrize("name", FAST_ORACLE_SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = duck.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    sc, sr = _norm(scols, srows)
    oc, orr = _norm(ocols, orows)
    assert sc == oc, f"{name}: column mismatch {sc} vs {oc}"
    assert len(sr) == len(orr), f"{name}: rowcount {len(sr)} vs {len(orr)}"
    assert sr == orr, f"{name}: value mismatch"


# G3 window form (last committed surviving WRITE wins, whole-row): was the
# cdc_lww_dedup registry row through round 4; consolidated out of the
# driver's 50-row oracle budget (round-4 verdict item 2) and pinned here with
# the identical DuckDB oracle instead.
_LWW_ORACLE = entrymod.FEED_SQL + """,
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY commit_scn DESC, scn DESC) AS rn
  FROM surv
)
SELECT conv_id, turn_idx,
  CASE WHEN NOT trimmed THEN event_type END AS role,
  text_v AS text,
  CASE WHEN NOT trimmed THEN strftime(src_ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_str
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def test_lww_dedup_matches_oracle(spark, duck):
    sdf = entrymod._q_lww_dedup(spark, SF)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = duck.execute(_LWW_ORACLE)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    sc, sr = _norm(scols, srows)
    oc, orr = _norm(ocols, orows)
    assert sc == oc
    assert len(sr) == len(orr)
    assert sr == orr
