"""Driver-contract replication: every oracle-backed query must match
DuckDB at sf0.001 on row count, column names and sorted value hash."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return sorted(df.itertuples(index=False, name=None))


def _oracle_cases():
    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q), "oracle entries must have a query"
    return [(name, q[name], o[name]) for name in o]


@pytest.mark.parametrize("name,fn,sql", _oracle_cases(),
                         ids=[n for n, _, _ in _oracle_cases()])
def test_query_matches_oracle(con, name, fn, sql):
    got = _to_pandas(fn(SF_DIR))
    exp = con.execute(sql).fetchdf()
    assert len(got) == len(exp), f"{name}: row count"
    assert sorted(got.columns) == sorted(exp.columns), f"{name}: columns"
    assert _canon(got) == _canon(exp), f"{name}: values"


def test_rows_only_queries_run():
    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    for name in set(q) - set(o):
        got = _to_pandas(q[name](SF_DIR))
        assert len(got) >= 0, name


def test_entry_smoke():
    import __ray_entry__ as e

    out = _to_pandas(e.entry())
    assert len(out) > 0
    assert "subj" in out.columns and "pred" in out.columns


def test_oracle_sql_first_ordering(con, monkeypatch, tmp_path):
    """A driver that evaluates oracle SQL BEFORE running any query must
    still find valid kg/canon/ivf/parity artifacts: oracle_sql() itself
    materializes them (VERDICT r3 #6).  Simulate the cold-cache case by
    wiping the artifact dirs, then run the artifact-backed SQL with no
    prior query call."""
    import shutil

    import __ray_entry__ as e
    from aisafetyintervention_literatureextraction_ray import driver_queries as dq

    for d in (dq._KG_ORACLE_DIR, dq._IVF_ORACLE_DIR, dq._PARITY_DIR):
        shutil.rmtree(d, ignore_errors=True)
    monkeypatch.setenv("GRAFT_ORACLE_SF_DIR", SF_DIR)
    sql = e.oracle_sql()  # must rebuild every artifact it references

    for name, min_rows in (("kg_canonicalized", 1),
                           ("kg_merge_pairs_parity", 1),
                           ("ann_ivf_topk", 1)):
        out = con.execute(sql[name]).fetchdf()
        assert len(out) >= min_rows, name


def test_bench_list_subset_of_registry():
    """Every BENCH_QUERIES entry must resolve in the driver registry —
    a bench run must never KeyError mid-suite."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..",
                              "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    import __ray_entry__ as e

    q = e.queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in q]
    assert not missing, f"bench list names missing from registry: {missing}"


@pytest.mark.parametrize("name", ["local_supplier_volume",
                                  "large_orders_topk",
                                  "returned_item_losses",
                                  "nation_volume_shipping",
                                  "nation_market_share",
                                  "nation_profit",
                                  "small_qty_revenue_loss",
                                  "nation_trade_matrix",
                                  "shipping_priority_topk"])
def test_measured_gate_distributed_path_matches_broadcast(name):
    """The session-6/7 join queries pick broadcast vs bucketed exchange
    from a MEASURED row count; force the distributed branch
    (broadcast_limit=0) and require bit-equal output."""
    from aisafetyintervention_literatureextraction_ray import (
        driver_queries as dq,
    )

    fast = dq.QUERIES[name](SF_DIR).reset_index(drop=True)
    slow = getattr(dq, name)(SF_DIR, broadcast_limit=0) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_motif_census_driver_gate_matches_distributed():
    """kg_motif_census's doubly-measured driver gate must agree with
    the partitioned wedge-join path on the same KG."""
    from aisafetyintervention_literatureextraction_ray import (
        driver_queries as dq,
    )

    fast = dq.QUERIES["kg_motif_census"](SF_DIR).reset_index(drop=True)
    slow = dq.kg_motif_census(SF_DIR, driver_threshold=0) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_naive_bayes_model_broadcast_matches_cogroup():
    """doc_naive_bayes's measured model-broadcast gate must agree with
    the term-co-group fallback path."""
    from aisafetyintervention_literatureextraction_ray import (
        driver_queries as dq,
    )

    fast = dq.QUERIES["doc_naive_bayes"](SF_DIR).reset_index(drop=True)
    slow = dq.doc_naive_bayes(SF_DIR, broadcast_limit=0) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.parametrize("name,kw", [
    ("kg_dominators", {"driver_threshold": 0}),
    ("kg_scc_levels", {"broadcast_limit": 0}),
])
def test_graph_gate_fallthrough_matches_fast_path(name, kw):
    """The kg_dominators driver gate and kg_scc_levels broadcast gate
    must agree with their distributed fall-through forms."""
    from aisafetyintervention_literatureextraction_ray import (
        driver_queries as dq,
    )

    fast = dq.QUERIES[name](SF_DIR).reset_index(drop=True)
    slow = getattr(dq, name)(SF_DIR, **kw).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)
