"""Driver-facing query registry: one entry per implemented operator.

Each callable takes ``sf_dir`` and returns a Dataset / DataFrame /
pyarrow Table.  ``ORACLE_SQL`` holds the DuckDB-equivalent SQL for the
SQL-expressible entries (same column names — the driver's comparator
hashes values after sorting columns by name).  Non-SQL-expressible
pipelines (gazetteer extraction, MinHash, encoders) have no oracle entry
and get a rows-only check.

Float policy: every float column that reaches the driver comparator is
rounded to a fixed number of decimals ON BOTH SIDES, because parallel
summation order differs between Ray and DuckDB in the last ulps.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn
    return deco


def _pq(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------- A1: grouped aggregate
@query(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                          AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                     AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
           ROUND(AVG(l_quantity), 2)                          AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                     AS avg_price,
           COUNT(*)                                           AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate (SURVEY.md §2.5 A1 semantics).

    Two-stage: vectorized per-batch partials inside map_batches, then a
    small group-by over partials — the shuffle moves one row per
    (key, batch), not one per lineitem row.
    """
    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity",
              "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        t = t.append_column("disc_price", disc)
        return pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536,
                              zero_copy_batch=True)
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity_sum", alias_name="sum_qty"),
        Sum("l_extendedprice_sum", alias_name="sum_base_price"),
        Sum("disc_price_sum", alias_name="sum_disc_price"),
        Sum("l_quantity_count", alias_name="count_order"),
    ).to_pandas()
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(2)
    out["avg_price"] = (out["sum_base_price"] / out["count_order"]).round(2)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = out[c].round(2)
    return out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                "sum_disc_price", "avg_qty", "avg_price", "count_order"]]


# ---------------------------------------------------------------- O3: sort + limit (top-k)
@query(
    "top_revenue_parts",
    """
    SELECT l_partkey AS partkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_partkey
    ORDER BY revenue DESC, partkey ASC LIMIT 10
    """,
)
def top_revenue_parts(sf_dir: str):
    """Global top-k over a grouped aggregate (SURVEY.md §2.6 O3)."""
    ds = _pq(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        t = pa.table({"partkey": t["l_partkey"], "rev": rev})
        return pa.TableGroupBy(t, "partkey").aggregate([("rev", "sum")])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536,
                       zero_copy_batch=True)
        .groupby("partkey")
        .aggregate(Sum("rev_sum", alias_name="revenue"))
    )
    top = agg.sort(["revenue", "partkey"], descending=[True, False]).limit(10)
    out = top.to_pandas()
    out["revenue"] = out["revenue"].round(2)
    return out[["partkey", "revenue"]]


# ---------------------------------------------------------------- J1: broadcast joins + rollup
@query(
    "customer_nation_rollup",
    """
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def customer_nation_rollup(sf_dir: str):
    """Dimension join as broadcast map-side lookup (SURVEY.md §2.4 J1):
    small sides shipped once via ``ray.put``, no shuffle join."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rmap = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nmap = {
        k: (name, rmap[rk])
        for k, name, rk in zip(nation["n_nationkey"].to_pylist(),
                               nation["n_name"].to_pylist(),
                               nation["n_regionkey"].to_pylist())
    }
    nmap_ref = ray.put(nmap)

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(nmap_ref)
        keys = t["c_nationkey"].to_numpy()
        names = [m[int(k)] for k in keys]
        out = pa.table({
            "region_name": pa.array(x[1] for x in names),
            "nation_name": pa.array(x[0] for x in names),
            "c_acctbal": t["c_acctbal"],
        })
        return pa.TableGroupBy(out, ["region_name", "nation_name"]).aggregate(
            [("c_acctbal", "sum"), ("c_acctbal", "count")]
        )

    out = (
        _pq(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(attach, batch_format="pyarrow", batch_size=65536,
                     zero_copy_batch=True)
        .groupby(["region_name", "nation_name"])
        .aggregate(Sum("c_acctbal_count", alias_name="n_customers"),
                   Sum("c_acctbal_sum", alias_name="sum_acctbal"))
        .to_pandas()
    )
    out["sum_acctbal"] = out["sum_acctbal"].round(2)
    return out[["region_name", "nation_name", "n_customers", "sum_acctbal"]]


# ---------------------------------------------------------------- A2: distinct (dedup count)
@query(
    "distinct_doc_sources",
    """
    SELECT source, COUNT(DISTINCT doc_id) AS n_docs
    FROM documents GROUP BY source
    """,
)
def distinct_doc_sources(sf_dir: str):
    """Distinct-per-key via group-by (SURVEY.md §2.5 A2 paper upsert)."""
    return (
        _pq(sf_dir, "documents", ["source", "doc_id"])
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"))  # doc_id unique per row in this table
        .to_pandas()
    )


# ---------------------------------------------------------------- KG pipeline (rows-only oracle)
@query("kg_triples")
def kg_triples(sf_dir: str):
    """Flagship: interleave documents -> extract -> triples (no SQL oracle:
    the gazetteer extractor is not SQL-expressible)."""
    from .pipelines.extraction import extract_pipeline, triples_from_extractions
    from .sources.docs import interleave_from_documents

    docs = interleave_from_documents(sf_dir)
    return triples_from_extractions(extract_pipeline(docs, batch_size=128))


@query("kg_nodes")
def kg_nodes(sf_dir: str):
    """Canonical node table from the KG build (group-by dedup, A1)."""
    from .pipelines.extraction import extract_pipeline
    from .pipelines.graph_build import build_nodes
    from .sources.docs import interleave_from_documents

    docs = interleave_from_documents(sf_dir)
    nodes = build_nodes(extract_pipeline(docs, batch_size=128))
    return nodes.drop_columns(["aliases"]).to_pandas().sort_values("node_id")


@query("kg_edges")
def kg_edges(sf_dir: str):
    """Canonical edge table (endpoint resolution J1 + edge dedup A3)."""
    from .pipelines.extraction import extract_pipeline, triples_from_extractions
    from .pipelines.graph_build import build_edges, build_nodes, node_id_map
    from .sources.docs import interleave_from_documents

    docs = interleave_from_documents(sf_dir)
    extr = extract_pipeline(docs, batch_size=128)
    nmap = node_id_map(build_nodes(extr))
    return build_edges(triples_from_extractions(extr), nmap).to_pandas()
