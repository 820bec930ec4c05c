"""Queryable graph exports: Cypher statements and bulk-import CSV.

The reference leaves its users a Cypher-queryable FalkorDB graph
(``src/local_graph_extraction/db.py:34-54``); this engine leaves
partitioned parquet tables (the scale-correct store, SURVEY.md §2.3).
These sinks restore the graph-database workflow from those tables:

* ``export_cypher`` — one ``MERGE`` statement per node/edge, written as
  sharded ``.cypher`` text files any openCypher DB can replay.  String
  escaping mirrors the reference's manual quoting concern (SURVEY.md
  §2.8 P5 — ``db.py`` interpolates property strings into Cypher), done
  vectorized per batch.
* ``export_graph_csv`` — ``nodes.csv`` / ``edges.csv`` directories in
  the neo4j-admin / falkordb-bulk-loader column convention
  (``:ID`` / ``:START_ID`` / ``:END_ID`` / ``:LABEL`` / ``:TYPE``).

Both are streaming ``map_batches`` + ``write_*`` pipelines — the graph
tables never materialize on the driver.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def cypher_escape(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Escape a string column for single-quoted Cypher literals
    (backslash first, then quote — P5, vectorized)."""
    col = pc.coalesce(col.cast(pa.string()), "")
    col = pc.replace_substring(col, pattern="\\", replacement="\\\\")
    return pc.replace_substring(col, pattern="'", replacement="\\'")


def _node_stmts(t: pa.Table) -> pa.Table:
    nid = cypher_escape(t.column("node_id"))
    label = pc.utf8_upper(pc.coalesce(t.column("type").cast(pa.string()),
                                      "NODE"))
    name = cypher_escape(t.column("name"))
    desc = cypher_escape(t.column("description"))
    stmt = pc.binary_join_element_wise(
        "MERGE (n:", label, " {id: '", nid, "'}) SET n.name = '", name,
        "', n.description = '", desc, "';", "")
    return pa.table({"stmt": stmt})


def _edge_stmts(t: pa.Table) -> pa.Table:
    src = cypher_escape(t.column("src_id"))
    dst = cypher_escape(t.column("dst_id"))
    pred = pc.utf8_upper(pc.coalesce(t.column("pred").cast(pa.string()),
                                     "RELATES_TO"))
    conf = t.column("confidence").cast(pa.string())
    stmt = pc.binary_join_element_wise(
        "MATCH (a {id: '", src, "'}), (b {id: '", dst,
        "'}) MERGE (a)-[r:", pred, "]->(b) SET r.confidence = ", conf, ";",
        "")
    return pa.table({"stmt": stmt})


def _write_text(ds: rd.Dataset, dest: str | Path, col: str = "stmt") -> None:
    """Streaming plain-text sink: each block writes one
    content-hash-named ``.cypher`` shard (atomic tmp+rename; the
    destination is cleared first so a re-export never mixes stale
    shards).  CSV/parquet writers would re-quote the statement text.
    ``dest`` must be shared storage on a multi-node cluster."""
    import hashlib
    import shutil

    dest = Path(dest)
    if dest.is_dir():  # re-export replaces: stale shards must not mix in
        shutil.rmtree(dest)
    elif dest.exists():  # a leftover FILE at the dest path
        dest.unlink()
    dest.mkdir(parents=True, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows:
            lines = "\n".join(t.column(col).to_pylist()) + "\n"
            name = hashlib.blake2b(lines.encode(), digest_size=8).hexdigest()
            tmp = dest / f".tmp_{name}.cypher"
            tmp.write_text(lines, encoding="utf-8")
            tmp.rename(dest / f"{name}.cypher")
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    for _ in ds.map_batches(write_block,
                            batch_format="pyarrow").iter_batches():
        pass


def export_cypher(graph_dir: str | Path, dest: str | Path) -> dict:
    """graph/nodes + graph/edges parquet -> sharded .cypher-able text.

    Nodes land in ``<dest>/nodes/``, edges in ``<dest>/edges/`` (edges
    must be replayed after nodes).  Returns statement counts.
    """
    graph_dir, dest = Path(graph_dir), Path(dest)
    nodes = rd.read_parquet(str(graph_dir / "nodes"),
                            columns=["node_id", "type", "name", "description"])
    edges = rd.read_parquet(str(graph_dir / "edges"),
                            columns=["src_id", "pred", "dst_id", "confidence"])
    n_stmts = nodes.map_batches(_node_stmts, batch_format="pyarrow")
    e_stmts = edges.map_batches(_edge_stmts, batch_format="pyarrow")
    _write_text(n_stmts, dest / "nodes")
    _write_text(e_stmts, dest / "edges")
    import pyarrow.dataset as pads

    return {
        "n_node_statements": pads.dataset(graph_dir / "nodes").count_rows(),
        "n_edge_statements": pads.dataset(graph_dir / "edges").count_rows(),
    }


def export_graph_csv(graph_dir: str | Path, dest: str | Path) -> dict:
    """graph parquet -> bulk-import CSV directories (neo4j-admin /
    falkordb-bulk-loader column headers)."""
    graph_dir, dest = Path(graph_dir), Path(dest)

    def node_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "nodeId:ID": t.column("node_id"),
            ":LABEL": pc.utf8_upper(t.column("type").cast(pa.string())),
            "name": t.column("name"),
            "description": pc.coalesce(
                t.column("description").cast(pa.string()), ""),
            "n_provenance:long": t.column("n_provenance"),
        })

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            ":START_ID": t.column("src_id"),
            ":END_ID": t.column("dst_id"),
            ":TYPE": pc.utf8_upper(t.column("pred").cast(pa.string())),
            "confidence:long": t.column("confidence").cast(pa.int64()),
        })

    import shutil

    nodes = rd.read_parquet(str(graph_dir / "nodes"))
    edges = rd.read_parquet(str(graph_dir / "edges"))
    for sub in ("nodes", "edges"):
        p = Path(dest) / sub
        if p.is_dir():  # replace, never mix stale shards
            shutil.rmtree(p)
        elif p.exists():
            p.unlink()
        p.mkdir(parents=True, exist_ok=True)
    nodes.map_batches(node_rows, batch_format="pyarrow").write_csv(
        str(dest / "nodes"))
    edges.map_batches(edge_rows, batch_format="pyarrow").write_csv(
        str(dest / "edges"))
    import pyarrow.dataset as pads

    return {
        "n_nodes": pads.dataset(graph_dir / "nodes").count_rows(),
        "n_edges": pads.dataset(graph_dir / "edges").count_rows(),
    }
