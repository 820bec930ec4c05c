"""Graph export sinks: Cypher statements + bulk-import CSV (P5 escaping)."""

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from aisafetyintervention_literatureextraction_ray.sinks import (
    cypher_escape,
    export_cypher,
    export_graph_csv,
)


def _write_graph(tmp_path: Path) -> Path:
    graph = tmp_path / "graph"
    (graph / "nodes").mkdir(parents=True)
    (graph / "edges").mkdir(parents=True)
    pq.write_table(pa.table({
        "node_id": ["n1", "n2"],
        "type": ["concept", "intervention"],
        "name": ["o'malley's method", "back\\slash"],
        "description": ["it's tricky", ""],
        "n_provenance": [3, 1],
    }), graph / "nodes" / "part.parquet")
    pq.write_table(pa.table({
        "src_id": ["n1"], "pred": ["mitigated_by"], "dst_id": ["n2"],
        "confidence": [4],
    }), graph / "edges" / "part.parquet")
    return graph


def test_cypher_escape_vectorized():
    out = cypher_escape(pa.array(["a'b", "c\\d", None])).to_pylist()
    assert out == ["a\\'b", "c\\\\d", ""]


def test_export_cypher_roundtrip(tmp_path):
    graph = _write_graph(tmp_path)
    stats = export_cypher(graph, tmp_path / "cypher")
    assert stats == {"n_node_statements": 2, "n_edge_statements": 1}
    node_text = "".join(
        p.read_text() for p in sorted((tmp_path / "cypher" / "nodes").glob("*")))
    assert "MERGE (n:CONCEPT {id: 'n1'})" in node_text
    assert "o\\'malley\\'s method" in node_text  # P5: quotes escaped
    assert "back\\\\slash" in node_text
    edge_text = "".join(
        p.read_text() for p in sorted((tmp_path / "cypher" / "edges").glob("*")))
    assert "MERGE (a)-[r:MITIGATED_BY]->(b)" in edge_text
    assert "r.confidence = 4" in edge_text


def test_export_graph_csv(tmp_path):
    import csv

    graph = _write_graph(tmp_path)
    stats = export_graph_csv(graph, tmp_path / "csv")
    assert stats == {"n_nodes": 2, "n_edges": 1}
    rows = []
    for p in sorted((tmp_path / "csv" / "nodes").glob("*")):
        with open(p, newline="") as f:
            rows.extend(csv.DictReader(f))
    assert {r["nodeId:ID"] for r in rows} == {"n1", "n2"}
    assert {r[":LABEL"] for r in rows} == {"CONCEPT", "INTERVENTION"}
    erows = []
    for p in sorted((tmp_path / "csv" / "edges").glob("*")):
        with open(p, newline="") as f:
            erows.extend(csv.DictReader(f))
    assert erows[0][":START_ID"] == "n1" and erows[0][":TYPE"] == "MITIGATED_BY"
