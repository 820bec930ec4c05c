"""Graph materialization: dedup keys, endpoint resolution, idempotency."""

import pyarrow as pa
import pytest
import ray.data as rd

from aisafetyintervention_literatureextraction_ray.fixtures import make_corpus
from aisafetyintervention_literatureextraction_ray.functions.normalize import (
    normalize_name,
)
from aisafetyintervention_literatureextraction_ray.pipelines import graph_build as gb
from aisafetyintervention_literatureextraction_ray.pipelines.extraction import (
    extract_pipeline,
    triples_from_extractions,
)
from aisafetyintervention_literatureextraction_ray.schemas import (
    EDGES_SCHEMA,
    EXTRACTION_SCHEMA,
    NODES_SCHEMA,
)


@pytest.fixture(scope="module")
def built():
    docs, _ = make_corpus(120, seed=42)
    extr_tbl = pa.Table.from_pandas(
        extract_pipeline(rd.from_arrow(docs), concurrency=(1, 2)).to_pandas(),
        schema=EXTRACTION_SCHEMA)
    extr = rd.from_arrow(extr_tbl)
    nodes = gb.build_nodes(extr).to_pandas()
    nmap = gb.node_id_map(gb.build_nodes(rd.from_arrow(extr_tbl)))
    edges = gb.build_edges(
        triples_from_extractions(rd.from_arrow(extr_tbl)), nmap).to_pandas()
    return extr_tbl, nodes, nmap, edges


def test_node_pk_unique(built):
    _, nodes, _, _ = built
    assert not nodes.duplicated(subset=["type", "name_norm"]).any()
    assert not nodes.duplicated(subset=["node_id"]).any()
    assert pa.Table.from_pandas(nodes, schema=NODES_SCHEMA).schema.equals(NODES_SCHEMA)


def test_edge_pk_unique_and_resolved(built):
    _, nodes, _, edges = built
    assert not edges.duplicated(subset=["src_id", "pred", "dst_id"]).any()
    node_ids = set(nodes["node_id"])
    assert set(edges["src_id"]) <= node_ids
    assert set(edges["dst_id"]) <= node_ids
    assert pa.Table.from_pandas(edges, schema=EDGES_SCHEMA).schema.equals(EDGES_SCHEMA)


def test_normalization_key():
    assert normalize_name("Reinforcement  Learning from Human-Feedback!") == \
        "reinforcement_learning_from_human_feedback"
    assert normalize_name("RLHF") == "rlhf"


def test_idempotent_rebuild(built):
    """Re-running the build over the same extractions yields the identical
    graph (MERGE re-run safety, db.py:36,42,51)."""
    extr_tbl, nodes, nmap, edges = built
    nodes2 = gb.build_nodes(rd.from_arrow(extr_tbl)).to_pandas()
    a = nodes.sort_values("node_id").reset_index(drop=True)
    b = nodes2.sort_values("node_id").reset_index(drop=True)
    assert a.drop(columns="aliases").equals(b.drop(columns="aliases"))
    assert all(list(x) == list(y) for x, y in zip(a["aliases"], b["aliases"]))
    edges2 = gb.build_edges(
        triples_from_extractions(rd.from_arrow(extr_tbl)), nmap).to_pandas()
    key = ["src_id", "pred", "dst_id"]
    assert edges.sort_values(key).reset_index(drop=True).equals(
        edges2.sort_values(key).reset_index(drop=True))


def test_provenance_counts(built):
    extr_tbl, nodes, _, edges = built
    # total node provenance = number of (doc, node) mentions
    mentions = sum(len(ns) for ns in extr_tbl.column("nodes").to_pylist())
    assert nodes["n_provenance"].sum() == mentions
    assert (edges["n_provenance"] >= 1).all()


def test_papers_distinct(built):
    extr_tbl, _, _, _ = built
    p = gb.papers(rd.from_arrow(extr_tbl)).to_pandas()
    assert sorted(p["doc_id"]) == sorted(extr_tbl.column("doc_id").to_pylist())


def test_build_edges_shuffle_matches_broadcast():
    """J1 scale path: distributed join endpoint resolution produces the
    same edge table as the broadcast alias-index path."""
    import ray.data as rd

    from aisafetyintervention_literatureextraction_ray.fixtures import make_corpus
    from aisafetyintervention_literatureextraction_ray.pipelines import (
        graph_build as gb,
    )
    from aisafetyintervention_literatureextraction_ray.pipelines.extraction import (
        extract_pipeline,
        triples_from_extractions,
    )

    docs, _ = make_corpus(60)
    extr = extract_pipeline(rd.from_arrow(docs), concurrency=(1, 2)).materialize()
    nodes = gb.build_nodes(extr).materialize()
    triples = triples_from_extractions(extr).materialize()

    broadcast = gb.build_edges(triples, gb.build_alias_index(nodes)).to_pandas()
    shuffle = gb.build_edges_shuffle(triples, nodes).to_pandas()
    key = ["src_id", "pred", "dst_id"]
    broadcast = broadcast.sort_values(key).reset_index(drop=True)
    shuffle = shuffle.sort_values(key).reset_index(drop=True)
    assert list(broadcast.columns) == list(shuffle.columns)
    pd_testing = __import__("pandas").testing
    pd_testing.assert_frame_equal(broadcast, shuffle)


def test_bucketed_join_left_keeps_unmatched():
    import pandas as pd
    import ray.data as rd

    from aisafetyintervention_literatureextraction_ray.functions.agg import (
        bucketed_join,
    )

    left = rd.from_pandas(pd.DataFrame(
        {"k": ["a", "b", "c"], "v": [1, 2, 3]}))
    right = rd.from_pandas(pd.DataFrame(
        {"key": ["a", "c"], "w": [10.0, 30.0]}))
    out = (bucketed_join(left, right, left_key="k", right_key="key",
                         right_value_cols=["w"], how="left")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out["k"]) == ["a", "b", "c"]
    assert out["w"].tolist()[0] == 10.0 and out["w"].tolist()[2] == 30.0
    assert pd.isna(out["w"].tolist()[1])
    inner = (bucketed_join(left, right, left_key="k", right_key="key",
                           right_value_cols=["w"], how="inner")
             .to_pandas())
    assert set(inner["k"]) == {"a", "c"}


def test_incremental_nodes_equals_full_rebuild():
    """Key-scoped incremental maintenance == full rebuild: add docs,
    remove docs, leave an untouched node group, and check row-for-row
    equality including n_provenance changes."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from aisafetyintervention_literatureextraction_ray.pipelines.graph_build import (
        incremental_nodes,
        nodes_from_mentions,
    )

    def m(doc, nid, name, lc=None):
        return {"doc_id": doc, "name": name, "type": "concept",
                "description": f"d-{nid}", "concept_category": "cat",
                "intervention_lifecycle": lc,
                "intervention_maturity": None,
                "name_norm": name.lower(), "node_id": nid}

    old_rows = [
        m("d1", "n1", "Alpha"), m("d1", "n2", "Beta"),
        m("d2", "n2", "Beta"), m("d2", "n3", "Gamma", 3),
        m("d3", "n4", "Delta"),  # untouched by the delta
    ]
    add_rows = [m("d4", "n1", "Alpha"), m("d4", "n5", "Eps")]

    def tbl(rows):
        cols = {k: [r[k] for r in rows] for k in old_rows[0]}
        t = pa.table(cols)
        return t.set_column(
            t.schema.get_field_index("intervention_lifecycle"),
            "intervention_lifecycle",
            t["intervention_lifecycle"].cast(pa.int8())).set_column(
            t.schema.get_field_index("intervention_maturity"),
            "intervention_maturity",
            t["intervention_maturity"].cast(pa.int8()))

    old_m = rd.from_arrow(tbl(old_rows))
    add_m = rd.from_arrow(tbl(add_rows))
    removed = rd.from_arrow(pa.table({"doc_id": ["d2"]}))

    old_nodes = nodes_from_mentions(old_m)
    inc = incremental_nodes(old_nodes, old_m, add_m, removed
                            ).to_pandas().sort_values("node_id")

    new_rows = [r for r in old_rows if r["doc_id"] != "d2"] + add_rows
    full = nodes_from_mentions(rd.from_arrow(tbl(new_rows))
                               ).to_pandas().sort_values("node_id")
    pd.testing.assert_frame_equal(inc.reset_index(drop=True),
                                  full.reset_index(drop=True))
    prov = dict(zip(inc["node_id"], inc["n_provenance"]))
    # n1: d1+d4, n2: d1 only (d2 removed), n3: gone, n4 untouched, n5 new
    assert prov == {"n1": 2, "n2": 1, "n4": 1, "n5": 1}
