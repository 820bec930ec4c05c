"""Canonicalization: planted near-dup pairs, union-find closure, LSH vs exact."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from aisafetyintervention_literatureextraction_ray.pipelines.canonicalization import (
    accept_pairs,
    apply_merges,
    candidate_pairs,
)
from aisafetyintervention_literatureextraction_ray.stages.canonicalize import (
    project_node_text,
    union_find,
)
from aisafetyintervention_literatureextraction_ray.stages.encode import HashingEncoder


def _nodes_df():
    """3 planted paraphrase pairs (FIXTURES.md §6) + unrelated nodes."""
    rows = []

    def node(nid, name, aliases, desc):
        rows.append({"node_id": nid, "type": "concept", "name_norm": name.replace(" ", "_"),
                     "name": name, "aliases": aliases, "description": desc,
                     "concept_category": "Finding",
                     "intervention_lifecycle": None, "intervention_maturity": None,
                     "n_provenance": 1})

    node("n01", "reinforcement learning from human feedback",
         ["rlhf", "preference tuning"],
         "align model behaviour with human preference signals during training")
    node("n02", "rlhf preference tuning",
         ["reinforcement learning from human feedback"],
         "align model behaviour with human preference signals during training")
    node("n03", "deceptive model behaviour",
         ["model deception", "strategic deception"],
         "models induce false beliefs in overseers during evaluation")
    node("n04", "strategic model deception",
         ["deceptive model behaviour", "model deception"],
         "models induce false beliefs in overseers during evaluation")
    node("n05", "gradient noise injection",
         ["noise injected training"],
         "inject gaussian noise into gradients during training")
    node("n06", "noise injected gradient training",
         ["gradient noise injection"],
         "inject gaussian noise into gradients during training")
    # unrelated
    node("n20", "tokenizer vocabulary growth", ["vocab scaling"],
         "vocabulary size scales sublinearly with corpus size")
    node("n21", "benchmark saturation", ["eval ceiling"],
         "static benchmarks stop discriminating between frontier models")
    node("n22", "data curation pipelines", ["corpus filtering"],
         "multi-stage filtering of web-scale corpora before pretraining")
    node("n23", "sparse expert routing", ["mixture of experts"],
         "route tokens to specialized expert subnetworks")
    return pd.DataFrame(rows)


PLANTED = {("n01", "n02"), ("n03", "n04"), ("n05", "n06")}


@pytest.fixture(scope="module")
def nodes_ds():
    return rd.from_pandas(_nodes_df())


def test_exact_mode_finds_planted_pairs(nodes_ds):
    pairs = candidate_pairs(nodes_ds, mode="exact", k=5,
                            encoder_concurrency=(1, 2))
    accepted = accept_pairs(pairs, threshold=0.25, top_n=None)
    got = set(zip(accepted["id_a"], accepted["id_b"]))
    assert got == PLANTED


def test_lsh_mode_finds_planted_pairs(nodes_ds):
    pairs = candidate_pairs(nodes_ds, mode="lsh", k=5,
                            encoder_concurrency=(1, 2))
    accepted = accept_pairs(pairs, threshold=0.25, top_n=None)
    got = set(zip(accepted["id_a"], accepted["id_b"]))
    assert got == PLANTED  # high-cosine pairs collide in >=1 band whp


def test_top_n_parity_mode(nodes_ds):
    """Reference parity: fixed top-n accepted pair list (merge.py:92)."""
    pairs = candidate_pairs(nodes_ds, mode="exact", k=5,
                            encoder_concurrency=(1, 2))
    accepted = accept_pairs(pairs, top_n=3)
    assert len(accepted) == 3
    assert set(zip(accepted["id_a"], accepted["id_b"])) == PLANTED
    # ordered by ascending distance like the reference's sorted()[:n]
    assert list(accepted["distance"]) == sorted(accepted["distance"])


def test_union_find_closure_and_determinism():
    remap = union_find([("b", "a"), ("c", "b"), ("e", "d")])
    assert remap["b"] == "a" and remap["c"] == "a" and remap["e"] == "d"
    # order-independent (the reference's sequential merge is not,
    # SURVEY.md §2.7 — closure is the intended semantics)
    remap2 = union_find([("e", "d"), ("c", "b"), ("b", "a")])
    assert remap == remap2


def test_apply_merges(nodes_ds):
    edges = rd.from_pandas(pd.DataFrame({
        "src_id": ["n02", "n20", "n01"],
        "pred": ["causes", "causes", "causes"],
        "dst_id": ["n03", "n04", "n04"],
        "subj": ["x", "x", "x"], "obj": ["y", "y", "y"],
        "description": ["d1", "d2", "d3"],
        "confidence": [2, 3, 4], "n_provenance": [1, 1, 1],
    }))
    accepted = pd.DataFrame({"id_a": ["n01", "n03"], "id_b": ["n02", "n04"],
                             "distance": [0.1, 0.1]})
    nodes2, edges2, remap = apply_merges(nodes_ds, edges, accepted)
    ndf = nodes2.to_pandas()
    assert "n02" not in set(ndf["node_id"]) and "n04" not in set(ndf["node_id"])
    edf = edges2.to_pandas()
    # n02->n03 and n01->n04 both rewire to n01->n03 and dedupe into one
    # edge with max confidence and summed provenance
    rewired = edf[(edf.src_id == "n01") & (edf.dst_id == "n03")]
    assert len(rewired) == 1
    assert rewired.iloc[0]["confidence"] == 4
    assert rewired.iloc[0]["n_provenance"] == 2
    assert (edf[(edf.src_id == "n20")]["dst_id"] == "n03").all()


def test_encoder_determinism():
    enc1, enc2 = HashingEncoder("text"), HashingEncoder("text")
    t = pa.table({"text": ["alpha beta gamma", "delta epsilon"]})
    a = enc1(t).column("embedding").to_pylist()
    b = enc2(t).column("embedding").to_pylist()
    assert a == b
    v = np.array(a[0])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_text_projection_skips_empty():
    t = pa.table({
        "name": ["x", "y"],
        "aliases": [["a1", "a2"], []],
        "description": ["desc", ""],
        "concept_category": ["Finding", None],
    })
    out = project_node_text(t).column("text").to_pylist()
    assert out[0] == "name=x; aliases=a1, a2; description=desc; concept_category=Finding"
    assert out[1] == "name=y"


def test_canonicalize_distributed_branch_matches_local(nodes_ds):
    """driver_threshold=0 forces the DISTRIBUTED candidate path (shuffle
    exchanges, no repartition(1)); it must produce the same accepted
    pairs, remap and surviving nodes as the driver-local fast path."""
    from aisafetyintervention_literatureextraction_ray.pipelines.canonicalization import (
        canonicalize,
    )

    def edges():
        return rd.from_pandas(pd.DataFrame({
            "src_id": ["n02", "n20"], "pred": ["causes", "causes"],
            "dst_id": ["n03", "n04"],
            "subj": ["x", "x"], "obj": ["y", "y"],
            "description": ["d1", "d2"], "confidence": [2, 3],
            "n_provenance": [1, 1],
        }))

    n_l, e_l, acc_l, remap_l = canonicalize(
        nodes_ds, edges(), mode="exact", k=5, top_n=None, threshold=0.25,
        driver_threshold=50_000)
    n_d, e_d, acc_d, remap_d = canonicalize(
        nodes_ds, edges(), mode="exact", k=5, top_n=None, threshold=0.25,
        driver_threshold=0)
    assert remap_l == remap_d
    assert (set(zip(acc_l["id_a"], acc_l["id_b"]))
            == set(zip(acc_d["id_a"], acc_d["id_b"])) == PLANTED)
    assert set(n_l.to_pandas()["node_id"]) == set(n_d.to_pandas()["node_id"])
    el = e_l.to_pandas().sort_values(["src_id", "pred", "dst_id"])
    ed = e_d.to_pandas().sort_values(["src_id", "pred", "dst_id"])
    assert el[["src_id", "pred", "dst_id", "confidence"]].to_numpy().tolist() \
        == ed[["src_id", "pred", "dst_id", "confidence"]].to_numpy().tolist()


def test_apply_merges_distributed_matches_broadcast(nodes_ds):
    """The no-driver-closure / no-broadcast-remap path (distributed CC
    labels + join-based rewire) produces the identical node and edge
    tables as apply_merges on the same accepted pairs."""
    from aisafetyintervention_literatureextraction_ray.pipelines.canonicalization import (
        apply_merges_distributed,
    )

    edges = rd.from_pandas(pd.DataFrame({
        "src_id": ["n02", "n20", "n01"],
        "pred": ["causes", "causes", "causes"],
        "dst_id": ["n03", "n04", "n04"],
        "subj": ["x", "x", "x"], "obj": ["y", "y", "y"],
        "description": ["d1", "d2", "d3"],
        "confidence": [2, 3, 4], "n_provenance": [1, 1, 1],
    }))
    accepted = pd.DataFrame({"id_a": ["n01", "n03"], "id_b": ["n02", "n04"],
                             "distance": [0.1, 0.1]})
    nodes_b, edges_b, _ = apply_merges(nodes_ds, edges, accepted)
    nodes_d, edges_d, labels = apply_merges_distributed(
        nodes_ds, edges, rd.from_pandas(accepted), num_buckets=4)

    nb = nodes_b.to_pandas().sort_values("node_id").reset_index(drop=True)
    nd = (nodes_d.to_pandas()[nb.columns]
          .sort_values("node_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(nb, nd)

    key = ["src_id", "pred", "dst_id"]
    eb = edges_b.to_pandas().sort_values(key).reset_index(drop=True)
    ed = (edges_d.to_pandas()[eb.columns]
          .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(eb, ed)

    lab = labels.to_pandas()
    assert dict(zip(lab["node_id"], lab["component_id"])) == {
        "n01": "n01", "n02": "n01", "n03": "n03", "n04": "n03"}


def test_canonicalize_distributed_closure_end_to_end(nodes_ds):
    """closure='distributed' (dataset-valued accepted pairs, CC-label
    closure, join rewire) matches the driver closure on the same
    threshold run — the fully driver-free canonicalization path."""
    from aisafetyintervention_literatureextraction_ray.pipelines.canonicalization import (
        canonicalize,
    )

    def edges():
        return rd.from_pandas(pd.DataFrame({
            "src_id": ["n02", "n20"], "pred": ["causes", "causes"],
            "dst_id": ["n03", "n04"],
            "subj": ["x", "x"], "obj": ["y", "y"],
            "description": ["d1", "d2"], "confidence": [2, 3],
            "n_provenance": [1, 1],
        }))

    n_l, e_l, acc_l, _ = canonicalize(
        nodes_ds, edges(), mode="exact", k=5, top_n=None, threshold=0.25,
        driver_threshold=50_000)
    n_d, e_d, acc_ds, labels = canonicalize(
        nodes_ds, edges(), mode="exact", k=5, top_n=None, threshold=0.25,
        driver_threshold=0, closure="distributed")

    acc_d = acc_ds.to_pandas()
    assert (set(zip(acc_l["id_a"], acc_l["id_b"]))
            == set(zip(acc_d["id_a"], acc_d["id_b"])) == PLANTED)
    assert set(n_l.to_pandas()["node_id"]) == set(n_d.to_pandas()["node_id"])
    key = ["src_id", "pred", "dst_id"]
    el = e_l.to_pandas().sort_values(key).reset_index(drop=True)
    ed = e_d.to_pandas().sort_values(key).reset_index(drop=True)
    assert el[key + ["confidence", "n_provenance"]].to_numpy().tolist() \
        == ed[key + ["confidence", "n_provenance"]].to_numpy().tolist()


def test_canonicalize_auto_closure_measured_gate(nodes_ds):
    """closure='auto' (the default) must MEASURE the accepted-pair count
    and pick the closure: under the limit it returns the driver
    remap/DataFrame shape; with closure_pair_limit=0 it must route to
    the distributed closure (dataset accepted pairs + CC labels) with
    identical surviving nodes/edges — no opt-in flag anywhere."""
    from aisafetyintervention_literatureextraction_ray.pipelines.canonicalization import (
        canonicalize,
    )

    def edges():
        return rd.from_pandas(pd.DataFrame({
            "src_id": ["n02", "n20"], "pred": ["causes", "causes"],
            "dst_id": ["n03", "n04"],
            "subj": ["x", "x"], "obj": ["y", "y"],
            "description": ["d1", "d2"], "confidence": [2, 3],
            "n_provenance": [1, 1],
        }))

    # auto + small measured count -> driver closure (dict remap)
    n_l, e_l, acc_l, remap_l = canonicalize(
        nodes_ds, edges(), mode="exact", k=5, top_n=None, threshold=0.25,
        driver_threshold=0, closure="auto")
    assert isinstance(remap_l, dict)
    assert set(zip(acc_l["id_a"], acc_l["id_b"])) == PLANTED

    # auto + limit 0 -> distributed closure (dataset labels), same graph
    n_d, e_d, acc_ds, labels = canonicalize(
        nodes_ds, edges(), mode="exact", k=5, top_n=None, threshold=0.25,
        driver_threshold=0, closure="auto", closure_pair_limit=0)
    assert not isinstance(labels, dict)
    acc_d = acc_ds.to_pandas()
    assert set(zip(acc_d["id_a"], acc_d["id_b"])) == PLANTED
    assert set(n_l.to_pandas()["node_id"]) == set(n_d.to_pandas()["node_id"])
    key = ["src_id", "pred", "dst_id"]
    el = e_l.to_pandas().sort_values(key).reset_index(drop=True)
    ed = e_d.to_pandas().sort_values(key).reset_index(drop=True)
    assert el[key + ["confidence", "n_provenance"]].to_numpy().tolist() \
        == ed[key + ["confidence", "n_provenance"]].to_numpy().tolist()
