"""Corpus generator invariants (SURVEY.md §5: schema gating + fixtures)."""

import numpy as np
import pyarrow as pa

from aisafetyintervention_literatureextraction_ray.fixtures import (
    corpus_dataset,
    docs_batch,
    golden_batch,
    make_corpus,
)
from aisafetyintervention_literatureextraction_ray.schemas import (
    DOCS_SCHEMA,
    GOLDEN_TRIPLES_SCHEMA,
)


def test_corpus_schema_and_determinism():
    docs1, golden1 = make_corpus(50, seed=42)
    docs2, golden2 = make_corpus(50, seed=42)
    assert docs1.schema.equals(DOCS_SCHEMA)
    assert golden1.schema.equals(GOLDEN_TRIPLES_SCHEMA)
    assert docs1.equals(docs2)
    assert golden1.equals(golden2)
    docs3, _ = make_corpus(50, seed=7)
    assert not docs1.equals(docs3)


def test_generation_is_order_independent():
    # doc i generated alone == doc i generated in a batch (required for
    # distributed, partition-parallel generation)
    full = docs_batch(np.arange(20))
    single = docs_batch(np.array([13]))
    assert full.slice(13, 1).equals(single)


def test_span_offsets_strictly_increasing():
    docs, _ = make_corpus(80)
    spans = docs.column("spans").combine_chunks()
    for row in spans.to_pylist():
        offsets = [s["offset"] for s in row]
        assert offsets == list(range(len(offsets)))
        assert len(row) >= 3
        for s in row:
            if s["kind"] == "text":
                assert s["media_ref"] == ""
            else:
                assert s["text"] == "" and s["media_ref"].startswith("media://")


def test_golden_has_rows_for_every_doc():
    docs, golden = make_corpus(30)
    doc_ids = set(docs.column("doc_id").to_pylist())
    gold_ids = set(golden.column("doc_id").to_pylist())
    assert gold_ids == doc_ids  # every doc has >= 1 planted fact


def test_distributed_corpus_matches_local():
    ds = corpus_dataset(40)
    tbl = pa.Table.from_pandas(
        ds.to_pandas().sort_values("doc_id").reset_index(drop=True),
        preserve_index=False,
    )
    local, _ = make_corpus(40)
    assert sorted(tbl.column("doc_id").to_pylist()) == \
        sorted(local.column("doc_id").to_pylist())


def test_head_skew_present():
    _, golden = golden_and_docs_head()
    counts = {}
    for s in golden.column("subj").to_pylist():
        counts[s] = counts.get(s, 0) + 1
    # head rules dominate when head_frac is high
    assert max(counts.values()) > np.mean(list(counts.values())) * 2


def golden_and_docs_head():
    return docs_batch(np.arange(200), head_frac=0.8), \
        golden_batch(np.arange(200), head_frac=0.8)
