"""Deterministic synthetic corpora of interleaved text+media documents.

Shapes mirror the reference's inputs: ARD JSONL records
(``data/raw/ard_examples/*.jsonl.example.json`` — ``{title, authors,
date_published, text, url}``) and the PDF dev set, re-expressed as the
BASELINE.json ``input_hint`` table ``(doc_id, spans: list<struct<kind,
text, media_ref, offset>>)``.

Every document is generated independently from ``(seed, doc_index)`` so
generation itself is a distributed, order-independent ``map_batches``
stage — the corpus can be produced at any scale without a driver loop,
and regenerated partition-by-partition for resume tests.

Facts are planted with the gazetteer templates (``gazetteer.py``), so the
golden triple set is computable exactly; distractor sentences (entity
mentions without triggers, triggers without entities) exercise extractor
precision.  Head entities are over-sampled (``head_frac``) to create the
hot node-dedup keys SURVEY.md §4.2 calls out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .gazetteer import ENTITY_BY_NAME, HEAD_RULES, RULES, TRIGGERS
from .schemas import DOCS_SCHEMA, GOLDEN_TRIPLES_SCHEMA

# Filler vocabulary: deliberately disjoint from every gazetteer alias
# unigram and every trigger word, so word soup can never assemble a
# false planted fact.
FILLER_VOCAB = (
    "figure table appendix section baseline dataset benchmark result "
    "experiment ablation metric curve plot sample split epoch batch "
    "layer parameter weight token corpus paper author review citation "
    "journal conference workshop poster abstract introduction method "
    "discussion conclusion future limitation acknowledgment reference"
).split()

_DISTRACTOR_TAILS = (
    "remains a central topic in recent literature.",
    "has been studied extensively across benchmarks.",
    "is discussed in the appendix.",
)
_DISTRACTOR_TRIGGER_SENTENCES = tuple(
    f"this framework {t} broader discussion." for t in TRIGGERS.values()
)

_N_RULES = len(RULES)
_HEAD_RULES = np.asarray(HEAD_RULES, dtype=np.int64)


def _fact_sentence(rule_idx: int, rng: np.random.Generator) -> str:
    """Render a planted fact with deterministically chosen alias surfaces."""
    rule = RULES[rule_idx]
    subj_surfaces = ENTITY_BY_NAME[rule.subj].surfaces
    obj_surfaces = ENTITY_BY_NAME[rule.obj].surfaces
    subj = subj_surfaces[int(rng.integers(0, len(subj_surfaces)))]
    obj = obj_surfaces[int(rng.integers(0, len(obj_surfaces)))]
    return f"{subj} {TRIGGERS[rule.pred]} {obj}."


def _filler_sentence(rng: np.random.Generator) -> str:
    n = int(rng.integers(6, 14))
    words = rng.choice(FILLER_VOCAB, size=n)
    return " ".join(words) + "."


def _distractor_sentence(rng: np.random.Generator) -> str:
    if rng.random() < 0.5:
        ent = list(ENTITY_BY_NAME.values())[int(rng.integers(0, len(ENTITY_BY_NAME)))]
        surface = ent.surfaces[int(rng.integers(0, len(ent.surfaces)))]
        tail = _DISTRACTOR_TAILS[int(rng.integers(0, len(_DISTRACTOR_TAILS)))]
        return f"{surface} {tail}"
    i = int(rng.integers(0, len(_DISTRACTOR_TRIGGER_SENTENCES)))
    return _DISTRACTOR_TRIGGER_SENTENCES[i]


def generate_doc(doc_index: int, seed: int = 42, head_frac: float = 0.35,
                 media_frac: float = 0.2):
    """Generate one document + its golden facts, independent of all others.

    Returns ``(doc_row: dict, facts: list[rule_idx])``.
    """
    rng = np.random.default_rng((seed, doc_index))
    doc_id = f"doc_{doc_index:08d}"

    is_head = rng.random() < head_frac
    n_facts = int(rng.integers(1, 5))
    pool = _HEAD_RULES if is_head else np.arange(_N_RULES)
    fact_idx = sorted(set(int(x) for x in rng.choice(pool, size=n_facts)))

    # span plan: every fact gets its own text span; filler / distractor /
    # media spans are interleaved around them (3..~16 spans per doc).
    n_extra = int(rng.integers(2, 12))
    sentences: list[tuple[str, str]] = [("fact", _fact_sentence(i, rng)) for i in fact_idx]
    for _ in range(n_extra):
        u = rng.random()
        if u < media_frac:
            sentences.append(("media", ""))
        elif u < media_frac + 0.25:
            sentences.append(("text", _distractor_sentence(rng)))
        else:
            sentences.append(("text", _filler_sentence(rng)))
    order = rng.permutation(len(sentences))

    spans = []
    for offset, j in enumerate(order):
        kind, text = sentences[int(j)]
        if kind == "media":
            mkind = "image" if rng.random() < 0.7 else "audio"
            spans.append({"kind": mkind, "text": "",
                          "media_ref": f"media://{doc_id}/{offset}",
                          "offset": offset})
        else:
            spans.append({"kind": "text", "text": text, "media_ref": "",
                          "offset": offset})

    row = {
        "doc_id": doc_id,
        "spans": spans,
        "title": f"synthetic paper {doc_index}",
        "authors": [f"author_{int(rng.integers(0, 50))}"],
        "date_published": "2023-07-31T00:00:00Z",
        "url": f"https://example.org/abs/{doc_index}",
    }
    return row, fact_idx


def docs_batch(doc_indices: np.ndarray, seed: int = 42,
               head_frac: float = 0.35) -> pa.Table:
    """Vector entry point for ``map_batches`` over ``ray.data.range(n)``."""
    rows = [generate_doc(int(i), seed=seed, head_frac=head_frac)[0]
            for i in doc_indices]
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def golden_batch(doc_indices: np.ndarray, seed: int = 42,
                 head_frac: float = 0.35) -> pa.Table:
    """Golden triples for the same doc indices (order-insensitive set)."""
    out = {k: [] for k in ("doc_id", "subj", "pred", "obj", "confidence")}
    for i in doc_indices:
        _, fact_idx = generate_doc(int(i), seed=seed, head_frac=head_frac)
        doc_id = f"doc_{int(i):08d}"
        for ri in fact_idx:
            r = RULES[ri]
            out["doc_id"].append(doc_id)
            out["subj"].append(r.subj)
            out["pred"].append(r.pred)
            out["obj"].append(r.obj)
            out["confidence"].append(r.confidence)
    return pa.Table.from_pydict(out, schema=GOLDEN_TRIPLES_SCHEMA)


def make_corpus(n_docs: int, seed: int = 42, head_frac: float = 0.35):
    """Small-scale driver-side corpus: ``(docs, golden)`` Arrow tables."""
    idx = np.arange(n_docs)
    return docs_batch(idx, seed, head_frac), golden_batch(idx, seed, head_frac)


def corpus_dataset(n_docs: int, seed: int = 42, head_frac: float = 0.35,
                   override_num_blocks: int | None = None):
    """Distributed corpus as a ``ray.data.Dataset`` (no driver loop)."""
    import ray.data as rd

    ds = rd.range(n_docs, override_num_blocks=override_num_blocks)

    def _gen(batch: pa.Table) -> pa.Table:
        return docs_batch(batch.column("id").to_numpy(), seed, head_frac)

    return ds.map_batches(_gen, batch_format="pyarrow", batch_size=256)
