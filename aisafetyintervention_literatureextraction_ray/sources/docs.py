"""Document sources: stored corpora + deterministic interleave adapter.

The engine's native input is the interleaved-document table of
BASELINE.json ``input_hint`` (DOCS_SCHEMA).  Two ways to obtain one:

* ``read_docs(path)`` — read a stored corpus (partitioned Parquet laid
  out like a Lance dataset: one directory, many fragments; the reference
  target format is Lance, which is not installed in this sandbox — the
  layout and schema are identical, only the container format differs).
  Replaces the reference's sorted PDF glob (``extract.py:62-67``).

* ``interleave_from_documents(sf_dir)`` — adapt the driver's flat
  ``documents(doc_id:int64, text, ...)`` parquet into interleaved docs,
  deterministically per row: the document text is chunked into text
  spans, media spans are interleaved, and gazetteer facts are planted by
  a per-doc seeded RNG so the golden triple set for the derived corpus
  is computable (``golden_for_documents``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..fixtures import _fact_sentence
from ..gazetteer import RULES
from ..schemas import DOCS_SCHEMA

_N_RULES = len(RULES)
_CHUNK_WORDS = 12
_MAX_CHUNKS = 40


def read_docs(path: str, **kwargs) -> rd.Dataset:
    """Read a stored interleaved-doc corpus (directory of parquet parts)."""
    return rd.read_parquet(path, **kwargs)


def _facts_for(doc_id: int, seed: int) -> tuple[list[int], np.random.Generator]:
    """Fact choice is the FIRST rng draw so golden replay stays in sync."""
    rng = np.random.default_rng((seed, 1000003, doc_id))
    n_facts = int(rng.integers(1, 4))
    fact_idx = sorted(set(int(x) for x in rng.choice(_N_RULES, size=n_facts)))
    return fact_idx, rng


def _interleave_batch(batch: pa.Table, seed: int) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = []
    for did, text in zip(ids, texts):
        fact_idx, rng = _facts_for(int(did), seed)
        words = (text or "").split()
        chunks = [
            " ".join(words[i: i + _CHUNK_WORDS])
            for i in range(0, min(len(words), _CHUNK_WORDS * _MAX_CHUNKS), _CHUNK_WORDS)
        ] or [""]
        sentences = [("text", c + ".") for c in chunks]
        sentences += [("fact", _fact_sentence(i, rng)) for i in fact_idx]
        n_media = int(rng.integers(0, 3))
        sentences += [("media", "")] * n_media
        order = rng.permutation(len(sentences))
        doc_id = f"doc_{int(did):08d}"
        spans = []
        for offset, j in enumerate(order):
            kind, t = sentences[int(j)]
            if kind == "media":
                spans.append({"kind": "image", "text": "",
                              "media_ref": f"media://{doc_id}/{offset}",
                              "offset": offset})
            else:
                spans.append({"kind": "text", "text": t, "media_ref": "",
                              "offset": offset})
        rows.append({
            "doc_id": doc_id,
            "spans": spans,
            "title": f"document {did}",
            "authors": ["unknown"],
            "date_published": "unknown",
            "url": "",
        })
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def interleave_from_documents(sf_dir: str, seed: int = 42) -> rd.Dataset:
    """documents.parquet -> interleaved-doc Dataset (streaming adapter)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: _interleave_batch(b, seed), batch_format="pyarrow", batch_size=512
    )


def golden_for_documents(sf_dir: str, seed: int = 42) -> pa.Table:
    """Golden (doc_id, subj, pred, obj, confidence) for the derived corpus."""
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = {k: [] for k in ("doc_id", "subj", "pred", "obj", "confidence")}
    for did in ids.column("doc_id").to_pylist():
        fact_idx, _ = _facts_for(int(did), seed)
        for ri in fact_idx:
            r = RULES[ri]
            out["doc_id"].append(f"doc_{int(did):08d}")
            out["subj"].append(r.subj)
            out["pred"].append(r.pred)
            out["obj"].append(r.obj)
            out["confidence"].append(r.confidence)
    return pa.table(out)
