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
from ..schemas import DOCS_SCHEMA, SPAN_TYPE

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
    """Flat-column span assembly: per-doc work is only the seeded rng
    draws and string chunking (the fixture contract — golden replay
    depends on the exact draw sequence); the nested spans column is
    built ONCE per batch from flat arrays (``StructArray`` +
    ``ListArray.from_arrays``), never via per-row pylist dicts."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    n = len(ids)
    kinds: list[str] = []
    span_texts: list[str] = []
    media_refs: list[str] = []
    span_pos: list[int] = []
    list_offsets = np.empty(n + 1, dtype=np.int32)
    list_offsets[0] = 0
    doc_ids = []
    titles = []
    for row, (did, text) in enumerate(zip(ids, texts)):
        fact_idx, rng = _facts_for(int(did), seed)
        words = (text or "").split()
        chunks = [
            " ".join(words[i: i + _CHUNK_WORDS])
            for i in range(0, min(len(words), _CHUNK_WORDS * _MAX_CHUNKS), _CHUNK_WORDS)
        ] or [""]
        sentences = [c + "." for c in chunks]
        sentences += [_fact_sentence(i, rng) for i in fact_idx]
        n_text = len(sentences)
        n_media = int(rng.integers(0, 3))
        order = rng.permutation(n_text + n_media)
        doc_id = f"doc_{int(did):08d}"
        for offset, j in enumerate(order):
            j = int(j)
            if j < n_text:
                kinds.append("text")
                span_texts.append(sentences[j])
                media_refs.append("")
            else:
                kinds.append("image")
                span_texts.append("")
                media_refs.append(f"media://{doc_id}/{offset}")
            span_pos.append(offset)
        list_offsets[row + 1] = list_offsets[row] + n_text + n_media
        doc_ids.append(doc_id)
        titles.append(f"document {did}")
    span_values = pa.StructArray.from_arrays(
        [pa.array(kinds, type=pa.string()),
         pa.array(span_texts, type=pa.string()),
         pa.array(media_refs, type=pa.string()),
         pa.array(span_pos, type=pa.int32())],
        fields=list(SPAN_TYPE))
    spans = pa.ListArray.from_arrays(pa.array(list_offsets), span_values)
    authors = pa.ListArray.from_arrays(
        pa.array(np.arange(n + 1, dtype=np.int32)),
        pa.array(["unknown"] * n, type=pa.string()))
    return pa.Table.from_arrays(
        [pa.array(doc_ids, type=pa.string()), spans,
         pa.array(titles, type=pa.string()), authors,
         pa.array(["unknown"] * n, type=pa.string()),
         pa.array([""] * n, type=pa.string())],
        schema=DOCS_SCHEMA)


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
