"""Embedding encoder stage (actor pool, deterministic hashing encoder).

Replaces the reference's OpenAI Batch-API embedding round-trip
(``merge.py:35-70``: write request JSONL -> upload -> 24h batch job ->
poll -> parse vectors) with an inline actor-pool ``map_batches`` stage:
vectors are just another column (``fixed_size_list<float32>``), never a
driver-resident matrix (the reference holds all embeddings in driver
RAM at ``merge.py:70`` — its scalability ceiling, SURVEY.md ST5).

In-sandbox the encoder is a seeded feature-hashing model (dim 256
instead of the reference's 1536, ``merge.py:43``): tokens are hashed to
(index, sign) buckets, counts accumulated, L2-normalized.  Deterministic
across processes, so entity-linking results are exactly reproducible.
An LLM-backed encoder would swap only ``__init__`` (load model) and the
vector math in ``_encode`` — the Ray plumbing is identical.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.hashing import crc32_tokens

DEFAULT_DIM = 256
_TOKEN_RE = re.compile(r"[a-z0-9]+")


class HashingEncoder:
    """``map_batches(HashingEncoder, concurrency=N)`` actor.

    Adds an ``embedding`` column (list<float32>[dim]) computed from
    ``text_col``.  Token -> (bucket, sign) assignments are cached in
    actor state, so repeated vocabulary costs one crc32 each.
    """

    def __init__(self, text_col: str = "text", dim: int = DEFAULT_DIM) -> None:
        self.text_col = text_col
        self.dim = dim
        self._cache: dict[str, tuple[int, float]] = {}

    def _slot(self, token: str) -> tuple[int, float]:
        slot = self._cache.get(token)
        if slot is None:
            h = int(crc32_tokens([token])[0])
            slot = (h % self.dim, 1.0 if (h >> 31) & 1 else -1.0)
            self._cache[token] = slot
        return slot

    def _encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            for tok in _TOKEN_RE.findall((text or "").lower()):
                j, sign = self._slot(tok)
                out[i, j] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        vecs = self._encode(texts)
        emb = vectors_to_arrow(vecs)
        if "embedding" in batch.column_names:
            batch = batch.drop_columns(["embedding"])
        return batch.append_column("embedding", emb)


def vectors_to_arrow(vecs: np.ndarray) -> pa.ListArray:
    """(n, d) float matrix -> plain list<float32> Arrow column.

    Deliberately NOT fixed_size_list: Ray Data auto-casts fixed-size
    lists to its tensor extension type, whose chunked pandas conversion
    fails inside ``map_groups`` (zero-copy constraint); plain lists
    round-trip everywhere.
    """
    n, d = vecs.shape
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.ListArray.from_arrays(
        offsets, pa.array(vecs.reshape(-1).astype(np.float32),
                          type=pa.float32()))


def embeddings_to_numpy(col) -> np.ndarray:
    """Zero-copy-ish conversion of a (fixed_size_)list<float> column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ExtensionArray):
        # Ray's ArrowTensorArray (ndarray cells) and friends
        return np.stack(col.to_numpy(zero_copy_only=False))
    if isinstance(col, pa.FixedSizeListArray):
        dim = col.type.list_size
        return col.values.to_numpy(zero_copy_only=False).reshape(-1, dim)
    # plain list<float>: offsets must be uniform
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    dim = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == dim).all():
        raise ValueError("ragged embedding column")
    return (
        col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        .reshape(-1, dim)
    )
