"""BM25 ranked retrieval over a document corpus.

Full-text relevance ranking for a fixed query — the retrieval half of a
RAG / search-index pipeline — computed in two streaming passes:

1. **corpus statistics** (one pass): per-block partials of N, total
   token count and per-term document frequency collapse to a handful of
   scalars on the driver (a few KB regardless of corpus size) — the
   classic broadcast-side of a scoring join;
2. **scoring** (one pass): the scalars ship inside the task closure and
   every block is scored vectorized (compiled RE2 term counts +
   float64 numpy expression tree); global top-k via ``Dataset.sort`` +
   ``limit``.

Exactness contract: term frequency uses RE2 word-boundary counts and
document length uses the whitespace tokenizer — both bit-reproducible
in DuckDB (same RE2 engine), and the scoring expression is written as
the identical IEEE op tree on both sides (``np.log(1.0 + x)`` mirrors
SQL ``ln(1.0 + x)``; integer-valued doubles sum exactly, so ``avgdl``
is division of exact values).  Scores are rounded to 6 decimals BEFORE
the sort so tie order cannot diverge between engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .text import token_counts

K1 = 1.2
B = 0.75


def _term_freqs(t: pa.Table, terms: list[str],
                text_col: str) -> tuple[pa.Array, list[np.ndarray]]:
    """(doc length, [tf per term]) — vectorized RE2 kernels.  Terms are
    lowercased (the text is) and regex-escaped so a metacharacter query
    like ``c++`` counts literally instead of breaking the pattern."""
    import re

    text = pc.utf8_lower(t.column(text_col))
    dl = token_counts(text)
    tfs = [
        pc.count_substring_regex(
            text, pattern=rf"\b{re.escape(term.lower())}\b")
        .to_numpy(zero_copy_only=False).astype(np.float64)
        for term in terms
    ]
    return dl, tfs


def bm25_topk(ds: rd.Dataset, terms: list[str], *, k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = K1, b: float = B) -> rd.Dataset:
    """Top-``k`` documents by BM25 score for the query ``terms``.

    Output: ``(id_col, bm25)`` sorted by score descending, id ascending.
    """
    terms = list(terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        dl, tfs = _term_freqs(t, terms, text_col)
        cols = {
            "n": pa.array([t.num_rows], type=pa.int64()),
            "sum_dl": pa.array([pc.sum(dl).as_py() or 0], type=pa.int64()),
        }
        for i, tf in enumerate(tfs):
            cols[f"df{i}"] = pa.array([int((tf > 0).sum())], type=pa.int64())
        return pa.table(cols)

    stats = (ds.map_batches(stats_partial, batch_format="pyarrow",
                            batch_size=4096, zero_copy_batch=True)
             .to_pandas().sum())
    n = float(stats.get("n", 0) or 0)
    if n == 0:  # empty corpus: empty top-k, not a ZeroDivisionError
        # typed empty with the INPUT's id type (ADVICE r3): a string-id
        # corpus must get a string-typed empty result, same as the
        # non-empty path carries the id type through
        from .agg import pa_type_of

        sch = ds.schema()
        id_type = pa_type_of(dict(zip(sch.names, sch.types))[id_col])
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=id_type),
            "bm25": pa.array([], type=pa.float64())}))
    avgdl = float(stats["sum_dl"]) / float(stats["n"])
    idfs = [float(np.log(1.0 + (n - float(stats[f"df{i}"]) + 0.5)
                         / (float(stats[f"df{i}"]) + 0.5)))
            for i in range(len(terms))]

    def score(t: pa.Table) -> pa.Table:
        dl, tfs = _term_freqs(t, terms, text_col)
        dlf = dl.to_numpy(zero_copy_only=False).astype(np.float64)
        denom_len = k1 * (1.0 - b + b * dlf / avgdl)
        total = np.zeros(t.num_rows, dtype=np.float64)
        for idf, tf in zip(idfs, tfs):
            total = total + idf * tf * (k1 + 1.0) / (tf + denom_len)
        return pa.table({
            id_col: t.column(id_col),
            "bm25": pa.array(np.round(total, 6), type=pa.float64()),
        })

    return (ds.map_batches(score, batch_format="pyarrow", batch_size=4096,
                           zero_copy_batch=True)
            .sort(["bm25", id_col], descending=[True, False])
            .limit(k))
