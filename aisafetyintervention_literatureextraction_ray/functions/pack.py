"""Sequence packing for training-data preparation.

Pretraining dataloaders consume fixed-length token sequences, not
documents: documents are concatenated in a deterministic order and the
stream is cut every ``capacity`` tokens ("concat-and-chunk" packing).
This module computes the pack assignment distributedly:

1. token counts per document (vectorized whitespace tokenizer from
   ``functions/text.py`` — swap in a BPE counter per actor when one is
   available);
2. a per-partition-key running token offset via ``grouped_running``
   (keyed shuffle + one vectorized ordered pass per bucket — no
   driver-side pass, no global sort);
3. ``pack_id = start_offset // capacity`` as a pure Arrow kernel.

A document is assigned to the pack containing its FIRST token; a
document straddling a boundary still belongs to its start pack (the
standard GPT-style stream chunking — the tail tokens spill into the
next physical sequence at tensorization time, which is a dataloader
concern, not a data-plane one).  The assignment is deterministic in
(partition key, order column) and SQL-expressible, so the oracle can
reproduce it exactly with a window function.

Scale contract: one partition key's rows co-locate in a shuffle bucket
(the ``grouped_running`` contract).  Packing partitions by a bounded
key (source / shard / date), never globally — a global concat order
would serialize the whole corpus through one bucket by design.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .agg import grouped_running
from .text import add_token_count


def pack_documents(ds: rd.Dataset, capacity: int, *,
                   key: str | list[str] = "source",
                   order_col: str = "doc_id",
                   text_col: str = "text",
                   num_buckets: int | None = None) -> rd.Dataset:
    """Assign every document to a fixed-``capacity`` token pack within
    its ``key`` partition.

    ``key`` may be a list — at corpus scale pass a COMPOSITE key like
    ``["source", "shard"]`` (the ``grouped_running`` contract is that
    one key's rows fit a bucket's heap share; a 20-source corpus keyed
    on source alone would put 1/20th of 10^12 docs in one bucket).
    Packs resetting at shard boundaries is the intended semantics: a
    shard is a storage file, and training-order packing is per file.

    Output columns: ``key`` column(s), ``order_col``, ``n_tokens``,
    ``pack_id`` (0-based within the key), ``offset_in_pack`` (token
    offset of the document's first token inside its pack).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    keys = [key] if isinstance(key, str) else list(key)

    def tokens_only(t: pa.Table) -> pa.Table:
        return add_token_count(t, text_col=text_col).drop_columns([text_col])

    counted = ds.map_batches(tokens_only, batch_format="pyarrow",
                             batch_size=4096, zero_copy_batch=True)

    running = grouped_running(counted, keys, [order_col],
                              cum_cols=["n_tokens"], seq_col="__seq",
                              num_buckets=num_buckets)

    cap = pa.scalar(capacity, type=pa.int64())

    def assign(t: pa.Table) -> pa.Table:
        start = pc.subtract(pc.cast(t["n_tokens_running"], pa.int64()),
                            pc.cast(t["n_tokens"], pa.int64()))
        pack_id = pc.divide(start, cap)  # int64 // int64 floors for >= 0
        offset = pc.subtract(start, pc.multiply(pack_id, cap))
        cols = {k: t[k] for k in keys}
        cols.update({
            order_col: t[order_col],
            "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
            "pack_id": pack_id,
            "offset_in_pack": offset,
        })
        return pa.table(cols)

    return running.map_batches(assign, batch_format="pyarrow",
                               zero_copy_batch=True)
