"""Vectorized explode helpers for nested list<struct> columns.

The reference walks nested pydantic objects in Python loops
(``db.py:59-66`` iterates docs then edges).  Here the flatten is pure
Arrow: ``list_parent_indices`` + ``ListArray.flatten`` — no Python row
loop, zero-copy where Arrow allows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_list_array(col) -> pa.ListArray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def _local_index(list_arr: pa.ListArray, parent: pa.Array) -> pa.Array:
    """0-based position of each flattened element within its parent list."""
    offsets = list_arr.offsets.to_numpy(zero_copy_only=False)
    parent_np = parent.to_numpy(zero_copy_only=False)
    starts = offsets[:-1]
    global_idx = np.arange(len(parent_np), dtype=np.int64)
    return pa.array(global_idx - starts[parent_np].astype(np.int64), type=pa.int32())


def explode_chain_edges(batch: pa.Table) -> pa.Table:
    """extractions batch -> flat triples batch (SURVEY.md §1.4 triples).

    Two-level explode: docs -> logical_chains -> edges, carrying
    ``doc_id``, a per-doc ``chain_id`` and per-chain ``edge_idx``.
    """
    chains = _as_list_array(batch.column("logical_chains"))
    chain_parent = pc.list_parent_indices(chains)          # doc idx per chain
    chain_id = _local_index(chains, chain_parent)          # chain idx within doc
    chains_flat = chains.flatten()                          # struct<title, edges>

    edges = chains_flat.field("edges")
    edge_parent = pc.list_parent_indices(edges)            # chain idx per edge
    edge_idx = _local_index(edges, edge_parent)
    edges_flat = edges.flatten()                            # struct<type, ...>

    doc_idx_per_edge = pc.take(chain_parent, edge_parent)
    return pa.table(
        {
            "doc_id": pc.take(batch.column("doc_id"), doc_idx_per_edge),
            "chain_id": pc.take(chain_id, edge_parent),
            "edge_idx": edge_idx,
            "subj": edges_flat.field("source_node"),
            "pred": edges_flat.field("type"),
            "obj": edges_flat.field("target_node"),
            "description": edges_flat.field("description"),
            "confidence": edges_flat.field("edge_confidence"),
        }
    )


def explode_nodes(batch: pa.Table) -> pa.Table:
    """extractions batch -> flat per-mention node rows (doc_id carried)."""
    nodes = _as_list_array(batch.column("nodes"))
    parent = pc.list_parent_indices(nodes)
    flat = nodes.flatten()
    return pa.table(
        {
            "doc_id": pc.take(batch.column("doc_id"), parent),
            "name": flat.field("name"),
            "aliases": flat.field("aliases"),
            "type": flat.field("type"),
            "description": flat.field("description"),
            "concept_category": flat.field("concept_category"),
            "intervention_lifecycle": flat.field("intervention_lifecycle"),
            "intervention_maturity": flat.field("intervention_maturity"),
        }
    )
