"""Legacy-schema (``prompts.py:46-71`` OutputSchema) ingestion.

The reference repo carries TWO extraction generations (SURVEY.md
§1.1.3): ``extract.py`` emits the current ``PaperSchema`` while
``db.py:62`` still ingests the LEGACY ``OutputSchema`` — ``edges:
List[Edge]`` where each edge EMBEDS its ``target_node`` and the source
is implicitly the paper itself (``prompts.py:96``).  The two are one
generation apart and would fail validation end-to-end in the reference.

This converter folds legacy documents into the canonical extraction
shape so both generations flow through one engine:

* each embedded target node becomes a declared node (legacy ``type`` is
  an open 16-value ontology, kept as the node type string; legacy
  ``confidence`` 0-1 floats are scaled to the 1-5 integer range);
* each legacy edge becomes a chain edge ``paper -[type]-> target``
  where the paper pseudo-node carries type ``PAPER`` (the reference's
  label, ``db.py:36``).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..schemas import EXTRACTION_SCHEMA


def _conf_1_5(conf) -> int:
    """Legacy 0-1 float confidence -> 1-5 integer scale."""
    if conf is None:
        return 1
    return max(1, min(5, int(round(float(conf) * 4)) + 1))


def legacy_record_to_extraction(paper_id: str, record: dict) -> dict:
    """One legacy OutputSchema dict -> one EXTRACTION_SCHEMA row."""
    paper_node = {
        "name": paper_id,
        "aliases": [],
        "type": "PAPER",
        "description": f"paper {paper_id}",
        "concept_category": None,
        "intervention_lifecycle": None,
        "intervention_maturity": None,
    }
    nodes = {paper_id: paper_node}
    edges = []
    for edge in record.get("edges", []):
        target = edge.get("target_node") or {}
        name = target.get("name") or target.get("canonical_name")
        if not name:
            continue
        nodes.setdefault(name, {
            "name": name,
            "aliases": list(target.get("aliases") or []),
            "type": target.get("type") or "concept",
            "description": target.get("notes") or "",
            "concept_category": None,
            "intervention_lifecycle": None,
            "intervention_maturity": None,
        })
        edges.append({
            "type": edge.get("type") or "relates_to",
            "source_node": paper_id,   # implicit source (prompts.py:96)
            "target_node": name,
            "description": edge.get("rationale") or "",
            "edge_confidence": _conf_1_5(edge.get("confidence")),
        })
    return {
        "doc_id": paper_id,
        "spans": [],
        "nodes": sorted(nodes.values(), key=lambda n: n["name"]),
        "logical_chains": [{"title": f"legacy extraction {paper_id}",
                            "edges": edges}] if edges else [],
        "minhash_sig": [],
        # S4: the legacy record itself IS the raw pre-parse artifact
        "raw_response": json.dumps(record, sort_keys=True,
                                   separators=(",", ":")),
    }


def read_legacy_extraction_dir(path: str) -> pa.Table:
    """Read a directory of per-paper legacy JSON files (the reference's
    ``output/`` layout, ``db.py:56-58``: ``{stem}.json``, skipping
    ``*_raw_response.json``) into an extraction table."""
    from pathlib import Path

    rows = []
    for p in sorted(Path(path).glob("*.json")):
        if "raw_response" in p.name:  # F2 filename filter
            continue
        with open(p, encoding="utf-8") as f:
            rows.append(legacy_record_to_extraction(p.stem, json.load(f)))
    return pa.Table.from_pylist(rows, schema=EXTRACTION_SCHEMA)
