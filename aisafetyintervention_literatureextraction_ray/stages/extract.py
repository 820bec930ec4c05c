"""Triple-extraction stage: span assembly + gazetteer/rule extractor.

Replaces the reference's sequential per-PDF loop
(``src/local_graph_extraction/extract.py:62-85``: upload PDF -> build
prompt -> ``responses.parse`` -> write JSON) with two Ray Data stages:

1. ``assemble_full_text`` — a stateless, fully vectorized ``map_batches``
   projection that concatenates each row's text spans *in span order*
   into one ``full_text`` column (the analogue of prompt/input assembly,
   ``extract.py:37-46``).  The ``spans`` column itself is passed through
   untouched — the per-row invariant ``(kind, text, media_ref, order)``
   must survive the stage (BASELINE.json input_hint).

2. ``TripleExtractor`` — the flagship *stateful* stage: a callable class
   run as a ``map_batches`` actor pool.  ``__init__`` compiles the
   gazetteer alternation + one regex per predicate ONCE per actor (the
   sandbox stand-in for loading an LLM client, ``extract.py:23-27``);
   ``__call__`` detects planted facts per batch and emits the exact
   Arrow mirror of the reference's ``PaperSchema``
   (``core.py:5-34``): nodes + logical chains of confidence-scored
   edges.  Output is deterministic, so retries are idempotent and P/R
   scoring against the golden set is exact.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..gazetteer import ENTITIES, ENTITY_BY_NAME, RULES, TRIGGERS
from ..schemas import EXTRACTION_SCHEMA, cast_batch


def assemble_full_text(batch: pa.Table) -> pa.Table:
    """Concatenate text spans per row (span order) into ``full_text``.

    Vectorized: builds a list<string> array sharing the spans list
    offsets, then joins with ``pc.binary_join`` — no Python row loop.
    Rows are assumed span-order-sorted by ``offset`` (the input contract);
    media spans contribute their empty ``text`` and are invisible.
    """
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):  # zero-chunk edge case
        spans = spans.combine_chunks()
    texts = spans.values.field("text")
    text_lists = pa.ListArray.from_arrays(spans.offsets, texts)
    full = pc.binary_join(text_lists, " ")
    return batch.append_column("full_text", full)


class TripleExtractor:
    """Actor-pool extraction: gazetteer mention detection + pattern rules.

    Use as ``ds.map_batches(TripleExtractor, batch_format="pyarrow",
    concurrency=N, batch_size=B)``.
    """

    def __init__(self, max_triples_per_doc: int | None = None) -> None:
        # A6: the reference caps extraction volume via prompt guidance
        # ("<= ~10,000 tokens per paper", fpp.py:8); here the budget is
        # an explicit deterministic cap (sorted-order truncation).
        self.max_triples_per_doc = max_triples_per_doc
        # one-time state (per actor): surface->entity map + per-predicate
        # compiled patterns.  Longest-first alternation so multi-word
        # aliases win over embedded shorter aliases.
        surfaces: dict[str, str] = {}
        for ent in ENTITIES:
            for s in ent.surfaces:
                surfaces[s.lower()] = ent.name
        self.surface_to_entity = surfaces
        alts = sorted(surfaces, key=len, reverse=True)
        alias_re = "|".join(re.escape(s) for s in alts)
        # ONE combined pattern (single scan per doc instead of one per
        # predicate); the matched trigger text maps back to the verb.
        trigs = sorted(TRIGGERS.values(), key=len, reverse=True)
        trig_re = "|".join(re.escape(t) for t in trigs)
        self.pattern = re.compile(
            rf"\b({alias_re})\s+({trig_re})\s+({alias_re})\b",
            re.IGNORECASE,
        )
        self.trigger_to_pred = {t.lower(): p for p, t in TRIGGERS.items()}
        self.rule_chain = {(r.subj, r.pred, r.obj): r.chain for r in RULES}
        self.rule_conf = {(r.subj, r.pred, r.obj): r.confidence for r in RULES}

    def _extract_one(self, text: str):
        """Detect triples in one doc; returns (nodes, chains) py-structs."""
        found: dict[tuple[str, str, str], None] = {}
        low = text.lower()
        for m in self.pattern.finditer(low):
            subj = self.surface_to_entity[m.group(1)]
            pred = self.trigger_to_pred[" ".join(m.group(2).split())]
            obj = self.surface_to_entity[m.group(3)]
            found.setdefault((subj, pred, obj), None)

        if not found:
            return [], []
        if self.max_triples_per_doc is not None \
                and len(found) > self.max_triples_per_doc:
            found = dict.fromkeys(
                sorted(found)[: self.max_triples_per_doc])

        # chains: group triples by gazetteer chain title; unknown
        # combinations (possible on non-synthetic text) fall into a
        # catch-all chain.  Deterministic ordering throughout.
        by_chain: dict[str, list[tuple[str, str, str]]] = {}
        mentioned: dict[str, None] = {}
        for key in sorted(found):
            chain = self.rule_chain.get(key, "extracted relations")
            by_chain.setdefault(chain, []).append(key)
            mentioned.setdefault(key[0], None)
            mentioned.setdefault(key[2], None)

        nodes = []
        for name in sorted(mentioned):
            e = ENTITY_BY_NAME[name]
            nodes.append(
                {
                    "name": e.name,
                    "aliases": list(e.aliases),
                    "type": e.type,
                    "description": e.description,
                    "concept_category": e.concept_category,
                    "intervention_lifecycle": e.intervention_lifecycle,
                    "intervention_maturity": e.intervention_maturity,
                }
            )
        chains = []
        for title in sorted(by_chain):
            edges = [
                {
                    "type": pred,
                    "source_node": subj,
                    "target_node": obj,
                    "description": f"{subj} {pred.replace('_', ' ')} {obj}",
                    "edge_confidence": self.rule_conf.get((subj, pred, obj), 1),
                }
                for subj, pred, obj in by_chain[title]
            ]
            chains.append({"title": title, "edges": edges})
        return nodes, chains

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "full_text" not in batch.column_names:
            batch = assemble_full_text(batch)
        texts = batch.column("full_text").to_pylist()
        nodes_col, chains_col = [], []
        for text in texts:
            nodes, chains = self._extract_one(text or "")
            nodes_col.append(nodes)
            chains_col.append(chains)
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "spans": batch.column("spans"),  # echoed: per-row invariant
                "nodes": pa.array(nodes_col, type=EXTRACTION_SCHEMA.field("nodes").type),
                "logical_chains": pa.array(
                    chains_col, type=EXTRACTION_SCHEMA.field("logical_chains").type
                ),
            }
        )
        return cast_batch(out, EXTRACTION_SCHEMA)
