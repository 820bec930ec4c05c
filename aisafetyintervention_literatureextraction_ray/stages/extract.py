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

import numpy as np
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
        from .dedup import MinHasher

        # dedup sketch computed in the same pass (one text scan feeds
        # both the KG structures and near-dup detection downstream)
        self.minhasher = MinHasher()
        # one-time state (per actor): surface->entity map + per-predicate
        # compiled patterns.  Longest-first alternation so multi-word
        # aliases win over embedded shorter aliases.
        surfaces: dict[str, str] = {}
        for ent in ENTITIES:
            for s in ent.surfaces:
                surfaces[s.lower()] = ent.name
        self.surface_to_entity = surfaces
        self.max_alias_words = max(len(s.split()) for s in surfaces)
        alts = sorted(surfaces, key=len, reverse=True)
        alias_re = "|".join(re.escape(s) for s in alts)
        trigs = sorted(TRIGGERS.values(), key=len, reverse=True)
        trig_re = "|".join(re.escape(t) for t in trigs)
        # reference pattern (kept for the parity test): one combined scan
        self.pattern = re.compile(
            rf"\b({alias_re})\s+({trig_re})\s+({alias_re})\b",
            re.IGNORECASE,
        )
        # hot path: scan for TRIGGERS only (a 12-phrase automaton is ~5x
        # cheaper than the full alias alternation on paper-sized docs),
        # then resolve subject/object with O(max_alias_words) dict
        # lookups around each trigger.  Verified equivalent to
        # ``self.pattern`` (tests/test_extract.py parity test).
        self.trigger_pattern = re.compile(
            rf"(?:^|(?<=\s))({trig_re})(?=\s)", re.IGNORECASE)
        self.trigger_to_pred = {t.lower(): p for p, t in TRIGGERS.items()}
        self.rule_chain = {(r.subj, r.pred, r.obj): r.chain for r in RULES}
        self.rule_conf = {(r.subj, r.pred, r.obj): r.confidence for r in RULES}

    def _find_triples(self, low: str) -> dict[tuple[str, str, str], None]:
        """Trigger-anchored detection, equivalent to ``self.pattern``."""
        surfaces = self.surface_to_entity
        found: dict[tuple[str, str, str], None] = {}
        for m in self.trigger_pattern.finditer(low):
            s, e = m.span(1)
            pred = self.trigger_to_pred[" ".join(m.group(1).split())]
            # subject: longest alias ending right before the trigger,
            # separated by whitespace only, with a word boundary before
            left = low[:s]
            lw = left.rstrip()
            if len(left) == len(lw):
                continue
            words = lw.split(" ")
            subj = None
            for k in range(min(self.max_alias_words, len(words)), 0, -1):
                cand = " ".join(words[-k:])
                ent = surfaces.get(cand)
                if ent is not None:
                    idx = len(lw) - len(cand)
                    if idx == 0 or not lw[idx - 1].isalnum():
                        subj = ent
                        break
            if subj is None:
                continue
            right = low[e:]
            rw = right.lstrip()
            if len(right) == len(rw):
                continue
            words_r = rw.split(" ")
            obj = None
            for k in range(min(self.max_alias_words, len(words_r)), 0, -1):
                cand = " ".join(words_r[:k])
                ent = surfaces.get(cand)
                if ent is not None and (len(cand) == len(rw)
                                        or not rw[len(cand)].isalnum()):
                    obj = ent
                    break
                stripped = cand.rstrip(".,;:!?")
                if stripped != cand and surfaces.get(stripped) is not None:
                    obj = surfaces[stripped]
                    break
            if obj is None:
                continue
            found.setdefault((subj, pred, obj), None)
        return found

    def _find_triples_regex(self, low: str) -> dict[tuple[str, str, str], None]:
        """Reference single-scan implementation (parity check only)."""
        found: dict[tuple[str, str, str], None] = {}
        for m in self.pattern.finditer(low):
            found.setdefault(
                (self.surface_to_entity[m.group(1)],
                 self.trigger_to_pred[" ".join(m.group(2).split())],
                 self.surface_to_entity[m.group(3)]), None)
        return found

    def _extract_one(self, text: str):
        """Detect triples in one doc; returns (nodes, chains) py-structs."""
        low = text.lower()
        found = self._find_triples(low)

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
        import json

        texts = batch.column("full_text").to_pylist()
        nodes_col, chains_col, raw_col = [], [], []
        for text in texts:
            nodes, chains = self._extract_one(text or "")
            nodes_col.append(nodes)
            chains_col.append(chains)
            # S4: the raw structured response, serialized before any
            # downstream parsing/validation (extract.py:77-80 analogue)
            raw_col.append(json.dumps(
                {"nodes": nodes, "logical_chains": chains},
                sort_keys=True, separators=(",", ":")))
        sigs = self.minhasher.signatures([t or "" for t in texts])
        n, p = sigs.shape if len(texts) else (0, self.minhasher.num_perm)
        # store the low 32 bits: equality (all the banding/estimation
        # needs) is preserved w.h.p. and the dedup scan halves in size
        sig32 = (sigs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        sig_col = pa.LargeListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * p, p, dtype=np.int64)),
            pa.array(sig32.reshape(-1), type=pa.uint32()))
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "spans": batch.column("spans"),  # echoed: per-row invariant
                "nodes": pa.array(nodes_col, type=EXTRACTION_SCHEMA.field("nodes").type),
                "logical_chains": pa.array(
                    chains_col, type=EXTRACTION_SCHEMA.field("logical_chains").type
                ),
                "minhash_sig": sig_col,
                "raw_response": pa.array(raw_col, type=pa.string()),
            }
        )
        return cast_batch(out, EXTRACTION_SCHEMA)
