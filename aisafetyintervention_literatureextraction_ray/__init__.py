"""Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the semantics of
``jonpsy/AISafetyIntervention_LiteratureExtraction`` (reference at
``/root/reference``, surveyed in ``SURVEY.md``) as a streaming Ray Data
pipeline: triple extraction -> entity linking -> canonicalization ->
graph materialization over interleaved text+media documents.

Everything is expressed as ``ray.data.Dataset`` transforms over
zero-copy Arrow batches; stateful stages are actor pools; the only
shuffles are the three keyed group-bys documented in SURVEY.md §4.3
(node dedup, edge dedup, near-dup bucketing).
"""

__version__ = "0.1.0"
