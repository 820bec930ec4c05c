"""Name normalization kernel (vectorized, pyarrow.compute only).

The reference enforces canonical naming through prompt text only —
snake_case, simplest-form, canonical long names (reference
``src/local_graph_extraction/prompts.py:94-95``, prompt guidelines
``src/prompt/final_primary_prompt.py:136-147``).  Here it is an explicit
deterministic kernel, because ``name_norm`` is the node-dedup group-by
key (SURVEY.md §2.8) and must be identical on every worker.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def normalize_names(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """NFKC -> lowercase -> non-alphanumeric runs to ``_`` -> trim.

    ``"Reinforcement Learning from Human Feedback"`` ->
    ``"reinforcement_learning_from_human_feedback"``.
    """
    x = pc.utf8_normalize(arr, form="NFKC")
    x = pc.utf8_lower(x)
    x = pc.replace_substring_regex(x, pattern=r"[^a-z0-9]+", replacement=" ")
    x = pc.utf8_trim_whitespace(x)
    x = pc.replace_substring_regex(x, pattern=r" ", replacement="_")
    return x


def normalize_name(name: str) -> str:
    """Scalar convenience wrapper (tests, broadcast-index construction)."""
    return normalize_names(pa.array([name])).to_pylist()[0]
