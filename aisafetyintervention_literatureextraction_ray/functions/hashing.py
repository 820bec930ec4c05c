"""Deterministic, process-independent hash kernels.

Python's builtin ``hash`` is salted per process (PYTHONHASHSEED) and can
never be used for partition keys or IDs in a distributed pipeline; every
key here is derived from blake2b/crc32 so that any worker on any node
computes the same value.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np


def stable_id(*parts: str, length: int = 16) -> str:
    """Stable hex ID for a composite key, e.g. node_id = stable_id(type, name_norm)."""
    h = hashlib.blake2b("\x1f".join(parts).encode("utf-8"), digest_size=8)
    return h.hexdigest()[:length]


def stable_u64(s: str) -> int:
    """Stable unsigned-64 hash of a string."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def crc32_tokens(tokens: list[str]) -> np.ndarray:
    """crc32 of each token — cheap, deterministic, good enough for feature
    hashing / shingle hashing (not cryptographic)."""
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in tokens),
        dtype=np.uint32,
        count=len(tokens),
    )


def partition_of(doc_id: str, num_partitions: int) -> int:
    """Deterministic partition assignment for lineage / resume (SURVEY.md §4.2)."""
    return stable_u64(doc_id) % num_partitions
