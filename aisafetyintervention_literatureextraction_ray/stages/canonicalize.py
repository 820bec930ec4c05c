"""Near-duplicate node canonicalization stages.

Ray-native rebuild of the reference's ``merge.py`` pipeline
(SURVEY.md §3.3): node-text projection (``db.py:81-96``) -> embed
(``merge.py:35-70``) -> ANN candidate pairs (``merge.py:72-105``) ->
best-distance-per-pair (``merge.py:85-91``) -> top-n/threshold accept
(``merge.py:92``) -> merge (``merge.py:107-109`` + ``db.py:106-155``).

Differences by design (documented in SURVEY.md §2.7):

* The reference builds ONE global usearch index in driver RAM
  (``merge.py:77-79``).  Here candidate generation is a shuffle: nodes
  are hashed into LSH bands/buckets and exact KNN runs per bucket inside
  ``groupby(bucket).map_groups`` — no global state, scales with the
  cluster.  ``exact`` mode (single bucket) reproduces the reference's
  global-KNN candidate set for parity tests at small scale.
* The reference merges accepted pairs sequentially without transitive
  closure (``merge.py:107-109``), which is order-dependent.  We compute
  the union-find closure over the accepted-pair set (order-independent,
  the semantically intended behavior); parity is asserted on the
  accepted-pair set itself.
* Keeper choice: the reference keeps ``node_a`` = the smaller id of the
  canonical ``(a, b), a < b`` pair key (``merge.py:88-89``, call at
  ``merge.py:107-109``).  We keep the minimum node_id per component.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .encode import embeddings_to_numpy

# ------------------------------------------------------------ text projection

_PROJ_KEYS = ("name", "aliases", "description", "concept_category",
              "intervention_lifecycle", "intervention_maturity")


def project_node_text(batch: pa.Table) -> pa.Table:
    """Render node props as ``"k=v; k=v"`` (reference ``db.py:81-96``).

    Vectorized: per-key prefix + element-wise join with null-skip;
    empty values become null and are skipped (the reference's
    ``len(v_str) > 0`` filter at ``db.py:95``); list values join with
    ``", "`` (``db.py:90-91``).  ``confidence``/``id`` style fields are
    excluded by the fixed key list; intervention lifecycle/maturity ints
    are stringified (reference ``db.py:89-91`` ``str(v)`` branch).
    """
    parts = []
    for key in _PROJ_KEYS:
        if key not in batch.column_names:
            continue
        col = batch.column(key)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            col = pc.binary_join(col, ", ")
        col = col.cast(pa.string())
        val = pc.if_else(pc.equal(pc.coalesce(col, ""), ""), pa.scalar(None, pa.string()), col)
        prefixed = pc.binary_join_element_wise(pa.scalar(f"{key}="), val, "")
        parts.append(prefixed)
    text = pc.binary_join_element_wise(*parts, "; ", null_handling="skip")
    if "text" in batch.column_names:
        batch = batch.drop_columns(["text"])
    return batch.append_column("text", text)


# ------------------------------------------------------------ LSH bucketing

class LSHBucketer:
    """Random-hyperplane banding: explode each row into ``n_bands`` rows
    keyed ``(band, bucket)``.  Rows sharing any band-bucket become KNN
    candidates.  Actor state = the projection matrix (seeded, built once
    per actor)."""

    def __init__(self, dim: int, n_bands: int = 8, planes_per_band: int = 6,
                 seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        self.n_bands = n_bands
        self.planes = rng.standard_normal(
            (n_bands * planes_per_band, dim)).astype(np.float32)
        self.ppb = planes_per_band

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = embeddings_to_numpy(batch.column("embedding")).astype(np.float32)
        bits = (X @ self.planes.T) > 0  # (n, bands*ppb)
        n = len(batch)
        weights = (1 << np.arange(self.ppb, dtype=np.int64))
        out = []
        for band in range(self.n_bands):
            chunk = bits[:, band * self.ppb: (band + 1) * self.ppb]
            bucket = chunk @ weights + (np.int64(band) << 32)
            t = batch.append_column("bucket", pa.array(bucket, type=pa.int64()))
            out.append(t)
        return pa.concat_tables(out) if n else batch.append_column(
            "bucket", pa.array([], type=pa.int64()))


def constant_bucket(batch: pa.Table) -> pa.Table:
    """Exact mode: all rows in one bucket -> global KNN (parity with the
    reference's single driver-RAM index; small inputs only)."""
    return batch.append_column("bucket", pa.array(np.zeros(len(batch), np.int64)))


# ------------------------------------------------------------ pair generation

def make_pairgen(k: int = 40, id_col: str = "node_id",
                 max_group: int = 8192):
    """Per-bucket exact cosine KNN -> candidate pairs (id_a < id_b, distance).

    Mirrors ``merge.py:79-91``: K nearest per node, self-match dropped
    (F5), pair key canonicalized (min, max), best distance kept.  Groups
    larger than ``max_group`` are processed in row-chunks against the
    whole group (bounded memory; full coverage, no silent truncation).

    Takes Arrow groups (``batch_format="pyarrow"``): Ray promotes
    uniform list columns to its tensor extension type after a shuffle,
    and that type's chunked pandas conversion fails — Arrow in, pandas
    out sidesteps it.
    """

    def pairgen(group: pa.Table) -> pd.DataFrame:
        from .encode import embeddings_to_numpy

        n = group.num_rows
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        if n < 2:
            # typed empty (same id dtype) so block schemas stay mergeable
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0],
                                 "distance": np.array([], dtype=np.float64)})
        X = embeddings_to_numpy(group.column("embedding")).astype(np.float32)
        rows_a, rows_b, dists = [], [], []
        kk = min(k + 1, n)
        for start in range(0, n, max_group):
            chunk = X[start: start + max_group]
            sims = chunk @ X.T  # vectors are L2-normalized upstream
            # top-(k+1) per row, then drop self
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            for i in range(chunk.shape[0]):
                gi = start + i
                for j in idx[i]:
                    if j == gi:
                        continue
                    a, b = (gi, j) if ids[gi] < ids[j] else (j, gi)
                    rows_a.append(ids[a])
                    rows_b.append(ids[b])
                    dists.append(1.0 - float(sims[i, j]))
        return pd.DataFrame({"id_a": rows_a, "id_b": rows_b,
                             "distance": np.asarray(dists, dtype=np.float64)})

    return pairgen


# ------------------------------------------------------------ union-find

def union_find(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Transitive closure over accepted pairs -> {node_id: canon_id}.

    Driver-side by design: accepted pairs are tiny relative to nodes
    (reference caps at top_n=30, ``merge.py:115``; threshold mode yields
    |pairs| ~ O(dup rate * nodes), still << corpus).  Canon id = min id
    in the component (deterministic, order-independent).
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}
