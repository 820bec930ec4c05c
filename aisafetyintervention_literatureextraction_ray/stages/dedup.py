"""Deduplication stages: exact, MinHash+LSH, SimHash.

The reference's only dedup operators are key-grouped MERGE upserts and
the embedding near-dup canonicalizer (SURVEY.md §2.7).  A 100 TB
training-data pipeline needs document-level dedup as a first-class
stage; these follow the same physical design rules as the KG build: no
global state, candidate generation as a keyed shuffle, verification
inside the group.

All hash functions are process-independent (``functions/hashing.py``);
Python's salted ``hash`` is never used.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_MERSENNE = np.uint64((1 << 61) - 1)


def content_hash(df: pd.DataFrame, col: str) -> pd.Series:
    """Deterministic vectorized 64-bit content hash (pandas C kernel,
    fixed hash key -> identical on every worker)."""
    return pd.util.hash_pandas_object(df[col], index=False)


def exact_dedup(ds: rd.Dataset, col: str, id_col: str) -> rd.Dataset:
    """Keep the min-``id_col`` row per distinct ``col`` value.

    Hash-partition + per-group first (SURVEY.md 'Deduplication' item):
    stage 1 drops in-batch duplicates (partial combine), stage 2 groups
    by the 64-bit content hash and resolves exact equality *within* the
    group (collisions cannot merge distinct values).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = content_hash(df, col)
        return df.sort_values(id_col, kind="stable").groupby(
            "__h", sort=False, as_index=False).first()

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(id_col, kind="stable")
            .groupby(col, sort=False, as_index=False)
            .first()
            .drop(columns="__h")
        )

    from ..functions.agg import bucketed_group_map

    return bucketed_group_map(
        ds.map_batches(partial, batch_format="pandas"), ["__h"], final)


# ------------------------------------------------------------------ MinHash

_SHINGLE_MIX = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
                np.uint64(0x165667B19E3779F9))


class _TokenHashCache:
    """Shared token->crc32 cache; vocabulary << corpus, so hit rate ~1."""

    def __init__(self) -> None:
        self._cache: dict[str, int] = {}

    def hash_tokens(self, toks: list[str]) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = zlib.crc32(t.encode("utf-8"))
                cache[t] = h
            out[i] = h
        return out


def shingle_hashes(text: str, k: int, cache: _TokenHashCache) -> np.ndarray:
    """Vectorized word-k-gram hashes: hash tokens once (cached crc32),
    combine k consecutive token hashes with a polynomial mix — no string
    joins, no per-shingle Python."""
    toks = text.split()
    th = cache.hash_tokens(toks)
    if len(toks) < k:
        return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
    acc = th[: len(th) - k + 1] * _SHINGLE_MIX[0]
    for j in range(1, k):
        acc = acc ^ (th[j: len(th) - k + 1 + j] * _SHINGLE_MIX[j % 3])
        acc = (acc << np.uint64(7)) | (acc >> np.uint64(57))
    return acc


class MinHasher:
    """Per-batch MinHash signatures + LSH band keys (actor pool).

    Actor state: the (a, b) permutation coefficients, built once.
    Output: ``num_bands`` rows per doc, keyed ``(band, band_hash)`` —
    the LSH bucket shuffle key — with the full signature carried for
    in-group Jaccard estimation.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 k_shingle: int = 3, num_perm: int = 64,
                 num_bands: int = 16, seed: int = 42) -> None:
        assert num_perm % num_bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.text_col, self.id_col = text_col, id_col
        self.k, self.num_perm, self.num_bands = k_shingle, num_perm, num_bands
        self.rows_per_band = num_perm // num_bands
        self._tokens = _TokenHashCache()

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def signatures(self, texts: list[str]) -> np.ndarray:
        """Whole-batch one-permutation-hashing (OPH) signatures.

        Classic k-permutation MinHash costs O(P * S) 64-bit multiplies,
        which numpy executes scalar (~35 ns each) — it dominated the
        extraction stage.  OPH is O(S): each shingle hash lands in bin
        ``h & (P-1)`` and the per-bin minimum is the signature slot;
        empty bins are densified by circular rotation (deterministic).
        P(sig_a[i] == sig_b[i]) ~ Jaccard(a, b) holds when bins are
        well-populated; docs with FEWER than P shingles fall back to the
        classic per-permutation computation (cheap there, and rotation
        densification is badly biased for tiny shingle sets).  Docs of
        very different sizes land on different paths, but their Jaccard
        is bounded by the size ratio (< any useful threshold) anyway.
        """
        n, p = len(texts), self.num_perm
        if not n:
            return np.empty((0, p), np.uint64)
        shingle_lists = [shingle_hashes(t or "", self.k, self._tokens)
                         for t in texts]
        lens = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64,
                           count=n)
        sig = np.empty((n, p), dtype=np.uint64)

        small = np.flatnonzero(lens < p)
        for i in small:  # classic path: S < P, so P*S stays tiny
            s = shingle_lists[i]
            ph = self.a[:, None] * s[None, :] + self.b[:, None]  # wraparound
            sig[i] = ph.min(axis=1)

        big = np.flatnonzero(lens >= p)
        if len(big):
            big_lists = [shingle_lists[i] for i in big]
            flat = np.concatenate(big_lists)
            doc_idx = np.repeat(np.arange(len(big), dtype=np.int64),
                                lens[big])
            bins = (flat & np.uint64(p - 1)).astype(np.int64)
            bsig = np.full(len(big) * p, np.uint64(0xFFFFFFFFFFFFFFFF),
                           dtype=np.uint64)
            np.minimum.at(bsig, doc_idx * p + bins, flat)
            bsig = bsig.reshape(len(big), p)
            empty = bsig == np.uint64(0xFFFFFFFFFFFFFFFF)
            while empty.any():  # rotate-fill (few iterations: S >= P)
                rolled = np.roll(bsig, 1, axis=1)
                bsig[empty] = rolled[empty]
                empty = bsig == np.uint64(0xFFFFFFFFFFFFFFFF)
            sig[big] = bsig
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        sigs = self.signatures(texts)
        r, nb = self.rows_per_band, self.num_bands
        # vectorized band hashes: polynomial mix of each band's rows
        chunks = sigs.reshape(n, nb, r) if n else np.empty((0, nb, r), np.uint64)
        bh = np.zeros((n, nb), dtype=np.uint64)
        for j in range(r):
            bh = (bh ^ (chunks[:, :, j] * _SHINGLE_MIX[j % 3]))
            bh = (bh << np.uint64(9)) | (bh >> np.uint64(55))
        # explode to nb rows per doc
        id_idx = np.repeat(np.arange(n), nb)
        band_col = np.tile(np.arange(nb, dtype=np.int32), n)
        sig_flat = np.repeat(sigs, nb, axis=0).reshape(-1)
        sig_offsets = pa.array(
            np.arange(0, (n * nb + 1) * self.num_perm, self.num_perm,
                      dtype=np.int64))
        return pa.table({
            self.id_col: ids.take(pa.array(id_idx)),
            "band": pa.array(band_col, type=pa.int32()),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64),
                                  type=pa.int64()),
            "sig": pa.LargeListArray.from_arrays(
                sig_offsets, pa.array(sig_flat, type=pa.uint64())),
        })


def pairs_from_signatures(sig_ds: rd.Dataset, *, id_col: str = "doc_id",
                          sig_col: str = "minhash_sig",
                          jaccard_threshold: float = 0.9,
                          num_bands: int = 8) -> rd.Dataset:
    """Near-dup pairs from PRE-COMPUTED MinHash signatures (e.g. the
    ``minhash_sig`` column the extraction pass emits).

    Two phases, so the exchange never moves signature payloads:

    1. candidate generation over SKINNY rows ``(id, band, band_hash)``
       (~25 bytes/row): bucket-group with a vectorized singleton
       prefilter, all-pairs within colliding buckets;
    2. verification: only the ids that appear in candidate pairs have
       their signatures fetched (broadcast semi-join filter) and the
       estimated Jaccard computed.  Candidates are rare by construction
       (real near-dups + band collisions); at a scale where they are
       not, phase 2 becomes a distributed hash join on id instead of a
       driver gather.
    """
    import ray

    from ..functions.agg import bucketed_group_map, hash_aggregate

    def band_rows(t: pa.Table) -> pa.Table:
        sigs_col = t.column(sig_col)
        if isinstance(sigs_col, pa.ChunkedArray):
            sigs_col = sigs_col.combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table({id_col: t.column(id_col),
                             "band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.int64())})
        num_perm = len(sigs_col[0])
        r = num_perm // num_bands
        sigs = np.asarray(sigs_col.flatten().to_numpy(zero_copy_only=False),
                          dtype=np.uint64).reshape(n, num_perm)  # u32 promotes
        chunks = sigs.reshape(n, num_bands, r)
        bh = np.zeros((n, num_bands), dtype=np.uint64)
        for j in range(r):
            bh = bh ^ (chunks[:, :, j] * _SHINGLE_MIX[j % 3])
            bh = (bh << np.uint64(9)) | (bh >> np.uint64(55))
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(np.repeat(np.arange(n), num_bands))),
            "band": pa.array(np.tile(np.arange(num_bands, dtype=np.int32), n),
                             type=pa.int32()),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64),
                                  type=pa.int64()),
        })

    def all_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()[:256]  # bucket cap: larger = boilerplate
        if len(ids) < 2:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    rows = sig_ds.map_batches(band_rows, batch_format="pyarrow",
                              batch_size=8192)
    # shuffle exchange: band collisions can be numerous on homogeneous
    # corpora, and per-group Python must parallelize across buckets
    cands = bucketed_group_map(rows, ["band", "band_hash"], all_pairs,
                               min_group_size=2, exchange="shuffle")
    cands = hash_aggregate(cands, ["id_a", "id_b"], [("id_a", "count")])
    cand_df = cands.to_pandas()
    if cand_df.empty:
        return ray.data.from_pandas(
            pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []}))

    involved = set(cand_df["id_a"]) | set(cand_df["id_b"])
    inv_ref = ray.put(involved)

    def gather(t: pa.Table) -> pa.Table:
        inv = ray.get(inv_ref)
        keep = [x in inv for x in t.column(id_col).to_pylist()]
        return t.filter(pa.array(keep))

    sig_tbl = pa.concat_tables(
        sig_ds.map_batches(gather, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=65536))
    sig_map = {i: np.asarray(s, dtype=np.uint64)
               for i, s in zip(sig_tbl.column(id_col).to_pylist(),
                               sig_tbl.column(sig_col).to_pylist())}
    jac = np.array([
        float((sig_map[a] == sig_map[b]).mean())
        for a, b in zip(cand_df["id_a"], cand_df["id_b"])])
    out = cand_df.loc[jac >= jaccard_threshold, ["id_a", "id_b"]].copy()
    out["jaccard"] = jac[jac >= jaccard_threshold]
    return ray.data.from_pandas(out.reset_index(drop=True)) if len(out) else \
        ray.data.from_pandas(pd.DataFrame({"id_a": [], "id_b": [],
                                           "jaccard": []}))


def make_minhash_pair_verifier(id_col: str = "doc_id",
                               jaccard_threshold: float = 0.7,
                               max_group: int = 256):
    """Per-(band, band_hash) group: all-pairs estimated Jaccard from the
    carried signatures; emit pairs above threshold.  Groups above
    ``max_group`` are truncated with a warning row — a band bucket that
    large means near-identical boilerplate; callers see the count."""

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        n = len(g)
        if n < 2:
            empty = g[id_col].to_numpy()[:0]
            return pd.DataFrame({"id_a": empty, "id_b": empty,
                                 "jaccard": np.array([], dtype=np.float64)})
        truncated = n > max_group
        if truncated:
            g = g.head(max_group)
            n = max_group
        sigs = np.stack(g["sig"].to_numpy())
        ids = g[id_col].to_numpy()
        eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
        ia, ib = np.triu_indices(n, k=1)
        jac = eq[ia, ib]
        keep = jac >= jaccard_threshold
        return pd.DataFrame({
            "id_a": ids[ia[keep]],
            "id_b": ids[ib[keep]],
            "jaccard": jac[keep],
        })

    return verify


def minhash_dedup_pairs(ds: rd.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", jaccard_threshold: float = 0.7,
                        num_perm: int = 64, num_bands: int = 16,
                        k_shingle: int = 3,
                        concurrency: int | tuple[int, int] = (1, 8)) -> rd.Dataset:
    """Near-duplicate pairs by MinHash+LSH: shingle -> minhash -> band ->
    bucket groupby -> in-group verification -> per-pair max estimate."""
    from ..functions.agg import bucketed_group_map, hash_aggregate

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col,
                               "num_perm": num_perm, "num_bands": num_bands,
                               "k_shingle": k_shingle},
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency,
    )
    pairs = bucketed_group_map(
        sigs, ["band", "band_hash"],
        make_minhash_pair_verifier(id_col=id_col,
                                   jaccard_threshold=jaccard_threshold),
        min_group_size=2)
    return hash_aggregate(pairs, ["id_a", "id_b"], [("jaccard", "max")],
                          rename={"jaccard_max": "jaccard"})


# ------------------------------------------------------------------ SimHash

class SimHasher:
    """64-bit SimHash per doc + 4x16-bit band keys for candidate gen.

    Token -> 64-bit hash is cached in actor state (vocabulary is far
    smaller than the corpus).
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        import hashlib

        self.text_col, self.id_col = text_col, id_col
        self._cache: dict[str, int] = {}
        self._blake = hashlib.blake2b

    def _th(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            h = int.from_bytes(self._blake(tok.encode(), digest_size=8).digest(), "little")
            self._cache[tok] = h
        return h

    def simhash(self, text: str) -> int:
        return int(self.simhashes([text])[0])

    def simhashes(self, texts: list[str]) -> np.ndarray:
        """Whole-batch 64-bit simhashes: cached token hashes, flat bit
        matrix, per-doc signed bit sums via reduceat."""
        tok_lists = [(t or "").lower().split() for t in texts]
        lens = np.array([max(len(x), 1) for x in tok_lists])
        flat_tokens = [tok for toks in tok_lists for tok in (toks or [""])]
        th = np.fromiter((self._th(t) for t in flat_tokens), dtype=np.uint64,
                         count=len(flat_tokens))
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        signed = bits * 2 - 1  # (T_total, 64)
        offsets = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        acc = np.add.reduceat(signed, offsets, axis=0)  # (n_docs, 64)
        return ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        hashes = self.simhashes(texts) if n else np.empty(0, np.uint64)
        bands = np.arange(4, dtype=np.uint64)
        keys = ((hashes[:, None] >> (bands * np.uint64(16))[None, :])
                & np.uint64(0xFFFF)).astype(np.int64)  # (n, 4)
        id_idx = np.repeat(np.arange(n), 4)
        return pa.table({
            self.id_col: ids.take(pa.array(id_idx)),
            "band": pa.array(np.tile(bands.astype(np.int32), n), type=pa.int32()),
            "band_key": pa.array(keys.reshape(-1), type=pa.int64()),
            "simhash": pa.array(np.repeat(hashes, 4), type=pa.uint64()),
        })


def simhash_dedup_pairs(ds: rd.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", max_hamming: int = 3,
                        concurrency: int | tuple[int, int] = (1, 8)) -> rd.Dataset:
    """Near-dup pairs with Hamming distance <= ``max_hamming`` (any pair
    within distance 3 shares at least one identical 16-bit quarter, so
    4-band blocking is lossless up to hamming 3 x ... <=16/4-1)."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency,
    )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2:
            empty = g[id_col].to_numpy()[:0]
            return pd.DataFrame({"id_a": empty, "id_b": empty,
                                 "hamming": np.array([], dtype=np.int64)})
        hs = g["simhash"].to_numpy().astype(np.uint64)
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(len(g), k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "hamming": ham[keep]})

    from ..functions.agg import bucketed_group_map, hash_aggregate

    pairs = bucketed_group_map(sigs, ["band", "band_key"], verify,
                               min_group_size=2)
    return hash_aggregate(pairs, ["id_a", "id_b"], [("hamming", "min")],
                          rename={"hamming_min": "hamming"})


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-n-gram Jaccard (verification kernel for candidates)."""
    ta, tb = text_a.split(), text_b.split()
    sa = {" ".join(ta[i: i + k]) for i in range(max(0, len(ta) - k + 1))} or {text_a}
    sb = {" ".join(tb[i: i + k]) for i in range(max(0, len(tb) - k + 1))} or {text_b}
    return len(sa & sb) / len(sa | sb) if sa | sb else 1.0
