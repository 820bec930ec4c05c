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

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__h")
        .map_groups(final, batch_format="pandas")
    )


# ------------------------------------------------------------------ MinHash

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
    return np.fromiter(
        (zlib.crc32(" ".join(toks[i: i + k]).encode()) for i in range(len(toks) - k + 1)),
        dtype=np.uint64,
        count=len(toks) - k + 1,
    )


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

    def signature(self, text: str) -> np.ndarray:
        s = _shingle_hashes(text or "", self.k)
        # (P, S) permuted hashes -> min over shingles
        ph = (self.a[:, None] * s[None, :] + self.b[:, None]) % _MERSENNE
        return ph.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if ids else \
            np.empty((0, self.num_perm), np.uint64)
        out_id, out_band, out_bh, out_sig = [], [], [], []
        r = self.rows_per_band
        for band in range(self.num_bands):
            chunk = sigs[:, band * r: (band + 1) * r]
            for i, did in enumerate(ids):
                bh = zlib.crc32(chunk[i].tobytes())
                out_id.append(did)
                out_band.append(band)
                out_bh.append(bh)
                out_sig.append(sigs[i])
        return pa.table({
            self.id_col: pa.array(out_id),
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_bh, type=pa.int64()),
            "sig": pa.array([s.tolist() for s in out_sig],
                            type=pa.list_(pa.uint64())),
        })


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
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
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
    from ray.data.aggregate import Max

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col,
                               "num_perm": num_perm, "num_bands": num_bands,
                               "k_shingle": k_shingle},
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency,
    )
    pairs = sigs.groupby(["band", "band_hash"]).map_groups(
        make_minhash_pair_verifier(id_col=id_col,
                                   jaccard_threshold=jaccard_threshold),
        batch_format="pandas",
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("jaccard", alias_name="jaccard"))


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
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for tok in (text or "").lower().split():
            h = np.uint64(self._th(tok))
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            acc += bits * 2 - 1
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        hashes = [self.simhash(t) for t in batch.column(self.text_col).to_pylist()]
        out_id, out_band, out_key, out_h = [], [], [], []
        for did, h in zip(ids, hashes):
            for band in range(4):
                out_id.append(did)
                out_band.append(band)
                out_key.append((h >> (band * 16)) & 0xFFFF)
                out_h.append(h)
        return pa.table({
            self.id_col: pa.array(out_id),
            "band": pa.array(out_band, type=pa.int32()),
            "band_key": pa.array(out_key, type=pa.int64()),
            "simhash": pa.array(out_h, type=pa.uint64()),
        })


def simhash_dedup_pairs(ds: rd.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", max_hamming: int = 3,
                        concurrency: int | tuple[int, int] = (1, 8)) -> rd.Dataset:
    """Near-dup pairs with Hamming distance <= ``max_hamming`` (any pair
    within distance 3 shares at least one identical 16-bit quarter, so
    4-band blocking is lossless up to hamming 3 x ... <=16/4-1)."""
    from ray.data.aggregate import Min

    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", batch_size=1024, concurrency=concurrency,
    )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        hs = g["simhash"].to_numpy().astype(np.uint64)
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(len(g), k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "hamming": ham[keep]})

    pairs = sigs.groupby(["band", "band_key"]).map_groups(
        verify, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-n-gram Jaccard (verification kernel for candidates)."""
    ta, tb = text_a.split(), text_b.split()
    sa = {" ".join(ta[i: i + k]) for i in range(max(0, len(ta) - k + 1))} or {text_a}
    sb = {" ".join(tb[i: i + k]) for i in range(max(0, len(tb) - k + 1))} or {text_b}
    return len(sa & sb) / len(sa | sb) if sa | sb else 1.0
