"""Deterministic sampling / dataset splitting (training-data ops).

A training pipeline needs reproducible train/val/test assignment that
is a pure function of the record id — stable across runs, machines and
engines (the same split must be computable in SQL for audits).  The
bucket is the first hex character of ``md5(str(id))``: md5 exists in
every SQL engine, so assignment is oracle-checkable, and the Python
side is the same C digest (~1 us/row; assignment cost is dwarfed by
the IO it gates).  Granularity is 1/16 per hex character.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_HEX = "0123456789abcdef"


def md5_hex(batch: pa.Table, id_col: str) -> list[str]:
    """The shared id-hash contract of every sampler/splitter here:
    ``md5(str(id)).hexdigest()`` per row — any change to this (bytes
    handling, casing, width) changes EVERY split/sample in one place,
    and must be mirrored in the SQL oracles (``md5(CAST(id AS
    VARCHAR))``)."""
    return [hashlib.md5(str(i).encode()).hexdigest()
            for i in batch.column(id_col).to_pylist()]


def split_boundaries(weights: tuple[int, ...],
                     names: tuple[str, ...]) -> list[tuple[str, str]]:
    """weights in sixteenths -> [(name, last_hex_char_inclusive)]."""
    assert sum(weights) == 16 and len(weights) == len(names)
    out, acc = [], 0
    for name, w in zip(names, weights):
        acc += w
        out.append((name, _HEX[acc - 1]))
    return out


def assign_split(batch: pa.Table, id_col: str,
                 boundaries: list[tuple[str, str]],
                 out_col: str = "split") -> pa.Table:
    """Append the split-name column (md5 first-hex-char bucketing)."""
    chars = [h[0] for h in md5_hex(batch, id_col)]
    names = np.empty(len(chars), dtype=object)
    for name, last in reversed(boundaries):
        mask = np.fromiter((c <= last for c in chars), dtype=bool,
                           count=len(chars))  # bool even when empty
        names[mask] = name
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(names, type=pa.string()))


def train_val_test_split(ds: rd.Dataset, id_col: str,
                         weights: tuple[int, int, int] = (12, 2, 2)
                         ) -> rd.Dataset:
    """Add a ``split`` column: train/val/test in ``weights`` sixteenths
    (default 75/12.5/12.5).  Pure map stage — no shuffle, no state."""
    bounds = split_boundaries(weights, ("train", "val", "test"))
    return ds.map_batches(
        lambda t: assign_split(t, id_col, bounds),
        batch_format="pyarrow")


def stratified_sample(ds: rd.Dataset, id_col: str, *,
                      hex_digits: int = 4,
                      threshold: str = "2fff") -> rd.Dataset:
    """Deterministic hash sample: keep rows whose
    ``md5(str(id))[:hex_digits] <= threshold`` — a pure per-row filter
    (no shuffle, no driver state) whose keep-rate is
    ``(int(threshold, 16) + 1) / 16**hex_digits`` within EVERY stratum
    simultaneously, because md5 is independent of any grouping column.
    The same predicate is one line of SQL, so the sample is
    audit-reproducible outside the engine (the training-data
    requirement that rules out seeded RNG sampling, whose stream
    depends on row order and partitioning).
    """
    assert len(threshold) == hex_digits

    def keep(batch: pa.Table) -> pa.Table:
        hs = md5_hex(batch, id_col)
        mask = np.fromiter((h[:hex_digits] <= threshold for h in hs),
                           dtype=bool, count=len(hs))
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def mixture_sample(ds: rd.Dataset, id_col: str, group_col: str,
                   rates: dict[str, float], *,
                   default_rate: float = 0.0,
                   hex_digits: int = 8) -> rd.Dataset:
    """Weighted mixture sampling: keep each row with ITS GROUP's rate —
    the pretraining-mixture op (e.g. wiki x2.0 is expressed upstream as
    two epochs; here a rate in [0, 1] downsamples each source to its
    mixture weight).

    Same determinism contract as ``stratified_sample``: keep iff
    ``int(md5(str(id))[:hex_digits], 16) < floor(rate * 16**hex_digits)``
    — a pure per-row predicate, reproducible in SQL, independent of row
    order, partitioning and engine.  The rate lookup is a vectorized
    broadcast map (the rate table is tiny by construction); unknown
    groups fall back to ``default_rate``.
    """
    scale = 16 ** hex_digits
    thresholds = {g: int(np.floor(r * scale)) for g, r in rates.items()}
    default_thr = int(np.floor(default_rate * scale))

    def keep(batch: pa.Table) -> pa.Table:
        hs = md5_hex(batch, id_col)
        h = np.fromiter((int(x[:hex_digits], 16) for x in hs),
                        dtype=np.int64, count=len(hs))
        groups = batch.column(group_col).to_pylist()
        thr = np.fromiter((thresholds.get(g, default_thr) for g in groups),
                          dtype=np.int64, count=len(groups))
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def shuffle_order_key(batch: pa.Table, id_col: str,
                      out_col: str = "__shuffle_key") -> pa.Table:
    """Deterministic global shuffle key: ``md5(str(id))`` — the
    training-order shuffle for dataloader prep.  Sorting the corpus by
    this key is a seedless, engine-independent permutation (same
    audit-reproducibility contract as ``stratified_sample``: one line
    of SQL replays it); a distributed ``Dataset.sort`` on the key IS
    the shuffle — no RNG state, no driver pass."""
    return batch.append_column(out_col,
                               pa.array(md5_hex(batch, id_col),
                                        type=pa.string()))


def weighted_interleave(ds: rd.Dataset, weights: dict[str, int], *,
                        source_col: str = "source",
                        order_col: str = "doc_id",
                        resolution: int = 1_000_000,
                        num_buckets: int | None = None) -> rd.Dataset:
    """Deterministic weighted fair-interleave SCHEDULE over sources —
    the training-mixture analogue of ``interleave_datasets``: a stream
    that, read in schedule order, serves sources in proportion to
    integer ``weights`` with the smoothest possible alternation
    (weighted fair queueing / stride scheduling).

    The ``k``-th document of source ``s`` (1-based, ordered by
    ``order_col``) gets virtual time ``vtime = (k * resolution) //
    weights[s]`` — all INTEGER arithmetic, so the schedule is
    bit-identical across engines and SQL-replayable with one window
    function.  The global schedule is the sort by ``(vtime, source,
    order_col)``; a source with twice the weight appears twice as often
    at every prefix (±1).  Sources absent from ``weights`` are dropped
    (the mixture spec is explicit).

    Scale contract: per-source sequence numbers come from
    ``grouped_running`` — one source's rows co-locate in one shuffle
    bucket (same bounded-key contract as ``pack_documents``; at corpus
    scale schedule per (source, shard) slice and round-robin the shard
    schedules, which preserves the mixture ratio).  Consumers that only
    need the mixture RATIO, not a total order, should use
    ``mixture_sample`` instead — it needs no keyed exchange at all.
    """
    from .agg import grouped_running

    if any(w <= 0 for w in weights.values()):
        raise ValueError("interleave weights must be positive integers")
    src_arr = pa.array(list(weights.keys()), type=pa.string())
    wt_arr = np.array(list(weights.values()), dtype=np.int64)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(source_col), value_set=src_arr))

    seq = grouped_running(
        ds.select_columns([source_col, order_col]).map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True),
        [source_col], [order_col], seq_col="seq",
        num_buckets=num_buckets)

    res = pa.scalar(resolution, type=pa.int64())

    def vtime(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(source_col), value_set=src_arr)
        w = pa.array(wt_arr[idx.to_numpy(zero_copy_only=False)])
        s = pc.cast(t.column("seq"), pa.int64())
        vt = pc.divide(pc.multiply(s, res), w)
        return pa.table({
            source_col: t.column(source_col),
            order_col: t.column(order_col),
            "seq": s,
            "vtime": vt,
        })

    return seq.map_batches(vtime, batch_format="pyarrow")
