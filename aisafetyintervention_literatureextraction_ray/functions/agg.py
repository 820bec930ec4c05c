"""Fast keyed reduction primitives.

Ray Data's ``groupby(keys).aggregate(...)`` uses a sort-based shuffle
with per-group Python dispatch; with many distinct keys it is orders of
magnitude slower than Arrow's hash aggregation (measured locally: 77 s
vs 0.1 s for 34k rows / 32k groups).  Every keyed reduce in this engine
therefore uses the classic two-stage pattern instead:

1. **partial**: ``pyarrow.TableGroupBy`` per batch (C hash aggregate) —
   collapses each block to one row per key, so the shuffle moves
   partials, not rows (this is also the skew/salt mitigation of
   SURVEY.md §4.2: a hot key costs one row per block);
2. **exchange**: rows are hashed into ``num_buckets`` coarse buckets
   (single int key — cheap for Ray's shuffle since the group count is
   the bucket count, not the key count);
3. **final**: per-bucket ``TableGroupBy`` again (C hash aggregate), or a
   user reduce applied per key group inside the bucket.

``num_buckets`` is the shuffle parallelism knob: ~2-4x the cluster CPU
count.  All bucket hashes are process-independent (pandas hash with the
fixed default key).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# partial-aggregate function -> how partials combine in the final stage
_COMBINE = {"sum": "sum", "count": "sum", "count_all": "sum",
            "min": "min", "max": "max", "one": "one"}


def default_num_buckets() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(8, cpus * 2)


def add_bucket_column(batch: pa.Table, keys: list[str], num_buckets: int,
                      col: str = "__bucket") -> pa.Table:
    """Vectorized deterministic bucket id from the key columns."""
    acc = None
    for k in keys:
        s = batch.column(k).to_pandas()
        h = pd.util.hash_pandas_object(s, index=False).to_numpy()
        acc = h if acc is None else (acc * np.uint64(1000003)) ^ h
    bucket = (acc % np.uint64(num_buckets)).astype(np.int64)
    return batch.append_column(col, pa.array(bucket, type=pa.int64()))


def hash_aggregate(ds: rd.Dataset, keys: list[str],
                   aggs: list[tuple[str, str]],
                   *, num_buckets: int | None = None,
                   rename: dict[str, str] | None = None) -> rd.Dataset:
    """Two-stage keyed aggregate.

    ``aggs`` are ``(column, fn)`` with fn in {sum, count, min, max};
    output columns are named ``{column}_{fn}`` (pyarrow convention) or
    via ``rename``.  ``count`` counts non-null rows of the column.
    """
    if num_buckets is None:
        num_buckets = default_num_buckets()

    partial_names = [f"{c}_{f}" for c, f in aggs]
    final_aggs = [(n, _COMBINE[f]) for n, (c, f) in zip(partial_names, aggs)]
    final_names = [f"{n}_{_COMBINE[f]}" for n, (c, f) in zip(partial_names, aggs)]

    def partial(t: pa.Table) -> pa.Table:
        # pyarrow returns [keys..., "{col}_{fn}"...]
        out = pa.TableGroupBy(t, keys).aggregate(aggs)
        return add_bucket_column(out, keys, num_buckets)

    def final_grouped(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bucket"])
        out = pa.TableGroupBy(t, keys).aggregate(final_aggs)
        # pyarrow names combined results "{partial}_{combine}"; rename back
        mapping = dict(zip(final_names, partial_names))
        if rename:
            mapping = {k: rename.get(v, v) for k, v in mapping.items()}
            mapping.update({k: v for k, v in rename.items() if k in keys})
        out = out.rename_columns([mapping.get(c, c) for c in out.column_names])
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby("__bucket").map_groups(
        final_grouped, batch_format="pyarrow")


def bucketed_group_map(ds: rd.Dataset, keys: list[str],
                       fn: Callable[[pd.DataFrame], pd.DataFrame],
                       *, num_buckets: int | None = None,
                       batch_format: str = "pandas") -> rd.Dataset:
    """``groupby(keys).map_groups(fn)`` semantics at bucket granularity:
    Ray shuffles ``num_buckets`` coarse groups (cheap), and the real
    per-key grouping happens inside each bucket with pandas/pyarrow
    (C hash grouping + one Python call per key group)."""
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def bucketize(t: pa.Table) -> pa.Table:
        return add_bucket_column(t, keys, num_buckets)

    if batch_format == "pandas":
        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.drop(columns="__bucket")
            if df.empty:
                return fn(df)
            parts = [fn(g) for _, g in df.groupby(keys, sort=False, dropna=False)]
            return pd.concat(parts, ignore_index=True)
    else:
        def per_bucket(t: pa.Table):
            t = t.drop_columns(["__bucket"])
            if t.num_rows == 0:
                return fn(t)
            # stable sort by keys then slice contiguous runs
            idx = pa.compute.sort_indices(
                t, sort_keys=[(k, "ascending") for k in keys])
            t = t.take(idx)
            df_keys = t.select(keys).to_pandas()
            codes = pd.MultiIndex.from_frame(df_keys).factorize()[0] \
                if len(keys) > 1 else df_keys[keys[0]].factorize()[0]
            boundaries = np.flatnonzero(np.diff(codes)) + 1
            starts = np.concatenate([[0], boundaries])
            ends = np.concatenate([boundaries, [len(codes)]])
            outs = [fn(t.slice(s, e - s)) for s, e in zip(starts, ends)]
            outs = [o if isinstance(o, pa.Table) else
                    pa.Table.from_pandas(o, preserve_index=False) for o in outs]
            return pa.concat_tables([o for o in outs if o.num_rows > 0]) \
                if any(o.num_rows for o in outs) else outs[0]

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format=batch_format)
    )
