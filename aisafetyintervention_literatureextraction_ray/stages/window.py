"""Stream-shaped windowing over event logs (ray_guide.md pattern).

Ray Data has no event-time watermarks; stream semantics are expressed
over the partitioned log: group by key, sort by timestamp within the
group, window with pandas.  The ordering assumption is explicit: events
of one key fit one group (bucketed exchange) and are processed in
timestamp order; ties share a window.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.agg import bucketed_group_map, hash_aggregate


def tumbling_window(events: rd.Dataset, key_col: str, ts_col: str,
                    value_col: str, freq: str = "h", *,
                    exchange: str = "shuffle") -> rd.Dataset:
    """Tumbling event-time window: count + sum per (key, floor(ts)).

    ``exchange`` follows :func:`hash_aggregate` — callers whose
    ``key_col`` cardinality x window count is provably bounded (e.g.
    event types x hours) may pass ``"coalesce"``."""

    def floor_ts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window"] = df[ts_col].dt.floor(freq)
        return df[[key_col, "window", value_col]]

    return hash_aggregate(
        events.map_batches(floor_ts, batch_format="pandas", batch_size=65536),
        [key_col, "window"],
        [(value_col, "count"), (value_col, "sum")],
        rename={f"{value_col}_count": "n_events",
                f"{value_col}_sum": "sum_value"},
        exchange=exchange,
    )


def sliding_window(events: rd.Dataset, key_col: str, ts_col: str,
                   value_col: str, *, width: int = 3,
                   freq: str = "h", exchange: str = "shuffle") -> rd.Dataset:
    """Sliding (hopping) event-time window: window ``W`` aggregates the
    trailing ``width`` buckets ending at ``W`` (hop = 1 bucket).

    Implemented replication-side (each event contributes one row per
    window it falls in — ``width`` skinny rows), then the standard
    two-stage keyed reduce; no sort, no range join."""

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        base = df[ts_col].dt.floor(freq)
        n = len(df)
        step_ns = pd.tseries.frequencies.to_offset(freq).nanos
        offs = (np.tile(np.arange(width), n)
                * np.timedelta64(step_ns, "ns"))
        return pd.DataFrame({
            key_col: np.repeat(df[key_col].to_numpy(), width),
            "window_end": np.repeat(base.to_numpy(), width) + offs,
            value_col: np.repeat(df[value_col].to_numpy(), width),
        })

    return hash_aggregate(
        events.map_batches(replicate, batch_format="pandas",
                           batch_size=65536),
        [key_col, "window_end"],
        [(value_col, "count"), (value_col, "sum")],
        rename={f"{value_col}_count": "n_events",
                f"{value_col}_sum": "sum_value"},
        exchange=exchange,
    )


def asof_join(left: rd.Dataset, right: rd.Dataset, *,
              by_left: str, by_right: str, on_left: str, on_right: str,
              right_value_cols: list[str],
              right_reduce: dict[str, str] | None = None,
              exchange: str = "shuffle") -> rd.Dataset:
    """Backward inclusive as-of join: each left row gets the right row
    with the largest ``on_right <= on_left`` within its ``by`` key
    (``pd.merge_asof`` semantics; DuckDB ``ASOF LEFT JOIN`` equivalent).

    Distributed as a co-grouped exchange: both sides are projected onto
    one union schema (typed nulls for the other side's columns), hashed
    on the ``by`` key into coarse buckets (``bucketed_apply``) and each
    bucket runs a vectorized ``pd.merge_asof`` — the partitioning
    assumption is only that one KEY's rows fit a bucket's share of the
    heap, the standard keyed-shuffle contract.  Output = left columns +
    ``right_value_cols`` (null where no right row precedes).

    ``right_reduce={col: fn}`` deduplicates the right side per
    ``(by, on)`` INSIDE the bucket (C groupby) before the merge.
    Callers that need e.g. "max value per (key, timestamp)" should pass
    this (plus an optional per-block partial upstream) instead of a
    standalone keyed aggregate: a separate exchange for a nearly-unique
    key set reduces nothing and pays a full extra shuffle (measured
    4.9 s of a 5 s query at sf0.1).
    """
    import pyarrow as pa

    from ..functions.agg import bucketed_apply

    from ..functions.agg import pa_type_of

    lschema, rschema = left.schema(), right.schema()
    left_cols = [c for c in lschema.names]
    ltypes = {n: pa_type_of(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: pa_type_of(t) for n, t in zip(rschema.names, rschema.types)}

    def left_side(t: pa.Table) -> pa.Table:
        cols = {"__key": t.column(by_left), "__ts": t.column(on_left)}
        for c in left_cols:
            cols[f"l_{c}"] = t.column(c)
        for c in right_value_cols:
            cols[c] = pa.nulls(t.num_rows, rtypes[c])
        cols["__side"] = pa.array([0] * t.num_rows, type=pa.int8())
        return pa.table(cols)

    def right_side(t: pa.Table) -> pa.Table:
        cols = {"__key": t.column(by_right).cast(ltypes[by_left]),
                "__ts": t.column(on_right).cast(ltypes[on_left])}
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(t.num_rows, ltypes[c])
        for c in right_value_cols:
            cols[c] = t.column(c)
        cols["__side"] = pa.array([1] * t.num_rows, type=pa.int8())
        return pa.table(cols)

    both = left.map_batches(left_side, batch_format="pyarrow").union(
        right.map_batches(right_side, batch_format="pyarrow"))

    # The union null-pads each side's columns; converting through pandas
    # NULLABLE extension dtypes (not numpy) keeps int64 ids exact — a
    # plain to_pandas would widen them to float64 and ids above 2^53
    # would silently lose exactness (ADVICE r2, finished r4).
    from ..functions.agg import _NULLABLE_DTYPES

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_NULLABLE_DTYPES.get)
        lhs = (df[df["__side"] == 0]
               .drop(columns=["__side"] + right_value_cols)
               .sort_values("__ts", kind="stable"))
        rhs = df[df["__side"] == 1][["__key", "__ts"] + right_value_cols]
        if right_reduce:
            rhs = rhs.groupby(["__key", "__ts"], as_index=False,
                              sort=False).agg(right_reduce)
        rhs = rhs.sort_values("__ts", kind="stable")
        out = pd.merge_asof(lhs, rhs, on="__ts", by="__key",
                            direction="backward")
        out = out.drop(columns=["__key", "__ts"])
        out = out.rename(columns={f"l_{c}": c for c in left_cols})
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return bucketed_apply(both, ["__key"], merge, exchange=exchange,
                          batch_format="pyarrow")


def range_join_agg(left: rd.Dataset, right: rd.Dataset, *,
                   by_left: str, by_right: str, on_left: str,
                   on_right: str, value_col: str,
                   window: pd.Timedelta | str,
                   count_col: str = "n_in_window",
                   sum_cents_col: str = "sum_cents_in_window",
                   exchange: str = "shuffle") -> rd.Dataset:
    """Trailing range (interval) join + aggregate: for each left row,
    count and sum the right rows of the same ``by`` key with
    ``on_left - window < on_right <= on_left``.

    The operator Ray Data lacks (SURVEY.md 'custom operators': range
    join), composed from the engine's co-grouped bucketed exchange: both
    sides union-project onto one schema, hash on the ``by`` key, and
    each bucket resolves every left row's window VECTORIZED with two
    ``np.searchsorted`` calls over the time-sorted right side (windows
    overlap, so sums come from exact int64 cent cumsums — prefix-sum
    differences in integer arithmetic are order-exact, unlike float).
    Output = left columns + count + cent sum (int64; divide by 100 for
    currency).
    """
    import numpy as np
    import pyarrow as pa

    from ..functions.agg import bucketed_apply, pa_type_of

    window = pd.Timedelta(window)
    lschema = left.schema()
    left_cols = list(lschema.names)
    ltypes = {n: pa_type_of(t) for n, t in zip(lschema.names, lschema.types)}

    def left_side(t: pa.Table) -> pa.Table:
        cols = {"__key": t.column(by_left), "__ts": t.column(on_left)}
        for c in left_cols:
            cols[f"l_{c}"] = t.column(c)
        cols["__val"] = pa.nulls(t.num_rows, pa.float64())
        cols["__side"] = pa.array([0] * t.num_rows, type=pa.int8())
        return pa.table(cols)

    def right_side(t: pa.Table) -> pa.Table:
        cols = {"__key": t.column(by_right).cast(ltypes[by_left]),
                "__ts": t.column(on_right).cast(ltypes[on_left])}
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(t.num_rows, ltypes[c])
        cols["__val"] = t.column(value_col).cast(pa.float64())
        cols["__side"] = pa.array([1] * t.num_rows, type=pa.int8())
        return pa.table(cols)

    both = left.map_batches(left_side, batch_format="pyarrow").union(
        right.map_batches(right_side, batch_format="pyarrow"))

    # nullable extension dtypes keep int64 ids exact through the
    # null-padded union (see asof_join); keys densify back to numpy for
    # the searchsorted kernel — exactly when null-free (the normal
    # case), else the old float64+NaN behavior (null keys match nothing)
    from ..functions.agg import _NULLABLE_DTYPES

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_NULLABLE_DTYPES.get)
        kdt = getattr(df["__key"].dtype, "numpy_dtype", None)
        if kdt is not None and df["__key"].isna().any():
            kdt = np.dtype("float64")

        def karr(s: pd.Series) -> np.ndarray:
            if kdt is None:
                return s.to_numpy()
            if kdt == np.dtype("float64"):
                return s.to_numpy(dtype="float64", na_value=np.nan)
            return s.to_numpy(dtype=kdt)

        lhs = df[df["__side"] == 0].drop(columns=["__side", "__val"])
        rhs = (df[df["__side"] == 1][["__key", "__ts", "__val"]]
               .sort_values(["__key", "__ts"], kind="stable"))
        out = lhs.rename(columns={f"l_{c}": c for c in left_cols})
        n = len(out)
        counts = np.zeros(n, dtype=np.int64)
        cents = np.zeros(n, dtype=np.int64)
        if n and len(rhs):
            # per-key slices of the time-sorted right side
            rkeys = karr(rhs["__key"])
            rts = rhs["__ts"].to_numpy()
            # exact integer cents: float sums would depend on order
            rcents = np.round(rhs["__val"].to_numpy(dtype=np.float64)
                              * 100).astype(np.int64)
            csum = np.concatenate([[0], np.cumsum(rcents)])
            rchange = np.flatnonzero(rkeys[1:] != rkeys[:-1]) + 1
            rbounds = np.concatenate([[0], rchange, [len(rkeys)]])
            rslice = {rkeys[rbounds[i]]: (rbounds[i], rbounds[i + 1])
                      for i in range(len(rbounds) - 1)}
            # sort the left side by (key, ts) so each key is ONE
            # contiguous slice: total work is O((L + R) log) with one
            # loop iteration per key, never a full-column mask per key
            lkeys = karr(lhs["__key"])
            lts = lhs["__ts"].to_numpy()
            lorder = np.lexsort((lts, lkeys))
            lk_s, lt_s = lkeys[lorder], lts[lorder]
            lchange = np.flatnonzero(lk_s[1:] != lk_s[:-1]) + 1
            lbounds = np.concatenate([[0], lchange, [len(lk_s)]])
            c_s = np.zeros(n, dtype=np.int64)
            m_s = np.zeros(n, dtype=np.int64)
            for i in range(len(lbounds) - 1):
                a, b = lbounds[i], lbounds[i + 1]
                se = rslice.get(lk_s[a])
                if se is None:
                    continue
                s, e = se
                ts = lt_s[a:b]
                lo = np.searchsorted(rts[s:e], ts - window.to_timedelta64(),
                                     side="right") + s
                hi = np.searchsorted(rts[s:e], ts, side="right") + s
                c_s[a:b] = hi - lo
                m_s[a:b] = csum[hi] - csum[lo]
            counts[lorder] = c_s
            cents[lorder] = m_s
        out[count_col] = counts
        out[sum_cents_col] = cents
        out = out.drop(columns=["__key", "__ts"])
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return bucketed_apply(both, ["__key"], merge, exchange=exchange,
                          batch_format="pyarrow")


def sessionize(events: rd.Dataset, *, key_col: str = "user_id",
               ts_col: str = "ts", gap: pd.Timedelta | str = "30min",
               exchange: str = "shuffle") -> rd.Dataset:
    """Session windows: a new session starts when the gap since the
    previous event of the same key exceeds ``gap``.

    Output: (key, session_id, n_events, start_ts, end_ts); session_id is
    0-based in timestamp order per key — deterministic, and identical to
    the SQL gaps-and-islands formulation (LAG + running SUM) the oracle
    uses.
    """
    gap = pd.Timedelta(gap)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        new_session = (g[ts_col].diff() > gap).cumsum()
        out = g.groupby(new_session).agg(
            n_events=(ts_col, "size"),
            start_ts=(ts_col, "min"),
            end_ts=(ts_col, "max"),
        ).reset_index(drop=True)
        out.insert(0, "session_id", range(len(out)))
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return bucketed_group_map(
        events.select_columns([key_col, ts_col]),
        [key_col], per_key, exchange=exchange)


def cohort_retention(events: rd.Dataset, *, key_col: str = "user_id",
                     ts_col: str = "ts",
                     bucket_us: int = 86_400_000_000,
                     num_buckets: int | None = None) -> rd.Dataset:
    """``(cohort_day, offset_days, n_users)`` — classic cohort
    retention: bucket event time into integer epoch days (pure int64
    ``microseconds // bucket_us``, exact and SQL-replayable as
    ``epoch_us(ts) // bucket``), take each key's FIRST active day as
    its cohort, and count distinct keys active at each (cohort,
    day-offset) cell — the corpus-telemetry view of user/source
    activity a training-data pipeline tracks across snapshot releases.

    Scale shape: one partial-deduped keyed exchange for the distinct
    (key, day) activity set, one keyed min for cohorts, one
    partitioned join of the two SKINNY int tables on the key, and a
    final (cohort, offset) count whose key set is bounded by the
    day-range squared — never by event volume.  Per-block partial
    dedup absorbs hot keys before anything shuffles.
    """
    from ..functions.agg import bucketed_join, hash_aggregate

    def to_day(t: pa.Table) -> pa.Table:
        us = t.column(ts_col).cast(pa.int64())
        return pa.table({
            key_col: t.column(key_col),
            "day": pc.divide(us, pa.scalar(bucket_us, pa.int64()))})

    ed = events.select_columns([key_col, ts_col]).map_batches(
        to_day, batch_format="pyarrow", zero_copy_batch=True)
    ud = hash_aggregate(
        ed, [key_col, "day"], [("day", "count")],
        num_buckets=num_buckets, exchange="shuffle",
    ).select_columns([key_col, "day"]).materialize()
    ch = hash_aggregate(
        ud, [key_col], [("day", "min")], rename={"day_min": "cday"},
        num_buckets=num_buckets, exchange="shuffle")
    sch = ud.schema()
    sch = getattr(sch, "base_schema", sch)
    key_type = dict(zip(sch.names, sch.types))[key_col]
    joined = bucketed_join(
        ud, ch, left_key=key_col, right_key=key_col,
        right_value_cols=["cday"], num_buckets=num_buckets,
        left_schema=pa.schema([(key_col, key_type),
                               ("day", pa.int64())]),
        right_schema=pa.schema([(key_col, key_type),
                                ("cday", pa.int64())]))

    def cells(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day": t.column("cday"),
            "offset_days": pc.subtract(t.column("day"),
                                       t.column("cday"))})

    return hash_aggregate(
        joined.map_batches(cells, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["cohort_day", "offset_days"], [("offset_days", "count")],
        rename={"offset_days_count": "n_users"},
        num_buckets=num_buckets, exchange="shuffle")
