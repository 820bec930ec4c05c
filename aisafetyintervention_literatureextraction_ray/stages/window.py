"""Stream-shaped windowing over event logs (ray_guide.md pattern).

Ray Data has no event-time watermarks; stream semantics are expressed
over the partitioned log: group by key, sort by timestamp within the
group, window with pandas.  The ordering assumption is explicit: events
of one key fit one group (bucketed exchange) and are processed in
timestamp order; ties share a window.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..functions.agg import bucketed_group_map, hash_aggregate


def tumbling_window(events: rd.Dataset, key_col: str, ts_col: str,
                    value_col: str, freq: str = "h") -> rd.Dataset:
    """Tumbling event-time window: count + sum per (key, floor(ts))."""

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
    )


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
