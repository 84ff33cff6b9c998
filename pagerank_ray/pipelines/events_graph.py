"""Derive a deterministic link graph from the ``events`` table.

Edge rule (FIXTURES.md F6): within each event_type, order events by
(ts, event_id); each event's user links to the NEXT event's user of
the same type: user_id -> next user_id. SQL-expressible with a lead()
window, which is the DuckDB oracle for the driver contract.

Node names are stringified user ids so the graph layer's string node
model applies unchanged.

Scale note: groupby(event_type) gives one group per type — fine here
(5 types), but at 100 TB the derivation partitions by
(event_type, time_bucket) so groups parallelize, with one extra pass
joining each bucket's last event to the next bucket's first (the only
cross-boundary pair). The per-group sort is the same either way.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd


def edges_from_events(sf_dir: str):
    """-> Dataset of (src, dst) string edges."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    def consecutive(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        if len(u) < 2:
            return pd.DataFrame({"src": pd.Series([], dtype="string"),
                                 "dst": pd.Series([], dtype="string")})
        return pd.DataFrame({"src": u[:-1].astype(str),
                             "dst": u[1:].astype(str)})

    return ds.groupby("event_type").map_groups(
        consecutive, batch_format="pandas")


EDGES_FROM_EVENTS_SQL = """
SELECT CAST(user_id AS VARCHAR) AS src,
       CAST(next_user AS VARCHAR) AS dst
FROM (
    SELECT user_id,
           lead(user_id) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id) AS next_user
    FROM events
)
WHERE next_user IS NOT NULL
"""
