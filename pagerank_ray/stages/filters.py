"""Edge-level filters (SURVEY.md M1, J2).

M1 — URL shape filter: drop any edge where source OR target matches
``.*((/$)|(/.*/)).*`` (node name ends in "/" or contains >= 2 path
segments), reproducing /root/reference/pagerank.py:42-45 exactly.
Implemented as a vectorized pyarrow regex kernel inside map_batches
(stateless tasks, zero-copy Arrow).

J2 — in-link-ratio filter: drop edges whose target's in-degree
(counted over ALL post-M1 edges, BEFORE any J2 dropping) is
>= ratio * n where n = total node count including filtered targets.
Edges are removed, nodes stay (heavy targets usually become dangling)
— /root/reference/pagerank.py:51-57 semantics. The heavy-target list
is short by construction, so it is computed with one groupby and
broadcast via ray.put instead of a shuffle join.
"""

from __future__ import annotations


import pyarrow as pa
import pyarrow.compute as pc

import ray

# Arrow's regex engine (RE2) anchors match_substring_regex nowhere, so
# the reference's `.match(...)` (anchored at start, unanchored at end)
# is equivalent to finding the group anywhere: name ends in '/' OR has
# a '/<something>/' segment.
URL_DROP_PATTERN = r"(/$)|(/.*/)"


def url_filter_batch(batch: pa.Table) -> pa.Table:
    bad_src = pc.match_substring_regex(batch.column("src"), URL_DROP_PATTERN)
    bad_dst = pc.match_substring_regex(batch.column("dst"), URL_DROP_PATTERN)
    keep = pc.invert(pc.or_(bad_src, bad_dst))
    return batch.filter(keep)


def url_filter(edges_ds):
    """M1 as a stateless vectorized map_batches filter."""
    return edges_ds.map_batches(
        url_filter_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def heavy_targets(edges_ds, filter_ratio: float, num_nodes: int,
                  salt: int = 16) -> set:
    """Targets whose in-degree >= filter_ratio * num_nodes (a SHORT list).

    In-degrees are counted over the full post-M1 edge stream (A1) with
    the SALTED two-phase aggregation (stages/aggregate.py): heavy
    targets are by definition the hot keys of this groupby — a
    power-law hub at 10^12-edge scale would land every one of its
    per-batch partial rows on a single reducer; salting spreads each
    key over ``salt`` sub-keys first, then combines the tiny per-salt
    partials. The heavy list itself is tiny and is collected to the
    driver for broadcast."""
    from .aggregate import salted_grouped_count

    threshold = filter_ratio * num_nodes
    counts = salted_grouped_count(edges_ds, "dst", salt=salt,
                                  alias="cnt")

    def pick_heavy(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # type the empty block from its own schema when it has one
            # (string fallback only for schema-less join/groupby blocks)
            typ = t.schema.field("dst").type \
                if "dst" in t.column_names else pa.string()
            return pa.table({"dst": pa.array([], typ)})
        keep = pc.greater_equal(t.column("cnt"), threshold)
        return pa.table({"dst": t.column("dst").filter(keep)})

    heavy = counts.map_batches(pick_heavy, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    return {r["dst"] for r in heavy}


def inlink_ratio_filter(edges_ds, filter_ratio: float | None,
                        num_nodes: int):
    """Apply J2; ``filter_ratio=None`` is a no-op (reference default).

    The heavy set is broadcast once via ray.put and filtered by
    STATELESS tasks (zero-copy plasma get per batch) — a lookup ref
    is not actor-pool state."""
    if filter_ratio is None:
        return edges_ds
    heavy = heavy_targets(edges_ds, filter_ratio, num_nodes)
    # broadcast the SORTED Arrow array (built once on the driver, not
    # per batch)
    heavy_ref = ray.put(pa.array(sorted(heavy), pa.string()))

    def flt(batch: pa.Table, *, heavy_ref) -> pa.Table:
        heavy_arr = ray.get(heavy_ref) if isinstance(
            heavy_ref, ray.ObjectRef) else heavy_ref
        if len(heavy_arr) == 0:
            return batch
        is_heavy = pc.is_in(batch.column("dst"), value_set=heavy_arr)
        return batch.filter(pc.invert(is_heavy))

    return edges_ds.map_batches(
        flt, fn_kwargs={"heavy_ref": heavy_ref},
        batch_format="pyarrow", zero_copy_batch=True,
    )
