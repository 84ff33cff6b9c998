"""Partitioned hash-join helper shared by the scale paths.

Thin wrapper over ``Dataset.join`` that fixes the two operational
hazards observed in this engine:

* **Aggregator-pool deadlock**: every join operator instantiates its
  full aggregator pool up front; with the default 1-CPU reservation a
  pipeline with two joins needs 2 x num_partitions CPUs *before any
  shuffle task runs* and deadlocks on small clusters. A 0.1-CPU
  reservation keeps admission gated by the shuffle map tasks (which
  hold 1 CPU each) instead.
* **Partition sizing**: defaults to the cluster CPU count (min 8).
  At real scale callers pass an explicit value sized so one hash
  partition of the bigger side fits in an aggregator's heap.
"""

from __future__ import annotations

import ray

_AGG_ARGS = {"num_cpus": 0.1}


def default_join_partitions() -> int:
    return max(8, int(ray.cluster_resources().get("CPU", 8)))


def hash_join(left, right, on, right_on=None, join_type: str = "inner",
              num_partitions: int | None = None,
              left_suffix: str | None = None,
              right_suffix: str | None = None):
    """Partitioned hash join of two Datasets (both sides shuffle).

    ``on`` / ``right_on`` are column-name tuples; the right key
    columns are dropped from the output (Ray semantics). Suffixes
    disambiguate colliding non-key columns (e.g. self-joins).
    """
    if isinstance(on, str):
        on = (on,)
    if isinstance(right_on, str):
        right_on = (right_on,)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions or default_join_partitions(),
        on=tuple(on),
        right_on=tuple(right_on) if right_on is not None else None,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
        aggregator_ray_remote_args=dict(_AGG_ARGS),
    )
