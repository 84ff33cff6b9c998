"""Partitioned hash-join helper shared by the scale paths.

Thin wrapper over ``Dataset.join`` that fixes the three operational
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
* **Zero-row first block loses the schema broadcast**: Ray's hash
  shuffle sends typed EMPTY shards to every aggregator partition only
  from the FIRST shuffle task of each join input
  (``send_empty_blocks=should_broadcast_schemas``,
  hash_shuffle.py:584) — but a zero-row block short-circuits before
  partitioning (:223), so when the first block of a side happens to
  be empty the broadcast is silently consumed and every partition
  that never receives a non-empty shard finalizes an EMPTY-SCHEMA
  table, killing the join with "No match or multiple matches for key
  field reference ..." (race-dependent on block order and on
  partition count vs key spread). Fix: every zero-row block on both
  sides is PADDED to one all-NULL row — typed from the block's own
  schema when it has one, else from the caller-provided
  ``left_schema``/``right_schema`` hint — so every block is
  non-empty, the first task always broadcasts, and every partition is
  seeded. NULL join keys never match in an inner join (SQL
  semantics, verified against Acero), so the padding rows can never
  appear in the output. Inner joins only (a null-key row WOULD
  surface in an outer join's output; no caller uses outer joins).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_AGG_ARGS = {"num_cpus": 0.1}


def default_join_partitions() -> int:
    return max(8, int(ray.cluster_resources().get("CPU", 8)))


def _null_sentinel(schema) -> pa.Table:
    """One all-NULL row with the given schema. ``schema`` is a
    pa.Schema or an iterable of (name, pa.DataType) pairs."""
    if isinstance(schema, pa.Schema):
        fields = [(f.name, f.type) for f in schema]
    else:
        fields = list(schema)
    return pa.table({name: pa.array([None], type=typ)
                     for name, typ in fields})


def _sanitize(ds, schema):
    """Prepend a one-row all-NULL sentinel block so the side's FIRST
    shuffle task is never a zero-row block (see module docstring).

    The sentinel must be FIRST: only the first task of a join input
    broadcasts typed empty shards to every partition, and a zero-row
    block consumes that broadcast silently. A sentinel prepended via
    ``union`` is an InputData bundle — available the instant the
    pipeline starts, before any upstream task can emit a block — so
    it is the one that broadcasts. (Padding empty blocks in a
    map_batches does NOT work: Ray Data never invokes the UDF on
    zero-row blocks, they pass through untouched.)

    Without a schema hint the side's schema is probed from plan
    metadata only (no execution); if unknown, the side is passed
    through unchanged and the caller should provide the schema."""
    if schema is None:
        schema = _known_schema(ds)
        if schema is None:
            return ds
    return ray.data.from_arrow(_null_sentinel(schema)).union(ds)


def _known_schema(ds):
    """The side's pyarrow schema if the plan already knows it —
    never triggers execution."""
    try:
        sch = ds.schema(fetch_if_missing=False)
    except Exception:
        return None
    base = getattr(sch, "base_schema", None)
    return base if isinstance(base, pa.Schema) else None


def hash_join(left, right, on, right_on=None, join_type: str = "inner",
              num_partitions: int | None = None,
              left_suffix: str | None = None,
              right_suffix: str | None = None,
              left_schema=None, right_schema=None):
    """Partitioned hash join of two Datasets (both sides shuffle).

    ``on`` / ``right_on`` are column-name tuples; the right key
    columns are dropped from the output (Ray semantics). Suffixes
    disambiguate colliding non-key columns (e.g. self-joins).

    ``left_schema`` / ``right_schema``: pass the side's exact schema
    (names, types AND column order must match its real blocks) when
    that side can carry SCHEMA-LESS empty blocks (it is directly
    downstream of another join/groupby with no normalizing map) or
    can be entirely empty — the null-row padding then stays typed
    even for those blocks (see module docstring).
    """
    if isinstance(on, str):
        on = (on,)
    if isinstance(right_on, str):
        right_on = (right_on,)
    if join_type != "inner":
        raise ValueError(
            "hash_join only supports inner joins: the null-row "
            "padding that makes the shuffle schema-safe would "
            "surface sentinel rows in an outer join's output")
    return _sanitize(left, left_schema).join(
        _sanitize(right, right_schema),
        join_type=join_type,
        num_partitions=num_partitions or default_join_partitions(),
        on=tuple(on),
        right_on=tuple(right_on) if right_on is not None else None,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
        aggregator_ray_remote_args=dict(_AGG_ARGS),
    )


def salted_join(big, small, on: str, right_on: str,
                heavy_keys, salt: int = 16,
                num_partitions: int | None = None,
                big_schema=None, small_schema=None):
    """Inner equi-join for a BIG side with HOT keys: rows of ``big``
    whose key sits in ``heavy_keys`` spread across ``salt`` sub-keys
    (a per-row cycling salt — the salt value carries no meaning, so
    no determinism is required for the output row-set), the SMALL
    side replicates its heavy rows salt-fold, and the join runs on
    (key, salt). The output rows are exactly ``hash_join``'s
    (equality pinned by test); what changes is the exchange: a key
    holding p% of the big side lands on ONE reducer under a plain
    hash join, and on ``salt`` reducers here — the join twin of
    ``stages/aggregate.salted_grouped_count`` (A1's production
    path), completing the north-rule's explicit skew handling for
    the case where pre-aggregation cannot shrink the hot key first.

    ``heavy_keys`` is a pyarrow array of the hot keys (tiny by
    definition — the heavy_targets discipline: find them with the
    salted count, broadcast the short list)."""
    i64 = pa.int64()
    href = ray.put(heavy_keys)

    def salt_big(t: pa.Table, *, href) -> pa.Table:
        hk = ray.get(href) if isinstance(href, ray.ObjectRef) else href
        if t.num_rows == 0:
            return t.append_column("__salt", pa.array([], i64))
        import numpy as np
        hot = pc.is_valid(pc.index_in(
            t.column(on), value_set=hk)).to_numpy(
                zero_copy_only=False)
        sv = np.zeros(t.num_rows, dtype=np.int64)
        # start each block's cycle at a random offset: a block with
        # fewer hot rows than `salt` would otherwise only ever use
        # salts 0..h-1, re-concentrating the hub on low sub-keys
        # across blocks (the salt value carries no meaning, so
        # nondeterminism here cannot change the output row-set)
        off = np.random.randint(salt)
        sv[hot] = (off + np.arange(int(hot.sum()),
                                   dtype=np.int64)) % salt
        return t.append_column("__salt", pa.array(sv, i64))

    def salt_small(t: pa.Table, *, href) -> pa.Table:
        hk = ray.get(href) if isinstance(href, ray.ObjectRef) else href
        if t.num_rows == 0:
            return t.append_column("__salt", pa.array([], i64))
        import numpy as np
        hot = pc.is_valid(pc.index_in(
            t.column(right_on), value_set=hk)).to_numpy(
                zero_copy_only=False)
        cold = t.filter(pa.array(~hot)).append_column(
            "__salt", pa.array(np.zeros(int((~hot).sum()), np.int64),
                               i64))
        hot_t = t.filter(pa.array(hot))
        if hot_t.num_rows == 0:
            return cold
        reps = []
        for sv in range(salt):
            reps.append(hot_t.append_column(
                "__salt", pa.array(
                    np.full(hot_t.num_rows, sv, np.int64), i64)))
        return pa.concat_tables([cold] + reps)

    big_s = big.map_batches(salt_big, fn_kwargs={"href": href},
                            batch_format="pyarrow",
                            zero_copy_batch=True)
    small_s = small.map_batches(salt_small, fn_kwargs={"href": href},
                                batch_format="pyarrow",
                                zero_copy_batch=True)
    bs = (list(big_schema) + [("__salt", i64)]) \
        if big_schema is not None else None
    ss = (list(small_schema) + [("__salt", i64)]) \
        if small_schema is not None else None
    out = hash_join(big_s, small_s, on=(on, "__salt"),
                    right_on=(right_on, "__salt"),
                    num_partitions=num_partitions,
                    left_schema=bs, right_schema=ss)
    return out.map_batches(
        lambda t: t.drop_columns(["__salt"]),
        batch_format="pyarrow", zero_copy_batch=True)
