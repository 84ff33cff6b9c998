"""Mergeable sketches for approximate aggregates at scale.

HyperLogLog distinct counting: one sketch per batch inside
map_batches, sketches merged in a tiny second stage (register-wise
max) — the guide's mergeable-sketch pattern. Hashing is blake2b
(process-independent); registers 2^p.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def splitmix64(v: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: full-avalanche uint64 mixing,
    deterministic across processes/platforms (unlike Python hash())."""
    with np.errstate(over="ignore"):
        z = v.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


class HyperLogLog:
    """Standard HLL with 2^p registers and the usual bias corrections."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining bits + 1 (cap 64-p+1),
        # counted 4 bits at a time (exact; float log2 is not)
        nonzero = rest != 0
        remaining = nonzero.copy()
        count = np.zeros(len(h), dtype=np.uint8)
        vv = rest.copy()
        for _ in range(16):
            nib = (vv >> np.uint64(60)) & np.uint64(0xF)
            count[(nib == 0) & remaining] += 4
            hit = (nib != 0) & remaining
            if hit.any():
                top = nib[hit].astype(np.uint8)
                extra = np.where(top >= 8, 0,
                                 np.where(top >= 4, 1,
                                          np.where(top >= 2, 2, 3)))
                count[hit] += extra.astype(np.uint8)
                remaining[hit] = False
            vv = vv << np.uint64(4)
        lz = np.where(nonzero, count + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, lz)

    def add_strings(self, values) -> None:
        if len(values) == 0:
            return
        h = np.fromiter(
            (np.frombuffer(hashlib.blake2b(
                str(x).encode("utf-8"), digest_size=8).digest(),
                dtype=np.uint64)[0] for x in values),
            dtype=np.uint64, count=len(values))
        self.add_hashes(h)

    def add_ints(self, v: np.ndarray) -> None:
        """Vectorized path for integer columns: splitmix64 finalizer
        (full-avalanche uint64 mixing, deterministic everywhere) —
        no per-row Python hashing."""
        if len(v) == 0:
            return
        self.add_hashes(splitmix64(v))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        s = np.sum(2.0 ** -self.registers.astype(np.float64))
        e = alpha * m * m / s
        if e <= 2.5 * m:
            zeros = int(np.sum(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


# the mod-2^64 HUGEINT replay pieces shared by every splitmix64 SQL
# oracle in this module (64x64-bit multiplies split into 32-bit
# halves so INT128 never overflows); walks.py / mis.py carry their
# own inlined copies, each pinned to the Python splitmix64 by their
# oracle-equality tests
_M64_SQL = "CAST('18446744073709551616' AS HUGEINT)"


def _mulmod_sql(col: str, b: int) -> str:
    hi, lo = b >> 32, b & 0xFFFFFFFF
    return (f"(((CAST({col} AS HUGEINT) * {lo}) % {_M64_SQL}"
            f" + ((CAST({col} AS HUGEINT) * {hi}) % 4294967296)"
            f" * 4294967296) % {_M64_SQL})")


def hll_distinct_sql(column: str = "user_id", table: str = "events",
                     p: int = 12) -> str:
    """DuckDB oracle for the INTEGER-column HLL path: replays
    splitmix64 (mod-2^64 arithmetic in HUGEINT; the two 64x64-bit
    multiplies are split into 32-bit halves so INT128 never
    overflows), the register index / leading-zero rank (exact via
    ``length(bin(x))``), register-wise max, and the standard
    estimate + linear-counting correction. The estimate is a
    deterministic function of the register array, so the approximate
    sketch gets an exact value-hash oracle."""
    m64 = _M64_SQL
    mulmod = _mulmod_sql

    m = 1 << p
    idx_div = 1 << (64 - p)
    zero_rank = 64 - p + 1
    return f"""
        WITH u AS (SELECT DISTINCT {column} FROM {table}),
         s1 AS (SELECT CAST((((CAST({column} AS HUGEINT) % {m64})
                              + {m64}) % {m64}
                             + 11400714819323198485) % {m64}
                       AS UBIGINT) AS z
                FROM u),
         s2 AS (SELECT CAST({mulmod('xor(z, z // 1073741824)',
                                    0xBF58476D1CE4E5B9)}
                            AS UBIGINT) AS z FROM s1),
         s3 AS (SELECT CAST({mulmod('xor(z, z // 134217728)',
                                    0x94D049BB133111EB)}
                            AS UBIGINT) AS z FROM s2),
         h AS (SELECT xor(z, z // 2147483648) AS h FROM s3),
         ranked AS (SELECT CAST(h // {idx_div} AS BIGINT) AS idx,
                           CASE WHEN (CAST(h AS HUGEINT) * {m})
                                     % {m64} = 0
                                THEN {zero_rank}
                                ELSE 65 - length(bin(CAST(
                                     (CAST(h AS HUGEINT) * {m}) % {m64}
                                     AS UBIGINT)))
                           END AS rank
                    FROM h),
         regs AS (SELECT idx, max(rank) AS r FROM ranked GROUP BY idx),
         agg AS (SELECT {m} - COUNT(*) AS zeros,
                        SUM(power(2.0, -r)) AS nz_sum FROM regs),
         est AS (SELECT CASE
                    WHEN (0.7213 / (1 + 1.079 / {m})) * {m}.0 * {m}.0
                         / (zeros + nz_sum) <= 2.5 * {m} AND zeros > 0
                    THEN {m}.0 * ln({m}.0 / zeros)
                    ELSE (0.7213 / (1 + 1.079 / {m})) * {m}.0 * {m}.0
                         / (zeros + nz_sum)
                 END AS e FROM agg)
        SELECT CAST(round(e) AS BIGINT) AS estimate FROM est
    """


def hll_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate distinct count of ``column`` via per-batch sketches
    merged register-wise (one small row per batch crosses the wire)."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        col = t.column(column)
        if pa.types.is_integer(col.type):
            h.add_ints(col.to_numpy())
        else:
            h.add_strings(col.to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        merged.merge(HyperLogLog.from_bytes(row["sketch"], p))
    return merged.estimate()


def splitmix64_subquery(column: str, table: str) -> str:
    """A DuckDB subquery computing splitmix64(``column``) for every
    row of ``table`` — the same mod-2^64 HUGEINT replay as
    ``hll_distinct_sql`` (shared ``_mulmod_sql`` pieces), factored
    out so any oracle can hash an integer column exactly as
    ``splitmix64`` does. Selects (key, h) with h a UBIGINT."""
    return f"""(
        SELECT key, xor(z, z // 2147483648) AS h FROM (
          SELECT key, CAST({_mulmod_sql('xor(z, z // 134217728)',
                                        0x94D049BB133111EB)}
                           AS UBIGINT) AS z FROM (
            SELECT key, CAST({_mulmod_sql('xor(z, z // 1073741824)',
                                          0xBF58476D1CE4E5B9)}
                             AS UBIGINT) AS z FROM (
              SELECT {column} AS key,
                     CAST((((CAST({column} AS HUGEINT) % {_M64_SQL})
                            + {_M64_SQL}) % {_M64_SQL}
                           + 11400714819323198485) % {_M64_SQL}
                     AS UBIGINT) AS z
              FROM {table}))))"""


def hll_distinct_per_group(ds, group_col: str, column: str,
                           p: int = 12) -> pa.Table:
    """Approximate distinct count of ``column`` PER GROUP — the
    mergeable-sketch-as-groupby-aggregate shape: each batch emits one
    (group, sketch) row per group present (a bincount-built register
    array per group, still one small row per (group, batch)); the
    driver merges register-wise per group and evaluates the estimate.
    Returns (group, estimate) sorted by group, estimate as exact
    int64 of the rounded HLL value (a deterministic function of the
    registers, so the DuckDB replay hash-matches it exactly).

    Only the INTEGER-column splitmix64 path is offered — it is the
    one with an exact SQL replay (``hll_distinct_per_group_sql``)."""
    i64 = pa.int64()

    def sketch_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "g": pa.array([], t.schema.field(group_col).type
                              if group_col in t.column_names
                              else pa.string()),
                "sketch": pa.array([], pa.binary())})
        gcol = t.column(group_col).to_numpy(zero_copy_only=False)
        v = t.column(column).to_numpy()
        groups, inv = np.unique(gcol, return_inverse=True)
        out = []
        for gi in range(len(groups)):
            h = HyperLogLog(p)
            h.add_ints(v[inv == gi])
            out.append(h.to_bytes())
        # keep the group column in its SOURCE type (an int group
        # column stringified would reorder '1','10','2' and change
        # dtype vs the SQL oracle)
        return pa.table({"g": pa.array(groups.tolist()),
                         "sketch": pa.array(out, pa.binary())})

    merged: dict[str, HyperLogLog] = {}
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        g = row["g"]
        if g in merged:
            merged[g].merge(HyperLogLog.from_bytes(row["sketch"], p))
        else:
            merged[g] = HyperLogLog.from_bytes(row["sketch"], p)
    groups = sorted(merged)
    # floor(x + 0.5): DuckDB round() is half-AWAY-from-zero; Python
    # round() is half-to-even (the hll_distinct_users discipline)
    return pa.table({
        group_col: pa.array(groups),
        "estimate": pa.array(
            [int(np.floor(merged[g].estimate() + 0.5))
             for g in groups], i64)})


def hll_distinct_per_group_sql(group_col: str = "event_type",
                               column: str = "user_id",
                               table: str = "events",
                               p: int = 12) -> str:
    """Per-group variant of ``hll_distinct_sql``: the identical
    splitmix64 / register / estimate replay with ``group_col``
    carried through every stage and a final GROUP BY."""
    m64 = _M64_SQL
    mulmod = _mulmod_sql
    m = 1 << p
    idx_div = 1 << (64 - p)
    zero_rank = 64 - p + 1
    return f"""
        WITH u AS (SELECT DISTINCT {group_col} AS g, {column}
                   FROM {table}),
         s1 AS (SELECT g, CAST((((CAST({column} AS HUGEINT) % {m64})
                              + {m64}) % {m64}
                             + 11400714819323198485) % {m64}
                       AS UBIGINT) AS z
                FROM u),
         s2 AS (SELECT g, CAST({mulmod('xor(z, z // 1073741824)',
                                       0xBF58476D1CE4E5B9)}
                            AS UBIGINT) AS z FROM s1),
         s3 AS (SELECT g, CAST({mulmod('xor(z, z // 134217728)',
                                       0x94D049BB133111EB)}
                            AS UBIGINT) AS z FROM s2),
         h AS (SELECT g, xor(z, z // 2147483648) AS h FROM s3),
         ranked AS (SELECT g, CAST(h // {idx_div} AS BIGINT) AS idx,
                           CASE WHEN (CAST(h AS HUGEINT) * {m})
                                     % {m64} = 0
                                THEN {zero_rank}
                                ELSE 65 - length(bin(CAST(
                                     (CAST(h AS HUGEINT) * {m}) % {m64}
                                     AS UBIGINT)))
                           END AS rank
                    FROM h),
         regs AS (SELECT g, idx, max(rank) AS r FROM ranked
                  GROUP BY g, idx),
         agg AS (SELECT g, {m} - COUNT(*) AS zeros,
                        SUM(power(2.0, -r)) AS nz_sum FROM regs
                 GROUP BY g),
         est AS (SELECT g, CASE
                    WHEN (0.7213 / (1 + 1.079 / {m})) * {m}.0 * {m}.0
                         / (zeros + nz_sum) <= 2.5 * {m} AND zeros > 0
                    THEN {m}.0 * ln({m}.0 / zeros)
                    ELSE (0.7213 / (1 + 1.079 / {m})) * {m}.0 * {m}.0
                         / (zeros + nz_sum)
                 END AS e FROM agg)
        SELECT g AS {group_col},
               CAST(round(e) AS BIGINT) AS estimate
        FROM est ORDER BY 1
    """
