"""Distributed per-worker result sink for the iterative algorithms.

``collect_ranks`` / ``collect_labels`` concatenate every shard's
result on the driver — fine for the query contract at test scale, a
TB-sized driver pull at the 10^12-node north-star. Here each
GraphWorker writes its own shards' (id, node, value) parquet directly
(atomic tmp+rename per shard), and the driver handles only the
manifest: a fingerprint built from per-shard sha256 digests (computed
worker-side — the values never travel), so

  * a rerun of the SAME result skips partitions whose files exist
    (resumable output, even across DIFFERENT cluster sizes — state
    keys on shards, not workers);
  * DIFFERENT content into a reused dir wipes stale partitions first
    (the write_ranks discipline, graph/pagerank.py).
"""

from __future__ import annotations

import hashlib
import json
import os

import ray

from . import build as gb


SUCCESS_MARKER = "_SUCCESS.json"


def wipe_parquet_dir(out_dir: str) -> None:
    """Remove stale parquet/tmp files (and any commit marker) so a
    reused out_dir never holds a mix of two runs' files
    (Dataset.write_parquet appends uniquely-named files). The marker
    goes FIRST: a crash mid-wipe must leave the dir uncommitted."""
    if os.path.isdir(out_dir):
        marker = os.path.join(out_dir, SUCCESS_MARKER)
        if os.path.exists(marker):
            os.remove(marker)
        for f in os.listdir(out_dir):
            if f.endswith(".parquet") or ".tmp" in f:
                os.remove(os.path.join(out_dir, f))


def sink_dataset(ds, out_dir: str) -> None:
    """Crash-safe sharded-parquet sink for Dataset/Table results that
    don't ride the per-shard worker sink below: wipe stale files,
    stream the blocks to parquet, then commit a ``_SUCCESS.json``
    listing the files written. Without the marker a job that dies
    mid-write leaves a plausible-looking PARTIAL file set; readers
    that go through ``read_sunk_dataset`` refuse an uncommitted dir.
    (pyarrow dataset discovery ignores ``_``-prefixed files, so plain
    read_parquet over the dir keeps working too.)"""
    import pyarrow as pa
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    wipe_parquet_dir(out_dir)
    if isinstance(ds, pa.Table):
        ds = rd.from_arrow(ds)
    ds.write_parquet(out_dir)
    files = sorted(f for f in os.listdir(out_dir)
                   if f.endswith(".parquet"))
    if not files:
        # an all-empty Dataset writes ZERO files; commit one typed
        # empty part so read_sunk_dataset has a path (and a schema)
        import pyarrow.parquet as pq
        sch = ds.schema()
        arrow_sch = getattr(sch, "base_schema", None) if sch else None
        empty = (arrow_sch.empty_table()
                 if isinstance(arrow_sch, pa.Schema) else pa.table({}))
        pq.write_table(empty, os.path.join(out_dir,
                                           "part-empty.parquet"))
        files = ["part-empty.parquet"]
    gb._atomic_write_json(os.path.join(out_dir, SUCCESS_MARKER),
                          {"files": files})


def read_sunk_dataset(out_dir: str):
    """Read back a ``sink_dataset`` result; raises if the writing run
    never committed (marker absent => partial/no data)."""
    import ray.data as rd

    marker = os.path.join(out_dir, SUCCESS_MARKER)
    if not os.path.exists(marker):
        raise RuntimeError(
            f"{out_dir}: no {SUCCESS_MARKER} — the writing run did "
            f"not complete; any parquet present may be partial")
    with open(marker) as f:
        files = json.load(f)["files"]
    return rd.read_parquet([os.path.join(out_dir, f) for f in files])


def write_result_distributed(workers, out_dir: str, kind: str) -> dict:
    """``kind``: "rank" (PageRank x_prev) or "label" (CC/LPA labels).
    Returns the committed manifest."""
    os.makedirs(out_dir, exist_ok=True)
    shard_hashes = sorted(
        h for group in ray.get(
            [w.result_hashes.remote(kind) for w in workers])
        for h in group)
    parts = [p for p, _ in shard_hashes]
    fp = hashlib.sha256(
        json.dumps([kind, shard_hashes]).encode()).hexdigest()

    man_path = os.path.join(out_dir, "manifest.json")
    same_run = False
    if os.path.exists(man_path):
        with open(man_path) as f:
            old = json.load(f)
        same_run = old.get("fingerprint") == fp
    if not same_run:
        wipe_parquet_dir(out_dir)
    skip = [p for p in parts if same_run and os.path.exists(
        os.path.join(out_dir, f"part-{p:05d}.parquet"))]

    ray.get([w.write_result.remote(out_dir, kind, skip)
             for w in workers])
    manifest = {"kind": kind, "fingerprint": fp, "partitions": parts,
                "skipped": sorted(skip)}
    gb._atomic_write_json(man_path, manifest)
    return manifest


def write_empty_result(out_dir: str, kind: str) -> dict:
    """The write_result_distributed contract for an EMPTY graph (no
    workers exist to write): wipe stale files, commit one empty part
    with the worker sink's (id, node, <kind>) schema, and return the
    manifest — so out_dir readers and reruns behave identically to the
    non-empty path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    man_path = os.path.join(out_dir, "manifest.json")
    fp = hashlib.sha256(json.dumps([kind, []]).encode()).hexdigest()
    same_run = False
    if os.path.exists(man_path):
        with open(man_path) as f:
            same_run = json.load(f).get("fingerprint") == fp
    if not same_run:
        wipe_parquet_dir(out_dir)
    path = os.path.join(out_dir, "part-00000.parquet")
    skip = same_run and os.path.exists(path)
    if not skip:
        t = pa.table({"id": pa.array([], pa.int64()),
                      "node": pa.array([], pa.string()),
                      kind: pa.array([], pa.int64())})
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    manifest = {"kind": kind, "fingerprint": fp, "partitions": [0],
                "skipped": [0] if skip else []}
    gb._atomic_write_json(man_path, manifest)
    return manifest


def result_files(out_dir: str) -> list[str]:
    """Partition files recorded by the manifest (ignores strays)."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        man = json.load(f)
    return [os.path.join(out_dir, f"part-{p:05d}.parquet")
            for p in man["partitions"]]


def read_result_dataset(out_dir: str):
    """The written result as a ray.data.Dataset (manifest-listed
    files only, so stale strays never leak into a read)."""
    import ray.data as rd
    return rd.read_parquet(result_files(out_dir))
