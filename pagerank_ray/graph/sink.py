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


def wipe_parquet_dir(out_dir: str) -> None:
    """Remove stale parquet/tmp files so a reused out_dir never holds
    a mix of two runs' files (Dataset.write_parquet appends
    uniquely-named files; this is the manifest-less counterpart of the
    fingerprint discipline below)."""
    if os.path.isdir(out_dir):
        for f in os.listdir(out_dir):
            if f.endswith(".parquet") or ".tmp" in f:
                os.remove(os.path.join(out_dir, f))


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
        for f in os.listdir(out_dir):
            if f.endswith(".parquet") or ".tmp" in f:
                os.remove(os.path.join(out_dir, f))
    skip = [p for p in parts if same_run and os.path.exists(
        os.path.join(out_dir, f"part-{p:05d}.parquet"))]

    ray.get([w.write_result.remote(out_dir, kind, skip)
             for w in workers])
    manifest = {"kind": kind, "fingerprint": fp, "partitions": parts,
                "skipped": sorted(skip)}
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
