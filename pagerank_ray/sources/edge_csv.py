"""Edge-list sources (SURVEY.md S1/S2).

The reference streams a gzipped CSV with header ``source,target``
(/root/reference/pagerank.py:38-49) and *assumes the file is sorted by
source* — a load-bearing assumption for its run-length weight
computation. This engine's weights come from a per-shard groupby, so
the sortedness assumption is DROPPED (documented delta).

``max_edges`` reproduces S2's row cap but without the reference's
off-by-one (pagerank.py:40-41 keeps max_nnz+1 rows; we keep exactly
``max_edges`` — documented delta).
"""

from __future__ import annotations

import ray.data as rd


def read_edge_csv(path: str, max_edges: int | None = None):
    """Read a (gzipped or plain) CSV of ``source,target`` into (src, dst).

    Arrow's CSV reader decompresses ``.gz`` transparently based on the
    file extension; blocks stream through the object store.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def normalize(t):
        t = t.rename_columns(["src", "dst"])
        # node names are strings; Arrow CSV may infer ints (small.csv)
        return pa.table({
            "src": pc.cast(t.column("src"), pa.string()),
            "dst": pc.cast(t.column("dst"), pa.string()),
        })

    ds = rd.read_csv(path)
    ds = ds.map_batches(normalize, batch_format="pyarrow",
                        zero_copy_batch=True)
    if max_edges is not None:
        ds = ds.limit(max_edges)
    return ds


def from_arrow_edges(table):
    """Wrap an in-memory Arrow (src, dst) table as a Dataset (fixtures)."""
    return rd.from_arrow(table)
