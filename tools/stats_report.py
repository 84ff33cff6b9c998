"""Print ds.stats() for the main Dataset pipelines (tuning aid).

Usage: PYTHONPATH=/root/repo python tools/stats_report.py [sf_dir]
"""

from __future__ import annotations

import sys


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import ray.data as rd

    from pagerank_ray.context import configure_data_context
    from pagerank_ray.functions.text import quality_counts_batch
    from pagerank_ray.pipelines.events_graph import edges_from_events
    from pagerank_ray.sources.synth import generate_corpus
    from pagerank_ray.stages.extract import extract_edges

    configure_data_context()

    print("=" * 70)
    print("## events -> edges derivation")
    ds = edges_from_events(sf).materialize()
    print(ds.stats())

    print("=" * 70)
    print("## corpus extraction")
    table, _ = generate_corpus(num_repos=5, files_per_repo=100)
    ds = extract_edges(rd.from_arrow(table)).materialize()
    print(ds.stats())

    print("=" * 70)
    print("## documents quality counts")
    ds = (rd.read_parquet(f"{sf}/documents.parquet")
          .map_batches(quality_counts_batch, batch_format="pyarrow")
          .materialize())
    print(ds.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
