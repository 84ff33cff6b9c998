"""pagerank_ray — a Ray-Data-native link-graph analytics engine.

Built from scratch against the semantics of the reference implementation
(laurenleadbetter/Pagerank, /root/reference/pagerank.py) but architected
for Ray Data: Datasets of Arrow blocks for all per-record work, actor
pools for iteration state (partitioned CSR shards), explicit shuffles
(groupby / partitioned parquet) for the wide steps, and resumable
checkpointed iteration.

Layout:
  sources/    corpus + edge-list readers, deterministic synthetic corpus
  stages/     stateless map_batches stages (extraction, filters, encoding)
  graph/      partitioned graph build, CSR shard actors, PageRank / CC /
              LPA / triangle counting, checkpoint manifests
  functions/  scalar / per-batch functions (query predicate, text, hashing)
  pipelines/  end-to-end pipelines (flagship, dedup, similarity, multimodal)
"""

__version__ = "0.1.0"
