"""CLI shim mirroring the reference's flags (conformance diffing).

``python -m pagerank_ray.cli --data=path/to/edges.csv.gz [flags]``
reproduces /root/reference/pagerank.py:245-267's end-to-end flow on
the Ray engine and prints the reference's golden log-line format
(``rank=i pagerank=… url=…``). The engine itself is a library; this
shim is the only module that owns a Ray session.
"""

from __future__ import annotations

import argparse
import tempfile


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--data", help="gzip/plain CSV edge list "
                                    "(reference S1)")
    src.add_argument("--corpus",
                     help="parquet corpus of source-code repositories "
                          "(repo, path, commit, lang, content) — runs "
                          "the flagship extract->graph->pagerank flow")
    parser.add_argument("--personalization_vector_query", default=None)
    parser.add_argument("--search_query", default="")
    parser.add_argument("--filter_ratio", type=float, default=None)
    parser.add_argument("--alpha", type=float, default=0.85)
    parser.add_argument("--max_iterations", type=int, default=1000)
    parser.add_argument("--epsilon", type=float, default=1e-6)
    parser.add_argument("--max_results", type=int, default=10)
    parser.add_argument("--max_nnz", type=int, default=None,
                        help="cap on edges read (reference S2, without "
                             "its off-by-one)")
    parser.add_argument("--num_parts", type=int, default=8)
    parser.add_argument("--url_filter", default=None,
                        action=argparse.BooleanOptionalAction,
                        help="M1 regex filter (default: on for --data, "
                             "matching the reference; off for --corpus "
                             "whose nodes are file paths, not URLs)")
    parser.add_argument("--boost", action="store_true",
                        help="v2 search: synonym score boost "
                             "(pagerank2.py:171-201)")
    parser.add_argument("--power", type=int, default=30)
    parser.add_argument("--s_weight", type=float, default=0.03)
    parser.add_argument("--output_dir", default=None,
                        help="write full ranks as partitioned parquet")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    import os

    import ray
    if not ray.is_initialized():
        # Under `ray job submit` RAY_ADDRESS points at the cluster —
        # connect to it; bare local runs fall back to a local session.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from .context import configure_data_context
    configure_data_context()

    from .functions.query import SynonymExpander, url_satisfies_query
    from .graph.build import build_graph
    from .graph.pagerank import PageRankRunner
    from .pipelines.search import format_results, search, search_boosted
    from .sources.edge_csv import read_edge_csv

    expander = SynonymExpander()
    v_ind = None
    if args.personalization_vector_query:
        q = args.personalization_vector_query
        extra = expander.expand_terms(q)
        v_ind = lambda nm: url_satisfies_query(nm, q, extra)  # noqa: E731

    with tempfile.TemporaryDirectory() as tmp:
        gdir = f"{tmp}/graph"
        if args.corpus:
            import ray.data as rd

            from .stages.extract import extract_edges
            edges = extract_edges(rd.read_parquet(args.corpus))
            if args.max_nnz is not None:
                # S2 semantics on the extracted edge stream (the CSV
                # branch caps edges at the read the same way)
                edges = edges.limit(args.max_nnz)
        else:
            edges = read_edge_csv(args.data, max_edges=args.max_nnz)
        url_filter = args.url_filter if args.url_filter is not None \
            else not args.corpus
        build_graph(edges, gdir, num_parts=args.num_parts,
                    apply_url_filter=url_filter,
                    filter_ratio=args.filter_ratio)
        runner = PageRankRunner(gdir)
        try:
            ranks = runner.run(alpha=args.alpha,
                               max_iterations=args.max_iterations,
                               epsilon=args.epsilon, v_indicator=v_ind)
            if args.verbose:
                print(f"iterations={runner.iterations_run} "
                      f"residual={runner.final_residual:.4e}")
            if args.output_dir:
                # worker-side sink: each shard writes its own parquet
                # partition; the n-row result never lands on the driver
                runner.write_ranks_distributed(args.output_dir)
        finally:
            runner.close()
        if args.boost:
            top = search_boosted(ranks, args.search_query,
                                 args.max_results, expander=expander,
                                 s_weight=args.s_weight,
                                 power=args.power)
        else:
            top = search(ranks, args.search_query, args.max_results,
                         expander=expander)
        for line in format_results(top):
            print(line)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
