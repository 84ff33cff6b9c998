"""Deterministic synthetic source-code corpus (FIXTURES.md F2).

Generates the ``files`` table mandated by BASELINE.json ``input_hint``:
``(repo: string, path: string, commit: string, lang: string,
content: string)`` whose import statements reference other generated
paths, so the expected edge set is known by construction.

Edge-producing constructs (must stay in sync with stages/extract.py):
  python:     ``import a.b.c`` / ``from a.b import c``  -> edge to a/b/c.py
  c:          ``#include "x/y.h"``                       -> edge to x/y.h
  javascript: ``require('./x/y')`` / ``import .. from './x/y'`` -> x/y.js

Fixture knobs (all deterministic, seeded):
  * a "menu" file per repo imported by most same-lang files (heavy
    in-degree target: exercises the in-link-ratio filter J2 and skew
    salting),
  * duplicate imports in files where ``i % 7 == 1`` (duplicate-edge
    weight-summing semantics of the reference COO coalesce,
    /root/reference/pagerank.py:74-77),
  * a controlled fraction of dangling references (target path not in
    the corpus).  PINNED SEMANTICS: a dangling reference DOES produce
    an edge; its target becomes a node with no out-links (a dangling
    node in the PageRank sense), matching the reference where the node
    set is derived purely from edge endpoints
    (/root/reference/pagerank.py:46-49).

Node naming: ``{repo}/{path}`` (repo-qualified so repos do not collide).
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

LANGS = ("python", "c", "javascript")


def _py_path(i: int) -> str:
    return f"py/pkg{i // 20}/m{i}.py"


def _py_module(i: int) -> str:
    return f"py.pkg{i // 20}.m{i}"


def _c_path(i: int) -> str:
    return f"c/inc{i // 20}/h{i}.h"


def _js_path(i: int) -> str:
    return f"js/d{i // 20}/f{i}.js"


def _js_spec(i: int) -> str:
    # require()-style specifier, resolved by extract.py as repo-root
    # relative with an implied .js extension.
    return f"./js/d{i // 20}/f{i}"


def generate_corpus(
    num_repos: int = 3,
    files_per_repo: int = 20,
    seed: int = 42,
    dangling_fraction: float = 0.1,
) -> tuple[pa.Table, list[tuple[str, str]]]:
    """Build the corpus table and its expected (src, dst) edge list.

    Returns (files_table, expected_edges) where expected_edges contains
    one entry per import statement occurrence (duplicates preserved).
    """
    rng = random.Random(seed)
    repos: list[str] = []
    paths: list[str] = []
    commits: list[str] = []
    langs: list[str] = []
    contents: list[str] = []
    expected: list[tuple[str, str]] = []

    for r in range(num_repos):
        repo = f"repo{r:03d}"
        commit = f"{seed:08x}{r:032x}"[:40]
        # index files by lang: i % 3 == 0 python, 1 c, 2 javascript
        lang_files: dict[str, list[int]] = {lg: [] for lg in LANGS}
        for i in range(files_per_repo):
            lang_files[LANGS[i % 3]].append(i)

        for i in range(files_per_repo):
            lang = LANGS[i % 3]
            same_lang = [j for j in lang_files[lang] if j != i]
            if lang == "python":
                path = _py_path(i)
            elif lang == "c":
                path = _c_path(i)
            else:
                path = _js_path(i)
            src_node = f"{repo}/{path}"

            lines: list[str] = [f"// synthetic {lang} file {repo}/{path}"
                                if lang != "python"
                                else f"# synthetic python file {repo}/{path}"]
            targets: list[int] = []
            # the per-lang "menu" file (first file of that lang) is
            # imported by ~80% of the other same-lang files
            menu = lang_files[lang][0]
            if i != menu and rng.random() < 0.8:
                targets.append(menu)
            k = rng.randint(2, 4)
            if same_lang:
                targets.extend(rng.choice(same_lang) for _ in range(k))
            if i % 7 == 1 and targets:
                targets.append(targets[-1])  # deliberate duplicate import

            for j in targets:
                if lang == "python":
                    mod = _py_module(j)
                    if rng.random() < 0.5:
                        lines.append(f"import {mod}")
                    else:
                        head, _, tail = mod.rpartition(".")
                        lines.append(f"from {head} import {tail}")
                    dst_path = _py_path(j)
                elif lang == "c":
                    dst_path = _c_path(j)
                    lines.append(f'#include "{dst_path}"')
                else:
                    dst_path = _js_path(j)
                    if rng.random() < 0.5:
                        lines.append(f"const m{j} = require('{_js_spec(j)}');")
                    else:
                        lines.append(f"import m{j} from '{_js_spec(j)}';")
                expected.append((src_node, f"{repo}/{dst_path}"))

            # dangling reference: target path never generated
            if rng.random() < dangling_fraction:
                if lang == "python":
                    lines.append(f"import ghost.g{i}")
                    dst_path = f"ghost/g{i}.py"
                elif lang == "c":
                    dst_path = f"ghost/g{i}.h"
                    lines.append(f'#include "{dst_path}"')
                else:
                    dst_path = f"ghost/g{i}.js"
                    lines.append(f"const g = require('./ghost/g{i}');")
                expected.append((src_node, f"{repo}/{dst_path}"))

            # filler body so content sizes are non-trivial and varied
            body_n = 5 + (i * 13 + r) % 40
            for b in range(body_n):
                lines.append(f"x_{b} = {b * i + r}" if lang == "python"
                             else f"int x_{b} = {b * i + r};")
            repos.append(repo)
            paths.append(path)
            commits.append(commit)
            langs.append(lang)
            contents.append("\n".join(lines) + "\n")

    table = pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )
    return table, expected


def write_corpus(
    out_dir: str,
    num_repos: int = 3,
    files_per_repo: int = 20,
    seed: int = 42,
    rows_per_file: int = 50_000,
) -> pa.Table:
    """Write the corpus as (possibly multi-file) parquet; returns the table."""
    import os

    import pyarrow.parquet as pq

    table, _ = generate_corpus(num_repos, files_per_repo, seed)
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    part = 0
    for start in range(0, n, rows_per_file):
        pq.write_table(
            table.slice(start, rows_per_file),
            f"{out_dir}/part-{part:05d}.parquet",
        )
        part += 1
    return table


def small_graph_edges() -> pa.Table:
    """FIXTURES.md F1: the reference toy graph (small.csv.gz) as Arrow."""
    rows = [("1", "2"), ("1", "3"), ("3", "1"), ("3", "2"), ("3", "5"),
            ("4", "5"), ("4", "6"), ("5", "6"), ("5", "4"), ("6", "4")]
    return pa.table({
        "src": pa.array([r[0] for r in rows]),
        "dst": pa.array([r[1] for r in rows]),
    })


def component_fixture_edges(seed: int = 42) -> tuple[pa.Table, int]:
    """FIXTURES.md F5: K4 + K5 cliques + an isolated chain (3 components).

    Returns (edges_table, n_components). Node names are string ints;
    edges are directed one way (graph algos symmetrize as needed).
    """
    rng = np.random.RandomState(seed)
    edges: list[tuple[str, str]] = []
    # K4 on nodes 0-3
    k4 = list(range(4))
    for a in k4:
        for b in k4:
            if a < b:
                edges.append((str(a), str(b)))
    # K5 on nodes 10-14
    k5 = list(range(10, 15))
    for a in k5:
        for b in k5:
            if a < b:
                edges.append((str(a), str(b)))
    # chain on nodes 20-27
    chain = list(range(20, 28))
    for a, b in zip(chain, chain[1:]):
        edges.append((str(a), str(b)))
    # shuffle deterministically so nothing depends on input order
    order = rng.permutation(len(edges))
    edges = [edges[i] for i in order]
    return (
        pa.table({
            "src": pa.array([e[0] for e in edges]),
            "dst": pa.array([e[1] for e in edges]),
        }),
        3,
    )
