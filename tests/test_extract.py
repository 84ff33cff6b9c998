"""Extraction stage (M6) + sha256 invariant + synth corpus (F2)."""

import hashlib

import pyarrow as pa

import ray.data as rd

from pagerank_ray.sources.synth import generate_corpus
from pagerank_ray.stages.extract import (
    content_hashes, extract_edges, extract_edges_batch, extract_targets)


def test_extract_targets_python():
    content = "import a.b.c\nfrom x.y import z\nx = 1\n"
    assert extract_targets("python", content) == ["a/b/c.py", "x/y/z.py"]


def test_extract_targets_c():
    content = '#include "x/y.h"\n # include "q.h"\nint main(){}\n'
    assert extract_targets("c", content) == ["x/y.h", "q.h"]


def test_extract_targets_js():
    content = ("const a = require('./x/y');\n"
               "import b from './p/q.js';\nvar v = 1;\n")
    assert extract_targets("javascript", content) == ["x/y.js", "p/q.js"]


def test_extract_targets_go():
    content = ('import "a/b"\n'
               'import (\n  "c/d"\n  "e/f"\n)\nfunc main() {}\n')
    assert extract_targets("go", content) == ["a/b.go", "c/d.go", "e/f.go"]


def test_extract_targets_rust():
    content = "use crate::a::b;\nmod util;\nfn main() {}\n"
    assert extract_targets("rust", content) == ["a/b.rs", "util.rs"]


def test_extract_targets_java():
    content = "import a.b.Cls;\nclass X {}\n"
    assert extract_targets("java", content) == ["a/b/Cls.java"]


def test_register_extractor():
    from pagerank_ray.stages.extract import register_extractor
    try:
        register_extractor("kotlin",
                           lambda c: ["k/" + w + ".kt"
                                      for w in c.split() if w.isalpha()])
        assert extract_targets("kotlin", "foo bar") == \
            ["k/foo.kt", "k/bar.kt"]
    finally:
        from pagerank_ray.stages.extract import EXTRACTORS
        EXTRACTORS.pop("kotlin", None)
    assert extract_targets("unknown_lang", "import x") == []


def test_corpus_edges_match_expected():
    table, expected = generate_corpus(num_repos=2, files_per_repo=15)
    got = extract_edges_batch(table)
    got_pairs = list(zip(got.column("src").to_pylist(),
                         got.column("dst").to_pylist()))
    assert sorted(got_pairs) == sorted(expected)
    # duplicates must be preserved (weight-summing semantics)
    assert len(got_pairs) == len(expected)


def test_corpus_has_duplicates_and_dangling():
    table, expected = generate_corpus(num_repos=2, files_per_repo=15)
    assert len(expected) > len(set(expected)), "fixture must contain dup edges"
    paths = {f"{r}/{p}" for r, p in zip(table.column("repo").to_pylist(),
                                        table.column("path").to_pylist())}
    dsts = {d for _, d in expected}
    assert dsts - paths, "fixture must contain dangling targets"


def test_dataset_extraction_and_sha256(tmp_path):
    table, expected = generate_corpus(num_repos=3, files_per_repo=20)
    ds = rd.from_arrow(table)
    edges = extract_edges(ds).take_all()
    assert len(edges) == len(expected)

    hashes = content_hashes(rd.from_arrow(table)).take_all()
    want = {
        (r["repo"], r["path"]): hashlib.sha256(
            r["content"].encode()).hexdigest()
        for r in table.to_pylist()
    }
    assert len(hashes) == len(want)
    for h in hashes:
        assert h["sha256"] == want[(h["repo"], h["path"])]
