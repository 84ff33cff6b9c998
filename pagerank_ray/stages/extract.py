"""Edge extraction from a source-code corpus (SURVEY.md M6, north_rule).

Stateless ``map_batches`` stage over zero-copy Arrow batches of the
``files`` table (repo, path, commit, lang, content) that emits the
directed link-graph edge table (src, dst) with repo-qualified node
names ``{repo}/{path}``, plus the per-row sha256 content invariant
(BASELINE.json input_hint).

Extraction rules (in sync with sources/synth.py):
  python:     ``import a.b.c``            -> a/b/c.py
              ``from a.b import c``       -> a/b/c.py
  c:          ``#include "x/y.h"``        -> x/y.h   (verbatim)
  javascript: ``require('./x/y')``        -> x/y.js
              ``import .. from './x/y'``  -> x/y.js

Dangling references (targets not present in the corpus) still produce
edges — the node set is derived purely from edge endpoints, matching
the reference's loader (/root/reference/pagerank.py:46-49).

Scale notes: the per-row regex findall loop is Python-level but each
findall is a C-backed scan; batches stream through stateless Ray tasks
with no cross-batch state. sha256 is computed in the same pass so
``content`` is read exactly once per row.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

_PY_IMPORT = re.compile(r"^\s*import\s+([\w\.]+)", re.M)
_PY_FROM = re.compile(r"^\s*from\s+([\w\.]+)\s+import\s+(\w+)", re.M)
_C_INCLUDE = re.compile(r'^\s*#\s*include\s+"([^"]+)"', re.M)
_JS_REQUIRE = re.compile(r"""require\(\s*['"]([^'"]+)['"]\s*\)""")
_JS_IMPORT = re.compile(r"""^\s*import\s+.*?\bfrom\s+['"]([^'"]+)['"]""", re.M)
_GO_IMPORT = re.compile(r'^\s*import\s+"([^"]+)"', re.M)
_GO_BLOCK = re.compile(r"^\s*import\s*\(([^)]*)\)", re.M | re.S)
_GO_QUOTED = re.compile(r'"([^"]+)"')
_RUST_USE = re.compile(r"^\s*use\s+crate::([\w:]+)\s*;", re.M)
_RUST_MOD = re.compile(r"^\s*mod\s+(\w+)\s*;", re.M)
_JAVA_IMPORT = re.compile(r"^\s*import\s+([\w\.]+)\s*;", re.M)


def _resolve_js(spec: str) -> str:
    p = spec[2:] if spec.startswith("./") else spec
    if not p.endswith(".js"):
        p += ".js"
    return p


def _extract_python(content: str) -> list[str]:
    out = [m.replace(".", "/") + ".py"
           for m in _PY_IMPORT.findall(content)]
    out.extend((head + "." + tail).replace(".", "/") + ".py"
               for head, tail in _PY_FROM.findall(content))
    return out


def _extract_c(content: str) -> list[str]:
    return _C_INCLUDE.findall(content)


def _extract_javascript(content: str) -> list[str]:
    out = [_resolve_js(s) for s in _JS_REQUIRE.findall(content)]
    out.extend(_resolve_js(s) for s in _JS_IMPORT.findall(content))
    return out


def _extract_go(content: str) -> list[str]:
    out = [s + ".go" for s in _GO_IMPORT.findall(content)]
    for block in _GO_BLOCK.findall(content):
        out.extend(s + ".go" for s in _GO_QUOTED.findall(block))
    return out


def _extract_rust(content: str) -> list[str]:
    out = [m.replace("::", "/") + ".rs"
           for m in _RUST_USE.findall(content)]
    out.extend(m + ".rs" for m in _RUST_MOD.findall(content))
    return out


def _extract_java(content: str) -> list[str]:
    return [m.replace(".", "/") + ".java"
            for m in _JAVA_IMPORT.findall(content)]


# The user-extension surface (SURVEY.md §2.9): lang -> extractor fn.
# Register a new language with register_extractor("kotlin", fn) and
# every corpus pipeline picks it up — the fn is pure (content ->
# target paths) so it ships to stateless map_batches tasks unchanged.
EXTRACTORS: dict[str, "callable"] = {
    "python": _extract_python,
    "c": _extract_c,
    "javascript": _extract_javascript,
    "go": _extract_go,
    "rust": _extract_rust,
    "java": _extract_java,
}


def register_extractor(lang: str, fn) -> None:
    """Register/override the import extractor for a language."""
    EXTRACTORS[lang] = fn


def extract_targets(lang: str, content: str) -> list[str]:
    """All referenced target paths in one file (duplicates preserved)."""
    fn = EXTRACTORS.get(lang)
    return fn(content) if fn else []


def extract_edges_batch(batch: pa.Table) -> pa.Table:
    """files batch -> (src, dst) edge rows; one row per import occurrence."""
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    langs = batch.column("lang").to_pylist()
    contents = batch.column("content").to_pylist()
    src_out: list[str] = []
    dst_out: list[str] = []
    for repo, path, lang, content in zip(repos, paths, langs, contents):
        src = f"{repo}/{path}"
        for tgt in extract_targets(lang, content):
            src_out.append(src)
            dst_out.append(f"{repo}/{tgt}")
    return pa.table({
        "src": pa.array(src_out, pa.string()),
        "dst": pa.array(dst_out, pa.string()),
    })


def sha256_batch(batch: pa.Table) -> pa.Table:
    """files batch -> (repo, path, sha256) — the content row invariant."""
    contents = batch.column("content").to_pylist()
    hashes = [hashlib.sha256(c.encode("utf-8")).hexdigest() for c in contents]
    return pa.table({
        "repo": batch.column("repo"),
        "path": batch.column("path"),
        "sha256": pa.array(hashes, pa.string()),
    })


def extract_edges(files_ds, batch_size: int = 1024):
    """Dataset of files -> Dataset of (src, dst) edges. Stateless tasks."""
    return files_ds.map_batches(
        extract_edges_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


def content_hashes(files_ds, batch_size: int = 1024):
    """Dataset of files -> Dataset of (repo, path, sha256)."""
    return files_ds.map_batches(
        sha256_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
