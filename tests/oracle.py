"""Single-process numpy oracles reproducing the reference semantics.

Faithful float64 re-implementation of /root/reference/pagerank.py
(verified against the README golden output for small.csv.gz: 24
iterations — trace i=0..23 — to residual < 1e-6, ranks
[4, 6, 5, 2, 3, 1] — SURVEY.md §5.2 / FIXTURES.md F1). torch/gensim
are unavailable in-sandbox, so this oracle IS the conformance target
for the engine.
"""

from __future__ import annotations

import re

import numpy as np

_URL_RE = re.compile(r".*((/$)|(/.*/)).*")


def ingest(edges, url_filter=False, filter_ratio=None):
    """Reference WebGraph.__init__ semantics (pagerank.py:22-78).

    edges: iterable of (src, dst) strings in file order. Ids are
    first-seen order (the oracle keeps the reference's id assignment;
    conformance always compares via node names). Returns
    (names_by_id, src_ids, dst_ids, weights, n).
    """
    url_dict: dict[str, int] = {}
    target_counts: dict[int, int] = {}
    idx = []

    def to_id(u):
        if u not in url_dict:
            url_dict[u] = len(url_dict)
        return url_dict[u]

    for s, d in edges:
        if url_filter and (_URL_RE.match(s) or _URL_RE.match(d)):
            continue
        si, di = to_id(s), to_id(d)
        target_counts[di] = target_counts.get(di, 0) + 1
        idx.append((si, di))

    n = len(url_dict)
    if filter_ratio is not None:
        idx = [(s, d) for s, d in idx
               if target_counts[d] < filter_ratio * n]

    src = np.array([e[0] for e in idx], dtype=np.int64)
    dst = np.array([e[1] for e in idx], dtype=np.int64)
    outdeg = np.bincount(src, minlength=n)
    w = 1.0 / outdeg[src]
    names = [None] * n
    for u, i in url_dict.items():
        names[i] = u
    return names, src, dst, w, n


def power_method(src, dst, w, n, alpha=0.85, max_iterations=1000,
                 epsilon=1e-6, v=None):
    """Reference power_method (pagerank.py:122-172) in float64.

    v: None -> uniform; else a raw nonnegative indicator vector.
    Returns (x, iterations).
    """
    outdeg = np.bincount(src, minlength=n)
    a = (outdeg == 0).astype(np.float64)
    if v is None:
        v = np.ones(n, dtype=np.float64)
    v = v.astype(np.float64)
    assert v.sum() > 0
    v = v / np.linalg.norm(v)
    x = np.full(n, 1.0, dtype=np.float64) / np.sqrt(n)
    it = 0
    for it in range(1, max_iterations + 1):
        q = alpha * (x @ a) + (1.0 - alpha)
        xn = np.zeros(n, dtype=np.float64)
        np.add.at(xn, dst, alpha * w * x[src])
        xn += q * v
        xn /= np.linalg.norm(xn)
        resid = np.linalg.norm(xn - x)
        x = xn
        if resid < epsilon:
            break
    return x, it


def pagerank_oracle(edges, alpha=0.85, max_iterations=1000, epsilon=1e-6,
                    url_filter=False, filter_ratio=None, v_indicator=None):
    """Full reference pipeline; returns dict node -> rank + iterations."""
    names, src, dst, w, n = ingest(edges, url_filter, filter_ratio)
    v = None
    if v_indicator is not None:
        v = np.array([1.0 if v_indicator(nm) else 0.0 for nm in names])
    x, it = power_method(src, dst, w, n, alpha, max_iterations, epsilon, v)
    return {names[i]: x[i] for i in range(n)}, it


def connected_components_oracle(edges):
    """Union-find; labels = min node NAME-sorted id in component.

    Returns dict node -> label where label is the id of the
    lexicographically smallest node name in the component (matching
    the engine's sorted-name id assignment + hash-min propagation).
    """
    nodes = sorted({u for e in edges for u in e})
    ids = {u: i for i, u in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        a, b = find(ids[s]), find(ids[d])
        if a != b:
            parent[max(a, b)] = min(a, b)
    comp_min: dict[int, int] = {}
    for u in nodes:
        r = find(ids[u])
        comp_min[r] = min(comp_min.get(r, ids[u]), ids[u])
    return {u: comp_min[find(ids[u])] for u in nodes}


def lpa_oracle(edges, rounds=10):
    """Synchronous LPA on the undirected graph, min-label tiebreak.

    Node ids sorted by name; initial label = own id; each round every
    node adopts the most frequent label among its neighbors' PREVIOUS
    labels (ties -> min label); isolated nodes keep their label.
    """
    nodes = sorted({u for e in edges for u in e})
    ids = {u: i for i, u in enumerate(nodes)}
    nbrs = {i: [] for i in range(len(nodes))}
    for s, d in edges:
        nbrs[ids[s]].append(ids[d])
        nbrs[ids[d]].append(ids[s])
    labels = list(range(len(nodes)))
    for _ in range(rounds):
        nxt = labels[:]
        for i in range(len(nodes)):
            if not nbrs[i]:
                continue
            counts = {}
            for j in nbrs[i]:
                counts[labels[j]] = counts.get(labels[j], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            nxt[i] = best[0]
        labels = nxt
    return {u: labels[ids[u]] for u in nodes}


def triangles_oracle(edges):
    """Per-vertex triangle counts on the undirected deduped graph."""
    nodes = sorted({u for e in edges for u in e})
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = {u: set() for u in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = {u: 0 for u in nodes}
    # count each triangle once, increment all three vertices
    seen = set()
    for a, b in und:
        for c in adj[a] & adj[b]:
            t = tuple(sorted((a, b, c)))
            if t not in seen:
                seen.add(t)
                for v in t:
                    tri[v] += 1
    return tri


def bfs_oracle(edges, seeds, undirected=True):
    """Plain-python BFS hop distances from ``seeds`` (node names).
    Returns dict node -> dist for REACHED nodes only."""
    from collections import deque

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set())
        if undirected:
            adj[d].add(s)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def kcore_oracle(edges, k):
    """Iterative k-core peeling on the symmetrized MULTIgraph
    (duplicate edges count; a self-loop adds 2 to its node's degree —
    the engine's shard-local out-degree convention). Returns dict
    node -> degree-within-core for members."""
    from collections import Counter, defaultdict

    deg = Counter()
    adj = defaultdict(Counter)
    for s, d in edges:
        deg[s] += 1
        deg[d] += 1
        adj[s][d] += 1
        adj[d][s] += 1
    alive = set(deg)
    frontier = {u for u in alive if deg[u] < k}
    while frontier:
        alive -= frontier
        dec = Counter()
        for u in frontier:
            for v, m in adj[u].items():
                dec[v] += m
        for v, c in dec.items():
            deg[v] -= c
        frontier = {u for u in alive if deg[u] < k}
    return {u: deg[u] for u in alive}


def scc_oracle(edges):
    """Iterative Kosaraju SCC. Returns dict node -> root where root is
    the lexicographically smallest member NAME (matching the engine's
    sorted-name id assignment)."""
    from collections import defaultdict

    nodes = sorted({u for e in edges for u in e})
    adj = defaultdict(list)
    radj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
        radj[d].append(s)

    seen, order = set(), []
    for start in nodes:
        if start in seen:
            continue
        stack = [(start, iter(adj[start]))]
        seen.add(start)
        while stack:
            u, it = stack[-1]
            advanced = False
            for v in it:
                if v not in seen:
                    seen.add(v)
                    stack.append((v, iter(adj[v])))
                    advanced = True
                    break
            if not advanced:
                order.append(u)
                stack.pop()

    root = {}
    for start in reversed(order):
        if start in root:
            continue
        members = []
        stack = [start]
        root[start] = start
        while stack:
            u = stack.pop()
            members.append(u)
            for v in radj[u]:
                if v not in root:
                    root[v] = start
                    stack.append(v)
        m = min(members)
        for u in members:
            root[u] = m
    return root
