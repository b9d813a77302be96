"""Distributed connected components (large-star/small-star) vs union-find."""

import numpy as np
import pandas as pd
import pytest


def _uf_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run_cc(edges, ray_session, **kw):
    import ray.data

    from plateau_gis_converter_ray.stages.graph import connected_components

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_a": [a for a, _ in edges],
                      "doc_b": [b for _, b in edges]})
    )
    got = (
        connected_components(ds, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return {int(r.doc_id): int(r.comp) for r in got.itertuples()}


@pytest.mark.parametrize(
    "name,edges",
    [
        ("path", [(i, i + 1) for i in range(200)]),  # diameter stress
        ("star", [(0, i) for i in range(1, 60)]),
        ("two_cliques", [(a, b) for a in range(5) for b in range(a + 1, 5)]
         + [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]),
        ("self_loops_and_dups", [(1, 1), (2, 3), (3, 2), (2, 3), (7, 7)]),
    ],
)
def test_cc_matches_union_find(name, edges, ray_session):
    real = [(a, b) for a, b in edges if a != b]
    want = _uf_components(real)
    got = _run_cc(edges, ray_session)
    assert got == want, name


def test_cc_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(7)
    # sparse random graph: many small components + a few chains
    a = rng.integers(0, 400, size=250)
    b = rng.integers(0, 400, size=250)
    edges = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    want = _uf_components(edges)
    got = _run_cc(edges, ray_session)
    assert got == want


@pytest.mark.parametrize(
    "name,edges",
    [
        ("path", [(i, i + 1) for i in range(200)]),  # diameter stress
        ("two_cliques", [(a, b) for a in range(5) for b in range(a + 1, 5)]
         + [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]),
    ],
)
def test_cc_distributed_star_rounds(name, edges, ray_session):
    # local_max_edges=0 forces the large-star/small-star path — keeps the
    # 100 TB route exercised now that small graphs finish on the driver
    want = _uf_components(edges)
    got = _run_cc(edges, ray_session, local_max_edges=0)
    assert got == want, name


def test_cc_local_equals_distributed(ray_session):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 150, size=120)
    b = rng.integers(0, 150, size=120)
    edges = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    assert _run_cc(edges, ray_session) == _run_cc(
        edges, ray_session, local_max_edges=0
    )
