"""Native (C++) meshkit kernels vs the numpy fallbacks."""

import numpy as np
import pytest
import scipy.sparse as sp

from helmholtz_x_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_rcm_reduces_bandwidth():
    rng = np.random.default_rng(0)
    a = sp.random(400, 400, density=0.02, random_state=1)
    a = ((a + a.T) > 0).astype(float).tocsr()
    perm = native.rcm(a.indptr.astype(np.int64), a.indices.astype(np.int64))
    assert sorted(perm) == list(range(400))
    coo = a.tocoo()
    bw0 = native.bandwidth(coo.row.astype(np.int64), coo.col.astype(np.int64),
                           400, np.arange(400, dtype=np.int64))
    bw1 = native.bandwidth(coo.row.astype(np.int64), coo.col.astype(np.int64),
                           400, perm)
    assert bw1 <= bw0


def test_coo_dedup_matches_scipy():
    rng = np.random.default_rng(2)
    n, nnz = 50, 3000
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vre = rng.standard_normal(nnz)
    vim = rng.standard_normal(nnz)
    r, c, xr, xi = native.coo_dedup(n, rows, cols, vre, vim)
    ref = sp.coo_matrix((vre + 1j * vim, (rows, cols)), shape=(n, n)).tocsr()
    got = sp.coo_matrix((xr + 1j * xi, (r, c)), shape=(n, n)).tocsr()
    assert abs(ref - got).max() < 1e-12
    # sorted by (row, col)
    key = r * n + c
    assert np.all(np.diff(key) > 0)


def test_facet_adjacency_matches_python():
    from helmholtz_x_tpu.mesh import rectangle_setup

    mesh = rectangle_setup(8, 6, 1.0, 0.5)
    facets = mesh.facets
    got = native.facet_adjacency(mesh.cells, facets)
    # python fallback
    import itertools

    combos = list(itertools.combinations(range(3), 2))
    face_map = {}
    for combo in combos:
        faces = np.sort(mesh.cells[:, combo], axis=1)
        for ci, fv in enumerate(faces):
            face_map.setdefault(tuple(fv), ci)
    want = np.array([face_map[tuple(f)] for f in np.sort(facets, axis=1)])
    assert np.array_equal(got, want)
