"""Topology derivation tests.

Pins the derived edge adjacency to the FV3 mosaic encoded by the
reference's FV3_FACE_CONNECTIONS table
(external/vcm/vcm/cubedsphere/xgcm.py:6-35).
"""

import numpy as np
import pytest

from fv3net_tpu.grid import topology as topo


def test_every_edge_has_unique_neighbor():
    links = topo.edge_links()
    assert len(links) == 24
    for l in links:
        assert l.nbr_face != l.face


def test_links_are_involutive():
    for l in topo.edge_links():
        back = topo.link(l.nbr_face, l.nbr_edge)
        assert back.nbr_face == l.face
        assert back.nbr_edge == l.edge
        assert back.flip == l.flip
        # rotations must compose to identity
        assert (back.rot + l.rot) % 4 == 0


def test_matches_fv3_contact_list():
    seen = set()
    for l in topo.edge_links():
        pair = frozenset([(l.face, l.edge), (l.nbr_face, l.nbr_edge)])
        seen.add(pair)
    expected = {frozenset(c) for c in topo.KNOWN_CONTACTS}
    assert seen == expected


def test_each_face_has_four_distinct_neighbors():
    for f in range(6):
        nbrs = {topo.link(f, e).nbr_face for e in range(4)}
        assert len(nbrs) == 4
        assert f not in nbrs
        # opposite face never adjacent
        opposite = {0: 3, 1: 4, 2: 5, 3: 0, 4: 1, 5: 2}
        assert opposite[f] not in nbrs


@pytest.mark.parametrize("n,h", [(4, 1), (6, 3), (12, 3)])
def test_halo_source_indices_shapes_and_interior(n, h):
    src_face, src_j, src_i, corner_mask = topo.halo_source_indices(n, h)
    assert src_face.shape == (6, n + 2 * h, n + 2 * h)
    # interior is identity
    for f in range(6):
        assert (src_face[f, h : h + n, h : h + n] == f).all()
        jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        assert (src_j[f, h : h + n, h : h + n] == jj).all()
        assert (src_i[f, h : h + n, h : h + n] == ii).all()
    # corner regions flagged: 4 corners x h*h cells per face
    assert corner_mask.sum() == 6 * 4 * h * h


def test_halo_sources_are_boundary_cells_of_neighbors(  # depth-0 check
):
    n, h = 6, 2
    src_face, src_j, src_i, corner_mask = topo.halo_source_indices(n, h)
    for f in range(6):
        for e in range(4):
            l = topo.link(f, e)
            # first halo row beyond edge e must source from nbr_face,
            # depth-0 cells adjacent to nbr_edge
            if e == topo.EDGE_N:
                sl = np.s_[f, h + n, h : h + n]
            elif e == topo.EDGE_S:
                sl = np.s_[f, h - 1, h : h + n]
            elif e == topo.EDGE_E:
                sl = np.s_[f, h : h + n, h + n]
            else:
                sl = np.s_[f, h : h + n, h - 1]
            assert (src_face[sl] == l.nbr_face).all()
            jvals, ivals = src_j[sl], src_i[sl]
            if l.nbr_edge == topo.EDGE_W:
                assert (ivals == 0).all()
            elif l.nbr_edge == topo.EDGE_E:
                assert (ivals == n - 1).all()
            elif l.nbr_edge == topo.EDGE_S:
                assert (jvals == 0).all()
            else:
                assert (jvals == n - 1).all()
