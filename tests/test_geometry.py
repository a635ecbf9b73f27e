"""Gnomonic grid geometry tests."""

import numpy as np
import pytest

from fv3net_tpu.constants import PI, RADIUS
from fv3net_tpu.grid import geometry as geo


def test_corners_on_unit_sphere():
    c = geo.gnomonic_grid(8)
    assert c.shape == (6, 9, 9, 3)
    np.testing.assert_allclose(np.linalg.norm(c, axis=-1), 1.0, atol=1e-14)


def test_shared_edges_coincide():
    """Corner points on shared face edges must be identical 3D points."""
    from fv3net_tpu.grid import topology as topo

    n = 8
    c = geo.gnomonic_grid(n)
    for l in topo.edge_links():
        def edge_pts(face, edge):
            if edge == topo.EDGE_W:
                return c[face, :, 0]
            if edge == topo.EDGE_E:
                return c[face, :, n]
            if edge == topo.EDGE_S:
                return c[face, 0, :]
            return c[face, n, :]

        a = edge_pts(l.face, l.edge)
        b = edge_pts(l.nbr_face, l.nbr_edge)
        if l.flip:
            b = b[::-1]
        np.testing.assert_allclose(a, b, atol=1e-14)


def test_total_area_is_sphere_area():
    g = geo.CubedSphereGrid.make(12, halo=3)
    total = g.area[g.interior].sum()
    np.testing.assert_allclose(total, 4 * PI * RADIUS ** 2, rtol=1e-10)


def test_extended_corners_match_neighbor_interior():
    """Halo corner points are the neighbor's actual grid points."""
    n, h = 6, 3
    ext = geo.extended_corners(n, h)
    base = geo.gnomonic_grid(n)
    # all finite halo points must appear in some face's corner lattice
    flat = base.reshape(-1, 3)
    for f in range(6):
        pts = ext[f].reshape(-1, 3)
        pts = pts[np.isfinite(pts).all(axis=1)]
        d = np.linalg.norm(pts[:, None, :] - flat[None, :, :], axis=-1)
        assert d.min(axis=1).max() < 1e-12


def test_halo_metrics_match_neighbor_interior_metrics():
    """dx/dy/area in the halo equal the neighbor's interior values."""
    n, h = 6, 2
    g = geo.CubedSphereGrid.make(n, halo=h)
    from fv3net_tpu.grid import topology as topo

    src_face, src_j, src_i, corner_mask = topo.halo_source_indices(n, h)
    area_int = g.area[:, h : h + n, h : h + n]
    for f in range(6):
        for J in range(n + 2 * h):
            for I in range(n + 2 * h):
                if corner_mask[f, J, I]:
                    continue
                expected = area_int[src_face[f, J, I], src_j[f, J, I],
                                    src_i[f, J, I]]
                np.testing.assert_allclose(g.area[f, J, I], expected,
                                           rtol=1e-12)


def test_dx_dy_positive_and_reasonable():
    n = 12
    g = geo.CubedSphereGrid.make(n, halo=3)
    # typical cell size at C12: ~ (pi/2 * R / 12)
    typical = (PI / 2) * RADIUS / n
    h = g.halo
    dx_int = g.dx[:, h : h + n + 1, h : h + n]
    dy_int = g.dy[:, h : h + n, h : h + n + 1]
    assert (dx_int > 0.3 * typical).all()
    assert (dx_int < 2.0 * typical).all()
    assert (dy_int > 0.3 * typical).all()
    assert (dy_int < 2.0 * typical).all()


def test_lonlat_roundtrip():
    lon = np.array([0.1, 1.0, 3.0, 6.0])
    lat = np.array([-1.2, -0.3, 0.4, 1.3])
    xyz = geo.xyz_from_lonlat(lon, lat)
    lon2, lat2 = geo.lonlat_from_xyz(xyz)
    np.testing.assert_allclose(lon2, lon, atol=1e-12)
    np.testing.assert_allclose(lat2, lat, atol=1e-12)


def test_polar_faces_contain_poles():
    g = geo.CubedSphereGrid.make(8, halo=1)
    h, n = g.halo, g.n
    # face 2 is the north-polar cap, face 5 south (0-based)
    assert g.lat[2, h : h + n, h : h + n].max() > 1.2
    assert g.lat[5, h : h + n, h : h + n].min() < -1.2
