"""Halo exchange correctness tests.

The decisive property: halo values are *exactly* the neighbor's interior
values (scalar), and for D-grid winds, the neighbor's edge-tangential
values on the same physical edge up to direction sign.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.grid import geometry as geo
from fv3net_tpu.grid import topology as topo
from fv3net_tpu.grid.halo import (
    halo_exchange,
    halo_exchange_dgrid,
    halo_exchange_vector_cgrid,
)


def smooth_field(xyz):
    """A smooth scalar on the sphere, asymmetric in all coordinates."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    return np.sin(3 * x) + 2 * np.cos(2 * y) * z + 0.5 * x * y * z


@pytest.mark.parametrize("n,h", [(6, 1), (12, 3)])
def test_scalar_halo_matches_neighbor_values(n, h):
    g = geo.CubedSphereGrid.make(n, halo=h)
    centers = g.centers_xyz[:, h : h + n, h : h + n]  # interior centers
    q = smooth_field(centers)
    qp = np.asarray(halo_exchange(jnp.asarray(q), h))
    assert qp.shape == (6, n + 2 * h, n + 2 * h)
    # interior passthrough
    np.testing.assert_array_equal(qp[:, h : h + n, h : h + n], q)
    # halo values equal the field evaluated at the padded centers
    # (which ARE the neighbor's cell centers), outside cube corners
    expected = smooth_field(g.centers_xyz)
    _, _, _, corner_mask = topo.halo_source_indices(n, h)
    ok = ~corner_mask
    np.testing.assert_allclose(qp[ok], expected[ok], rtol=1e-12)


def test_scalar_halo_leading_dims():
    n, h = 6, 2
    q = np.random.RandomState(0).randn(6, 5, n, n)  # [face, nz, j, i]
    qp = np.asarray(halo_exchange(jnp.asarray(q), h))
    assert qp.shape == (6, 5, n + 2 * h, n + 2 * h)
    np.testing.assert_array_equal(qp[:, :, h : h + n, h : h + n], q)


def _dgrid_from_vector_field(g, vec_fn):
    """Project a 3D vector field onto D-grid edge tangents.

    u[J,i] = V(mid) . t where t is the unit tangent from corner (J,i) to
    (J,i+1); similarly v.  Uses interior lattice only.
    """
    h, n = g.halo, g.n
    c = g.corners_xyz[:, h : h + n + 1, h : h + n + 1]

    def comp(a, b):
        mid = a + b
        mid = mid / np.linalg.norm(mid, axis=-1, keepdims=True)
        t = b - a
        # project tangent onto sphere tangent plane at mid
        t = t - np.sum(t * mid, axis=-1, keepdims=True) * mid
        t = t / np.linalg.norm(t, axis=-1, keepdims=True)
        return np.sum(vec_fn(mid) * t, axis=-1)

    u = comp(c[:, :, :-1], c[:, :, 1:])  # [6, n+1, n]
    v = comp(c[:, :-1, :], c[:, 1:, :])  # [6, n, n+1]
    return u, v


def rotational_vec(xyz):
    """Tangent field: rigid rotation about an arbitrary axis."""
    axis = np.array([0.3, -0.5, 0.81])
    return np.cross(np.broadcast_to(axis, xyz.shape), xyz)


@pytest.mark.parametrize("n,h", [(6, 1), (8, 3)])
def test_dgrid_halo_exact(n, h):
    g = geo.CubedSphereGrid.make(n, halo=h)
    u, v = _dgrid_from_vector_field(g, rotational_vec)
    up, vp = halo_exchange_dgrid(jnp.asarray(u), jnp.asarray(v), h)
    up, vp = np.asarray(up), np.asarray(vp)
    assert up.shape == (6, n + 2 * h + 1, n + 2 * h)
    assert vp.shape == (6, n + 2 * h, n + 2 * h + 1)
    # recompute expected values directly from the padded corner lattice
    c = g.corners_xyz

    def comp(a, b):
        mid = a + b
        nrm = np.linalg.norm(mid, axis=-1, keepdims=True)
        mid = mid / np.where(nrm > 0, nrm, 1.0)
        t = b - a
        t = t - np.sum(t * mid, axis=-1, keepdims=True) * mid
        tn = np.linalg.norm(t, axis=-1, keepdims=True)
        t = t / np.where(tn > 0, tn, 1.0)
        return np.sum(rotational_vec(mid) * t, axis=-1)

    u_exp = comp(c[:, :, :-1], c[:, :, 1:])
    v_exp = comp(c[:, :-1, :], c[:, 1:, :])
    ok_u = np.isfinite(u_exp)
    ok_v = np.isfinite(v_exp)
    # where the exchange produced a value (nonzero sign), it must agree
    (u_tab, u_sign), (v_tab, v_sign) = __import__(
        "fv3net_tpu.grid.halo", fromlist=["_dgrid_tables"]
    )._dgrid_tables(n, h)
    filled_u = u_sign != 0
    filled_v = v_sign != 0
    np.testing.assert_allclose(
        up[filled_u & ok_u], u_exp[filled_u & ok_u], atol=1e-12
    )
    np.testing.assert_allclose(
        vp[filled_v & ok_v], v_exp[filled_v & ok_v], atol=1e-12
    )
    # every position with well-defined geometry must have been filled
    assert (filled_u | ~ok_u).all()
    assert (filled_v | ~ok_v).all()


def test_agrid_vector_rotation_consistency():
    """A-grid exchange: halo vector, rotated back by the neighbor's rule,
    must reproduce the neighbor's stored components exactly."""
    n, h = 8, 2
    rng = np.random.RandomState(1)
    u = rng.randn(6, n, n)
    v = rng.randn(6, n, n)
    up, vp = halo_exchange_vector_cgrid(jnp.asarray(u), jnp.asarray(v), h)
    up, vp = np.asarray(up), np.asarray(vp)
    src_face, src_j, src_i, corner_mask = topo.halo_source_indices(n, h)
    from fv3net_tpu.grid.halo import _agrid_vector_tables

    m00, m01, m10, m11 = _agrid_vector_tables(n, h)
    for f in range(6):
        for J in range(n + 2 * h):
            for I in range(n + 2 * h):
                if corner_mask[f, J, I]:
                    continue
                gu = u[src_face[f, J, I], src_j[f, J, I], src_i[f, J, I]]
                gv = v[src_face[f, J, I], src_j[f, J, I], src_i[f, J, I]]
                eu = m00[f, J, I] * gu + m01[f, J, I] * gv
                ev = m10[f, J, I] * gu + m11[f, J, I] * gv
                np.testing.assert_allclose([up[f, J, I], vp[f, J, I]],
                                           [eu, ev], atol=1e-12)
