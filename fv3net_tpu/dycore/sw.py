"""D-grid vector-invariant shallow-water solver on the cubed sphere.

The 2D core of the FV3 dynamical core (the ``d_sw`` layer of
``fv_dynamics``, reference submodule not in tree): flux-form mass
transport with the Lin-Rood PPM operators, vector-invariant momentum with
cell-centered absolute vorticity fluxed by the *same* transport operators
(Lin & Rood 1997), corner kinetic energy + geopotential gradients, and
forward-backward gravity-wave coupling.  Divergence damping stabilizes
the grid-scale mode as in FV3 (``dddmp``-style 2nd-order damping).

Discrete layout (face-local, [6, ..., j, i]):
    delp  [6, n, n]      cell mass (or fluid depth h for pure SW)
    u     [6, n+1, n]    covariant x-wind on x-directed edges (D grid)
    v     [6, n, n+1]    covariant y-wind on y-directed edges

This round-1 implementation treats the local basis as orthogonal
(contravariant == covariant); the cosa/sina metric corrections of FV3's
non-orthogonal formulation are a planned refinement and mainly affect
corner-adjacent accuracy, not conservation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GRAV
from ..grid.geometry import CubedSphereGrid
from ..grid.halo import (
    halo_exchange,
    halo_exchange_cgrid,
    halo_exchange_dgrid,
)
from ..ops.advection import fv_tp_2d


class ShallowWaterState(NamedTuple):
    delp: jax.Array  # [6, n, n] fluid depth (m) or mass
    u: jax.Array  # [6, n+1, n]
    v: jax.Array  # [6, n, n+1]


def _shx(a, k):
    return jnp.roll(a, -k, axis=-1)


def _shy(a, k):
    return jnp.roll(a, -k, axis=-2)


@dataclasses.dataclass(frozen=True)
class SWMetrics:
    """Precomputed padded metric terms for the SW step (device arrays)."""

    n: int
    halo: int
    area_px: jax.Array
    area_py: jax.Array
    rarea: jax.Array  # interior 1/area
    dx_u: jax.Array  # edge length at u positions, padded [6, N+1, N]
    dy_v: jax.Array  # edge length at v positions, padded [6, N, N+1]
    dxc_f: jax.Array  # center-center distance at x-faces [6, N, N]
    dyc_f: jax.Array  # at y-faces [6, N, N]
    dy_f: jax.Array  # x-face edge length (for mass flux) [6, N, N]
    dx_f: jax.Array  # y-face edge length [6, N, N]
    f_center: jax.Array  # Coriolis at centers, interior [6, n, n]
    f_px: jax.Array  # Coriolis padded, corner fill x [6, N, N]
    f_py: jax.Array  # corner fill y
    area_c_int: jax.Array  # dual-cell areas at interior corners [6,n+1,n+1]

    @classmethod
    def make(cls, g: CubedSphereGrid, dtype=jnp.float32) -> "SWMetrics":
        h, n = g.halo, g.n
        N = n + 2 * h
        area_int = jnp.asarray(g.area[g.interior], dtype)
        area_px = halo_exchange(area_int, h, fill="x")
        area_py = halo_exchange(area_int, h, fill="y")

        # distribute edge-lattice metrics with the C-grid machinery so
        # halo+corner values are the neighbors' true metrics.  Metric
        # lengths are positive scalars per edge; exchange |.| of the
        # signed C-grid transport.
        def pad_faces(x_int, y_int, fill):
            ux, vy = halo_exchange_cgrid(
                jnp.asarray(x_int), jnp.asarray(y_int), h, fill=fill
            )
            return jnp.abs(ux), jnp.abs(vy)

        # x-face metrics: dxc (center distance across face), dy (face
        # edge length); y-face: dyc, dx.  Each padded with the corner
        # fill matching the direction of the stencils that consume it.
        dxc_int = g.dxc[:, h : h + n, h : h + n + 1]
        dyc_int = g.dyc[:, h : h + n + 1, h : h + n]
        dyf_int = g.dy[:, h : h + n, h : h + n + 1]
        dxf_int = g.dx[:, h : h + n + 1, h : h + n]
        dxc_p, _ = pad_faces(dxc_int, dyc_int, "x")
        _, dyc_p = pad_faces(dxc_int, dyc_int, "y")
        dyf_p, _ = pad_faces(dyf_int, dxf_int, "x")
        _, dxf_p = pad_faces(dyf_int, dxf_int, "y")

        # u/v-edge lengths (dgrid positions): dx at x-edges, dy at y-edges
        dxu_int = g.dx[:, h : h + n + 1, h : h + n]
        dyv_int = g.dy[:, h : h + n, h : h + n + 1]
        dxu_p, dyv_p = halo_exchange_dgrid(
            jnp.asarray(dxu_int), jnp.asarray(dyv_int), h
        )
        dxu_p = jnp.where(jnp.abs(dxu_p) > 0, jnp.abs(dxu_p), 1.0)
        dyv_p = jnp.where(jnp.abs(dyv_p) > 0, jnp.abs(dyv_p), 1.0)

        def face_embed_x(a):
            return jnp.asarray(np.asarray(a)[:, :, :N], dtype)

        def face_embed_y(a):
            return jnp.asarray(np.asarray(a)[:, :N, :], dtype)

        fc = jnp.asarray(g.f_center[g.interior], dtype)
        return cls(
            n=n,
            halo=h,
            area_px=area_px,
            area_py=area_py,
            rarea=1.0 / area_int,
            dx_u=jnp.asarray(dxu_p, dtype),
            dy_v=jnp.asarray(dyv_p, dtype),
            dxc_f=face_embed_x(dxc_p),
            dyc_f=face_embed_y(dyc_p),
            dy_f=face_embed_x(dyf_p),
            dx_f=face_embed_y(dxf_p),
            f_center=fc,
            f_px=halo_exchange(fc, h, fill="x"),
            f_py=halo_exchange(fc, h, fill="y"),
            area_c_int=jnp.asarray(
                g.area_c[:, h : h + n + 1, h : h + n + 1], dtype
            ),
        )


def shallow_water_step(
    state: ShallowWaterState,
    m: SWMetrics,
    dt: float,
    hord: int = 5,
    d2_damp: float = 0.12,
    hs=None,
):
    """One forward-backward SW step.  Returns the new state.

    hs: optional terrain height [6, n, n] (adds to the geopotential).
    """
    h, n = m.halo, m.n
    N = n + 2 * h
    delp, u, v = state

    # --- halo exchanges ---------------------------------------------------
    up, vp = halo_exchange_dgrid(u, v, h)  # [6,N+1,N], [6,N,N+1]
    dpx = halo_exchange(delp, h, fill="x")
    dpy = halo_exchange(delp, h, fill="y")

    # --- C-face normal winds (orthogonal approximation) ------------------
    # x-face (j, I) between cells (j, I-1), (j, I): average of the four
    # adjacent u edges (rows j, j+1; spans [I-1, I] and [I, I+1]).
    # Computed on each face's own face lattice (touching only edge halos)
    # and then distributed by the C-grid exchange so halo AND cube-corner
    # values are canonical -- the property that makes shared-edge mass
    # fluxes cancel exactly (FV3 likewise halo-updates uc/vc).
    u_l = up[:, :-1, :]  # u[j, i]
    u_u = up[:, 1:, :]  # u[j+1, i]
    uc_full = 0.25 * (_shx(u_l, -1) + u_l + _shx(u_u, -1) + u_u)
    v_l = vp[:, :, :-1]
    v_u = vp[:, :, 1:]
    vc_full = 0.25 * (_shy(v_l, -1) + v_l + _shy(v_u, -1) + v_u)
    uc_int = uc_full[:, h : h + n, h : h + n + 1]  # own x-faces [6,n,n+1]
    vc_int = vc_full[:, h : h + n + 1, h : h + n]  # own y-faces [6,n+1,n]
    ucx_p, _ = halo_exchange_cgrid(uc_int, vc_int, h, fill="x")
    _, vcy_p = halo_exchange_cgrid(uc_int, vc_int, h, fill="y")
    uc = ucx_p[:, :, :N]  # face lattice embedded: entry [j, i] = face i
    vc = vcy_p[:, :N, :]

    crx = uc * dt / m.dxc_f
    cry = vc * dt / m.dyc_f
    xfx = uc * dt * m.dy_f  # geometric volume flux per unit depth
    yfx = vc * dt * m.dx_f

    # --- mass transport ---------------------------------------------------
    fx, fy = fv_tp_2d(dpx, dpy, crx, cry, xfx, yfx, m.area_px, m.area_py,
                      hord)
    div = (fx - _shx(fx, 1)) + (fy - _shy(fy, 1))
    delp_new = delp + div[:, h : h + n, h : h + n] * m.rarea

    # --- absolute vorticity (cell-centered) -------------------------------
    # circulation around each interior cell uses only the face's own
    # edges; the scalar halo exchange then provides canonical halo and
    # cube-corner values (vorticity is a scalar, so this is exact)
    udx = u * m.dx_u[:, h : h + n + 1, h : h + n]
    vdy = v * m.dy_v[:, h : h + n, h : h + n + 1]
    vort = (
        udx[:, :-1, :] - udx[:, 1:, :] + vdy[:, :, 1:] - vdy[:, :, :-1]
    )
    zeta_int = vort * m.rarea  # [6, n, n]
    omega_x = halo_exchange(zeta_int, h, fill="x") + m.f_px
    omega_y = halo_exchange(zeta_int, h, fill="y") + m.f_py

    # vorticity fluxes with displacement "mass" fluxes (advective form)
    fxo, fyo = fv_tp_2d(
        omega_x, omega_y, crx, cry, uc * dt, vc * dt, m.area_px, m.area_py,
        hord,
    )

    # --- corner kinetic energy + geopotential (forward-backward) ---------
    # corner winds: average of the two edges meeting at the corner
    ub = 0.5 * (_shx(up, -1) + up)  # [6, N+1, N]: entry I ~ corner col I
    vb = 0.5 * (_shy(vp, -1) + vp)  # [6, N, N+1]
    ke_c = 0.5 * (
        jnp.pad(ub ** 2, ((0, 0), (0, 0), (0, 1)))
        + jnp.pad(vb ** 2, ((0, 0), (0, 1), (0, 0)))
    )  # [6, N+1, N+1]; last row/col padding is never consumed

    # cube-corner vertices: three faces meet, so the B-grid stencil is
    # ill-defined and each face would compute a different value.  Use the
    # symmetric 3-edge form ke = (a^2+b^2+c^2)/3 from the three REAL
    # incident boundary-edge winds (the decomposition identity for three
    # ~120-degree unit tangents), which every face evaluates identically.
    hn = h + n
    for (cj, ci), es in (
        ((h, h), ((up, h, h), (vp, h, h), (vp, h - 1, h))),
        ((h, hn), ((up, h, hn - 1), (vp, h, hn), (vp, h - 1, hn))),
        ((hn, h), ((up, hn, h), (vp, hn - 1, h), (vp, hn, h))),
        ((hn, hn), ((up, hn, hn - 1), (vp, hn - 1, hn), (vp, hn, hn))),
    ):
        a, b, c = (arr[:, j, i] for arr, j, i in es)
        ke_c = ke_c.at[:, cj, ci].set((a * a + b * b + c * c) / 3.0)

    dp_new_p = halo_exchange(delp_new, h, fill="y")
    if hs is not None:
        dp_new_p = dp_new_p + halo_exchange(hs, h, fill="y")
    phi = GRAV * dp_new_p
    # corner average of the cell-centered geopotential
    phi_e = jnp.pad(phi, ((0, 0), (1, 1), (1, 1)), mode="edge")
    phi_c = 0.25 * (
        phi_e[:, :-1, :-1]
        + phi_e[:, :-1, 1:]
        + phi_e[:, 1:, :-1]
        + phi_e[:, 1:, 1:]
    )  # [6, N+1, N+1]
    # vertices: mean of the 3 real adjacent cells (the 4th slot is a
    # fill-dependent corner ghost that the faces would disagree on)
    for (cj, ci), cells in (
        ((h, h), ((h - 1, h), (h, h - 1), (h, h))),
        ((h, hn), ((h - 1, hn - 1), (h, hn), (h, hn - 1))),
        ((hn, h), ((hn, h), (hn - 1, h), (hn - 1, h - 1))),
        ((hn, hn), ((hn, hn - 1), (hn - 1, hn), (hn - 1, hn - 1))),
    ):
        vals = sum(phi[:, j, i] for j, i in cells) / 3.0
        phi_c = phi_c.at[:, cj, ci].set(vals)
    kphi = ke_c + phi_c

    # --- divergence damping (nondimensional corner-divergence smoother) --
    u_pad = jnp.pad(up, ((0, 0), (0, 0), (1, 1)))
    v_pad = jnp.pad(vp, ((0, 0), (1, 1), (0, 0)))
    div_b = (u_pad[:, :, 1:] - u_pad[:, :, :-1]) + (
        v_pad[:, 1:, :] - v_pad[:, :-1, :]
    )  # [6, N+1, N+1]
    # vertices: zero the damping stencil (no consistent 4-point form)
    for cj, ci in ((h, h), (h, hn), (hn, h), (hn, hn)):
        div_b = div_b.at[:, cj, ci].set(0.0)

    # --- wind updates -----------------------------------------------------
    du_grad = -(dt / m.dx_u) * (kphi[:, :, 1:] - kphi[:, :, :-1])
    dv_grad = -(dt / m.dy_v) * (kphi[:, 1:, :] - kphi[:, :-1, :])
    # fyo lives on y-faces == u positions (fyo[:, j, i] at u[j, i]);
    # fxo on x-faces == v positions
    fyo_u = jnp.pad(fyo, ((0, 0), (0, 1), (0, 0)))
    fxo_v = jnp.pad(fxo, ((0, 0), (0, 0), (0, 1)))
    u_new_p = (
        up + fyo_u + du_grad
        + d2_damp * (div_b[:, :, 1:] - div_b[:, :, :-1])
    )
    v_new_p = (
        vp - fxo_v + dv_grad
        + d2_damp * (div_b[:, 1:, :] - div_b[:, :-1, :])
    )

    u_new = u_new_p[:, h : h + n + 1, h : h + n]
    v_new = v_new_p[:, h : h + n, h : h + n + 1]
    return ShallowWaterState(delp_new, u_new, v_new)


def make_sw_stepper(g: CubedSphereGrid, dt: float, hord: int = 5,
                    d2_damp: float = 0.12, dtype=jnp.float32):
    """Build a jitted multi-substep SW stepper."""
    m = SWMetrics.make(g, dtype)

    @partial(jax.jit, static_argnames=("nsteps",))
    def run(state: ShallowWaterState, nsteps: int):
        def body(s, _):
            return shallow_water_step(s, m, dt, hord, d2_damp), None

        out, _ = jax.lax.scan(body, state, None, length=nsteps)
        return out

    return run, m
