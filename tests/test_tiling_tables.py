"""Tiled (face, y, x) exchange plans vs face-level exchanges.

Contract under test (parallel/tiling.py): for every exchange type, the
tiled output on device (face g, tile b, c) equals the face-level padded
output sliced to that tile's window, BIT-FOR-BIT (the forward pass is
pure copies).  Uses the numpy reference executor so failures localize
to tables, not shard_map mechanics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fv3net_tpu.grid.halo import (
    average_dgrid_boundary,
    canonicalize_cgrid_boundary,
    halo_exchange,
    halo_exchange_cgrid,
    halo_exchange_dgrid,
)
from fv3net_tpu.parallel.tiling import (
    TileLayout,
    apply_plan_numpy,
    avg_dgrid_plans,
    canon_cgrid_plans,
    cgrid_halo_plans,
    dgrid_halo_plans,
    scalar_halo_plan,
)

N_, H_ = 12, 3


def _layouts():
    return [
        TileLayout(N_, H_, F=6, Y=2, X=2),  # 24 devices, 1 face each
        TileLayout(N_, H_, F=2, Y=2, X=2),  # 8 devices, 3 faces each
        TileLayout(N_, H_, F=6, Y=1, X=1),  # face-only degenerate
    ]


def _scalar_pools(lay, q):
    nl = lay.nl
    pools = np.zeros((lay.D, lay.L * nl * nl), q.dtype)
    for g in range(6):
        for b in range(lay.Y):
            for c in range(lay.X):
                d = lay.device_of(g, b, c)
                blk = q[g, b * nl : (b + 1) * nl, c * nl : (c + 1) * nl]
                s = g % lay.L
                pools[d, s * nl * nl : (s + 1) * nl * nl] = blk.ravel()
    return pools


def _uv_pools(lay, u, v, u_rows_plus, v_cols_plus):
    """Stored staggered tiles: u [nl+1, nl] (redundant top row),
    v [nl, nl+1] (redundant right col) -- or the C-grid transpose."""
    nl = lay.nl
    pools = []
    for d in range(lay.D):
        pools.append([])
    for g in range(6):
        for b in range(lay.Y):
            for c in range(lay.X):
                d = lay.device_of(g, b, c)
                if u_rows_plus:
                    ublk = u[g, b * nl : b * nl + nl + 1,
                             c * nl : (c + 1) * nl]
                    vblk = v[g, b * nl : (b + 1) * nl,
                             c * nl : c * nl + nl + 1]
                else:  # C-grid: uc [nl, nl+1], vc [nl+1, nl]
                    ublk = u[g, b * nl : (b + 1) * nl,
                             c * nl : c * nl + nl + 1]
                    vblk = v[g, b * nl : b * nl + nl + 1,
                             c * nl : (c + 1) * nl]
                pools[d].append((g % lay.L, ublk.ravel(), vblk.ravel()))
    out = []
    for d in range(lay.D):
        parts = [None] * lay.L
        for s, ub_, vb_ in pools[d]:
            parts[s] = np.concatenate([ub_, vb_])
        out.append(np.concatenate(parts))
    return np.stack(out)


def _check_tiles(lay, out, ref, rows_plus=0, cols_plus=0):
    """out: [D, L, tj, ti]; ref: [6, fj, fi] face-level padded."""
    nl, h = lay.nl, lay.h
    for g in range(6):
        for b in range(lay.Y):
            for c in range(lay.X):
                d = lay.device_of(g, b, c)
                s = g % lay.L
                win = ref[
                    g,
                    b * nl : b * nl + nl + 2 * h + rows_plus,
                    c * nl : c * nl + nl + 2 * h + cols_plus,
                ]
                np.testing.assert_array_equal(
                    out[d, s], win,
                    err_msg=f"face {g} tile ({b},{c})",
                )


@pytest.mark.parametrize("fill", ["none", "x", "y"])
@pytest.mark.parametrize("lay", _layouts(), ids=lambda l: f"F{l.F}Y{l.Y}")
def test_scalar_halo_matches_face_level(lay, fill):
    rng = np.random.RandomState(0)
    q = rng.randn(6, N_, N_).astype(np.float64)
    ref = np.asarray(halo_exchange(jnp.asarray(q), H_, fill=fill))
    plan = scalar_halo_plan(lay, fill)
    out = apply_plan_numpy(plan, _scalar_pools(lay, q))
    _check_tiles(lay, out, ref)


@pytest.mark.parametrize("lay", _layouts(), ids=lambda l: f"F{l.F}Y{l.Y}")
def test_dgrid_halo_matches_face_level(lay):
    rng = np.random.RandomState(1)
    u = rng.randn(6, N_ + 1, N_)
    v = rng.randn(6, N_, N_ + 1)
    # stored boundary values must be single-valued across faces for a
    # meaningful bit-exact comparison
    uj, vj = average_dgrid_boundary(jnp.asarray(u), jnp.asarray(v))
    u, v = np.asarray(uj), np.asarray(vj)
    ru, rv = halo_exchange_dgrid(jnp.asarray(u), jnp.asarray(v), H_)
    pu, pv = dgrid_halo_plans(lay)
    pools = _uv_pools(lay, u, v, 1, 1)
    _check_tiles(lay, apply_plan_numpy(pu, pools), np.asarray(ru),
                 rows_plus=1)
    _check_tiles(lay, apply_plan_numpy(pv, pools), np.asarray(rv),
                 cols_plus=1)


@pytest.mark.parametrize("fill", ["x", "y"])
@pytest.mark.parametrize("lay", _layouts(), ids=lambda l: f"F{l.F}Y{l.Y}")
def test_cgrid_halo_matches_face_level(lay, fill):
    rng = np.random.RandomState(2)
    uc = rng.randn(6, N_, N_ + 1)
    vc = rng.randn(6, N_ + 1, N_)
    ucj, vcj = canonicalize_cgrid_boundary(
        jnp.asarray(uc), jnp.asarray(vc)
    )
    uc, vc = np.asarray(ucj), np.asarray(vcj)
    ru, rv = halo_exchange_cgrid(
        jnp.asarray(uc), jnp.asarray(vc), H_, fill=fill
    )
    pu, pv = cgrid_halo_plans(lay, fill)
    pools = _uv_pools(lay, uc, vc, 0, 0)
    N = N_ + 2 * H_
    ru = np.asarray(ru)
    rv = np.asarray(rv)
    _check_tiles(lay, apply_plan_numpy(pu, pools), ru, cols_plus=1)
    _check_tiles(lay, apply_plan_numpy(pv, pools), rv, rows_plus=1)


@pytest.mark.parametrize("lay", _layouts(), ids=lambda l: f"F{l.F}Y{l.Y}")
def test_canonicalize_matches_face_level(lay):
    rng = np.random.RandomState(3)
    uc = rng.randn(6, N_, N_ + 1)
    vc = rng.randn(6, N_ + 1, N_)
    ru, rv = canonicalize_cgrid_boundary(jnp.asarray(uc),
                                         jnp.asarray(vc))
    pu, pv = canon_cgrid_plans(lay)
    pools = _uv_pools(lay, uc, vc, 0, 0)
    nl = lay.nl
    out_u = apply_plan_numpy(pu, pools)
    out_v = apply_plan_numpy(pv, pools)
    ru, rv = np.asarray(ru), np.asarray(rv)
    for g in range(6):
        for b in range(lay.Y):
            for c in range(lay.X):
                d = lay.device_of(g, b, c)
                s = g % lay.L
                np.testing.assert_allclose(
                    out_u[d, s],
                    ru[g, b * nl : (b + 1) * nl,
                       c * nl : c * nl + nl + 1],
                    rtol=0, atol=1e-15,
                )
                np.testing.assert_allclose(
                    out_v[d, s],
                    rv[g, b * nl : b * nl + nl + 1,
                       c * nl : (c + 1) * nl],
                    rtol=0, atol=1e-15,
                )


@pytest.mark.parametrize("lay", _layouts(), ids=lambda l: f"F{l.F}Y{l.Y}")
def test_average_dgrid_matches_face_level(lay):
    rng = np.random.RandomState(4)
    u = rng.randn(6, N_ + 1, N_)
    v = rng.randn(6, N_, N_ + 1)
    ru, rv = average_dgrid_boundary(jnp.asarray(u), jnp.asarray(v))
    (u_own, u_part), (v_own, v_part) = avg_dgrid_plans(lay)
    pools = _uv_pools(lay, u, v, 1, 1)
    out_u = apply_plan_numpy(u_own, pools) + apply_plan_numpy(
        u_part, pools
    )
    out_v = apply_plan_numpy(v_own, pools) + apply_plan_numpy(
        v_part, pools
    )
    ru, rv = np.asarray(ru), np.asarray(rv)
    nl = lay.nl
    for g in range(6):
        for b in range(lay.Y):
            for c in range(lay.X):
                d = lay.device_of(g, b, c)
                s = g % lay.L
                np.testing.assert_allclose(
                    out_u[d, s],
                    ru[g, b * nl : b * nl + nl + 1,
                       c * nl : (c + 1) * nl],
                    rtol=0, atol=1e-15,
                )
                np.testing.assert_allclose(
                    out_v[d, s],
                    rv[g, b * nl : (b + 1) * nl,
                       c * nl : c * nl + nl + 1],
                    rtol=0, atol=1e-15,
                )
