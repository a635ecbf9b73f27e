"""Nonhydrostatic dycore tests: Riemann solver + full NH step.

Validation strategy mirrors the reference's port-validation pattern
(SURVEY 4.7): exact invariants (rest state, conservation) plus
consistency between the nonhydrostatic and hydrostatic branches in the
large-scale limit, since the reference's own C12 regression config runs
`hydrostatic: false` with `a_imp: 1.0`
(workflows/prognostic_c48_run/tests/test_regression.py:133-200).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.constants import GRAV, KAPPA, REFERENCE_SURFACE_PRESSURE
from fv3net_tpu.dycore.hydro import (
    DycoreState,
    add_nonhydrostatic_fields,
    hybrid_coefficients,
    make_dycore_stepper,
)
from fv3net_tpu.dycore.riemann import (
    full_pressure,
    hydrostatic_dz,
    layer_mean_pressure,
    sim1_solver,
)
from fv3net_tpu.grid import CubedSphereGrid

PTOP = 300.0


def _column_setup(nz=63, n=4):
    k = np.linspace(0, 1, nz + 1)
    pe1d = PTOP + (1e5 - PTOP) * k**1.5
    pe = jnp.asarray(
        np.broadcast_to(pe1d[None, :, None, None], (6, nz + 1, n, n)).copy()
    )
    delp = pe[:, 1:] - pe[:, :-1]
    pt = jnp.full((6, nz, n, n), 300.0)
    dz = hydrostatic_dz(delp, pt, pe)
    return delp, pt, dz, pe


def test_sim1_rest_state_is_fixed_point():
    delp, pt, dz, pe = _column_setup()
    dm = delp / GRAV
    pm = layer_mean_pressure(delp, pe)
    w = jnp.zeros_like(delp)
    ws = jnp.zeros_like(delp[:, 0])
    w2, dz2, ppe = sim1_solver(100.0, dm, pt, dz, w, pe, pm, ws)
    assert float(jnp.max(jnp.abs(w2))) < 1e-6
    assert float(jnp.max(jnp.abs(dz2 - dz) / jnp.abs(dz))) < 1e-5
    assert float(jnp.max(jnp.abs(ppe))) < 1.0  # Pa


def test_sim1_gas_law_consistency():
    delp, pt, dz, pe = _column_setup()
    pm = layer_mean_pressure(delp, pe)
    pf = full_pressure(delp / GRAV, pt, dz)
    assert float(jnp.max(jnp.abs(pf - pm) / pm)) < 1e-5


def test_sim1_stable_with_acoustically_large_dt():
    """Implicit solve: dt >> dz/c_s must not blow up, and a squeezed
    layer must relax (overpressure pushes the column back)."""
    delp, pt, dz, pe = _column_setup()
    dm = delp / GRAV
    pm = layer_mean_pressure(delp, pe)
    ws = jnp.zeros_like(delp[:, 0])
    w = jnp.zeros_like(delp)
    dzp = dz.at[:, 30].mul(0.95)  # 5% squeeze: dz/c_s ~ 1s, dt = 150s

    @jax.jit
    def step(w, dzc):
        return sim1_solver(150.0, dm, pt, dzc, w, pe, pm, ws)

    dzc = dzp
    for _ in range(30):
        w, dzc, ppe = step(w, dzc)
    assert np.isfinite(np.asarray(w)).all()
    assert float(jnp.max(jnp.abs(w))) < 5.0
    # total column height conserved
    h0 = jnp.sum(dzp, axis=1)
    h1 = jnp.sum(dzc, axis=1)
    assert float(jnp.max(jnp.abs(h1 - h0) / jnp.abs(h0))) < 1e-3


def _rest_state(n, nz, dtype=jnp.float32):
    ak, bk = hybrid_coefficients(nz, PTOP)
    pe = np.asarray(ak)[:, None, None] + np.asarray(bk)[:, None, None] * 1e5
    delp = np.broadcast_to(pe[1:] - pe[:-1], (6, nz, n, n)).copy()
    pik = (pe / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    theta = 285.0 / (0.5 * (pik[1:] + pik[:-1]))
    pt = np.broadcast_to(theta, (6, nz, n, n)).copy()
    return DycoreState(
        jnp.asarray(delp, dtype),
        jnp.asarray(pt, dtype),
        jnp.zeros((6, nz, n + 1, n), dtype),
        jnp.zeros((6, nz, n, n + 1), dtype),
    )


@pytest.mark.slow
def test_nh_dycore_rest_state():
    """Resting isothermal-ish atmosphere stays at rest (f32, 4 steps)."""
    n, nz = 12, 16
    g = CubedSphereGrid.make(n, halo=3)
    run, m, _ = make_dycore_stepper(
        g, nz, dt_atmos=900.0, k_split=1, n_split=4, dtype=jnp.float32
    )
    state = add_nonhydrostatic_fields(_rest_state(n, nz), PTOP)
    phis = jnp.zeros((6, n, n), jnp.float32)
    out = run(state, phis, 4)
    assert np.isfinite(np.asarray(out.u)).all()
    assert float(jnp.max(jnp.abs(out.u))) < 0.2
    assert float(jnp.max(jnp.abs(out.w))) < 0.05
    # delz stays hydrostatically consistent
    rel_dz = jnp.abs(out.delz - state.delz) / jnp.abs(state.delz)
    assert float(jnp.max(rel_dz)) < 0.02


@pytest.mark.slow
def test_nh_matches_hydrostatic_for_large_scale_flow():
    """For a large-scale thermal perturbation the NH and hydrostatic
    branches must track each other closely over a few steps."""
    n, nz = 12, 16
    g = CubedSphereGrid.make(n, halo=3)
    run, m, _ = make_dycore_stepper(
        g, nz, dt_atmos=900.0, k_split=1, n_split=4, dtype=jnp.float32
    )
    base = _rest_state(n, nz)
    key = jax.random.PRNGKey(0)
    # smooth (face-constant + gentle) perturbation: large horizontal scale
    pert = 2.0 * jax.random.normal(key, (6, nz, 1, 1), jnp.float32)
    state_h = base._replace(pt=base.pt + pert)
    state_n = add_nonhydrostatic_fields(state_h, PTOP)
    phis = jnp.zeros((6, n, n), jnp.float32)
    out_h = run(state_h, phis, 3)
    out_n = run(state_n, phis, 3)
    # same large-scale response
    du = float(jnp.max(jnp.abs(out_n.u - out_h.u)))
    scale = float(jnp.max(jnp.abs(out_h.u))) + 1e-9
    assert np.isfinite(np.asarray(out_n.u)).all()
    assert du < 0.35 * scale + 0.05


@pytest.mark.slow
def test_nh_mass_and_height_conservation():
    n, nz = 12, 16
    g = CubedSphereGrid.make(n, halo=3)
    run, m, _ = make_dycore_stepper(
        g, nz, dt_atmos=900.0, k_split=1, n_split=4, dtype=jnp.float32
    )
    base = _rest_state(n, nz)
    key = jax.random.PRNGKey(1)
    state = add_nonhydrostatic_fields(
        base._replace(
            pt=base.pt
            + 0.5 * jax.random.normal(key, base.pt.shape, jnp.float32)
        ),
        PTOP,
    )
    phis = jnp.zeros((6, n, n), jnp.float32)
    out = run(state, phis, 3)
    area = m.rarea ** -1
    mass0 = jnp.sum(jnp.sum(state.delp, axis=1) * area)
    mass1 = jnp.sum(jnp.sum(out.delp, axis=1) * area)
    assert abs(float(mass1 - mass0) / float(mass0)) < 1e-5
