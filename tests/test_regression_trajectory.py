"""Stored-trajectory regression gate for the dycore.

The analogue of the reference's prognostic-field checksum gate
(workflows/prognostic_c48_run/tests/test_regression.py:631-663): a C12
(npx=13 equivalent), npz=63, dt_atmos=900, k_split=1, n_split=6
NONHYDROSTATIC run -- the reference regression namelist
(test_regression.py:133-200) -- from a deterministic perturbed state;
after N steps the prognostic fields (u, v, pt, delp, w, delz) must match
the stored trajectory.  Any dycore change that shifts the solution fails
loudly; regenerate the data with
`python tests/test_regression_trajectory.py regen` after INTENDED
changes and say so in the commit message.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.grid import CubedSphereGrid
from fv3net_tpu.dycore.hydro import (
    add_nonhydrostatic_fields,
    make_dycore_stepper,
)

DATA = os.path.join(os.path.dirname(__file__), "data",
                    "c12_trajectory.npz")
N, NZ, DT, NSTEPS = 12, 63, 900.0, 2


def _initial_state(g):
    from fv3net_tpu.dycore.hydro import DycoreState, hybrid_coefficients
    from fv3net_tpu.constants import KAPPA, REFERENCE_SURFACE_PRESSURE

    n = g.n
    ak, bk = hybrid_coefficients(NZ, 300.0)
    pe = np.asarray(ak)[:, None, None] + np.asarray(bk)[:, None, None] * 1e5
    delp = np.broadcast_to(pe[1:] - pe[:-1], (6, NZ, n, n)).copy()
    pik = (pe / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    theta = 285.0 / (0.5 * (pik[1:] + pik[:-1]))
    pt = np.broadcast_to(theta, (6, NZ, n, n)).copy()
    rng = np.random.RandomState(0)
    pt = pt + rng.standard_normal(pt.shape)
    st = DycoreState(
        jnp.asarray(delp, jnp.float64),
        jnp.asarray(pt, jnp.float64),
        jnp.asarray(rng.standard_normal((6, NZ, n + 1, n)), jnp.float64),
        jnp.asarray(rng.standard_normal((6, NZ, n, n + 1)), jnp.float64),
        jnp.asarray(
            np.abs(rng.standard_normal((1, 6, NZ, n, n))) * 1e-3,
            jnp.float64,
        ),
    )
    return add_nonhydrostatic_fields(st, 300.0)


def _run():
    g = CubedSphereGrid.make(N, halo=3)
    run, m, _ = make_dycore_stepper(
        g, NZ, dt_atmos=DT, k_split=1, n_split=6, hord=5,
        dtype=jnp.float64,
    )
    st = _initial_state(g)
    phis = jnp.zeros((6, N, N), jnp.float64)
    out = run(st, phis, NSTEPS)
    return {
        k: np.asarray(getattr(out, k), np.float32)
        for k in ("delp", "pt", "u", "v", "q", "w", "delz")
    }


@pytest.mark.slow
def test_c12_trajectory_matches_stored():
    got = _run()
    assert os.path.exists(DATA), (
        "missing stored trajectory; run "
        "`python tests/test_regression_trajectory.py regen`"
    )
    want = np.load(DATA)
    for k in ("delp", "pt", "u", "v", "q", "w", "delz"):
        scale = np.abs(want[k]).max()
        np.testing.assert_allclose(
            got[k], want[k], rtol=2e-5, atol=2e-5 * max(scale, 1e-30),
            err_msg=f"trajectory drift in {k}",
        )
    # checksums logged for exact-environment comparison (the reference
    # records vcm.testing.checksum_dataarray per variable)
    sums = {k: float(np.float64(got[k]).sum()) for k in got.files} if \
        hasattr(got, "files") else {
            k: float(np.sum(np.float64(v))) for k, v in got.items()}
    print("checksums:", sums)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        out = _run()
        np.savez_compressed(DATA, **out)
        print("wrote", DATA, {k: v.shape for k, v in out.items()})
