"""Benchmark: prints one JSON line with the headline metric.

Flagship benchmark: the full NONHYDROSTATIC dycore step (n_split=6
acoustic-style substeps with the semi-implicit vertical Riemann solver,
tracer transport, and conservative vertical remap) at C48 x 63 levels,
float32 -- the reference's prognostic-run configuration
(`hydrostatic: false`, `a_imp: 1.0`, test_regression.py:133-200;
SURVEY 6).  Metric: gridcell-updates/s/chip (cells x levels x substeps
per wall-second) plus SYPD at dt_atmos=900s.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fv3net_tpu.dycore.hydro import (
        add_nonhydrostatic_fields,
        make_dycore_stepper,
    )
    from fv3net_tpu.grid import CubedSphereGrid
    from __graft_entry__ import _rest_state

    n, nz = 48, 63
    k_split, n_split = 1, 6
    dt_atmos = 900.0
    g = CubedSphereGrid.make(n, halo=3)
    run, m, _ = make_dycore_stepper(
        g, nz, dt_atmos=dt_atmos, k_split=k_split, n_split=n_split,
        hord=5, dtype=jnp.float32,
    )
    state = _rest_state(g, nz, 300.0, jnp.float32)
    state = jax.tree_util.tree_map(jnp.asarray, state)
    # perturb so the flow is nontrivial
    key = jax.random.PRNGKey(0)
    state = state._replace(
        pt=state.pt
        + 1.0 * jax.random.normal(key, state.pt.shape, jnp.float32)
    )
    state = add_nonhydrostatic_fields(state, 300.0)
    phis = jnp.zeros((6, n, n), jnp.float32)

    t0 = time.perf_counter()
    out = run(state, phis, 1)
    out.delp.block_until_ready()
    compile_s = time.perf_counter() - t0

    iters = 20
    t0 = time.perf_counter()
    st = out
    for _ in range(iters):
        st = run(st, phis, 1)
    st.delp.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    assert bool(jnp.isfinite(st.delp).all()), "state blew up"
    cells = 6 * n * n * nz
    updates_per_s = cells * (k_split * n_split) / dt
    sypd = dt_atmos / dt / 365.25 / 86400.0 * 86400.0
    print(
        json.dumps(
            {
                "metric": "dycore_cell_updates_per_s",
                "value": updates_per_s,
                "unit": "cell-substep-updates/s/chip",
                "vs_baseline": None,
                "detail": {
                    "config": (
                        f"C{n} nz={nz} k_split={k_split} "
                        f"n_split={n_split} f32 nonhydrostatic"
                    ),
                    "step_ms": dt * 1e3,
                    "simulated_years_per_day": sypd,
                    "compile_s": compile_s,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
