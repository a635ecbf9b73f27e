"""Benchmark: prints one JSON line with the headline metric.

Flagship benchmark: the full NONHYDROSTATIC dycore step (n_split=6
acoustic-style substeps with the semi-implicit vertical Riemann solver,
tracer transport, and conservative vertical remap), float32 -- the
reference's prognostic-run configuration (`hydrostatic: false`,
`a_imp: 1.0`, test_regression.py:133-200; SURVEY 6).  Metric:
gridcell-updates/s/chip (cells x levels x substeps per wall-second)
plus SYPD at the config's CFL timestep.

Measured tunnel facts that shape the structure (round 3):
- The axon TPU tunnel compiles SERVER-side on every fresh process;
  jax's persistent compilation cache hits on the client but the first
  execution still pays the full remote compile (C12: client hit in
  1.3 s, first exec 140-190 s regardless).  A committed .jax_cache
  therefore buys nothing -- the fix is ordering + overlap, not caching.
- Remote compile time is program-pathological, not size-monotone:
  C12 x 63 takes 140-390 s (!) while C48 x 63 takes ~12 s and
  C192 x 63 ~55 s on a clean queue.  C12 is therefore NOT a viable
  "fast first rung" and is excluded.
- Killed/abandoned client processes leave their compiles RUNNING
  server-side and congest the queue for everyone after (measured:
  C48 first-exec 11.6 s on a clean queue vs 320 s mid-congestion).

Ladder (banks a value as early as possible, upgrades as budget allows):
  rung 1  C48 x 63  -- headline; ~12 s remote compile on a clean queue
  rung 2  C192 x 63 -- largest comfortable single-chip config; its
                       grid/metrics/state are built on a CPU thread
                       WHILE rung 1 waits on the remote compile
  rung 3  C384 x 63 -- the BASELINE.md north star; attempted with
                       remat only if budget remains, honest report

Every rung is wrapped so a failure/timeout preserves the best banked
value; a watchdog thread flushes the JSON at the hard budget.
"""

import json
import os
import sys
import threading
import time

HARD_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "110"))
_T0 = time.perf_counter()
_RESULT = {
    "metric": "dycore_cell_updates_per_s",
    "value": None,
    "unit": "cell-substep-updates/s/chip",
    "vs_baseline": None,
    "detail": {"stage": "startup"},
}
_DONE = threading.Event()


def _flush_and_exit():
    print(json.dumps(_RESULT), flush=True)
    os._exit(0)


def _watchdog():
    while not _DONE.wait(0.5):
        if time.perf_counter() - _T0 > HARD_BUDGET_S:
            _RESULT["detail"]["timeout"] = True
            if _RESULT["value"] is None:
                # nothing banked: the remote compile queue was
                # congested past the whole budget (r3 saw 320 s for a
                # 12 s compile).  Point at the committed steady-state
                # artifacts instead of reporting nothing.
                _RESULT["detail"]["builder_artifacts"] = (
                    "committed warm steady-state measurements: "
                    "bench_full_r5.json (full ladder: C48, C192, "
                    "C384, coupled-compiled C48 with stage "
                    "breakdown); reproduce with BENCH_BUDGET_S=1500 "
                    "python bench.py on a clean queue"
                )
            _flush_and_exit()


def _remaining():
    return HARD_BUDGET_S - (time.perf_counter() - _T0)


def _stage(name):
    _RESULT["detail"]["stage"] = name
    _RESULT["detail"][f"t_{name}"] = round(
        time.perf_counter() - _T0, 1
    )


# ~160 B of HBM traffic per cell-substep-update is the analytic lower
# bound for the acoustic substep (state reads + flux pairs + remap);
# v5e peak is ~819 GB/s.
EST_BYTES_PER_UPDATE = 160.0
V5E_HBM_GBS = 819.0


def _build_config(n, nz, jax, jnp, remat=False, dt_atmos=900.0):
    """Build (run, state, phis) for the C<n> x nz nonhydro step.

    All construction is pinned to the host CPU backend (every eager op
    on the tunneled TPU backend pays a remote round trip), then shipped
    to the TPU in one device_put.
    """
    from fv3net_tpu.dycore.hydro import (
        add_nonhydrostatic_fields,
        make_dycore_stepper,
    )
    from fv3net_tpu.grid import CubedSphereGrid
    from __graft_entry__ import _rest_state

    import numpy as np

    g = CubedSphereGrid.make(n, halo=3)
    run, m, _ = make_dycore_stepper(
        g, nz, dt_atmos=dt_atmos, k_split=1, n_split=6,
        hord=5, dtype=jnp.float32, remat=remat, donate=True,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = jax.tree_util.tree_map(
            jnp.asarray, _rest_state(g, nz, 300.0, jnp.float32)
        )
        rng = np.random.RandomState(0)
        state = state._replace(
            pt=state.pt
            + jnp.asarray(
                rng.randn(*state.pt.shape).astype(np.float32)
            )
        )
        state = add_nonhydrostatic_fields(state, 300.0)
    return run, state, np.zeros((6, n, n), np.float32)


def _measure(n, nz, run, state, phis_np, jax, jnp,
             iters_budget_s=5.0, dt_atmos=900.0, remat=False):
    """Steady-state timing with the ACTING congestion guard
    (fv3net_tpu.utils.benchtime): settle, RTT-corrected batches,
    congested windows re-run rather than banked, min-of-CLEAN-batches
    is the value, and `clean=False` results are never promoted to the
    headline (r3 lesson: the same program measured 84 ms warm vs
    566 ms right after a congested compile; r4 lesson: recording the
    spread is not enough, the guard must act)."""
    from fv3net_tpu.utils.benchtime import steady_state_timing

    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    phis = jax.device_put(jnp.asarray(phis_np), dev)
    _stage(f"compile_c{n}")
    t0 = time.perf_counter()
    box = [run(state, phis, 1)]
    box[0].delp.block_until_ready()
    compile_s = time.perf_counter() - t0
    _stage(f"probe_c{n}")

    def step():
        box[0] = run(box[0], phis, 1)

    def fetch():
        # data-dependent corner scalar (block_until_ready lies on the
        # axon tunnel); the FULL-field finiteness gate runs at the end
        _ = float(box[0].delp[0, 0, 0, 0])

    r = steady_state_timing(
        step, fetch, _remaining, target_batch_s=1.0
    )
    assert bool(jnp.isfinite(box[0].delp).all()), "state blew up"
    dt = r["step_s"]

    cells = 6 * n * n * nz
    updates_per_s = cells * 6 / dt  # k_split=1, n_split=6
    sypd = dt_atmos / dt
    achieved_gbs = updates_per_s * EST_BYTES_PER_UPDATE / 1e9
    return {
        "updates_per_s": updates_per_s,
        "step_ms": dt * 1e3,
        "batch_ms": r["batch_ms"],
        "iters_per_batch": r["iters_per_batch"],
        "fetch_rtt_ms": r["fetch_rtt_ms"],
        "congestion_spread": r["congestion_spread"],
        "clean": r["clean"],
        "gridpoints_per_s_per_chip": cells / dt,
        "simulated_years_per_day": sypd / 365.25,
        "compile_s": compile_s,
        "est_hbm_gbs": achieved_gbs,
        "est_hbm_fraction_of_819gbs": achieved_gbs / V5E_HBM_GBS,
        "config": (
            f"C{n} nz={nz} k_split=1 n_split=6 "
            f"f32 nonhydrostatic remat={remat}"
        ),
    }


def _measure_coupled(jax, jnp, n=48, nz=63, breakdown=True):
    """One FULL coupled step at C<n>: nonhydrostatic dynamics + GFS
    physics suite + radiation + dense ML postphysics (the reference's
    hot loop, SURVEY 3.1 / runtime/loop.py:656-683), via the COMPILED
    TimeLoop -- the whole step is one jitted dispatch
    (runtime/compiled_loop.py; the eager per-op path measured 2.9 s at
    C48 over the tunnel, 82% of it dispatch RTT).  Steady-state timing
    with the acting congestion guard; if budget allows, a per-substep
    breakdown from the split stage functions."""
    import numpy as np

    from fv3net_tpu import fit, wrapper
    from fv3net_tpu.data import SyntheticWaves
    from fv3net_tpu.runtime.compiled_loop import (
        CompiledTimeLoop,
        build_compiled_step,
    )
    from fv3net_tpu.utils.benchtime import steady_state_timing

    dt = 900.0
    wrapper.initialize(
        wrapper.ModelConfig(
            npx=n + 1, npz=nz, physics_suite="gfs",
            do_radiation=True, hydrostatic=False, dt_atmos=dt,
        )
    )
    try:
        # small real MLP (dQ1, dQ2 from T, q), trained one epoch on
        # synthetic waves -- on the CPU backend (training would
        # otherwise pay its own remote TPU compiles)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            batches = SyntheticWaves(
                ["air_temperature", "specific_humidity", "dQ1",
                 "dQ2"],
                n=8, nz=nz, nbatch=1, seed=0,
            ).batches()
            model = fit.train_dense_model(
                fit.DenseHyperparameters(depth=2, width=64, epochs=1),
                batches,
                input_variables=["air_temperature",
                                 "specific_humidity"],
                output_variables=["dQ1", "dQ2"],
            )
        loop = CompiledTimeLoop(wrapper, ml_model=model)
        t0 = time.perf_counter()
        loop.step()
        loop.block()
        compile_s = time.perf_counter() - t0

        r = steady_state_timing(
            loop.step, loop.block, _remaining, target_batch_s=2.0
        )
        step_s = r["step_s"]
        out = {
            "step_ms": step_s * 1e3,
            "batch_ms": r["batch_ms"],
            "fetch_rtt_ms": r["fetch_rtt_ms"],
            "congestion_spread": r["congestion_spread"],
            "clean": r["clean"],
            "simulated_years_per_day": dt / step_s / 365.25,
            "compile_s": compile_s,
            "config": (
                f"coupled C{n} nz={nz} nonhydro + GFS physics + "
                f"radiation + dense ML postphysics, single fused "
                f"dispatch"
            ),
        }
        if breakdown and _remaining() > 100.0:
            # per-substep wall clock from the split stage programs
            # (three extra remote compiles -- builder-budget runs only)
            mdl = wrapper.get_model()
            _, stages = build_compiled_step(
                mdl, model, split=True
            )
            cosz, solcon = loop._astronomy()
            tsfc = loop._tsfc
            tp = jnp.asarray(mdl.total_precip, mdl.dtype)
            st1, _ = stages["dynamics"](mdl.state, mdl.phis)
            st2, tp2, _, _ = stages["physics"](
                st1, tsfc, tp, jnp.asarray(cosz),
                jnp.asarray(solcon),
            )
            st3, _ = stages["postphysics"](st2)
            float(np.asarray(st3.pt[0, 0, 0, 0]))  # compile + settle
            bd = {}
            for name, call in (
                ("dynamics", lambda: stages["dynamics"](
                    mdl.state, mdl.phis)[0]),
                ("physics", lambda: stages["physics"](
                    st1, tsfc, tp, jnp.asarray(cosz),
                    jnp.asarray(solcon))[0]),
                ("postphysics", lambda: stages["postphysics"](
                    st2)[0]),
            ):
                o = call()
                float(np.asarray(o.pt[0, 0, 0, 0]))  # warm
                t0 = time.perf_counter()
                for _ in range(3):
                    o = call()
                float(np.asarray(o.pt[0, 0, 0, 0]))
                bd[name] = round(
                    (time.perf_counter() - t0) / 3 * 1e3, 1
                )
            out["timer_breakdown_ms"] = bd
        return out
    finally:
        wrapper.cleanup()


def _bank(result, key, headline=False):
    _RESULT["detail"][key] = dict(
        result, cell_substep_updates_per_s=result["updates_per_s"]
    )
    _RESULT["detail"][key].pop("updates_per_s")
    if headline and result.get("clean", True):
        _RESULT["value"] = result["updates_per_s"]
        _RESULT["detail"]["headline_config"] = result["config"]
    elif headline:
        # the acting congestion guard: a window with no clean
        # consensus is recorded but never promoted to the headline
        _RESULT["detail"]["headline_refused"] = (
            f"{key}: no clean batch consensus "
            f"(congestion_spread={result['congestion_spread']})"
        )


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    _RESULT["detail"] = {
        "stage": "import-done",
        "device": str(jax.devices()[0].device_kind),
        "platform": jax.devices()[0].platform,
    }
    _stage("imports")

    # Rung 2's grid/metrics/state build is ~30 s of pure host work;
    # run it on a thread so it overlaps rung 1's remote compile wait.
    c192_built = {}

    def _build_c192():
        try:
            c192_built["art"] = _build_config(
                192, 63, jax, jnp, dt_atmos=225.0
            )
        except Exception as e:
            c192_built["err"] = repr(e)[:300]

    t192 = threading.Thread(target=_build_c192, daemon=True)

    # --- rung 1: C48 x 63 -- the reference config, headline ----------
    t192_started = False
    try:
        run, state, phis = _build_config(48, 63, jax, jnp)
        _stage("build_c48")
        t192.start()
        t192_started = True
        r48 = _measure(48, 63, run, state, phis, jax, jnp)
        _bank(r48, "c48", headline=True)
        _stage("c48_done")
    except Exception as e:
        _RESULT["detail"]["c48_error"] = repr(e)[:300]
        if not t192_started:
            t192.start()

    # --- rung 2: C192 x 63 -- largest comfortable single-chip config -
    # dt scales with resolution (CFL): C192 runs 225 s.  The remote
    # compile is ~107 s (measured r5): starting it with less than
    # ~135 s of budget would die MID-COMPILE -- killing the process
    # then leaves the compile running server-side and congests the
    # queue for the next bench (r3 lesson) -- so the rung only fires
    # when it can finish, and otherwise points at the committed
    # full-ladder artifact.
    _C192_NEED_S = 135.0
    if _remaining() > _C192_NEED_S:
        t192.join(timeout=max(0.0, _remaining() - _C192_NEED_S))
        if "art" in c192_built and _remaining() > _C192_NEED_S:
            try:
                run, state, phis = c192_built["art"]
                r192 = _measure(
                    192, 63, run, state, phis, jax, jnp,
                    iters_budget_s=4.0, dt_atmos=225.0,
                )
                _bank(r192, "c192")
                _stage("c192_done")
            except Exception as e:
                _RESULT["detail"]["c192_error"] = repr(e)[:300]
        elif "err" in c192_built:
            _RESULT["detail"]["c192_error"] = c192_built["err"]
        else:
            _RESULT["detail"]["c192"] = (
                "skipped (compile ~107 s exceeds remaining budget); "
                "committed steady-state: 738.6 ms/step, 113.2M "
                "updates/s, clean (bench_full_r5.json)"
            )
    else:
        _RESULT["detail"]["c192"] = (
            "skipped (compile ~107 s exceeds remaining budget); "
            "committed steady-state: 738.6 ms/step, 113.2M updates/s, "
            "clean (bench_full_r5.json)"
        )

    # --- rung 3: coupled C48 step (dynamics+physics+radiation+ML) ----
    # a ~40 s wrapper compile chain; attempted when budget remains
    if _remaining() > 150.0:
        try:
            rc = _measure_coupled(jax, jnp, n=48, nz=63)
            _RESULT["detail"]["coupled_c48"] = rc
            _stage("coupled_done")
        except Exception as e:
            _RESULT["detail"]["coupled_c48"] = (
                "error: " + repr(e)[:300]
            )
    else:
        _RESULT["detail"]["coupled_c48"] = (
            "skipped (budget); the COMPILED TimeLoop (one dispatch "
            "per step) measures ~108 ms/step at C48 on this chip -- "
            "committed artifact bench_full_r5.json"
        )

    # --- rung 4: C384 x 63 -- the north star --------------------------
    # Runs on one chip since r4; the remote compile alone is ~360 s,
    # so inside a ~110 s driver budget the rung reports the committed
    # builder artifact instead of lying.
    if _remaining() > 480.0:
        try:
            run, state, phis = _build_config(
                384, 63, jax, jnp, dt_atmos=112.5
            )
            _stage("build_c384")
            r384 = _measure(
                384, 63, run, state, phis, jax, jnp,
                iters_budget_s=3.0, dt_atmos=112.5,
            )
            _bank(r384, "c384")
            _stage("c384_done")
        except Exception as e:
            _RESULT["detail"]["c384"] = "oom/error: " + repr(e)[:300]
    else:
        _RESULT["detail"]["c384"] = (
            "runs on one chip since r4; compile ~122 s + ~170 s host "
            "build exceeds this "
            "budget -- committed steady-state artifact "
            "bench_full_r5.json (reproduce with BENCH_BUDGET_S=1500 "
            "python bench.py)"
        )

    _DONE.set()
    _flush_and_exit()


if __name__ == "__main__":
    main()
