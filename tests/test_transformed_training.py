"""Microphysics-emulation training sub-framework tests.

Covers the physics-space transform machinery (forward/backward
inverses, Zhao-Carr classification, the conditionally-scaled factory),
the `transformed` training family (train -> dump -> load through the io
registry), and the end-to-end loop the sub-framework exists for: a
trained emulator substituted into ``apply_physics`` through
MicrophysicsHook, with moisture conservation checked
(train_microphysics.py:449, emulation/transforms/zhao_carr.py).
"""

import numpy as np
import pytest

from fv3net_tpu.emulation import transforms as tr
from fv3net_tpu.fit import load
from fv3net_tpu.fit.transformed import (
    ArchitectureConfig,
    CustomLoss,
    MicrophysicsConfig,
    TransformedParameters,
    train_transformed,
)
from fv3net_tpu.util.quantity import Quantity


def test_log_transform_inverse():
    t = tr.LogTransform(epsilon=1e-10)
    x = np.array([0.0, 1e-8, 1e-3, 1.0])
    np.testing.assert_allclose(t.backward(t.forward(x)), x, atol=1e-12)


def test_difference_roundtrip():
    d = tr.Difference(to="dT", before="T_in", after="T_out")
    x = {"T_in": np.array([1.0, 2.0]), "T_out": np.array([1.5, 1.0])}
    f = d.forward(x)
    np.testing.assert_allclose(f["dT"], [0.5, -1.0])
    back = d.backward({"T_in": x["T_in"], "dT": f["dT"]})
    np.testing.assert_allclose(back["T_out"], x["T_out"])
    assert d.backward_names({"T_out"}) == {"dT", "T_in"}


def test_conditionally_scaled_roundtrip():
    rng = np.random.RandomState(0)
    cond = rng.uniform(200, 300, size=(4000, 1))
    src = (cond - 250) * 1e-6 + rng.randn(4000, 1) * 1e-7
    t = tr.ConditionallyScaled(
        to="scaled", source="dq", condition_on="T", bins=10
    ).build({"T": cond, "dq": src})
    f = t.forward({"T": cond, "dq": src})
    # scaled variable is O(1) despite the tiny physical magnitudes
    assert 0.3 < np.abs(f["scaled"]).mean() < 3.0
    back = t.backward({"T": cond, "scaled": f["scaled"]})
    np.testing.assert_allclose(back["dq"], src, rtol=1e-5, atol=1e-12)


def test_classify_partition():
    """Every sample falls in exactly one of the four classes
    (zhao_carr.py:285-298)."""
    rng = np.random.RandomState(1)
    cloud_in = np.abs(rng.randn(500)) * 1e-4
    cloud_out = cloud_in + rng.randn(500) * 1e-5
    cloud_out[::7] = 0.0
    cloud_out[::11] = cloud_in[::11]
    classes = tr.classify(cloud_in, cloud_out, 900.0)
    total = sum(np.asarray(v, int) for v in classes.values())
    np.testing.assert_array_equal(total, 1)


def test_one_hot_and_route_reconstruction():
    rng = np.random.RandomState(2)
    n = 400
    t_in = 250 + 30 * rng.rand(n, 1)
    qv_in = 1e-3 * rng.rand(n, 1)
    cloud_in = 1e-4 * rng.rand(n, 1)
    # truth: half the samples condense, a quarter evaporate everything
    cond = 1e-5 * rng.rand(n, 1)
    cond[n // 2:] = 0.0
    qv_out = qv_in - cond
    t_out = t_in + cond * tr.LATENT_HEAT / tr.SPECIFIC_HEAT
    cloud_out = cloud_in + cond
    zero_cloud = np.arange(n) % 4 == 3
    cloud_out[zero_cloud] = 0.0

    onehot = tr.MicrophysicsClassesV1OneHot(timestep=900.0).build({})
    x = onehot.forward({
        tr.CLOUD_INPUT: cloud_in, tr.CLOUD_GSCOND: cloud_out,
    })
    assert x["gscond_classes"].shape == (n, 1, 4)

    route = tr.GscondClassesRoute(timestep=900.0)
    y = {
        tr.T_INPUT: t_in, tr.QV_INPUT: qv_in, tr.CLOUD_INPUT: cloud_in,
        tr.T_GSCOND: t_out, tr.QV_GSCOND: qv_out,
        "gscond_classes": np.asarray(x["gscond_classes"], np.float32),
    }
    back = route.backward(y)
    # zero-tendency rows freeze the state
    zt = np.asarray(
        tr.classify(cloud_in, cloud_out, 900.0)[tr.ZERO_TENDENCY]
    )[:, 0]
    np.testing.assert_allclose(
        back[tr.CLOUD_GSCOND][zt], cloud_in[zt], atol=1e-12
    )
    # zero-cloud rows evaporate the whole cloud moist-adiabatically
    zc = np.asarray(
        tr.classify(cloud_in, cloud_out, 900.0)[tr.ZERO_CLOUD]
    )[:, 0]
    if zc.any():
        np.testing.assert_allclose(back[tr.CLOUD_GSCOND][zc], 0.0)
        np.testing.assert_allclose(
            back[tr.QV_GSCOND][zc], (qv_in + cloud_in)[zc], atol=1e-12
        )


def test_cloud_limiter_conserves_moist_energy():
    lim = tr.CloudLimiter()
    y = {
        tr.CLOUD_GSCOND: np.array([-2e-4, 1e-4]),
        tr.QV_GSCOND: np.array([1e-3, 1e-3]),
        tr.T_GSCOND: np.array([250.0, 250.0]),
    }
    out = lim.backward(y)
    assert (out[tr.CLOUD_GSCOND] >= 0).all()
    # total water and moist enthalpy unchanged
    np.testing.assert_allclose(
        out[tr.CLOUD_GSCOND] + out[tr.QV_GSCOND],
        y[tr.CLOUD_GSCOND] + y[tr.QV_GSCOND],
    )
    np.testing.assert_allclose(
        tr.SPECIFIC_HEAT * out[tr.T_GSCOND]
        + tr.LATENT_HEAT * out[tr.QV_GSCOND],
        tr.SPECIFIC_HEAT * y[tr.T_GSCOND]
        + tr.LATENT_HEAT * y[tr.QV_GSCOND],
        rtol=1e-10,
    )


def _synthetic_gscond_batch(n=2048, nz=8, seed=0):
    """Columns with a known gscond-like rule the net can learn."""
    rng = np.random.RandomState(seed)
    t_in = 240 + 50 * rng.rand(n, nz)
    qv_in = 1e-3 * rng.rand(n, nz)
    cloud_in = 1e-4 * rng.rand(n, nz)
    # condensation proportional to humidity where T < 270
    cond = np.where(t_in < 270.0, 0.05 * qv_in, 0.0)
    qv_out = qv_in - cond
    t_out = t_in + cond * tr.LATENT_HEAT / tr.SPECIFIC_HEAT
    cloud_out = cloud_in + cond
    return {
        tr.T_INPUT: t_in.astype(np.float32),
        tr.QV_INPUT: qv_in.astype(np.float32),
        tr.CLOUD_INPUT: cloud_in.astype(np.float32),
        tr.T_GSCOND: t_out.astype(np.float32),
        tr.QV_GSCOND: qv_out.astype(np.float32),
        tr.CLOUD_GSCOND: cloud_out.astype(np.float32),
    }


def _train_config():
    return TransformedParameters(
        tensor_transform=[
            {"kind": "log", "source": tr.CLOUD_INPUT,
             "to": "log_cloud_input", "epsilon": 1e-10},
            {"to": "tdiff", "before": tr.T_INPUT,
             "after": tr.T_GSCOND},
            {"to": "qvdiff", "before": tr.QV_INPUT,
             "after": tr.QV_GSCOND},
        ],
        model=MicrophysicsConfig(
            input_variables=[
                tr.T_INPUT, tr.QV_INPUT, "log_cloud_input"
            ],
            direct_out_variables=["tdiff", "qvdiff"],
            architecture=ArchitectureConfig(
                name="dense", depth=2, width=64
            ),
        ),
        loss=CustomLoss(loss_variables=["tdiff", "qvdiff"]),
        epochs=50,
        batch_size=256,
        learning_rate=1e-3,
    )


def test_train_dump_load_predict(tmp_path):
    batch = _synthetic_gscond_batch()
    model = train_transformed(_train_config(), [batch])
    path = str(tmp_path / "model")
    from fv3net_tpu.fit import dump

    dump(model, path)
    loaded = load(path)
    assert type(loaded).__name__ == "TransformedPredictor"

    test = _synthetic_gscond_batch(seed=5, n=512)
    X = {
        k: Quantity(test[k], ("sample", "z"), "")
        for k in (tr.T_INPUT, tr.QV_INPUT, tr.CLOUD_INPUT)
    }
    pred = loaded.predict(X)
    assert tr.T_GSCOND in pred and tr.QV_GSCOND in pred
    # the learned condensation signal beats the no-change baseline
    err = np.abs(
        np.asarray(pred[tr.QV_GSCOND].data) - test[tr.QV_GSCOND]
    ).mean()
    baseline = np.abs(test[tr.QV_INPUT] - test[tr.QV_GSCOND]).mean()
    assert err < 0.6 * baseline
    # temperature prediction correlates with truth tendency
    dt_pred = np.asarray(pred[tr.T_GSCOND].data) - test[tr.T_INPUT]
    dt_true = test[tr.T_GSCOND] - test[tr.T_INPUT]
    corr = np.corrcoef(dt_pred.ravel(), dt_true.ravel())[0, 1]
    assert corr > 0.8


@pytest.mark.slow
def test_hook_substitution_end_to_end(tmp_path):
    """Trained emulator drives apply_physics through MicrophysicsHook:
    the run completes, stays finite, and conserves column moisture to
    the tolerance of the emulator's own error."""
    import fv3net_tpu.wrapper as W
    from fv3net_tpu.emulation.config import (
        EmulationConfig, ModelConfig as EmuModel,
    )
    from fv3net_tpu.emulation.hooks import get_hooks

    batch = _synthetic_gscond_batch()
    model = train_transformed(_train_config(), [batch])
    path = str(tmp_path / "model")
    from fv3net_tpu.fit import dump

    dump(model, path)

    W.initialize(W.ModelConfig(
        npx=7, npz=8, dt_atmos=900.0, n_split=2,
        physics_suite="gfs", do_radiation=False,
    ))
    m = W.get_model()
    m.emulation_hooks = get_hooks(
        EmulationConfig(gscond=EmuModel(path=path))
    )
    q0 = float(np.sum(
        np.asarray(m.state.q[0] + m.state.q[1]) * np.asarray(m.state.delp)
    ))
    W.step_dynamics()
    W.apply_physics()
    st = m.state
    assert bool(np.isfinite(np.asarray(st.pt)).all())
    assert bool(np.isfinite(np.asarray(st.q)).all())
    qc = np.asarray(st.q[1])
    assert (qc >= -1e-10).all()
    W.cleanup()
