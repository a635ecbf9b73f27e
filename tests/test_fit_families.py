"""Tests for the convolutional / precipitative / reservoir / generative
model families (fv3fit parity: convolutional.py:101,
precipitative.py:162, reservoir/, pytorch/cyclegan/)."""

import numpy as np
import pytest

import fv3net_tpu.fit as fit
from fv3net_tpu.constants import GRAV
from fv3net_tpu.data import SyntheticWaves
from fv3net_tpu.util.quantity import Quantity


N, NZ = 8, 4


def _cube_batch(seed=0, n=N, nz=NZ):
    rng = np.random.RandomState(seed)
    a = rng.randn(6, nz, n, n).astype(np.float32)
    return {
        "a_in": Quantity(a, ("tile", "z", "y", "x"), ""),
        "b_out": Quantity(
            2.0 * a + 0.1 * rng.randn(6, nz, n, n).astype(np.float32),
            ("tile", "z", "y", "x"), "",
        ),
    }


# -------------------------------------------------------------- conv


def test_append_halos_matches_halo_exchange():
    import jax.numpy as jnp

    from fv3net_tpu.fit import append_halos
    from fv3net_tpu.grid.halo import halo_exchange

    rng = np.random.RandomState(0)
    f = rng.randn(6, N, N, 3).astype(np.float32)
    out = np.asarray(append_halos(jnp.asarray(f), 2))
    assert out.shape == (6, N + 4, N + 4, 3)
    ref = np.asarray(
        halo_exchange(jnp.asarray(np.moveaxis(f, -1, 1)), 2)
    )
    np.testing.assert_array_equal(out, np.moveaxis(ref, 1, -1))


def test_convolutional_train_predict_roundtrip(tmp_path):
    batches = [_cube_batch(s) for s in range(2)]
    model = fit.train_convolutional_model(
        fit.ConvolutionalHyperparameters(
            filters=8, depth=2, epochs=300, learning_rate=3e-3
        ),
        batches,
        input_variables=["a_in"],
        output_variables=["b_out"],
    )
    pred = model.predict(batches[0])
    assert pred["b_out"].shape == (6, NZ, N, N)
    # local linear map is learnable
    err = np.abs(
        pred["b_out"].values - batches[0]["b_out"].values
    ).mean()
    scale = np.abs(batches[0]["b_out"].values).mean()
    assert err < 0.5 * scale
    fit.dump(model, str(tmp_path / "conv"))
    loaded = fit.load(str(tmp_path / "conv"))
    np.testing.assert_allclose(
        loaded.predict(batches[0])["b_out"].values,
        pred["b_out"].values, rtol=1e-5, atol=1e-5,
    )


# ----------------------------------------------------- precipitative


def _precip_batch(seed=0):
    rng = np.random.RandomState(seed)
    t = 250 + 30 * rng.rand(6, NZ, N, N).astype(np.float32)
    q = 1e-3 * rng.rand(6, NZ, N, N).astype(np.float32)
    delp = np.full((6, NZ, N, N), 1e4, np.float32)
    dq2 = -1e-7 * rng.rand(6, NZ, N, N).astype(np.float32)
    dq1 = 1e-5 * rng.randn(6, NZ, N, N).astype(np.float32)
    precip = np.maximum(-(dq2 * delp).sum(axis=1) / GRAV, 0.0)
    dims3, dims2 = ("tile", "z", "y", "x"), ("tile", "y", "x")
    return {
        "air_temperature": Quantity(t, dims3, "K"),
        "specific_humidity": Quantity(q, dims3, ""),
        "pressure_thickness_of_atmospheric_layer": Quantity(
            delp, dims3, "Pa"),
        "dQ1": Quantity(dq1, dims3, "K/s"),
        "dQ2": Quantity(dq2, dims3, "kg/kg/s"),
        "total_precipitation_rate": Quantity(
            precip.astype(np.float32), dims2, "kg/m**2/s"),
    }


def test_precipitative_budget_closure_and_roundtrip(tmp_path):
    batches = [_precip_batch(s) for s in range(2)]
    model = fit.train_precipitative_model(
        fit.PrecipitativeHyperparameters(depth=2, width=32, epochs=5),
        batches,
        input_variables=[
            "air_temperature", "specific_humidity",
            "pressure_thickness_of_atmospheric_layer",
        ],
        output_variables=["dQ1", "dQ2", "total_precipitation_rate"],
    )
    pred = model.predict(batches[0])
    assert set(pred) == {"dQ1", "dQ2", "total_precipitation_rate"}
    assert (pred["total_precipitation_rate"].values >= 0).all()
    fit.dump(model, str(tmp_path / "precip"))
    loaded = fit.load(str(tmp_path / "precip"))
    np.testing.assert_allclose(
        loaded.predict(batches[0])["dQ1"].values,
        pred["dQ1"].values, rtol=1e-5, atol=1e-7,
    )


# --------------------------------------------------------- reservoir


def test_rank_divider_roundtrip():
    d = fit.RankDivider((2, 2), N, N, overlap=0)
    rng = np.random.RandomState(0)
    f = rng.randn(6, 3, N, N).astype(np.float32)
    subs = d.subdomains_with_overlap(f)
    assert subs.shape == (4, 6, 3, (N // 2) ** 2)
    merged = d.merge_subdomains(subs)
    np.testing.assert_array_equal(merged, f)


def test_rank_divider_overlap_shapes():
    d = fit.RankDivider((2, 2), N, N, overlap=1)
    f = np.zeros((6, N, N), np.float32)
    subs = d.subdomains_with_overlap(f)
    assert subs.shape == (4, 6, (N // 2 + 2) ** 2)


def test_reservoir_trains_on_predictable_series(tmp_path):
    # slowly rotating wave: next step predictable from current
    T = 40
    t_grid = np.arange(T)
    yy, xx = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    series = []
    for t in t_grid:
        f = np.sin(
            2 * np.pi * (xx[None] + 0.5 * t) / N
        ) * np.ones((6, 1, 1))
        series.append(
            {"f": Quantity(f.astype(np.float32),
                           ("tile", "y", "x"), "")}
        )
    hp = fit.ReservoirHyperparameters(
        state_size=128, burn_in=5, subdomain_layout=(2, 2), overlap=1,
        seed=0,
    )
    model = fit.train_reservoir_model(
        hp, series, input_variables=["f"], output_variables=["f"],
    )
    # synchronize on the series then predict the next step
    model.synchronize(series[:-2])
    pred = model.predict(series[-2])
    truth = series[-1]["f"].values
    err = np.abs(pred["f"].values - truth).mean()
    assert err < 0.3, err
    fit.dump(model, str(tmp_path / "resv"))
    loaded = fit.load(str(tmp_path / "resv"))
    loaded.synchronize(series[:-2])
    pred2 = loaded.predict(series[-2])
    np.testing.assert_allclose(
        pred2["f"].values, pred["f"].values, rtol=1e-4, atol=1e-5
    )


# -------------------------------------------------------- generative


def test_autoencoder_reconstructs(tmp_path):
    batches = [_cube_batch(s) for s in range(2)]
    model = fit.train_autoencoder(
        fit.AutoencoderHyperparameters(
            filters=8, depth=1, latent=16, epochs=100
        ),
        batches,
        input_variables=["a_in"],
    )
    pred = model.predict(batches[0])
    assert pred["a_in"].shape == (6, NZ, N, N)
    z = model.encode(batches[0])
    assert z.shape[0] == 6 and z.shape[-1] == 16
    fit.dump(model, str(tmp_path / "ae"))
    loaded = fit.load(str(tmp_path / "ae"))
    np.testing.assert_allclose(
        loaded.predict(batches[0])["a_in"].values,
        pred["a_in"].values, rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow
def test_cyclegan_trains_and_roundtrips(tmp_path):
    rng = np.random.RandomState(0)
    batches = []
    for s in range(2):
        a = rng.randn(6, 2, N, N).astype(np.float32)
        batches.append({
            "coarse": Quantity(a, ("tile", "z", "y", "x"), ""),
            "fine": Quantity(
                a + 1.0, ("tile", "z", "y", "x"), ""),
        })
    model = fit.train_cyclegan(
        fit.CycleGANHyperparameters(filters=8, n_res=1, epochs=5),
        batches,
        input_variables=["coarse"],
        output_variables=["fine"],
    )
    pred = model.predict(batches[0])
    assert pred["fine"].shape == (6, 2, N, N)
    assert np.isfinite(pred["fine"].values).all()
    fit.dump(model, str(tmp_path / "cgan"))
    loaded = fit.load(str(tmp_path / "cgan"))
    np.testing.assert_allclose(
        loaded.predict(batches[0])["fine"].values,
        pred["fine"].values, rtol=1e-5, atol=1e-5,
    )


# -------------------------------------------------------------- graph


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["mpg", "unet"])
def test_graph_train_predict_roundtrip(tmp_path, arch):
    batches = [_cube_batch(s) for s in range(2)]
    model = fit.train_graph_model(
        fit.GraphHyperparameters(
            architecture=arch, width=8, depth=2, epochs=150,
            learning_rate=3e-3,
        ),
        batches,
        input_variables=["a_in"],
        output_variables=["b_out"],
    )
    pred = model.predict(batches[0])
    assert pred["b_out"].shape == (6, NZ, N, N)
    truth = batches[0]["b_out"].values
    base = np.mean((truth - truth.mean()) ** 2)
    mse = np.mean((pred["b_out"].values - truth) ** 2)
    assert mse < 0.6 * base, f"{arch} did not learn: {mse} vs {base}"
    # io registry round trip
    path = str(tmp_path / f"graph_{arch}")
    fit.dump(model, path)
    loaded = fit.load(path)
    again = loaded.predict(batches[0])
    np.testing.assert_allclose(
        again["b_out"].values, pred["b_out"].values, rtol=1e-5,
        atol=1e-5,
    )


def test_graph_message_passing_sees_neighbors():
    """A graph model CAN represent neighbor-dependent targets a
    pointwise map cannot: shifted-field prediction improves on the
    climatological baseline."""
    rng = np.random.RandomState(3)
    a = rng.randn(6, 1, N, N).astype(np.float32)
    import jax.numpy as jnp

    from fv3net_tpu.grid.halo import halo_exchange

    padded = np.asarray(halo_exchange(jnp.asarray(a), 1))
    shifted = padded[:, :, 2:, 1:-1]  # north neighbor
    batch = {
        "a_in": Quantity(a, ("tile", "z", "y", "x"), ""),
        "b_out": Quantity(shifted, ("tile", "z", "y", "x"), ""),
    }
    model = fit.train_graph_model(
        fit.GraphHyperparameters(width=16, depth=1, epochs=400,
                                 learning_rate=5e-3),
        [batch],
        input_variables=["a_in"],
        output_variables=["b_out"],
    )
    pred = model.predict(batch)["b_out"].values
    mse = np.mean((pred - shifted) ** 2)
    assert mse < 0.35 * np.var(shifted)


# ---------------------------------------------------------------- fmr


def _time_series(T=12, seed=0):
    """Forced linear dynamics: s_{t+1} = 0.9 s_t + 0.5 f_t."""
    rng = np.random.RandomState(seed)
    f = rng.randn(T, 6, 2, N, N).astype(np.float32)
    s = np.zeros((T, 6, 2, N, N), np.float32)
    for t in range(T - 1):
        s[t + 1] = 0.9 * s[t] + 0.5 * f[t]
    batches = []
    for t in range(T):
        batches.append({
            "forcing": Quantity(f[t], ("tile", "z", "y", "x"), ""),
            "state": Quantity(s[t], ("tile", "z", "y", "x"), ""),
        })
    return batches, f, s


@pytest.mark.slow
def test_fmr_learns_forced_linear_dynamics(tmp_path):
    batches, f, s = _time_series()
    model = fit.train_fmr_model(
        fit.FMRHyperparameters(hidden=32, epochs=500,
                               learning_rate=3e-3),
        batches,
        input_variables=["forcing"],
        output_variables=["state"],
    )
    pred = model.predict(batches[3])
    assert pred["state"].shape == (6, 2, N, N)
    err = np.mean((pred["state"].values - s[4]) ** 2)
    assert err < 0.5 * np.var(s[4]) + 1e-3

    path = str(tmp_path / "fmr")
    fit.dump(model, path)
    loaded = fit.load(path)
    np.testing.assert_allclose(
        loaded.predict(batches[3])["state"].values,
        pred["state"].values, rtol=1e-5, atol=1e-5,
    )


def test_fmr_rollout_shape():
    batches, f, s = _time_series(T=6)
    model = fit.train_fmr_model(
        fit.FMRHyperparameters(hidden=16, epochs=50),
        batches,
        input_variables=["forcing"],
        output_variables=["state"],
    )
    cols = 6 * N * N
    s0 = s[0].transpose(0, 2, 3, 1).reshape(cols, 2)
    ff = f.transpose(0, 1, 3, 4, 2).reshape(6, cols, 2)
    traj = model.predict_rollout(s0, ff)
    assert traj.shape == (6, cols, 2)
    assert np.isfinite(traj).all()
