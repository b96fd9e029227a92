"""Loss handler tests vs fp64 oracles of the reference semantics."""

import types

import numpy as np
import jax.numpy as jnp
import pytest

from swin_v2_weather_tpu.ops.losses import (
    GeometricH1Loss,
    GeometricLpLoss,
    LossHandler,
    auto_channel_weights,
)
from swin_v2_weather_tpu.ops.quadrature import quadrature_weights

CHANNEL_NAMES = ["u10m", "v10m", "t2m", "sp", "z500", "t850", "q700", "r925", "xyz"]


def test_auto_channel_weights_rules():
    w = auto_channel_weights(CHANNEL_NAMES)
    assert w[0] == w[1] == 0.1  # surface winds
    assert w[2] == 1.0  # t2m
    assert w[3] == 0.1  # sp
    assert w[4] == pytest.approx(0.5)  # z500 -> 0.001*500
    assert w[5] == pytest.approx(0.85)  # t850
    assert w[6] == pytest.approx(0.7)  # q700
    assert w[7] == pytest.approx(0.925)  # r925
    assert w[8] == 0.01  # unknown


def _params(tmp_path, loss, n_future=0, channel_weights="auto", n_out=4, dt=1):
    names = CHANNEL_NAMES[:n_out]
    stds = np.abs(np.random.default_rng(0).normal(size=(1, n_out, 1, 1))) + 0.5
    tstds = np.abs(np.random.default_rng(1).normal(size=(1, n_out, 1, 1))) + 0.25
    np.save(tmp_path / "global_stds.npy", stds)
    np.save(tmp_path / "time_diff_stds.npy", tstds)
    return types.SimpleNamespace(
        loss=loss,
        n_future=n_future,
        img_shape_x=24,
        img_shape_y=48,
        n_out_channels=n_out,
        channel_names=names,
        channel_weights=channel_weights,
        out_channels=list(range(n_out)),
        dt=dt,
        global_stds_path=str(tmp_path / "global_stds.npy"),
        time_diff_stds_path=str(tmp_path / "time_diff_stds.npy"),
        model_grid_type="equiangular",
    )


def _oracle_abs_l2(prd, tar, chw, squared):
    """fp64 oracle of GeometricLpLoss.abs (utils/losses.py:188-206)."""
    qw = quadrature_weights("naive", prd.shape[-2:], normalize=True)
    norms = np.sum(np.abs(prd - tar) ** 2 * qw, axis=(-2, -1)).reshape(prd.shape[0], -1)
    if not squared:
        norms = norms**0.5
    return np.sum(chw * norms)


def test_flagship_loss_matches_oracle(tmp_path, rng):
    params = _params(tmp_path, "weighted absolute temp-std squared geometric l2")
    handler = LossHandler(params)
    prd = rng.normal(size=(2, 4, 24, 48))
    tar = rng.normal(size=(2, 4, 24, 48))
    got = np.asarray(handler(jnp.asarray(prd, jnp.float32), jnp.asarray(tar, jnp.float32)))

    # oracle channel weights: auto, renormalized, times squared temp-std ratio
    w = auto_channel_weights(params.channel_names).reshape(1, -1, 1, 1)
    w = w / w.sum()
    stds = np.load(params.global_stds_path)
    tstds = np.sqrt(params.dt) * np.load(params.time_diff_stds_path)
    w = w * (stds / (tstds + 1e-6)) ** 2
    want = _oracle_abs_l2(prd, tar, w.reshape(1, -1), squared=True)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_relative_l2_loss(tmp_path, rng):
    params = _params(tmp_path, "l2")  # relative, not squared
    handler = LossHandler(params)
    prd = rng.normal(size=(2, 4, 24, 48))
    tar = rng.normal(size=(2, 4, 24, 48)) + 1.0
    got = np.asarray(handler(jnp.asarray(prd, jnp.float32), jnp.asarray(tar, jnp.float32)))

    qw = quadrature_weights("naive", (24, 48), normalize=True)
    diff = np.sum(np.abs(prd - tar) ** 2 * qw, axis=(-2, -1))
    tnorm = np.sum(np.abs(tar) ** 2 * qw, axis=(-2, -1))
    want = np.sum(np.ones((1, 4)) / 4.0 * np.sqrt(diff / tnorm))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_zero_prediction_error_gives_zero_absolute_loss(tmp_path, rng):
    params = _params(tmp_path, "absolute squared geometric l2")
    handler = LossHandler(params)
    x = jnp.asarray(rng.normal(size=(1, 4, 24, 48)), jnp.float32)
    assert np.asarray(handler(x, x)).item() == 0.0


def test_multistep_weighting(tmp_path, rng):
    # with n_future=1, training chw spans 2*C entries each halved
    n_out = 4
    params = _params(tmp_path, "absolute squared geometric l2", n_future=1)
    handler = LossHandler(params)
    prd = rng.normal(size=(2, 2 * n_out, 24, 48))
    tar = rng.normal(size=(2, 2 * n_out, 24, 48))
    got = np.asarray(handler(jnp.asarray(prd, jnp.float32), jnp.asarray(tar, jnp.float32), training=True))
    chw = np.full((1, 2 * n_out), (1.0 / n_out) * 0.5)
    want = _oracle_abs_l2(prd, tar, chw, squared=True)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_l1_loss_selectable(tmp_path, rng):
    params = _params(tmp_path, "absolute geometric l1")
    handler = LossHandler(params)
    assert isinstance(handler.loss_obj, GeometricLpLoss)
    assert handler.loss_obj.p == 1
    prd = rng.normal(size=(1, 4, 24, 48))
    tar = rng.normal(size=(1, 4, 24, 48))
    qw = quadrature_weights("naive", (24, 48), normalize=True)
    norms = np.sum(np.abs(prd - tar) * qw, axis=(-2, -1))
    want = np.sum(norms / 4.0)
    got = np.asarray(handler(jnp.asarray(prd, jnp.float32), jnp.asarray(tar, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_h1_loss_runs_and_penalizes_gradients(tmp_path, rng):
    params = _params(tmp_path, "absolute squared h1")
    handler = LossHandler(params)
    assert isinstance(handler.loss_obj, GeometricH1Loss)
    smooth = np.tile(np.linspace(0, 1, 48), (24, 1))[None, None] * np.ones((1, 4, 1, 1))
    rough = rng.normal(size=(1, 4, 24, 48))
    zero = jnp.zeros((1, 4, 24, 48), jnp.float32)
    l_smooth = np.asarray(handler(jnp.asarray(smooth, jnp.float32), zero)).item()
    l_rough = np.asarray(handler(jnp.asarray(rough, jnp.float32), zero)).item()
    # same-ish variance fields: the rough one has far larger H1 seminorm
    assert l_rough > l_smooth


def test_loss_is_differentiable(tmp_path, rng):
    import jax

    params = _params(tmp_path, "weighted absolute temp-std squared geometric l2")
    handler = LossHandler(params)
    tar = jnp.asarray(rng.normal(size=(1, 4, 24, 48)), jnp.float32)

    g = jax.grad(lambda p: handler(p, tar))(tar * 0.5)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
