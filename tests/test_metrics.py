"""Metrics tests: jnp implementations vs fp64 numpy oracles and reference
torch semantics (including the reference's literal 3.1416-pi constant)."""

import numpy as np
import jax.numpy as jnp

from swin_v2_weather_tpu.ops import metrics as M


def _torch_reference_rmse(pred, target):
    """fp64 oracle reproducing utils/weighted_acc_rmse.py:59-86 math."""
    num_lat = pred.shape[2]
    j = np.arange(num_lat, dtype=np.float64)
    lat = 90.0 - j * 180.0 / (num_lat - 1)
    coslat = np.cos(3.1416 / 180.0 * lat)
    weight = (num_lat * coslat / coslat.sum()).reshape(1, 1, -1, 1)
    per_chan = np.sqrt(np.mean(weight * (pred - target) ** 2, axis=(-1, -2)))
    return per_chan.mean(axis=0)


def _torch_reference_acc(pred, target):
    num_lat = pred.shape[2]
    j = np.arange(num_lat, dtype=np.float64)
    lat = 90.0 - j * 180.0 / (num_lat - 1)
    coslat = np.cos(3.1416 / 180.0 * lat)
    weight = (num_lat * coslat / coslat.sum()).reshape(1, 1, -1, 1)
    num = np.sum(weight * pred * target, axis=(-1, -2))
    den = np.sqrt(
        np.sum(weight * pred * pred, axis=(-1, -2))
        * np.sum(weight * target * target, axis=(-1, -2))
    )
    return (num / den).mean(axis=0)


def test_weighted_rmse_matches_reference_math(rng):
    pred = rng.normal(size=(3, 5, 33, 64))
    target = rng.normal(size=(3, 5, 33, 64))
    got = np.asarray(M.weighted_rmse(jnp.asarray(pred, jnp.float32), jnp.asarray(target, jnp.float32)))
    want = _torch_reference_rmse(pred, target)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_weighted_acc_matches_reference_math(rng):
    pred = rng.normal(size=(2, 4, 19, 36)) + 0.3
    target = pred + 0.05 * rng.normal(size=pred.shape)
    got = np.asarray(M.weighted_acc(jnp.asarray(pred, jnp.float32), jnp.asarray(target, jnp.float32)))
    want = _torch_reference_acc(pred, target)
    np.testing.assert_allclose(got, want, rtol=2e-5)
    assert (got > 0.9).all()  # strongly correlated fields


def test_acc_of_identical_fields_is_one(rng):
    x = jnp.asarray(rng.normal(size=(1, 2, 21, 40)), jnp.float32)
    np.testing.assert_allclose(np.asarray(M.weighted_acc(x, x)), 1.0, rtol=1e-6)


def test_rmse_of_identical_fields_is_zero(rng):
    x = jnp.asarray(rng.normal(size=(1, 2, 21, 40)), jnp.float32)
    assert np.asarray(M.weighted_rmse(x, x)).max() == 0.0


def test_rmse_constant_offset(rng):
    # constant offset d has lat-weighted RMSE exactly d (weights average to 1)
    x = jnp.asarray(rng.normal(size=(2, 3, 33, 64)), jnp.float32)
    got = np.asarray(M.weighted_rmse(x, x + 2.5))
    np.testing.assert_allclose(got, 2.5, rtol=1e-5)


def test_unweighted_acc(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 11, 22)), jnp.float32)
    got = np.asarray(M.unweighted_acc_channels(x, x))
    np.testing.assert_allclose(got, 1.0, rtol=1e-6)


def test_latitude_weights_average_to_one():
    w = np.asarray(M.latitude_weights(721))
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-6)


def test_numpy_oracles_roughly_agree_with_jax(rng):
    pred = rng.normal(size=(1, 33, 64))
    target = rng.normal(size=(1, 33, 64))
    got = M.weighted_rmse_np(pred, target)
    via_jax = np.asarray(
        M.weighted_rmse(jnp.asarray(pred[None], jnp.float32), jnp.asarray(target[None], jnp.float32))
    ).item()
    # np.pi vs 3.1416 -> tiny relative difference
    assert abs(got - via_jax) / got < 1e-4


def test_top_quantiles_error_matches_numpy_oracle(rng):
    pred = rng.normal(size=(2, 3, 16, 32))
    tar = rng.normal(size=(2, 3, 16, 32))
    got = np.asarray(
        M.top_quantiles_error(jnp.asarray(pred, jnp.float32), jnp.asarray(tar, jnp.float32))
    )
    want = M.top_quantiles_error_np(pred, tar)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_top_quantiles_error_sign(rng):
    tar = jnp.asarray(rng.normal(size=(2, 3, 16, 32)), jnp.float32)
    # predictions with inflated extremes have positive quantile error
    got = np.asarray(M.top_quantiles_error(tar * 2.0, tar))
    assert (got > 0).all()
    got_same = np.asarray(M.top_quantiles_error(tar, tar))
    np.testing.assert_allclose(got_same, 0.0, atol=1e-6)
