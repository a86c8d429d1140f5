"""Pallas kernel tests. The Gram kernel validates in interpreter mode on
CPU; the Metropolis kernel uses the TPU hardware PRNG and only runs on real
hardware (validated separately in BENCHMARKS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmc_pde_tpu.kernels.gram import multi_weight_gram, multi_weight_gram_padded


def _ref(O, W, mean=None):
    m = O.mean(0) if mean is None else mean
    Oc = O - m
    return np.stack([(Oc * W[k][:, None]).T @ Oc / O.shape[0]
                     for k in range(W.shape[0])])


def test_multi_weight_gram_matches_numpy():
    rng = np.random.default_rng(0)
    N, P, K = 1024, 512, 3
    O = rng.normal(size=(N, P)).astype(np.float32)
    W = (rng.normal(size=(K, N)).astype(np.float32)) ** 2
    G = multi_weight_gram(jnp.asarray(O), jnp.asarray(W), interpret=True)
    ref = _ref(O, W)
    np.testing.assert_allclose(np.asarray(G), ref,
                               atol=8e-6 * np.abs(ref).max())


def test_multi_weight_gram_padded():
    rng = np.random.default_rng(1)
    N, P, K = 512, 300, 2  # P not a tile multiple
    O = rng.normal(size=(N, P)).astype(np.float32)
    W = np.ones((K, N), np.float32)
    W[1] = rng.uniform(size=N)
    G = multi_weight_gram_padded(jnp.asarray(O), jnp.asarray(W),
                                 tile=256, chunk=256, interpret=True)
    assert G.shape == (K, P, P)
    ref = _ref(O, W)
    np.testing.assert_allclose(np.asarray(G), ref,
                               atol=8e-6 * np.abs(ref).max())


def test_multi_weight_gram_explicit_mean():
    rng = np.random.default_rng(2)
    N, P = 512, 256
    O = rng.normal(size=(N, P)).astype(np.float32) + 3.0
    W = np.ones((1, N), np.float32)
    mean = O.mean(0)
    G = multi_weight_gram(jnp.asarray(O), jnp.asarray(W),
                          mean=jnp.asarray(mean), chunk=256, interpret=True)
    ref = _ref(O, W, mean)
    np.testing.assert_allclose(np.asarray(G), ref,
                               atol=8e-6 * np.abs(ref).max())


def test_multi_weight_gram_shape_validation():
    O = jnp.zeros((100, 256))
    W = jnp.ones((1, 100))
    with pytest.raises(ValueError):
        multi_weight_gram(O, W, chunk=512, interpret=True)
