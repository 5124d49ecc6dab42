"""SpMM correctness: vs dense matmul, gradients, and empty rows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chromegcn_tpu.ops import sparse as cgs
from chromegcn_tpu.ops.spmm import sddmm, spmm, spmm_xla


def _random_graph(n, density, seed=0, n_valid=None):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, n)) < density).astype(np.float32)
    dense *= rng.random((n, n)).astype(np.float32)
    if n_valid is not None:
        dense[n_valid:, :] = 0
        dense[:, n_valid:] = 0
    return cgs.from_dense(dense, n_valid=n_valid), dense


@pytest.mark.parametrize("n,d", [(32, 16), (100, 128)])
def test_spmm_matches_dense(n, d):
    g, dense = _random_graph(n, 0.1)
    x = np.random.default_rng(1).normal(size=(n, d)).astype(np.float32)
    out = np.asarray(spmm(g, jnp.asarray(x), impl="xla"))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-5, atol=1e-5)


def test_spmm_empty_rows():
    dense = np.zeros((16, 16), dtype=np.float32)
    dense[2, 5] = 1.0
    g = cgs.from_dense(dense)
    x = np.ones((16, 4), dtype=np.float32)
    out = np.asarray(spmm_xla(g, jnp.asarray(x)))
    assert out[2, 0] == 1.0
    assert np.all(out[[0, 1] + list(range(3, 16))] == 0)


def test_spmm_grad_x_is_transpose_spmm():
    n, d = 24, 8
    g, dense = _random_graph(n, 0.2, seed=2)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(n, d)).astype(np.float32))
    ct = np.random.default_rng(4).normal(size=(n, d)).astype(np.float32)

    def f(x):
        return jnp.sum(spmm_xla(g, x) * ct)

    gx = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(gx, dense.T @ ct, rtol=1e-5, atol=1e-5)


def test_spmm_grad_vals_is_sddmm():
    n, d = 20, 8
    g, dense = _random_graph(n, 0.25, seed=5)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(n, d)).astype(np.float32))
    ct = jnp.asarray(np.random.default_rng(7).normal(size=(n, d)).astype(np.float32))

    def f(vals):
        return jnp.sum(spmm_xla(g.replace(vals=vals), x) * ct)

    gv = np.asarray(jax.grad(f)(g.vals))
    expected = np.asarray(sddmm(g, ct, x))
    np.testing.assert_allclose(gv, expected, rtol=1e-5, atol=1e-5)


def test_spmm_jit_and_vmap_compatible():
    g, dense = _random_graph(16, 0.3, seed=8)
    xs = jnp.asarray(
        np.random.default_rng(9).normal(size=(3, 16, 8)).astype(np.float32)
    )
    out = jax.vmap(lambda x: spmm_xla(g, x))(xs)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out[i]), dense @ np.asarray(xs[i]), rtol=1e-5, atol=1e-5
        )
