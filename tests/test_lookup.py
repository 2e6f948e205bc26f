"""lookup_cols: gather vs one-hot-matmul strategies must agree exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.ops import lookup


def test_onehot_path_matches_gather_exactly(monkeypatch):
    rng = np.random.default_rng(0)
    for k in (1, 5, 100, 3000):  # 3000 crosses a K_CHUNK boundary
        cols = (
            jnp.asarray(rng.standard_normal(k).astype(np.float32) * 1e3),
            jnp.asarray(rng.integers(0, 2**20, k).astype(np.int32)),
            jnp.asarray(rng.standard_normal(k).astype(np.float32)),
        )
        idx = jnp.asarray(rng.integers(0, k, 4096).astype(np.int32))
        expected = tuple(np.asarray(c)[np.asarray(idx)] for c in cols)

        monkeypatch.setattr(lookup, "_use_mxu", lambda kk: True)
        got = lookup.lookup_cols(idx, cols)
        monkeypatch.setattr(lookup, "_use_mxu", lambda kk: False)
        got_gather = lookup.lookup_cols(idx, cols)

        for e, g, gg in zip(expected, got, got_gather):
            # one-hot matmul is EXACT (single nonzero per sum)
            np.testing.assert_array_equal(e, np.asarray(g))
            np.testing.assert_array_equal(e, np.asarray(gg))
            assert g.dtype == e.dtype


def test_onehot_path_differentiable_wrt_table(monkeypatch):
    monkeypatch.setattr(lookup, "_use_mxu", lambda kk: True)
    col = jnp.arange(8, dtype=jnp.float32)
    idx = jnp.asarray([1, 1, 3], jnp.int32)

    def f(c):
        (out,) = lookup.lookup_cols(idx, (c,))
        return jnp.sum(out * jnp.asarray([1.0, 2.0, 4.0]))

    g = jax.grad(f)(col)
    np.testing.assert_allclose(np.asarray(g), [0, 3, 0, 4, 0, 0, 0, 0])
