"""Pallas fused attention vs the XLA oracle (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mmdti_tpu.ops.pallas_attention as pa
from mmdti_tpu.ops.attention import merge_padding_into_bias, pair_bias_attention_xla


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # run the kernel in the Pallas interpreter on CPU
    orig = pa.pl.pallas_call
    monkeypatch.setattr(pa.pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def _inputs(B=2, H=2, N=16, D=8, pad_tail=3, seed=0):
    rng = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(rng.randn(B, H, N, D).astype(np.float32)) for _ in range(3))
    bias = jnp.asarray(rng.randn(B, H, N, N).astype(np.float32))
    pad = np.zeros((B, N), bool)
    pad[:, N - pad_tail:] = True
    return q, k, v, merge_padding_into_bias(bias, jnp.asarray(pad))


class TestPallasForward:
    def test_matches_xla(self):
        q, k, v, bias = _inputs()
        o_x, l_x = pair_bias_attention_xla(q, k, v, bias)
        o_p, l_p = pa.pair_bias_attention_pallas(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x), atol=1e-5)
        fin = np.isfinite(np.asarray(l_x))
        np.testing.assert_allclose(
            np.asarray(l_p)[fin], np.asarray(l_x)[fin], atol=1e-5
        )
        assert (np.isneginf(np.asarray(l_p)) == np.isneginf(np.asarray(l_x))).all()


class TestPallasBackward:
    def test_grads_match_xla(self):
        q, k, v, bias = _inputs()

        def make_loss(fn):
            def loss(q, k, v, b):
                o, l = fn(q, k, v, b)
                lf = jnp.where(jnp.isfinite(l), l, 0.0)
                return (o ** 2).sum() + 1e-3 * (lf ** 2).sum()

            return loss

        gx = jax.grad(make_loss(pair_bias_attention_xla), argnums=(0, 1, 2, 3))(q, k, v, bias)
        gp = jax.grad(make_loss(pa.pair_bias_attention_pallas), argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip("qkvb", gx, gp):
            a, b = np.asarray(a), np.asarray(b)
            fin = np.isfinite(a) & np.isfinite(b)
            np.testing.assert_allclose(a[fin], b[fin], atol=1e-4, err_msg=f"grad {name}")
