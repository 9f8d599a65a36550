"""Fused LayerNorm kernel vs the flax/XLA oracle (interpret mode on CPU)."""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mmdti_tpu.ops.pallas_ln as pln
from mmdti_tpu.models.layers import FusedLN, LayerNormFP32


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pln.pl.pallas_call
    monkeypatch.setattr(pln.pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def _inputs(shape, dtype, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
    g = jnp.asarray((rng.rand(shape[-1]) + 0.5).astype(np.float32))
    b = jnp.asarray((rng.randn(shape[-1]) * 0.1).astype(np.float32))
    return x, g, b


def _flax_ln(x, g, b, eps):
    """The pre-existing LayerNormFP32 contract: nn.LayerNorm(dtype=f32) on an
    fp32 upcast, cast back to x.dtype."""
    mod = nn.LayerNorm(epsilon=eps, dtype=jnp.float32)
    y = mod.apply({"params": {"scale": g, "bias": b}}, x.astype(jnp.float32))
    return y.astype(x.dtype)


class TestKernelParity:
    @pytest.mark.parametrize("shape,dtype", [
        ((4, 16, 512), jnp.bfloat16),   # flagship-like [B,N,E]
        ((8, 128), jnp.float32),        # minimal single block
        ((2, 3, 8, 256), jnp.bfloat16), # >2 leading dims
        ((64, 128), jnp.float32),       # multi-row fold (R=64)
    ])
    def test_forward(self, shape, dtype):
        x, g, b = _inputs(shape, dtype)
        y = pln.layer_norm_fused(x, g, b, epsilon=1e-5)
        ref = _flax_ln(x, g, b, 1e-5)
        assert y.dtype == x.dtype
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(ref, np.float32),
            atol=2e-5, rtol=2e-5,
        )

    @pytest.mark.parametrize("eps", [1e-5, 1e-12])
    def test_grads(self, eps):
        x, g, b = _inputs((4, 16, 512), jnp.bfloat16)

        def loss_pal(x, g, b):
            y = pln.layer_norm_fused(x, g, b, epsilon=eps)
            return (y.astype(jnp.float32) ** 2).mean()

        def loss_ref(x, g, b):
            y = _flax_ln(x, g, b, eps)
            return (y.astype(jnp.float32) ** 2).mean()

        gp = jax.grad(loss_pal, argnums=(0, 1, 2))(x, g, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
        for a, c in zip(gp, gr):
            assert a.dtype == c.dtype
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                atol=3e-6, rtol=1e-3,
            )

    def test_multiblock_grid_accumulation(self):
        """T large enough for several row blocks: dgamma/dbeta must
        accumulate across sequential grid steps (the revisited-output
        pattern), not just within one block."""
        T = pln._ROW_BLOCK_ELEM_CAP // 128 * 4  # 4 blocks at E=128
        x, g, b = _inputs((T, 128), jnp.float32)
        assert pln._row_block(T, 128) < T  # really multi-block

        def loss(fn):
            return lambda x, g, b: (fn(x, g, b).astype(jnp.float32) ** 2).mean()

        gp = jax.grad(loss(lambda x, g, b: pln.layer_norm_fused(x, g, b)),
                      argnums=(1, 2))(x, g, b)
        gr = jax.grad(loss(lambda x, g, b: _flax_ln(x, g, b, 1e-5)),
                      argnums=(1, 2))(x, g, b)
        for a, c in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=1e-4, rtol=1e-4)

    def test_out_dtype(self):
        x, g, b = _inputs((8, 128), jnp.bfloat16)
        y = pln.layer_norm_fused(x, g, b, out_dtype=jnp.float32)
        assert y.dtype == jnp.float32
        ref = _flax_ln(x.astype(jnp.float32), g, b, 1e-5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


class TestSupportGating:
    def test_unsupported_shapes(self):
        assert not pln.layer_norm_supported((8, 100))   # E % 128 != 0
        assert not pln.layer_norm_supported((3, 128))   # T % 8 != 0
        assert not pln.layer_norm_supported((128,))     # rank 1
        assert pln.layer_norm_supported((4, 16, 512))

    def test_fused_raises_on_unsupported(self):
        x, g, b = _inputs((8, 100), jnp.float32)
        with pytest.raises(ValueError, match="unsupported"):
            pln.layer_norm_fused(x, g, b)

    def test_env_override(self, monkeypatch):
        # default (unset / anything but "1"): OFF even with use_pallas=True
        monkeypatch.delenv("MMDTI_PALLAS_LN", raising=False)
        assert not pln.ln_kernel_enabled(True, (8, 128))
        monkeypatch.setenv("MMDTI_PALLAS_LN", "0")
        assert not pln.ln_kernel_enabled(True, (8, 128))
        # explicit opt-in engages (chip-neutral default-off, see module doc),
        # but only where the model's platform-resolved use_pallas allows —
        # the kernel must never trace on CPU/XLA-oracle configurations
        monkeypatch.setenv("MMDTI_PALLAS_LN", "1")
        assert not pln.ln_kernel_enabled(False, (8, 128))
        assert pln.ln_kernel_enabled(True, (8, 128))
        # unsupported shape never engages
        assert not pln.ln_kernel_enabled(True, (8, 100))


class TestFusedLNModule:
    def test_pallas_path_matches_xla_path(self):
        """Same params, same input: the module's two branches agree (value
        and gradient) — the pallas path is a pure acceleration."""
        x, g, b = _inputs((4, 16, 512), jnp.bfloat16)
        params = {"params": {"scale": g, "bias": b}}
        m_pal = FusedLN(epsilon=1e-12, use_pallas=True)
        m_xla = FusedLN(epsilon=1e-12, use_pallas=False)

        y_pal = m_pal.apply(params, x, out_dtype=jnp.bfloat16)
        y_xla = m_xla.apply(params, x, out_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(y_pal, np.float32),
                                   np.asarray(y_xla, np.float32),
                                   atol=2e-5, rtol=2e-5)

        def loss(mod):
            return lambda p, x: (
                mod.apply(p, x, out_dtype=jnp.float32) ** 2
            ).mean()

        gp = jax.grad(loss(m_pal))(params, x)
        gx = jax.grad(loss(m_xla))(params, x)
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), atol=3e-6, rtol=1e-3
            ),
            gp, gx,
        )

    def test_unsupported_shape_falls_back(self):
        # E=64 is not lane-aligned: use_pallas=True must silently take the
        # XLA branch (this is the encoder's final_head_layer_norm case)
        x, g, b = _inputs((4, 6, 64), jnp.float32)
        params = {"params": {"scale": g, "bias": b}}
        y = FusedLN(use_pallas=True).apply(params, x)
        ref = _flax_ln(x, g, b, 1e-5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_layernorm_fp32_wrapper_tree(self):
        """LayerNormFP32 keeps its ln/{scale,bias} param layout (checkpoint
        compatibility) and its output dtype contract."""
        x = jnp.ones((8, 128), jnp.bfloat16)
        mod = LayerNormFP32(use_pallas=False)
        v = mod.init(jax.random.PRNGKey(0), x)
        assert set(v["params"]["ln"].keys()) == {"scale", "bias"}
        assert v["params"]["ln"]["scale"].shape == (128,)
        assert mod.apply(v, x).dtype == jnp.bfloat16
