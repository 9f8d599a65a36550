"""Fused Gaussian pair-bias projection kernel vs the XLA oracle (interpret
mode on CPU): values, gradients, and checkpoint interchangeability with the
unfused GaussianLayer + NonLinearHead path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mmdti_tpu.ops.pallas_gbf as pg


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    import mmdti_tpu.ops.pallas_attention as pa

    orig = pg.pl.pallas_call
    monkeypatch.setattr(pg.pl, "pallas_call", functools.partial(orig, interpret=True))
    orig_a = pa.pl.pallas_call
    monkeypatch.setattr(pa.pl, "pallas_call", functools.partial(orig_a, interpret=True))
    yield


def _params(K=16, Kh=16, H=8, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        means=jnp.asarray(rng.uniform(0, 3, K).astype(np.float32)),
        stds=jnp.asarray(rng.uniform(-3, 3, K).astype(np.float32)),
        w1=jnp.asarray(0.1 * rng.randn(K, Kh).astype(np.float32)),
        b1=jnp.asarray(0.1 * rng.randn(Kh).astype(np.float32)),
        w2=jnp.asarray(0.1 * rng.randn(Kh, H).astype(np.float32)),
        b2=jnp.asarray(0.1 * rng.randn(H).astype(np.float32)),
    )


def _oracle(u, means, stds, w1, b1, w2, b2, act="gelu_tanh"):
    """The unfused math: Gaussian expansion -> 2-layer MLP, fp32."""
    from mmdti_tpu.models.gaussian import gaussian_pdf
    from mmdti_tpu.models.layers import get_activation_fn

    std = jnp.abs(stds) + 1e-5
    feat = gaussian_pdf(u[..., None], means, std)            # [B,N,N,K]
    h = get_activation_fn(act)(feat @ w1 + b1)
    return h @ w2 + b2                                       # [B,N,N,H]


def _u(B=2, N=16, seed=1):
    rng = np.random.RandomState(seed)
    return jnp.asarray((rng.rand(B, N, N) * 6).astype(np.float32))


class TestFusedGbfKernel:
    def test_forward_matches_oracle(self):
        p = _params()
        u = _u()
        want = _oracle(u, **p)
        got = pg.gbf_pair_bias_fused(
            u, p["means"], p["stds"], p["w1"], p["b1"], p["w2"], p["b2"]
        )
        # kernel emits i-major [B,N,H,N]
        np.testing.assert_allclose(
            np.asarray(got.transpose(0, 2, 1, 3)),
            np.asarray(want.transpose(0, 3, 1, 2)),
            atol=2e-5,
        )

    def test_forward_erf_gelu(self):
        p = _params(seed=3)
        u = _u(seed=4)
        want = _oracle(u, **p, act="gelu")
        got = pg.gbf_pair_bias_fused(
            u, p["means"], p["stds"], p["w1"], p["b1"], p["w2"], p["b2"],
            activation="gelu",
        )
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(want.transpose(0, 1, 3, 2)),
            atol=2e-5,
        )

    def test_gradients_match_oracle(self):
        p = _params(seed=5)
        u = _u(seed=6)
        cot = jnp.asarray(np.random.RandomState(7).randn(2, 16, 8, 16).astype(np.float32))

        def loss_fused(u, means, stds, w1, b1, w2, b2):
            out = pg.gbf_pair_bias_fused(u, means, stds, w1, b1, w2, b2)
            return jnp.sum(out * cot)

        def loss_oracle(u, means, stds, w1, b1, w2, b2):
            out = _oracle(u, means, stds, w1, b1, w2, b2)
            return jnp.sum(out.transpose(0, 1, 3, 2) * cot)

        args = (u, p["means"], p["stds"], p["w1"], p["b1"], p["w2"], p["b2"])
        gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        go = jax.grad(loss_oracle, argnums=tuple(range(7)))(*args)
        for a, b, name in zip(
            gf, go, ["u", "means", "stds", "w1", "b1", "w2", "b2"]
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-4,
                err_msg=f"grad mismatch: {name}",
            )

    def test_bf16_out_dtype(self):
        p = _params()
        u = _u()
        got = pg.gbf_pair_bias_fused(
            u, p["means"], p["stds"], p["w1"], p["b1"], p["w2"], p["b2"],
            out_dtype=jnp.bfloat16,
        )
        assert got.dtype == jnp.bfloat16
        want = _oracle(u, **p).transpose(0, 1, 3, 2)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=0.05, rtol=0.02
        )

    def test_supported_gate(self):
        assert pg.gbf_fused_supported(64, 128, 128, 64, "gelu_tanh")
        assert pg.gbf_fused_supported(64, 128, 128, 64, "gelu")
        assert not pg.gbf_fused_supported(63, 128, 128, 64, "gelu_tanh")
        assert not pg.gbf_fused_supported(64, 128, 128, 64, "relu")
        assert not pg.gbf_fused_supported(1024, 128, 128, 64, "gelu_tanh")


class TestModuleInterchange:
    def test_param_tree_matches_nonlinearhead(self):
        """FusedGbfProj must be checkpoint-interchangeable with the
        NonLinearHead it replaces (same scope tree, shapes, and math)."""
        from mmdti_tpu.models.gaussian import FusedGbfProj, GaussianLayer
        from mmdti_tpu.models.layers import NonLinearHead

        K, H, B, N = 16, 8, 2, 16
        gl = GaussianLayer(kernels=K, edge_types=25)
        rng = np.random.RandomState(0)
        dist = jnp.asarray((rng.rand(B, N, N) * 6).astype(np.float32))
        toks = jnp.asarray(rng.randint(0, 5, (B, N)).astype(np.int32))
        et = (toks[:, :, None] * 5 + toks[:, None, :]).astype(jnp.int32)
        gl_params = gl.init(jax.random.PRNGKey(0), dist, et, tokens=toks)

        feat = gl.apply(gl_params, dist, et, tokens=toks)
        u, means, stds = gl.apply(gl_params, dist, et, tokens=toks, return_affine=True)

        head = NonLinearHead(H, "gelu_tanh")
        head_params = head.init(jax.random.PRNGKey(1), feat)
        fused = FusedGbfProj(out_dim=H, kernels=K, activation_fn="gelu_tanh")
        fused_params = fused.init(jax.random.PRNGKey(1), u, means, stds)

        # identical tree: same init rng stream => identical values
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            head_params, fused_params,
        )

        want = head.apply(head_params, feat)                 # [B,N,N,H]
        got = fused.apply(head_params, u, means, stds)       # [B,N,H,N]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want.transpose(0, 1, 3, 2)), atol=2e-5
        )


@pytest.mark.heavy
class TestFullModelPallasPath:
    def test_model_fwd_and_grads_match_xla_path(self):
        """The complete TPU path (fused gbf kernel + fused attention kernels)
        must match the XLA model on the SAME params: logits and grads."""
        from mmdti_tpu.models import build_model

        overrides = dict(
            unimol_overrides={
                "encoder_layers": 2, "embed_dim": 64, "ffn_embed_dim": 64,
                "attention_heads": 8, "gaussian_kernels": 16,
                "dropout": 0.0, "emb_dropout": 0.0, "attention_dropout": 0.0,
                "pooler_dropout": 0.0,
            },
            chemberta_overrides={
                "hidden_size": 64, "num_hidden_layers": 1,
                "num_attention_heads": 4, "intermediate_size": 64,
                "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
            },
        )

        def mk(use_pallas):
            return build_model(
                output_dim=1, atom_vocab_size=9, atom_pad_idx=1,
                task="regression", smiles_vocab_size=30, **overrides,
                use_pallas=use_pallas,
            )

        # N=64 covers the flagship sequence shape end to end: fused gbf
        # kernel + fused pair-bias attention + fused masked bert/cross-modal
        # attention, against the XLA model on the same params.
        B, N, L = 2, 64, 8
        rng = np.random.RandomState(0)
        toks = rng.randint(3, 8, (B, N)).astype(np.int32)
        toks[:, -2:] = 1  # padded tail
        batch = {
            "src_tokens": jnp.asarray(toks),
            "src_distance": jnp.asarray((rng.rand(B, N, N) * 6).astype(np.float32)),
            "src_edge_type": jnp.asarray(
                (toks[:, :, None] * 9 + toks[:, None, :]).astype(np.int32)
            ),
            "input_ids": jnp.asarray(rng.randint(4, 29, (B, L)).astype(np.int32)),
            "attention_mask": jnp.asarray(np.ones((B, L), np.int32)),
        }
        mx, mp = mk(False), mk(True)
        key = jax.random.PRNGKey(0)
        params = mx.init({"params": key, "dropout": key}, **batch, deterministic=True)[
            "params"
        ]

        def loss(model, p):
            out = model.apply({"params": p}, **batch, deterministic=True)
            return jnp.sum(out["logits"] ** 2) + out["infonce_loss"], out["logits"]

        (lx, logits_x), gx = jax.value_and_grad(lambda p: loss(mx, p), has_aux=True)(params)
        (lp, logits_p), gp = jax.value_and_grad(lambda p: loss(mp, p), has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_x), atol=2e-4)
        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
        flat_x = jax.tree_util.tree_leaves_with_path(gx)
        flat_p = jax.tree_util.tree_leaves_with_path(gp)
        for (path_x, ax), (_, ap) in zip(flat_x, flat_p):
            np.testing.assert_allclose(
                np.asarray(ap), np.asarray(ax), atol=5e-3, rtol=5e-3,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path_x)}",
            )
