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
    """Returns token-major (q,k,v [B,N,H*D]) plus the -inf-filled bias."""
    rng = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(rng.randn(B, N, H * D).astype(np.float32)) for _ in range(3))
    bias = jnp.asarray(rng.randn(B, H, N, N).astype(np.float32))
    pad = np.zeros((B, N), bool)
    pad[:, N - pad_tail:] = True
    return q, k, v, merge_padding_into_bias(bias, jnp.asarray(pad))


def _heads(t, H):
    B, N, E = t.shape
    return t.reshape(B, N, H, E // H).transpose(0, 2, 1, 3)


def _xla(q, k, v, bias, H, pair_dtype=jnp.float32):
    o, l = pair_bias_attention_xla(
        _heads(q, H), _heads(k, H), _heads(v, H), bias, pair_dtype=pair_dtype
    )
    B, _, N, D = o.shape
    return o.transpose(0, 2, 1, 3).reshape(B, N, H * D), l


class TestPallasForward:
    def test_matches_xla(self):
        H = 2
        q, k, v, bias = _inputs(H=H)
        o_x, l_x = _xla(q, k, v, bias, H)
        o_p, l_p = pa.pair_bias_attention_pallas(q, k, v, bias, num_heads=H)
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x), atol=1e-5)
        fin = np.isfinite(np.asarray(l_x))
        np.testing.assert_allclose(
            np.asarray(l_p)[fin], np.asarray(l_x)[fin], atol=1e-5
        )
        assert (np.isneginf(np.asarray(l_p)) == np.isneginf(np.asarray(l_x))).all()

    def test_bf16_pair_storage(self):
        """pair_dtype=bfloat16 stores the logits chain rounded; values must
        match the fp32 logits to bf16 resolution and out stays fp32-exact."""
        H = 2
        q, k, v, bias = _inputs(H=H)
        o_x, l_x = _xla(q, k, v, bias, H)
        o_p, l_p = pa.pair_bias_attention_pallas(
            q, k, v, bias.astype(jnp.bfloat16), num_heads=H,
            pair_dtype=jnp.bfloat16,
        )
        assert l_p.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x), atol=2e-2)
        fin = np.isfinite(np.asarray(l_x))
        np.testing.assert_allclose(
            np.asarray(l_p).astype(np.float32)[fin], np.asarray(l_x)[fin],
            rtol=1e-2, atol=5e-2,
        )


class TestPallasBackward:
    def test_grads_match_xla(self):
        H = 2
        q, k, v, bias = _inputs(H=H)

        def make_loss(fn):
            def loss(q, k, v, b):
                o, l = fn(q, k, v, b)
                lf = jnp.where(jnp.isfinite(l), l, 0.0)
                return (o ** 2).sum() + 1e-3 * (lf ** 2).sum()

            return loss

        gx = jax.grad(make_loss(lambda *a: _xla(*a, H)), argnums=(0, 1, 2, 3))(
            q, k, v, bias
        )
        gp = jax.grad(
            make_loss(lambda *a: pa.pair_bias_attention_pallas(*a, num_heads=H)),
            argnums=(0, 1, 2, 3),
        )(q, k, v, bias)
        for name, a, b in zip("qkvb", gx, gp):
            a, b = np.asarray(a), np.asarray(b)
            fin = np.isfinite(a) & np.isfinite(b)
            np.testing.assert_allclose(a[fin], b[fin], atol=1e-4, err_msg=f"grad {name}")


class TestPallasDropout:
    @pytest.fixture(autouse=True)
    def _fake_prng(self, monkeypatch):
        """pltpu.prng_* is unimplemented in interpret mode; substitute a
        deterministic hash mask with the same (seed, program) keying so the
        fwd/bwd replay property is still exercised."""
        def fake_keep(seed_ref, shape, rate):
            pid = (pa.pl.program_id(0) * pa.pl.num_programs(1)
                   + pa.pl.program_id(1))
            base = (seed_ref[0] + pid).astype(jnp.uint32)
            idx = jnp.zeros(shape, jnp.uint32)
            for d in range(len(shape)):
                idx = idx * jnp.uint32(8191) + jax.lax.broadcasted_iota(
                    jnp.uint32, shape, d
                )
            h = (idx + base) * jnp.uint32(2654435761)
            return (h % jnp.uint32(1000)).astype(jnp.float32) >= rate * 1000.0

        monkeypatch.setattr(pa, "_keep_mask", fake_keep)

    def test_dropout_replay_and_rate(self):
        """Forward/backward share the PRNG stream: gradcheck through dropout
        (finite differences would not see the same mask, so instead assert
        the analytic identity loss==<g, primal> for the linear out-path) and
        the empirical keep rate is near 1-rate."""
        H, rate = 2, 0.3
        q, k, v, bias = _inputs(H=H, pad_tail=0, N=32)
        rng = jax.random.PRNGKey(7)

        def fwd(vv):
            o, _ = pa.pair_bias_attention_pallas(
                q, k, vv, bias, num_heads=H, dropout_rate=rate,
                dropout_rng=rng, deterministic=False,
            )
            return o

        o = fwd(v)
        # out is linear in v for a fixed mask: f(v) == J·v, so <f(v), g> must
        # equal <v, J^T g> — holds ONLY if bwd replays the same mask
        g = jnp.asarray(np.random.RandomState(1).randn(*o.shape), jnp.float32)
        _, vjp_fn = jax.vjp(fwd, v)
        (dv,) = vjp_fn(g)
        lhs = float(jnp.vdot(o, g))
        rhs = float(jnp.vdot(v, dv))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

        # keep-rate sanity: compare against the no-dropout output
        o_det = pa.pair_bias_attention_pallas(q, k, v, bias, num_heads=H)[0]
        assert not np.allclose(np.asarray(o), np.asarray(o_det))


class TestMaskedAttention:
    """Fused BERT-style masked attention (ChemBERTa + cross-modal layers) vs
    the XLA oracle: values, grads, cross-shaped Nq != Nk, dropout replay."""

    def _mask(self, B, Nk, n_pad, fill=-10000.0):
        m = np.zeros((B, 1, 1, Nk), np.float32)
        m[:, :, :, Nk - n_pad:] = fill
        return jnp.asarray(m)

    def test_forward_matches_xla(self):
        from mmdti_tpu.ops.attention import cross_attention_xla

        B, H, Nq, Nk, D = 2, 2, 16, 24, 8
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, Nq, H * D).astype(np.float32))
        k = jnp.asarray(rng.randn(B, Nk, H * D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, Nk, H * D).astype(np.float32))
        mask = self._mask(B, Nk, 5)
        o_p = pa.masked_attention_pallas(q, k, v, mask, num_heads=H)
        o_x = cross_attention_xla(_heads(q, H), _heads(k, H), _heads(v, H), mask)
        o_x = o_x.transpose(0, 2, 1, 3).reshape(B, Nq, H * D)
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x), atol=1e-5)

    def test_grads_match_xla(self):
        from mmdti_tpu.ops.attention import cross_attention_xla

        B, H, Nq, Nk, D = 2, 2, 16, 16, 8
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(B, Nq, H * D).astype(np.float32))
        k = jnp.asarray(rng.randn(B, Nk, H * D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, Nk, H * D).astype(np.float32))
        mask = self._mask(B, Nk, 3)

        def loss_p(q, k, v):
            return (pa.masked_attention_pallas(q, k, v, mask, num_heads=H) ** 2).sum()

        def loss_x(q, k, v):
            o = cross_attention_xla(_heads(q, H), _heads(k, H), _heads(v, H), mask)
            return (o ** 2).sum()

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gx, gp):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"grad {name}"
            )

    def test_hf_finfo_min_mask(self):
        """ChemBERTa uses (1-mask)*finfo.min — must not produce NaNs."""
        B, H, N, D = 1, 2, 16, 8
        rng = np.random.RandomState(2)
        q, k, v = (jnp.asarray(rng.randn(B, N, H * D).astype(np.float32))
                   for _ in range(3))
        mask = self._mask(B, N, 6, fill=float(np.finfo(np.float32).min))
        o = pa.masked_attention_pallas(q, k, v, mask, num_heads=H)
        assert np.isfinite(np.asarray(o)).all()


class TestMaskedAttentionDropout:
    @pytest.fixture(autouse=True)
    def _fake_prng(self, monkeypatch):
        def fake_keep(seed_ref, shape, rate):
            pid = (pa.pl.program_id(0) * pa.pl.num_programs(1)
                   + pa.pl.program_id(1))
            base = (seed_ref[0] + pid).astype(jnp.uint32)
            idx = jnp.zeros(shape, jnp.uint32)
            for d in range(len(shape)):
                idx = idx * jnp.uint32(8191) + jax.lax.broadcasted_iota(
                    jnp.uint32, shape, d
                )
            h = (idx + base) * jnp.uint32(2654435761)
            return (h % jnp.uint32(1000)).astype(jnp.float32) >= rate * 1000.0

        monkeypatch.setattr(pa, "_keep_mask", fake_keep)

    def test_replay(self):
        """bwd must replay the fwd dropout mask: <f(v), g> == <v, J^T g>."""
        B, H, N, D, rate = 1, 2, 16, 8, 0.25
        rng_np = np.random.RandomState(3)
        q, k, v = (jnp.asarray(rng_np.randn(B, N, H * D).astype(np.float32))
                   for _ in range(3))
        mask = jnp.zeros((B, 1, 1, N), jnp.float32)
        key = jax.random.PRNGKey(5)

        def fwd(vv):
            return pa.masked_attention_pallas(
                q, k, vv, mask, num_heads=H, dropout_rate=rate,
                dropout_rng=key, deterministic=False,
            )

        o = fwd(v)
        g = jnp.asarray(rng_np.randn(*o.shape).astype(np.float32))
        _, vjp_fn = jax.vjp(fwd, v)
        (dv,) = vjp_fn(g)
        np.testing.assert_allclose(
            float(jnp.vdot(o, g)), float(jnp.vdot(v, dv)), rtol=1e-4
        )


class TestQRowBlocking:
    """Force the flash-style multi-row-block path at small shapes (by
    shrinking the VMEM element cap) and check values + grads against the
    single-block path / XLA oracle, including dk/dv accumulation."""

    @pytest.fixture(autouse=True)
    def _small_cap(self, monkeypatch):
        # H=2, D=8, N=32: full rows need 2*32*32=2048 elems; cap 1024 forces
        # hc=2 (lane rule: hc==H), qb=16 -> 2 row blocks
        monkeypatch.setattr(pa, "_PAIR_ELEM_CAP", 1024)
        monkeypatch.setattr(pa, "_MASKED_ELEM_CAP", 1024)
        assert pa._chunk_policy(2, 32, 32, 8) == (2, 16)
        yield

    def test_pair_bias_fwd_bwd_match_xla(self):
        H = 2
        q, k, v, bias = _inputs(H=H, N=32, pad_tail=5)

        def loss_x(q, k, v, b):
            o, l = _xla(q, k, v, b, H)
            lf = jnp.where(jnp.isfinite(l), l, 0.0)
            return (o ** 2).sum() + 1e-3 * (lf ** 2).sum()

        def loss_p(q, k, v, b):
            o, l = pa.pair_bias_attention_pallas(q, k, v, b, num_heads=H)
            lf = jnp.where(jnp.isfinite(l), l, 0.0)
            return (o ** 2).sum() + 1e-3 * (lf ** 2).sum()

        o_x, l_x = _xla(q, k, v, bias, H)
        o_p, l_p = pa.pair_bias_attention_pallas(q, k, v, bias, num_heads=H)
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x), atol=1e-5)
        fin = np.isfinite(np.asarray(l_x))
        np.testing.assert_allclose(np.asarray(l_p)[fin], np.asarray(l_x)[fin],
                                   atol=1e-5)
        gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(q, k, v, bias)
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip("qkvb", gx, gp):
            a, b = np.asarray(a), np.asarray(b)
            fin = np.isfinite(a) & np.isfinite(b)
            np.testing.assert_allclose(a[fin], b[fin], atol=1e-4,
                                       err_msg=f"grad {name} (multi-block)")

    def test_masked_fwd_bwd_match_xla(self):
        from mmdti_tpu.ops.attention import cross_attention_xla

        B, H, Nq, Nk, D = 2, 2, 32, 24, 8
        rng = np.random.RandomState(5)
        q = jnp.asarray(rng.randn(B, Nq, H * D).astype(np.float32))
        k = jnp.asarray(rng.randn(B, Nk, H * D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, Nk, H * D).astype(np.float32))
        mask = np.zeros((B, 1, 1, Nk), np.float32)
        mask[:, :, :, Nk - 4:] = -10000.0
        mask = jnp.asarray(mask)
        assert pa._chunk_policy(H, Nq, Nk, D) == (2, 16)

        def loss_p(q, k, v):
            return (pa.masked_attention_pallas(q, k, v, mask, num_heads=H) ** 2).sum()

        def loss_x(q, k, v):
            o = cross_attention_xla(_heads(q, H), _heads(k, H), _heads(v, H), mask)
            return (o ** 2).sum()

        np.testing.assert_allclose(
            np.asarray(pa.masked_attention_pallas(q, k, v, mask, num_heads=H)),
            np.asarray(
                cross_attention_xla(_heads(q, H), _heads(k, H), _heads(v, H), mask)
                .transpose(0, 2, 1, 3).reshape(B, Nq, H * D)
            ),
            atol=1e-5,
        )
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gx, gp):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4,
                err_msg=f"grad {name} (multi-block)",
            )

    def test_det_fwd_policy_diverges_from_bwd(self, monkeypatch):
        """Deterministic (rate==0) forwards may use a larger row-block policy
        than the backward (no dropout-replay grid coupling): with the det cap
        raised to full rows while the shared cap forces qb=16, the fwd runs a
        single-block grid and the bwd a two-block grid — values and grads
        must still match the XLA oracle."""
        monkeypatch.setattr(pa, "_PAIR_FWD_DET_ELEM_CAP", 8192)
        H = 2
        # det fwd sees full rows (full-row budget is lane-PADDED:
        # 2*32*ceil128(32) = 8192 <= det cap), bwd stays (2,16)
        assert pa._chunk_policy(2, 32, 32, 8, elem_cap=8192) == (2, 32)
        assert pa._chunk_policy(2, 32, 32, 8) == (2, 16)
        q, k, v, bias = _inputs(H=H, N=32, pad_tail=5)

        def loss_x(q, k, v, b):
            o, l = _xla(q, k, v, b, H)
            lf = jnp.where(jnp.isfinite(l), l, 0.0)
            return (o ** 2).sum() + 1e-3 * (lf ** 2).sum()

        def loss_p(q, k, v, b):
            o, l = pa.pair_bias_attention_pallas(q, k, v, b, num_heads=H)
            lf = jnp.where(jnp.isfinite(l), l, 0.0)
            return (o ** 2).sum() + 1e-3 * (lf ** 2).sum()

        o_p, l_p = pa.pair_bias_attention_pallas(q, k, v, bias, num_heads=H)
        o_x, l_x = _xla(q, k, v, bias, H)
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x), atol=1e-5)
        gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(q, k, v, bias)
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip("qkvb", gx, gp):
            a, b = np.asarray(a), np.asarray(b)
            fin = np.isfinite(a) & np.isfinite(b)
            np.testing.assert_allclose(a[fin], b[fin], atol=1e-4,
                                       err_msg=f"grad {name} (divergent grids)")

    def test_dropout_replay_multiblock(self):
        """The PRNG stream keying includes the row-block grid dim: fwd/bwd
        replay must hold across blocks (<f(v),g> == <v,J^T g>)."""
        H, rate = 2, 0.3
        q, k, v, bias = _inputs(H=H, pad_tail=0, N=32)
        rng = jax.random.PRNGKey(11)

        def fake_keep(seed_ref, shape, rate):
            pid = (pa.pl.program_id(0) * pa.pl.num_programs(1)
                   + pa.pl.program_id(1)) * pa.pl.num_programs(2) \
                  + pa.pl.program_id(2)
            base = (seed_ref[0] + pid).astype(jnp.uint32)
            idx = jnp.zeros(shape, jnp.uint32)
            for d in range(len(shape)):
                idx = idx * jnp.uint32(8191) + jax.lax.broadcasted_iota(
                    jnp.uint32, shape, d
                )
            h = (idx + base) * jnp.uint32(2654435761)
            return (h % jnp.uint32(1000)).astype(jnp.float32) >= rate * 1000.0

        import unittest.mock as mock

        with mock.patch.object(pa, "_keep_mask", fake_keep):
            def fwd(vv):
                o, _ = pa.pair_bias_attention_pallas(
                    q, k, vv, bias, num_heads=H, dropout_rate=rate,
                    dropout_rng=rng, deterministic=False,
                )
                return o

            o = fwd(v)
            g = jnp.asarray(np.random.RandomState(2).randn(*o.shape), jnp.float32)
            _, vjp_fn = jax.vjp(fwd, v)
            (dv,) = vjp_fn(g)
            np.testing.assert_allclose(
                float(jnp.vdot(o, g)), float(jnp.vdot(v, dv)), rtol=1e-4
            )


class TestSupportedShapes:
    def test_policy(self):
        from mmdti_tpu.ops.pallas_attention import (
            _chunk_policy,
            pallas_attention_supported,
        )

        assert pallas_attention_supported(64, 8, 64)       # flagship
        assert pallas_attention_supported(64, 8, 96)       # bucket
        # long sequences run with flash-style q-row blocking
        assert pallas_attention_supported(64, 8, 160)
        assert pallas_attention_supported(64, 8, 256)
        assert not pallas_attention_supported(64, 8, 63)   # ragged rows
        assert _chunk_policy(64, 64, 64, 8) == (32, 64)    # full rows
        hc, qb = _chunk_policy(64, 256, 256, 8)
        assert qb < 256 and 256 % qb == 0 and qb % 8 == 0
        from mmdti_tpu.ops.pallas_attention import _PAIR_ELEM_CAP

        assert hc * qb * 256 <= _PAIR_ELEM_CAP
        # MXU passes process up to 128 rows: the reference max_atoms regime
        # must not run tiny row blocks (qb=32 measured 2.6x vs XLA; qb=64+
        # is the point of the per-family caps)
        assert qb >= 64
        # huge-Nk cross shapes: the policy must keep the resident k/v scratch
        # under its own cap (choosing a smaller head chunk, or falling back)
        # rather than failing Mosaic VMEM allocation at compile time
        from mmdti_tpu.ops.pallas_attention import _KV_ELEM_CAP

        pol = _chunk_policy(12, 64, 512, 64)        # Nq=64, Nk=512, D=64
        assert pol is not None and pol[0] * 512 * 64 <= _KV_ELEM_CAP
        # ChemBERTa-like long-SMILES self-attention stays supported
        pol = _chunk_policy(8, 512, 512, 64)
        assert pol is not None and pol[0] * 512 * 64 <= _KV_ELEM_CAP

    def test_masked_policy_stays_in_validated_envelope(self):
        """The masked kernels have no streamed pair arrays, but XLA may place
        their dq/dk/dv OUTPUT arrays in scoped VMEM: at the cross-modal shape
        (H=16, D=32, Nq=256, Nk=64) a 524k element cap (hc=16 full rows)
        measured a Mosaic scoped-vmem compile failure at B=64/N=256 — over by
        148K-916K bytes.  The 240k envelope (hc=8 there) compiles at every
        measured shape; raising _MASKED_ELEM_CAP needs a fresh on-chip
        compile check at B>=64, N=256 (scripts/longseq_probe.py)."""
        from mmdti_tpu.ops.pallas_attention import (
            _MASKED_ELEM_CAP,
            _chunk_policy,
        )

        from mmdti_tpu.ops.pallas_attention import _MASKED_FULL_ROW_CAP

        assert _MASKED_ELEM_CAP <= 240_000
        assert _MASKED_FULL_ROW_CAP <= 262_144  # padded-elem budget
        pol = _chunk_policy(16, 256, 64, 32,
                            elem_cap=_MASKED_ELEM_CAP,
                            full_row_cap=_MASKED_FULL_ROW_CAP)
        assert pol == (8, 256)

    def test_dispatcher_handles_none_mask_with_pallas_flag(self):
        """masked_attention(mask_bias=None, use_pallas=True) must fall back
        to the XLA path (which treats None as 'no mask'), not crash on the
        shape guard."""
        from mmdti_tpu.ops.attention import masked_attention

        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
        k = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
        v = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
        kwargs = dict(num_heads=4, dropout_rate=0.0, dropout_rng=None,
                      deterministic=True)
        got = masked_attention(q, k, v, None, use_pallas=True, **kwargs)
        want = masked_attention(q, k, v, None, use_pallas=False, **kwargs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_default_buckets_keep_fused_kernels_engaged(self):
        """Every default atom bucket must satisfy the fused kernels' seq%8
        contract — a misaligned top bucket silently drops the largest
        molecules onto the slower XLA path."""
        from mmdti_tpu.ops.pallas_attention import pallas_attention_supported
        from mmdti_tpu.ops.pallas_gbf import gbf_fused_supported
        from mmdti_tpu.utils.padding import DEFAULT_ATOM_BUCKETS

        assert all(b % 8 == 0 for b in DEFAULT_ATOM_BUCKETS)
        # top bucket must still hold max_atoms+2 = 258 tokens
        assert DEFAULT_ATOM_BUCKETS[-1] >= 258
        for b in DEFAULT_ATOM_BUCKETS:
            assert pallas_attention_supported(64, 8, b), b
            assert gbf_fused_supported(b, 128, 128, 64, "gelu"), b

    def test_policy_budgets_padded_lanes_past_256(self):
        """Mosaic pads the lane dim of (hc,qb,N) blocks to 128-multiples, so
        for N in 257..384 the policy must budget with 384 lanes: the raw-N
        math picked qb=48 at N=288 / qb=56 at N=280, both of which FAIL
        Mosaic scoped-vmem compilation on chip (by 0.12M / 1.32M); qb=40/32
        compile and run (8.03 / 9.29 ms per layer, B=32).  N<=256 policies
        are chip-validated with raw N and must not shrink."""
        from mmdti_tpu.ops.pallas_attention import _chunk_policy

        assert _chunk_policy(64, 280, 280, 8) == (16, 40)
        assert _chunk_policy(64, 288, 288, 8) == (16, 32)
        assert _chunk_policy(64, 320, 320, 8) == (16, 40)
        # validated raw-N policies unchanged
        assert _chunk_policy(64, 256, 256, 8) == (16, 64)
        assert _chunk_policy(64, 160, 160, 8) == (16, 80)

    def test_full_row_budget_pads_small_n_lanes(self):
        """The full-row branch budgets with lanes padded to 128 at EVERY N:
        at N=48 the raw math picked hc=64 (147456 raw elems) which fails
        Mosaic scoped vmem at 17.36M on chip — 393216 PADDED elems, 1.5x the
        validated flagship point (32,64) = 262144 padded.  Small-molecule
        datasets (atom pad <= 56) hit this on the first real train step."""
        from mmdti_tpu.ops.pallas_attention import (
            _PAIR_FULL_ROW_CAP,
            _chunk_policy,
        )

        # chip-validated small-N ladder (B=32, H=64, D=8)
        assert _chunk_policy(64, 48, 48, 8) == (32, 48)   # was (64,48): OOM
        assert _chunk_policy(64, 32, 32, 8) == (64, 32)
        assert _chunk_policy(64, 56, 56, 8) == (32, 56)
        assert _chunk_policy(64, 80, 80, 8) == (16, 80)
        assert _chunk_policy(64, 96, 96, 8) == (16, 96)
        assert _chunk_policy(64, 64, 64, 8) == (32, 64)   # flagship pinned
        # padded-budget invariant over every bucketable small N
        for n in range(8, 136, 8):
            pol = _chunk_policy(64, n, n, 8)
            assert pol is not None
            hc, qb = pol
            if qb == n:  # full-row selection
                padded = -(-n // 128) * 128
                assert hc * n * padded <= _PAIR_FULL_ROW_CAP

    def test_layer_falls_back_to_xla_on_long_sequences(self):
        """use_pallas=True at unsupported N must silently take the XLA path
        (identical numerics to use_pallas=False)."""
        from mmdti_tpu.configs.architectures import UniMolEncoderConfig
        from mmdti_tpu.models.unimol import PairBiasEncoderLayer

        cfg = UniMolEncoderConfig(
            encoder_layers=1, embed_dim=32, ffn_embed_dim=64,
            attention_heads=4, dropout=0.0, emb_dropout=0.0,
            attention_dropout=0.0,
        )
        rng = np.random.RandomState(0)
        # N=63: fails the N % 8 == 0 rule -> fallback
        x = jnp.asarray(rng.randn(1, 63, 32).astype(np.float32))
        bias = jnp.asarray(rng.randn(1, 4, 63, 63).astype(np.float32))
        lp = PairBiasEncoderLayer(cfg, use_pallas=True)
        lx = PairBiasEncoderLayer(cfg, use_pallas=False)
        params = lp.init(jax.random.PRNGKey(0), x, bias, True)["params"]
        op, bp = lp.apply({"params": params}, x, bias, True)
        ox, bx = lx.apply({"params": params}, x, bias, True)
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bp), np.asarray(bx), atol=1e-6)
