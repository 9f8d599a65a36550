"""Fused Pallas kernels under a sharded device mesh (the shard_map path).

Round-3 gap: the production Pallas path (default on TPU) and the
('data','model') mesh had never executed together — pallas_call has no GSPMD
partitioning rule, so inside a batch-sharded jit XLA would all-gather the
[B,H,N,N] pair chain (destroying DP scaling) or fail to lower.  The kernels
now self-wrap in jax.shard_map over the registered kernel mesh
(ops/pallas_attention.py, ops/pallas_gbf.py).  These tests run them in
interpret mode on the 8-virtual-device CPU mesh and assert:

  * values AND grads match the unmeshed kernels / the GSPMD'd XLA oracle,
    including the psum'd cotangents of mesh-replicated kernel operands
    (the gbf parameter-gradient pattern);
  * head sharding over the 'model' axis (DPxTP) matches too;
  * the compiled sharded train computation contains NO all-gather of a
    pair-sized operand (VERDICT r3 item 1b);
  * per-shard dropout masks are decorrelated (each shard's on-core PRNG
    restarts program ids at 0 — without the per-shard seed offset all data
    shards would replay identical masks);
  * the supported() gates refuse indivisible mesh/shape combinations so the
    dispatchers fall back to the XLA path instead of crashing in shard_map.
"""

import functools
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mmdti_tpu.ops.pallas_attention as pa
import mmdti_tpu.ops.pallas_gbf as pg
from mmdti_tpu.models import build_model
from mmdti_tpu.ops.attention import merge_padding_into_bias, pair_bias_attention_xla
from mmdti_tpu.parallel import make_mesh, replicate, shard_batch
from mmdti_tpu.parallel.mesh import kernel_mesh_scope


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # pa.pl and pg.pl are the same pallas module object: one patch covers both
    orig = pa.pl.pallas_call
    monkeypatch.setattr(pa.pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def _mesh(shape):
    return make_mesh(shape, devices=jax.devices())


def _attn_inputs(B=8, H=4, N=16, D=32, pad_tail=3, seed=0):
    rng = np.random.RandomState(seed)
    q, k, v = (
        jnp.asarray(rng.randn(B, N, H * D).astype(np.float32)) for _ in range(3)
    )
    bias = jnp.asarray(rng.randn(B, H, N, N).astype(np.float32))
    pad = np.zeros((B, N), bool)
    pad[:, N - pad_tail:] = True
    return q, k, v, merge_padding_into_bias(bias, jnp.asarray(pad))


def _pair_loss(out, logits):
    return jnp.sum(out * out) + 1e-3 * jnp.sum(
        jnp.where(jnp.isfinite(logits), logits, 0.0) ** 2
    )


class TestPairBiasMesh:
    def _grads(self, H, q, k, v, bias):
        def loss(q, k, v, b):
            out, logits = pa.pair_bias_attention_pallas(q, k, v, b, num_heads=H)
            return _pair_loss(out, logits)

        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))(q, k, v, bias)

    def test_data_mesh_matches_unmeshed(self):
        q, k, v, bias = _attn_inputs()
        ref_v, ref_g = self._grads(4, q, k, v, bias)
        with kernel_mesh_scope(_mesh((8, 1))):
            got_v, got_g = self._grads(4, q, k, v, bias)
        np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
        for name, a, b in zip("qkvb", got_g, ref_g):
            fin = np.isfinite(np.asarray(b))
            np.testing.assert_allclose(
                np.asarray(a)[fin], np.asarray(b)[fin], rtol=1e-5, atol=1e-5,
                err_msg=f"d{name}",
            )

    def test_dp_tp_mesh_matches_unmeshed(self):
        # model axis shards heads: H=4 over mp=2 -> 2 heads/shard (hc==H legal)
        q, k, v, bias = _attn_inputs(B=8, H=4, N=16, D=64)
        ref_v, ref_g = self._grads(4, q, k, v, bias)
        with kernel_mesh_scope(_mesh((4, 2))):
            got_v, got_g = self._grads(4, q, k, v, bias)
        np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
        for name, a, b in zip("qkvb", got_g, ref_g):
            fin = np.isfinite(np.asarray(b))
            np.testing.assert_allclose(
                np.asarray(a)[fin], np.asarray(b)[fin], rtol=1e-5, atol=1e-5,
                err_msg=f"d{name}",
            )

    def test_matches_xla_oracle_on_committed_shards(self):
        # inputs committed batch-sharded on the mesh, as the trainer feeds them
        q, k, v, bias = _attn_inputs()
        mesh = _mesh((8, 1))

        def hd(t):
            B, N, E = t.shape
            return t.reshape(B, N, 4, E // 4).transpose(0, 2, 1, 3)

        def loss_x(q, k, v, b):
            out, logits = pair_bias_attention_xla(hd(q), hd(k), hd(v), b)
            out = out.transpose(0, 2, 1, 3).reshape(q.shape)
            return _pair_loss(out, logits)

        ref = jax.jit(loss_x)(q, k, v, bias)
        with kernel_mesh_scope(mesh):
            sb = shard_batch(mesh, {"q": q, "k": k, "v": v, "b": bias})

            def loss_p(q, k, v, b):
                out, logits = pa.pair_bias_attention_pallas(q, k, v, b, num_heads=4)
                return _pair_loss(out, logits)

            got = jax.jit(loss_p)(sb["q"], sb["k"], sb["v"], sb["b"])
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    def test_indivisible_shard_raises(self):
        q, k, v, bias = _attn_inputs(B=6)  # 6 % 8 != 0
        with kernel_mesh_scope(_mesh((8, 1))):
            with pytest.raises(ValueError, match="cannot shard"):
                pa.pair_bias_attention_pallas(q, k, v, bias, num_heads=4)


class TestMaskedMesh:
    def _inputs(self, B=8, H=4, Nq=16, Nk=24, D=32, seed=1):
        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(B, Nq, H * D).astype(np.float32))
        k = jnp.asarray(rng.randn(B, Nk, H * D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, Nk, H * D).astype(np.float32))
        mask = np.zeros((B, 1, Nk), np.float32)
        mask[:, :, Nk - 4:] = -10000.0
        return q, k, v, jnp.asarray(mask)

    def _grads(self, H, q, k, v, mask):
        def loss(q, k, v):
            out = pa.masked_attention_pallas(q, k, v, mask, num_heads=H)
            return jnp.sum(out * out)

        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(q, k, v)

    @pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
    def test_mesh_matches_unmeshed(self, shape):
        q, k, v, mask = self._inputs()
        ref_v, ref_g = self._grads(4, q, k, v, mask)
        with kernel_mesh_scope(_mesh(shape)):
            got_v, got_g = self._grads(4, q, k, v, mask)
        np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
        for name, a, b in zip("qkv", got_g, ref_g):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                err_msg=f"d{name}",
            )


class TestGbfMesh:
    """The fused Gaussian-projection kernel: its parameters are replicated
    over 'data' (and w1/means over 'model' too), so their cotangents exercise
    shard_map's replication->psum transpose."""

    def _inputs(self, B=8, N=16, K=16, Kh=16, H=16, seed=2):
        rng = np.random.RandomState(seed)
        return (
            jnp.asarray(rng.rand(B, N, N).astype(np.float32) * 4),
            jnp.asarray(rng.randn(K).astype(np.float32)),
            jnp.asarray(rng.rand(K).astype(np.float32) + 0.5),
            jnp.asarray(rng.randn(K, Kh).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(Kh).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(Kh, H).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(H).astype(np.float32) * 0.1),
        )

    def _grads(self, args):
        def loss(*a):
            out = pg.gbf_pair_bias_fused(*a)
            return jnp.sum(out * out)

        return jax.jit(jax.value_and_grad(loss, argnums=tuple(range(7))))(*args)

    @pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
    def test_mesh_matches_unmeshed(self, shape):
        args = self._inputs()
        ref_v, ref_g = self._grads(args)
        with kernel_mesh_scope(_mesh(shape)):
            got_v, got_g = self._grads(args)
        np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
        names = ["u", "means", "stds", "w1", "b1", "w2", "b2"]
        for name, a, b in zip(names, got_g, ref_g):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
                err_msg=f"d{name}",
            )


class TestMeshAwareGates:
    """supported() answers under an active mesh: indivisible combinations
    must report False (the dispatchers then keep the GSPMD'd XLA path)."""

    def test_pair_bias_gate(self):
        with kernel_mesh_scope(_mesh((8, 1))):
            assert pa.pallas_attention_supported(64, 8, 64, batch=32)
            assert not pa.pallas_attention_supported(64, 8, 64, batch=30)
        with kernel_mesh_scope(_mesh((4, 2))):
            assert pa.pallas_attention_supported(64, 8, 64, batch=32)
            assert not pa.pallas_attention_supported(3, 8, 64, batch=32)  # H % 2
        # no mesh: batch is unconstrained
        assert pa.pallas_attention_supported(64, 8, 64, batch=30)

    def test_masked_gate(self):
        with kernel_mesh_scope(_mesh((4, 2))):
            assert pa.masked_attention_supported(8, 64, 16, 24, batch=8)
            assert not pa.masked_attention_supported(8, 64, 16, 24, batch=6)
            assert not pa.masked_attention_supported(5, 64, 16, 24, batch=8)

    def test_gbf_gate(self):
        with kernel_mesh_scope(_mesh((4, 2))):
            # heads must stay %8 per shard: 16/2=8 ok, 8/2=4 not
            assert pg.gbf_fused_supported(64, 128, 128, 16, "gelu_tanh", batch=8)
            assert not pg.gbf_fused_supported(64, 128, 128, 8, "gelu_tanh", batch=8)
            assert not pg.gbf_fused_supported(64, 128, 128, 16, "gelu_tanh", batch=6)
        with kernel_mesh_scope(_mesh((8, 1))):
            assert pg.gbf_fused_supported(64, 128, 128, 8, "gelu_tanh", batch=8)


class TestDropoutDecorrelation:
    @pytest.fixture(autouse=True)
    def _fake_prng(self, monkeypatch):
        """pltpu.prng_* has no interpret-mode lowering; substitute the same
        deterministic (seed, program)-keyed hash mask test_pallas.py uses —
        what matters here is that the mask DEPENDS on the seed value, which
        carries the per-shard axis_index offset."""
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

    def test_data_shards_draw_independent_masks(self):
        """Identical per-row inputs: every shard runs program id 0 for its
        row, so WITHOUT the per-shard seed offset all 8 rows would come back
        identical.  With it, shards must differ."""
        B, H, N, D = 8, 4, 16, 32
        rng = np.random.RandomState(3)
        row = rng.randn(1, N, H * D).astype(np.float32)
        q = k = v = jnp.asarray(np.repeat(row, B, axis=0))
        bias = jnp.zeros((B, H, N, N), jnp.float32)
        key = jax.random.PRNGKey(7)
        with kernel_mesh_scope(_mesh((8, 1))):
            out, _ = pa.pair_bias_attention_pallas(
                q, k, v, bias, num_heads=H, dropout_rate=0.5,
                dropout_rng=key, deterministic=False,
            )
        out = np.asarray(out)
        diffs = [
            not np.allclose(out[i], out[j])
            for i in range(B) for j in range(i + 1, B)
        ]
        assert all(diffs), "per-shard dropout masks are correlated"


class TestRegistryThreadIsolation:
    def test_mesh_does_not_leak_across_threads(self):
        """The registry is thread-local: a mesh registered on one thread
        (e.g. a serving dispatch thread) must not reroute kernels traced on
        another (e.g. a Trainer's fit thread) — each owner re-asserts its
        own mesh on its own thread."""
        import threading

        from mmdti_tpu.parallel.mesh import get_kernel_mesh, set_kernel_mesh

        set_kernel_mesh(_mesh((8, 1)))
        seen = {}

        def other():
            seen["initial"] = get_kernel_mesh()
            set_kernel_mesh(_mesh((4, 2)))
            seen["own"] = get_kernel_mesh()

        t = threading.Thread(target=other)
        t.start()
        t.join()
        assert seen["initial"] is None            # no leak in
        assert seen["own"] is not None            # its own registration works
        assert get_kernel_mesh() is not None      # no leak back out
        assert dict(get_kernel_mesh().shape) == {"data": 8, "model": 1}
        set_kernel_mesh(None)


@pytest.mark.heavy
class TestMeshedModelStep:
    """The whole model under mesh + Pallas: parity with the meshed XLA path
    and the no-pair-all-gather HLO guarantee (VERDICT r3 item 1a/1b)."""

    B, N, L = 8, 8, 16

    def _model(self, use_pallas):
        return build_model(
            output_dim=1, atom_vocab_size=35, atom_pad_idx=1, task="regression",
            smiles_vocab_size=64, compute_dtype="float32",
            use_pallas=use_pallas,
            unimol_overrides={
                "encoder_layers": 2, "embed_dim": 64, "ffn_embed_dim": 64,
                "attention_heads": 8, "dropout": 0.0, "emb_dropout": 0.0,
                "attention_dropout": 0.0, "pooler_dropout": 0.0,
                "pair_dtype": "float32",
            },
            chemberta_overrides={
                "hidden_size": 64, "num_hidden_layers": 1,
                "num_attention_heads": 4, "intermediate_size": 64,
                "hidden_dropout_prob": 0.0,
                "attention_probs_dropout_prob": 0.0,
            },
        )

    def _batch(self):
        rng = np.random.RandomState(0)
        toks = rng.randint(4, 30, (self.B, self.N))
        toks[:, 0] = 0
        toks[:, -1] = 2
        feats = {
            "src_tokens": jnp.asarray(toks),
            "src_distance": jnp.asarray(
                rng.rand(self.B, self.N, self.N).astype(np.float32) * 4
            ),
            "src_edge_type": jnp.asarray(
                rng.randint(0, 35 * 35, (self.B, self.N, self.N))
            ),
            "input_ids": jnp.asarray(rng.randint(4, 60, (self.B, self.L))),
            "attention_mask": jnp.asarray(np.ones((self.B, self.L), np.int32)),
        }
        return feats, jnp.asarray(rng.randn(self.B, 1).astype(np.float32))

    def _loss_and_grads(self, model, params, feats, y):
        def loss_fn(p, f, y):
            out = model.apply({"params": p}, **f, deterministic=True)
            return jnp.mean((out["logits"] - y) ** 2) + 0.1 * out["infonce_loss"]

        return jax.jit(jax.value_and_grad(loss_fn)), loss_fn

    def test_meshed_pallas_matches_meshed_xla(self, monkeypatch):
        mesh = _mesh((8, 1))
        feats, y = self._batch()
        model_p = self._model(True)
        model_x = self._model(False)
        key = jax.random.PRNGKey(0)
        params = model_x.init({"params": key, "dropout": key}, **feats,
                              deterministic=True)["params"]

        # prove the fused kernels actually engage under the mesh (the parity
        # would be vacuously true if the dispatcher silently fell back)
        calls = {"pair": 0}
        orig = pa.pair_bias_attention_pallas

        def counting(*a, **k):
            calls["pair"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(pa, "pair_bias_attention_pallas", counting)

        results = {}
        with kernel_mesh_scope(mesh):
            p = replicate(mesh, params)
            f = shard_batch(mesh, feats)
            ys = shard_batch(mesh, {"y": y})["y"]
            for name, model in (("pallas", model_p), ("xla", model_x)):
                step, _ = self._loss_and_grads(model, p, f, ys)
                loss, grads = step(p, f, ys)
                results[name] = (float(loss), jax.device_get(grads))
        assert calls["pair"] >= 2, "pallas path did not engage under the mesh"
        np.testing.assert_allclose(
            results["pallas"][0], results["xla"][0], rtol=2e-4
        )
        flat_p = jax.tree_util.tree_flatten_with_path(results["pallas"][1])[0]
        flat_x = jax.tree.leaves(results["xla"][1])
        for (path, a), b in zip(flat_p, flat_x):
            np.testing.assert_allclose(
                a, b, rtol=5e-3, atol=5e-4, err_msg=jax.tree_util.keystr(path)
            )

    def test_no_pair_sized_all_gather_in_hlo(self):
        mesh = _mesh((8, 1))
        feats, y = self._batch()
        model = self._model(True)
        key = jax.random.PRNGKey(0)
        with kernel_mesh_scope(mesh):
            params = model.init({"params": key, "dropout": key}, **feats,
                                deterministic=True)["params"]
            p = replicate(mesh, params)
            f = shard_batch(mesh, feats)
            ys = shard_batch(mesh, {"y": y})["y"]

            def loss_fn(p, f, y):
                out = model.apply({"params": p}, **f, deterministic=True)
                return jnp.mean((out["logits"] - y) ** 2) + 0.1 * out["infonce_loss"]

            step = jax.jit(jax.value_and_grad(loss_fn))
            txt = step.lower(p, f, ys).compile().as_text()

        # global pair tensor is B*H*N*N elems; any gather at that scale means
        # GSPMD replicated the pair chain across the data axis
        pair_elems = self.B * 8 * self.N * self.N
        offenders = []
        for line in txt.splitlines():
            if "all-gather" not in line and "all-to-all" not in line:
                continue
            for dims in re.findall(r"\w+\[([0-9,]*)\]", line):
                if not dims:
                    continue
                n = int(np.prod([int(d) for d in dims.split(",")]))
                if n >= pair_elems:
                    offenders.append(line.strip())
        assert not offenders, "pair-sized gather in HLO:\n" + "\n".join(offenders)


class TestCompiledMosaicUnderShardMapOnChip:
    """Chip-only (auto-skip on CPU): the compiled — NOT interpret — Mosaic
    kernels execute inside jax.shard_map on the real TPU via a FORCED
    1-device mesh (set_kernel_mesh(force=True) bypasses the size-1 nulling),
    bit-identical to the unmeshed kernels, values and grads, with and
    without dropout.  Closes the half of the shard_map x Mosaic composition
    risk that one chip can physically test (VERDICT r4 #3); the full probe
    with all three families is scripts/shardmap_chip_probe.py."""

    def test_pair_bias_compiled_shard_map_parity(self, monkeypatch):
        if jax.default_backend() != "tpu":
            pytest.skip("needs the real TPU (compiled Mosaic lowering)")
        monkeypatch.undo()  # drop the autouse interpret patch: compiled path
        from mmdti_tpu.parallel.mesh import (
            DATA_AXIS, MODEL_AXIS, set_kernel_mesh,
        )

        B, H, D, N = 8, 64, 8, 64
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, N, H * D), jnp.float32).astype(jnp.bfloat16)
        bias = jnp.asarray(rng.randn(B, H, N, N) * 0.1,
                           jnp.float32).astype(jnp.bfloat16)
        key = jax.random.PRNGKey(7)

        def loss(q, bias):
            o, lgt = pa.pair_bias_attention_pallas(
                q, q, q, bias, num_heads=H, dropout_rate=0.1, dropout_rng=key,
                deterministic=False, pair_dtype=jnp.bfloat16)
            return ((o.astype(jnp.float32) ** 2).mean()
                    + (lgt.astype(jnp.float32) ** 2).mean())

        set_kernel_mesh(None)
        v0, g0 = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(q, bias)
        jax.block_until_ready((v0, g0))
        mesh = jax.make_mesh((1, 1), (DATA_AXIS, MODEL_AXIS))
        try:
            set_kernel_mesh(mesh, force=True)
            v1, g1 = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(q, bias)
            jax.block_until_ready((v1, g1))
        finally:
            set_kernel_mesh(None)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
