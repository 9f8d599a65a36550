"""Loss math tests against independent numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdti_tpu.configs.architectures import FDSConfig
from mmdti_tpu.losses import (
    ct_multi,
    ct_regress,
    ct_single,
    fds_bucket_params,
    fds_kernel_window,
    fds_smooth,
    fds_update_last_epoch_stats,
    fds_update_running_stats,
    info_nce_loss,
    init_fds_state,
    zoo,
)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestInfoNCE:
    def test_matches_oracle(self):
        rng = np.random.RandomState(0)
        q = rng.randn(6, 8).astype(np.float32)
        p = rng.randn(6, 8).astype(np.float32)
        got = float(info_nce_loss(jnp.asarray(q), jnp.asarray(p), temperature=0.1))

        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        pn = p / np.linalg.norm(p, axis=1, keepdims=True)
        logits = qn @ pn.T / 0.1
        ce1 = -np.log(_softmax(logits)[np.arange(6), np.arange(6)]).mean()
        ce2 = -np.log(_softmax(logits.T)[np.arange(6), np.arange(6)]).mean()
        np.testing.assert_allclose(got, (ce1 + ce2) / 2, rtol=1e-5)

    def test_perfect_alignment_is_low(self):
        x = np.eye(4, 8).astype(np.float32) * 10
        aligned = float(info_nce_loss(jnp.asarray(x), jnp.asarray(x)))
        shuffled = float(info_nce_loss(jnp.asarray(x), jnp.asarray(x[::-1].copy())))
        assert aligned < shuffled


def _oracle_pair_loss(prod, pos, neg, push, denom):
    neg_exp = (push * np.exp(prod * neg) * neg).sum(1)
    z = np.exp(prod * pos).sum(1) + neg_exp
    li = (-(prod * pos - np.log(z)[:, None]) * pos).sum(1) / denom
    return float((li * (neg.sum(1) > 0)).mean())


class TestCTRegress:
    def test_matches_oracle(self):
        rng = np.random.RandomState(1)
        B, F = 8, 16
        f = rng.randn(B, F).astype(np.float32)
        y = rng.randn(B, 1).astype(np.float32)
        out = rng.randn(B, 1).astype(np.float32)
        wts = rng.rand(B).astype(np.float32) + 0.5
        w, t, e = 0.2, 0.07, 0.01
        got = float(ct_regress(jnp.asarray(f), jnp.asarray(y), jnp.asarray(out),
                               jnp.asarray(wts), w=w, t=t, e=e))

        fn = f / np.linalg.norm(f, axis=1, keepdims=True)
        l = y.reshape(B, -1).mean(1)[:, None]
        p = out.reshape(B, -1).mean(1)[:, None]
        ld, pdist = np.abs(l - l.T), np.abs(p - p.T)
        pos = (ld <= w).astype(float)
        np.fill_diagonal(pos, 0.0)
        neg = ((~(ld <= w)) & (pdist <= w)).astype(float)
        prod = fn @ fn.T / t
        push = ld * wts.reshape(B, 1) * e
        want = _oracle_pair_loss(prod, pos, neg, push, (ld <= w).sum(1))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_no_negatives_zero_loss(self):
        # identical labels => no negatives anywhere => loss 0
        f = np.random.RandomState(0).randn(6, 8).astype(np.float32)
        y = np.ones((6, 1), np.float32)
        out = np.ones((6, 1), np.float32)
        assert float(ct_regress(jnp.asarray(f), jnp.asarray(y), jnp.asarray(out))) == 0.0

    def test_nan_targets_masked(self):
        """NaN-masked multilabel-regression targets must not poison the loss:
        partially-NaN rows keep their valid columns (nanmean), all-NaN rows
        drop out of every pair, and loss + grads stay finite."""
        rng = np.random.RandomState(4)
        B = 8
        f = rng.randn(B, 16).astype(np.float32)
        y = rng.randn(B, 2).astype(np.float32)
        y[1, 0] = np.nan  # partial NaN: row keeps its valid column
        y[5, :] = np.nan  # all-NaN row: excluded from every pair
        out = rng.randn(B, 1).astype(np.float32)
        wts = rng.rand(B).astype(np.float32) + 0.5
        w, t, e = 0.5, 0.07, 0.01
        loss, grad = jax.value_and_grad(
            lambda ff: ct_regress(ff, jnp.asarray(y), jnp.asarray(out),
                                  jnp.asarray(wts), w=w, t=t, e=e)
        )(jnp.asarray(f))
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(grad)).all()

        fn = f / np.linalg.norm(f, axis=1, keepdims=True)
        with np.errstate(invalid="ignore"):
            l = np.nanmean(y, axis=1)[:, None]
        p = out.mean(1)[:, None]
        ld, pdist = np.abs(l - l.T), np.abs(p - p.T)
        valid = ~np.isnan(ld)
        ld = np.where(valid, ld, np.inf)
        pos = (ld <= w).astype(float)
        np.fill_diagonal(pos, 0.0)
        neg = (valid & ~(ld <= w) & (pdist <= w)).astype(float)
        prod = fn @ fn.T / t
        push = np.where(valid, ld, 0.0) * wts[:, None] * e
        denom = np.maximum((ld <= w).sum(1), 1.0)
        want = _oracle_pair_loss(prod, pos, neg, push, denom)
        np.testing.assert_allclose(float(loss), want, rtol=1e-4)


class TestCTSingle:
    def test_matches_oracle_keywise_weights(self):
        rng = np.random.RandomState(2)
        B, F = 8, 12
        f = rng.randn(B, F).astype(np.float32)
        y = rng.randint(0, 2, (B, 1)).astype(np.float32)
        wts = rng.rand(B).astype(np.float32) + 0.5
        got = float(ct_single(jnp.asarray(f), jnp.asarray(y), None, jnp.asarray(wts)))

        fn = f / np.linalg.norm(f, axis=1, keepdims=True)
        ld = np.abs(y[:, :1] - y[:, :1].T)
        pos = (ld == 0).astype(float)
        np.fill_diagonal(pos, 0.0)
        neg = (ld != 0).astype(float)
        prod = fn @ fn.T / 0.07
        push = wts.reshape(1, B)  # per-key broadcast, reference semantics
        denom = pos.sum(1)
        denom[denom == 0] = 1.0
        want = _oracle_pair_loss(prod, pos, neg, push, denom)
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestCTMulti:
    def test_agreement_threshold(self):
        rng = np.random.RandomState(3)
        B, C = 6, 4
        f = rng.randn(B, 8).astype(np.float32)
        y = rng.randint(0, 2, (B, C))
        loss = float(ct_multi(jnp.asarray(f), jnp.asarray(y), None))
        assert np.isfinite(loss)

    def test_all_same_labels_no_negatives(self):
        f = np.random.RandomState(0).randn(4, 8).astype(np.float32)
        y = np.ones((4, 3), np.int32)
        assert float(ct_multi(jnp.asarray(f), jnp.asarray(y), None)) == 0.0


class TestFDS:
    def _cfg(self):
        return FDSConfig(feature_dim=4, bucket_num=5, bucket_start=0,
                         start_update=0, start_smooth=1, ks=3, sigma=1.0, momentum=0.9)

    def test_bucket_params(self):
        vals = np.linspace(0, 10, 100)
        mn, bw = fds_bucket_params(vals, 10, using_scale=False)
        assert mn == 0.0
        np.testing.assert_allclose(bw, 1.0)

    def test_running_stats_update(self):
        cfg = self._cfg()
        state = init_fds_state(cfg)
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(20, 4).astype(np.float32))
        labels = jnp.asarray(rng.uniform(0, 5, 20).astype(np.float32))
        s1 = fds_update_running_stats(state, feats, labels, jnp.asarray(0.0), 0.0, 1.0, cfg)
        # epoch == start_update => factor 0 => running mean == batch mean per bucket
        bins = np.clip(np.floor(np.asarray(labels)).astype(int), 0, 4)
        for b in np.unique(bins):
            want = np.asarray(feats)[bins == b].mean(0)
            np.testing.assert_allclose(np.asarray(s1["running_mean"])[b], want, atol=1e-5)

    def test_ema_second_epoch(self):
        cfg = self._cfg()
        state = init_fds_state(cfg)
        f0 = jnp.ones((8, 4)) * 2.0
        y = jnp.full((8,), 1.5)
        s1 = fds_update_running_stats(state, f0, y, jnp.asarray(0.0), 0.0, 1.0, cfg)
        f1 = jnp.ones((8, 4)) * 6.0
        s2 = fds_update_running_stats(s1, f1, y, jnp.asarray(1.0), 0.0, 1.0, cfg)
        # bucket 1: 0.1*6 + 0.9*2 = 2.4
        np.testing.assert_allclose(np.asarray(s2["running_mean"])[1], 2.4, atol=1e-5)

    def test_witness_rule(self):
        cfg = self._cfg()
        state = init_fds_state(cfg)
        # labels: one sample beyond top bucket, NO sample exactly in top bucket
        labels = jnp.asarray([0.5, 1.5, 99.0])
        feats = jnp.ones((3, 4))
        s = fds_update_running_stats(state, feats, labels, jnp.asarray(0.0), 0.0, 1.0, cfg)
        # top bucket (4) untouched: mean still 0
        np.testing.assert_allclose(np.asarray(s["running_mean"])[4], 0.0)

    def test_smooth_gate_and_calibration(self):
        cfg = self._cfg()
        state = init_fds_state(cfg)
        state["running_mean_last_epoch"] = jnp.ones((5, 4)) * 2.0
        state["running_var_last_epoch"] = jnp.ones((5, 4)) * 4.0
        state["smoothed_mean_last_epoch"] = jnp.zeros((5, 4))
        state["smoothed_var_last_epoch"] = jnp.ones((5, 4))
        feats = jnp.ones((2, 4)) * 3.0
        labels = jnp.asarray([0.5, 1.5])
        # epoch 0 < start_smooth => unchanged
        out0 = fds_smooth(state, feats, labels, jnp.asarray(0.0), 0.0, 1.0, cfg)
        np.testing.assert_allclose(np.asarray(out0), 3.0)
        # epoch >= start_smooth => (3-2)*sqrt(1/4)+0 = 0.5
        out1 = fds_smooth(state, feats, labels, jnp.asarray(1.0), 0.0, 1.0, cfg)
        np.testing.assert_allclose(np.asarray(out1), 0.5, atol=1e-6)

    def test_epoch_update_matches_sequential(self):
        """The single-program fds_epoch_update (one jit dispatch per epoch,
        collective-rendezvous-safe on virtual-device meshes) must equal the
        sequential last-epoch-roll + running-stats composition."""
        from mmdti_tpu.losses.fds import fds_epoch_update

        cfg = self._cfg()
        state = init_fds_state(cfg)
        rng = np.random.RandomState(1)
        win = fds_kernel_window(cfg.kernel, cfg.ks, cfg.sigma)
        feats = jnp.asarray(rng.randn(16, 4).astype(np.float32))
        labels = jnp.asarray(rng.uniform(0, 5, 16).astype(np.float32))
        seq = state
        fused = state
        for epoch in (0.0, 1.0, 2.0):
            e = jnp.asarray(epoch)
            seq = fds_update_last_epoch_stats(seq, e, win)
            seq = fds_update_running_stats(seq, feats, labels, e, 0.0, 1.0, cfg)
            fused = fds_epoch_update(fused, feats, labels, e, 0.0, 1.0, win, cfg)
        for k in seq:
            np.testing.assert_allclose(
                np.asarray(seq[k]), np.asarray(fused[k]), atol=1e-6, err_msg=k
            )

    def test_kernel_smoothing_epoch_gate(self):
        cfg = self._cfg()
        state = init_fds_state(cfg)
        state["running_mean"] = jnp.asarray(
            np.outer([0, 0, 9, 0, 0], np.ones(4)).astype(np.float32)
        )
        win = fds_kernel_window(cfg.kernel, cfg.ks, cfg.sigma)
        s1 = fds_update_last_epoch_stats(state, jnp.asarray(1.0), win)  # epoch==state.epoch+1
        sm = np.asarray(s1["smoothed_mean_last_epoch"])[:, 0]
        assert sm[2] < 9.0 and sm[1] > 0.0  # mass spread to neighbors
        np.testing.assert_allclose(sm.sum(), 9.0, atol=1e-4)  # kernel sums to 1
        s_nogate = fds_update_last_epoch_stats(state, jnp.asarray(5.0), win)
        np.testing.assert_allclose(
            np.asarray(s_nogate["smoothed_mean_last_epoch"]), 0.0
        )  # gate not hit => unchanged defaults


class TestZoo:
    def test_mse_ce(self):
        x = jnp.asarray([[1.0], [2.0]])
        y = jnp.asarray([[0.0], [0.0]])
        np.testing.assert_allclose(float(zoo.mse_loss(x, y)), 2.5)
        logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
        t = jnp.asarray([0, 1])
        assert float(zoo.cross_entropy_loss(logits, t)) < 1e-3

    def test_mae_with_nan(self):
        x = jnp.asarray([[1.0, 5.0]])
        y = jnp.asarray([[0.0, np.nan]])
        np.testing.assert_allclose(float(zoo.mae_with_nan(x, y)), 1.0)

    def test_bce_matches_formula(self):
        rng = np.random.RandomState(0)
        x = rng.randn(10, 3).astype(np.float32)
        y = rng.randint(0, 2, (10, 3)).astype(np.float32)
        got = float(zoo.bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
        p = 1 / (1 + np.exp(-x))
        want = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_focal_masks_invalid(self):
        x = jnp.asarray([[0.0, 0.0]])
        y = jnp.asarray([[1.0, np.nan]])
        assert np.isfinite(float(zoo.focal_loss_with_logits(x, y)))

    def test_ghmc_state_threading(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(16, 2).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 2, (16, 2)).astype(np.float32))
        l1, bins1 = zoo.ghmc_loss(x, y)
        l2, bins2 = zoo.ghmc_loss(x, y, last_bin_count=bins1)
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
        np.testing.assert_allclose(np.asarray(bins2), np.asarray(bins1), atol=1e-5)

    def test_gradients_flow(self):
        x = jnp.ones((4, 1))
        y = jnp.zeros((4, 1))
        g = jax.grad(lambda a: zoo.mse_loss(a, y))(x)
        np.testing.assert_allclose(np.asarray(g), 0.5)


class TestTorchOracleGHM:
    """Value-level parity of the GHM losses against a torch port of
    /root/reference/models/loss.py:19-178 (GHM_Loss base + GHMC/GHMR),
    including the EMA bin-count state across two sequential calls."""

    @staticmethod
    def _torch_ghm(torch, x, y, last_bin_count, bins, alpha, kind, mu=0.02):
        import torch.nn.functional as F

        if kind == "c":
            g = (torch.sigmoid(x) - y).abs()
        else:
            d = x - y
            g = (d / torch.sqrt(d * d + mu * mu)).abs()
        bin_idx = torch.floor(g * (bins - 0.0001)).long()
        bin_count = torch.zeros((bins,))
        for i in range(bins):
            bin_count[i] = (bin_idx == i).sum().item()
        n = x.size(0) * x.size(1)
        if last_bin_count is not None:
            bin_count = alpha * last_bin_count + (1 - alpha) * bin_count
        nonempty = (bin_count > 0).sum().item()
        gd = torch.clamp(bin_count * nonempty, min=0.0001)
        beta = (n / gd).type_as(x)
        if kind == "c":
            loss = F.binary_cross_entropy_with_logits(x, y, weight=beta[bin_idx])
        else:
            d = x - y
            loss = ((torch.sqrt(d * d + mu * mu) - mu) * beta[bin_idx]).sum() / n
        return loss, bin_count

    def test_ghmc_matches_torch_with_ema(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(11)
        x0 = rng.randn(16, 3).astype(np.float32)
        y0 = rng.randint(0, 2, (16, 3)).astype(np.float32)
        x1 = rng.randn(16, 3).astype(np.float32) * 2.0
        y1 = rng.randint(0, 2, (16, 3)).astype(np.float32)
        with torch.no_grad():
            w0, b0 = self._torch_ghm(torch, torch.from_numpy(x0),
                                     torch.from_numpy(y0), None, 10, 0.5, "c")
            w1, b1 = self._torch_ghm(torch, torch.from_numpy(x1),
                                     torch.from_numpy(y1), b0, 10, 0.5, "c")
        l0, s0 = zoo.ghmc_loss(jnp.asarray(x0), jnp.asarray(y0))
        l1, s1 = zoo.ghmc_loss(jnp.asarray(x1), jnp.asarray(y1), last_bin_count=s0)
        np.testing.assert_allclose(float(l0), float(w0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s0), b0.numpy(), atol=1e-5)
        np.testing.assert_allclose(float(l1), float(w1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s1), b1.numpy(), atol=1e-5)

    def test_ghmr_matches_torch_with_ema(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(12)
        x0 = rng.randn(12, 2).astype(np.float32)
        y0 = rng.randn(12, 2).astype(np.float32)
        x1 = rng.randn(12, 2).astype(np.float32)
        y1 = rng.randn(12, 2).astype(np.float32)
        with torch.no_grad():
            w0, b0 = self._torch_ghm(torch, torch.from_numpy(x0),
                                     torch.from_numpy(y0), None, 10, 0.5, "r")
            w1, b1 = self._torch_ghm(torch, torch.from_numpy(x1),
                                     torch.from_numpy(y1), b0, 10, 0.5, "r")
        l0, s0 = zoo.ghmr_loss(jnp.asarray(x0), jnp.asarray(y0))
        l1, s1 = zoo.ghmr_loss(jnp.asarray(x1), jnp.asarray(y1), last_bin_count=s0)
        np.testing.assert_allclose(float(l0), float(w0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s0), b0.numpy(), atol=1e-5)
        np.testing.assert_allclose(float(l1), float(w1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s1), b1.numpy(), atol=1e-5)


class TestTorchOracleInfoNCEModule:
    """Value-level parity of the full InfoNCE flax module against a torch port
    of /root/reference/models/infonce.py:20-38 (VERDICT r2 missing #3): the
    projection MLPs (E -> E -> 50, erf GELU between), mean-pool over ALL token
    positions (including padding, reference quirk), unit-normalize, in-batch
    similarity with diagonal positives, symmetric CE at temperature 0.1.
    Deterministic mode (query dropout off) so values are comparable."""

    def test_module_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from mmdti_tpu.losses.infonce import InfoNCE

        B, N, L, E = 4, 5, 7, 32
        rng = np.random.RandomState(9)
        q_tokens = rng.randn(B, N, E).astype(np.float32)   # 3D-graph stream
        p_tokens = rng.randn(B, L, E).astype(np.float32)   # SMILES stream
        module = InfoNCE()
        vars_ = module.init(
            jax.random.PRNGKey(0), jnp.asarray(q_tokens), jnp.asarray(p_tokens),
            deterministic=True,
        )
        got = float(
            module.apply(vars_, jnp.asarray(q_tokens), jnp.asarray(p_tokens),
                         deterministic=True)
        )
        p = jax.tree.map(np.asarray, vars_["params"])

        def t(a):
            return torch.from_numpy(np.asarray(a, np.float32))

        def mlp(x, name):
            x = x @ t(p[f"{name}_fc1"]["kernel"]) + t(p[f"{name}_fc1"]["bias"])
            x = F.gelu(x)  # erf gelu = torch nn.GELU default
            return x @ t(p[f"{name}_fc2"]["kernel"]) + t(p[f"{name}_fc2"]["bias"])

        with torch.no_grad():
            proj_q = mlp(t(q_tokens), "proj_query").mean(dim=1)
            proj_p = mlp(t(p_tokens), "proj_positive").mean(dim=1)
            qn = F.normalize(proj_q, dim=-1)
            pn = F.normalize(proj_p, dim=-1)
            logits = qn @ pn.T
            labels = torch.arange(B)
            want = (
                F.cross_entropy(logits / 0.1, labels)
                + F.cross_entropy(logits.T / 0.1, labels)
            ) / 2
        np.testing.assert_allclose(got, float(want), rtol=2e-5)

    def test_projection_shape_is_50(self):
        """Reference pins d_l = d_av = 50 (infonce.py:14)."""
        from mmdti_tpu.losses.infonce import InfoNCE

        module = InfoNCE()
        vars_ = module.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 3, 16)), jnp.zeros((2, 4, 16)),
            deterministic=True,
        )
        p = jax.tree.map(np.asarray, vars_["params"])
        assert p["proj_query_fc2"]["kernel"].shape == (16, 50)
        assert p["proj_positive_fc2"]["kernel"].shape == (16, 50)


class TestFDSBucketGuards:
    def test_constant_labels_fail_loudly(self):
        """bin_width 0 would NaN every bucket assignment silently."""
        import pytest as _pytest

        from mmdti_tpu.losses.fds import fds_bucket_params

        with _pytest.raises(ValueError, match="zero range"):
            fds_bucket_params(np.full(20, 3.0), bucket_num=10)

    def test_all_nan_labels_fail_loudly(self):
        import pytest as _pytest

        from mmdti_tpu.losses.fds import fds_bucket_params

        with _pytest.raises(ValueError, match="no finite"):
            fds_bucket_params(np.full(5, np.nan), bucket_num=10)
