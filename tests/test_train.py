"""Trainer mechanics: DP-vs-single-device parity on 8 virtual devices,
checkpoint roundtrip, schedule shape, freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdti_tpu.models import build_model
from mmdti_tpu.parallel import make_mesh, param_sharding, replicate, shard_batch
from mmdti_tpu.train import load_checkpoint, make_optimizer, save_checkpoint
from mmdti_tpu.train.optim import linear_warmup_schedule


def _tiny_model():
    return build_model(
        output_dim=1, atom_vocab_size=35, atom_pad_idx=1, task="regression",
        smiles_vocab_size=64, compute_dtype="float32",
        unimol_overrides={
            "encoder_layers": 1, "embed_dim": 16, "ffn_embed_dim": 32,
            "attention_heads": 2, "dropout": 0.0, "emb_dropout": 0.0,
            "attention_dropout": 0.0, "pooler_dropout": 0.0,
        },
        chemberta_overrides={
            "hidden_size": 16, "num_hidden_layers": 1, "num_attention_heads": 2,
            "intermediate_size": 32, "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0,
        },
    )


def _batch(B=8, N=8, L=10, seed=0):
    rng = np.random.RandomState(seed)
    toks = rng.randint(4, 30, (B, N))
    toks[:, 0] = 0
    toks[:, -1] = 2
    return {
        "src_tokens": jnp.asarray(toks),
        "src_distance": jnp.asarray(rng.rand(B, N, N).astype(np.float32) * 4),
        "src_edge_type": jnp.asarray(rng.randint(0, 35 * 35, (B, N, N))),
        "input_ids": jnp.asarray(rng.randint(4, 60, (B, L))),
        "attention_mask": jnp.asarray(np.ones((B, L), np.int32)),
    }, jnp.asarray(rng.randn(B, 1).astype(np.float32))


class TestFusedAdamApply:
    """make_fused_apply == the optax chain's tx.update + p+u, bit-identical
    under jit (the production path), on the SAME tx.init state layout."""

    @pytest.mark.parametrize("mu_dtype", ["bfloat16", "float32"])
    @pytest.mark.parametrize("frozen", [False, True])
    def test_bit_identical_to_chain(self, mu_dtype, frozen):
        from mmdti_tpu.train.optim import make_fused_apply

        rng = np.random.RandomState(0)
        params = {
            "a": jnp.asarray(rng.randn(32, 64), jnp.float32),
            "b": {"w": jnp.asarray(rng.randn(128), jnp.float32),
                  "x": jnp.asarray(rng.randn(4, 4), jnp.float32)},
        }
        mask = {"a": False, "b": {"w": True, "x": False}} if frozen else None
        kw = dict(frozen_mask=mask, mu_dtype=mu_dtype)
        tx, _ = make_optimizer(1e-3, 50, 0.1, 0.5, **kw)
        fused = make_fused_apply(1e-3, 50, 0.1, 0.5, **kw)

        @jax.jit
        def chain_step(p, s, g):
            u, s = tx.update(g, s, p)
            return jax.tree.map(lambda q, uu: q + uu, p, u), s

        fused_step = jax.jit(lambda g, s, p: fused(g, s, p))
        s1 = tx.init(params)
        s2 = jax.tree.map(lambda x: x, s1)
        p1 = p2 = params
        for i in range(8):
            # alternate huge grads (clip TRIGGERS) and tiny ones (no clip)
            scale = 100.0 if i % 3 == 0 else 0.01
            g1 = jax.tree.map(lambda p: scale * jnp.sin(p + i), p1)
            g2 = jax.tree.map(lambda p: scale * jnp.sin(p + i), p2)
            p1, s1 = chain_step(p1, s1, g1)
            p2, s2 = fused_step(g2, s2, p2)
        for l1, l2 in zip(jax.tree.leaves((p1, s1)), jax.tree.leaves((p2, s2))):
            assert np.asarray(l1).dtype == np.asarray(l2).dtype
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        if frozen:
            np.testing.assert_array_equal(
                np.asarray(p2["b"]["w"]), np.asarray(params["b"]["w"])
            )


class TestSchedule:
    def test_linear_warmup_then_decay(self):
        sched = linear_warmup_schedule(1e-3, 100, 0.1)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
        np.testing.assert_allclose(float(sched(55)), 5e-4, rtol=1e-5)
        np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-9)


class TestDistributed:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    def test_dp_matches_single_device(self):
        """Data-parallel sharded step == single-device step (SURVEY §4)."""
        model = _tiny_model()
        feats, labels = _batch()
        key = jax.random.PRNGKey(0)
        variables = model.init({"params": key, "dropout": key}, **feats, deterministic=True)
        params0 = variables["params"]
        tx, _ = make_optimizer(1e-3, 100, 0.1, 1.0)

        def loss_fn(p, f, y):
            out = model.apply({"params": p}, **f, deterministic=True)
            task = jnp.mean((out["logits"] - y) ** 2)
            return task + 0.1 * out["infonce_loss"]

        @jax.jit
        def step(p, opt, f, y):
            loss, grads = jax.value_and_grad(loss_fn)(p, f, y)
            updates, opt = tx.update(grads, opt, p)
            return jax.tree.map(lambda a, b: a + b, p, updates), opt, loss

        results = {}
        for ndev in (1, 8):
            mesh = make_mesh((ndev, 1), devices=jax.devices()[:ndev])
            p = replicate(mesh, params0)
            opt = tx.init(p)
            f = shard_batch(mesh, feats)
            y = shard_batch(mesh, {"y": labels})["y"]
            p1, _, loss = step(p, opt, f, y)
            results[ndev] = (jax.device_get(loss), jax.device_get(p1))
        np.testing.assert_allclose(results[1][0], results[8][0], rtol=1e-5)
        flat1 = jax.tree.leaves(results[1][1])
        flat8 = jax.tree.leaves(results[8][1])
        for a, b in zip(flat1, flat8):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_tensor_parallel_sharding_compiles(self):
        """(data=4, model=2) mesh: TP-sharded params, step executes."""
        model = _tiny_model()
        feats, labels = _batch()
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, **feats, deterministic=True)["params"]
        mesh = make_mesh((4, 2))
        shardings = param_sharding(mesh, params)
        p = jax.device_put(params, shardings)
        f = shard_batch(mesh, feats)

        @jax.jit
        def fwd(p, f):
            out = model.apply({"params": p}, **f, deterministic=True)
            return out["logits"].sum()

        val = float(fwd(p, f))
        want = float(fwd(jax.device_put(params, None), jax.device_put(feats, None)))
        np.testing.assert_allclose(val, want, rtol=2e-4)

    def test_batch_size_rounds_up_to_data_axis(self):
        """batch_size must be divisible by the data-mesh axis (every batch is
        exactly batch_size rows and shards over it); the Trainer rounds up
        with a warning instead of failing device_put mid-fit."""
        from mmdti_tpu.train.trainer import Trainer

        t = Trainer(task="regression", metrics="mse", batch_size=8,
                    mesh=make_mesh((3, 2)))
        assert t.batch_size == 9  # next multiple of the 3-way data axis
        t2 = Trainer(task="regression", metrics="mse", batch_size=9,
                     mesh=make_mesh((3, 2)))
        assert t2.batch_size == 9  # divisible: untouched


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        model = _tiny_model()
        feats, _ = _batch(B=2)
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, **feats, deterministic=True)["params"]
        fds = {"running_mean": jnp.ones((5, 4))}
        save_checkpoint(str(tmp_path), 0, params, fds)
        ckpt = load_checkpoint(str(tmp_path), 0)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ckpt["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(ckpt["fds"]["running_mean"]), 1.0)


class TestFreezing:
    def test_frozen_params_do_not_move(self):
        tx, _ = make_optimizer(
            1e-1, 10, 0.0, 100.0,
            frozen_mask={"a": True, "b": False},
        )
        params = {"a": jnp.ones(3), "b": jnp.ones(3)}
        opt = tx.init(params)
        grads = {"a": jnp.ones(3), "b": jnp.ones(3)}
        updates, _ = tx.update(grads, opt, params)
        np.testing.assert_allclose(np.asarray(updates["a"]), 0.0)
        assert np.abs(np.asarray(updates["b"])).max() > 0


class TestOverfit:
    def test_loss_decreases(self):
        model = _tiny_model()
        feats, labels = _batch(B=8)
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, **feats, deterministic=True)["params"]
        tx, _ = make_optimizer(3e-3, 60, 0.05, 5.0)
        opt = tx.init(params)

        @jax.jit
        def step(p, o, f, y):
            def lf(p):
                out = model.apply({"params": p}, **f, deterministic=True)
                return jnp.mean((out["logits"] - y) ** 2)

            loss, grads = jax.value_and_grad(lf)(p)
            updates, o = tx.update(grads, o, p)
            return jax.tree.map(lambda a, b: a + b, p, updates), o, loss

        losses = []
        for _ in range(40):
            params, opt, l = step(params, opt, feats, labels)
            losses.append(float(l))
        assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]


class TestFrozenMaskClipOrdering:
    def test_frozen_grads_excluded_from_clip_norm(self):
        """Frozen-subtree gradients are zeroed BEFORE global-norm clipping, so
        a huge frozen gradient neither scales down the trainable updates nor
        moves the frozen params (reference requires_grad=False semantics)."""
        params = {"a": jnp.ones((4,)), "b": jnp.ones((4,))}
        mask = {"a": False, "b": True}  # b frozen
        tx, _ = make_optimizer(1e-2, 100, 0.0, max_norm=1.0, frozen_mask=mask)
        state = tx.init(params)
        grads_huge_frozen = {"a": jnp.full((4,), 0.1), "b": jnp.full((4,), 1e6)}
        grads_zero_frozen = {"a": jnp.full((4,), 0.1), "b": jnp.zeros((4,))}
        u1, _ = tx.update(grads_huge_frozen, state, params)
        u2, _ = tx.update(grads_zero_frozen, tx.init(params), params)
        np.testing.assert_allclose(np.asarray(u1["a"]), np.asarray(u2["a"]), rtol=1e-6)
        assert np.all(np.asarray(u1["b"]) == 0.0)


class TestResume:
    def test_train_state_roundtrip(self, tmp_path):
        from mmdti_tpu.train.trainer import load_train_state, save_train_state

        model = _tiny_model()
        feats, _ = _batch(B=2)
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, **feats, deterministic=True)["params"]
        tx, _ = make_optimizer(1e-3, 100, 0.1, 1.0)
        opt_state = tx.init(params)
        save_train_state(str(tmp_path), 0, params, opt_state, None, epoch=3, global_step=40)
        p2, o2, fds2, epoch, step, extra = load_train_state(str(tmp_path), 0, tx.init(params))
        assert epoch == 3 and step == 40 and fds2 is None
        assert extra["best_params"] is None and extra["early_stop"] is None
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_best_state_roundtrip(self, tmp_path):
        """Resume must carry the best-so-far weights and early-stop tracking,
        not just the current params (a resumed run would otherwise lose the
        true best checkpoint)."""
        from mmdti_tpu.train.trainer import load_train_state, save_train_state

        model = _tiny_model()
        feats, _ = _batch(B=2)
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, **feats, deterministic=True)["params"]
        best = jax.tree.map(lambda x: x * 2.0, params)
        tx, _ = make_optimizer(1e-3, 100, 0.1, 1.0)
        opt_state = tx.init(params)
        es = {"min_val_loss": 0.25, "wait": 2, "best_score": float("nan")}
        save_train_state(str(tmp_path), 0, params, opt_state, None, epoch=7,
                         global_step=80, best_params=best, early_stop=es)
        _, _, _, _, _, extra = load_train_state(str(tmp_path), 0, tx.init(params))
        assert extra["early_stop"]["min_val_loss"] == 0.25
        assert extra["early_stop"]["wait"] == 2.0
        assert np.isnan(extra["early_stop"]["best_score"])
        for a, b in zip(jax.tree.leaves(best), jax.tree.leaves(extra["best_params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestDeviceFeedNormalization:
    def test_string_spellings(self):
        from mmdti_tpu.train.trainer import _normalize_device_feed as norm

        assert norm("auto") == "auto" and norm("AUTO") == "auto"
        assert norm("true") is True and norm("on") is True and norm(1) is True
        assert norm("false") is False and norm("off") is False
        assert norm(False) is False and norm(None) is False

    def test_unknown_value_raises(self):
        from mmdti_tpu.train.trainer import _normalize_device_feed as norm

        with pytest.raises(ValueError, match="device_feed"):
            norm("maybe")


class TestDeviceFeedRowBuckets:
    def test_fold_sized_datasets_share_resident_shapes(self):
        """Resident arrays pad rows to 128-buckets so CV folds / protocol
        seeds whose splits differ by a few molecules hit ONE compiled epoch
        program instead of a fresh remote compile each (round 5; the batch
        index matrices never reference pad rows)."""
        from mmdti_tpu.train.trainer import Trainer

        t = Trainer(task="regression", metrics="mse", batch_size=8)

        class _DS:
            def __init__(self, n):
                self.n = n
            def __len__(self):
                return self.n
            def __getitem__(self, i):
                return {"src_tokens": np.array([0, 5, 2])}, np.float32(i)

        def collate(items):
            feats = {"src_tokens": np.stack([f["src_tokens"] for f, _ in items])}
            labels = np.asarray([y for _, y in items], np.float32).reshape(-1, 1)
            return feats, labels

        collate.pad_mode = "dataset"  # static pads (collate_dataset contract)

        shapes = {}
        for n in (130, 200, 256):
            f, l, w, labels_host = t._dataset_to_device(_DS(n), collate)
            shapes[n] = (f["src_tokens"].shape, l.shape, w.shape)
            assert labels_host.shape[0] == n          # host rows UNPADDED
            assert l.shape[0] == 256                  # bucketed
            # pad rows are zeros, real rows intact
            assert float(l[n:].sum()) == 0.0
            np.testing.assert_array_equal(
                np.asarray(l[:n]).reshape(-1), np.arange(n, dtype=np.float32)
            )
        assert shapes[130] == shapes[200] == shapes[256]


class TestAsyncSaver:
    def test_error_propagates_on_wait(self):
        from mmdti_tpu.train.trainer import _AsyncSaver

        s = _AsyncSaver()

        def boom():
            raise RuntimeError("disk full")

        s.submit(boom)
        with pytest.raises(RuntimeError, match="disk full"):
            s.wait()

    def test_submissions_serialize(self):
        import time as _t

        from mmdti_tpu.train.trainer import _AsyncSaver

        order = []
        s = _AsyncSaver()
        s.submit(lambda: (_t.sleep(0.05), order.append("a")))
        s.submit(lambda: order.append("b"))  # must join the first save
        s.wait()
        assert order == ["a", "b"]


class TestResumeE2E:
    def test_resume_continues_and_history_is_complete(self, tmp_path):
        """Full-API resume: a second MolTrain(resume=True) run picks up from
        the saved train state, and history_{fold}.json keeps the first run's
        epochs instead of being truncated to post-resume rows."""
        import json
        import os

        import pandas as pd

        from mmdti_tpu import MolTrain
        from tests.conftest import SMALL_ARCH, SMILES_20

        rng = np.random.RandomState(1)
        df = pd.DataFrame({
            "smiles": SMILES_20, "y": rng.randn(len(SMILES_20)).astype(float),
        })
        train_csv = str(tmp_path / "train.csv")
        val_csv = str(tmp_path / "val.csv")
        df.iloc[:16].to_csv(train_csv, index=False)
        df.iloc[16:].to_csv(val_csv, index=False)
        exp = str(tmp_path / "exp")
        common = dict(
            task="regression", batch_size=8, metrics="mse", smiles_col="smiles",
            save_path=exp, target_cols=["y"], seed=0, compute_dtype="float32",
            use_pallas=False, checkpoint_interval=1, early_stopping=10,
            **SMALL_ARCH,
        )
        MolTrain(epochs=2, **common).fit(train_csv, val_csv)
        with open(os.path.join(exp, "history_0.json")) as f:
            assert [r["epoch"] for r in json.load(f)] == [1, 2]

        MolTrain(epochs=4, resume=True, **common).fit(train_csv, val_csv)
        with open(os.path.join(exp, "history_0.json")) as f:
            hist = json.load(f)
        assert [r["epoch"] for r in hist] == [1, 2, 3, 4]
        assert all(np.isfinite(r["val_loss"]) for r in hist)

    def test_interrupted_run_matches_uninterrupted(self, tmp_path):
        """stop_after_epoch=2 + resume must reproduce the uninterrupted
        4-epoch trajectory EXACTLY: the train state carries params/opt/
        early-stop, the dropout PRNG is global_step-keyed, and the resumed
        loader realigns its shuffle stream (advance_epochs) — so every
        post-resume history row is bit-identical."""
        import json
        import os

        import pandas as pd

        from mmdti_tpu import MolTrain
        from tests.conftest import SMALL_ARCH, SMILES_20

        rng = np.random.RandomState(3)
        df = pd.DataFrame({
            "smiles": SMILES_20, "y": rng.randn(len(SMILES_20)).astype(float),
        })
        train_csv = str(tmp_path / "train.csv")
        val_csv = str(tmp_path / "val.csv")
        df.iloc[:16].to_csv(train_csv, index=False)
        df.iloc[16:].to_csv(val_csv, index=False)
        common = dict(
            task="regression", batch_size=8, metrics="mse", smiles_col="smiles",
            target_cols=["y"], seed=0, compute_dtype="float32",
            use_pallas=False, early_stopping=10, epochs=4, **SMALL_ARCH,
        )
        scalar_keys = ("train_loss", "m_loss", "infonce_loss", "ct_loss",
                       "val_loss", "val_mse")

        def rows(exp):
            with open(os.path.join(exp, "history_0.json")) as f:
                return json.load(f)

        exp_a = str(tmp_path / "uninterrupted")
        MolTrain(save_path=exp_a, **common).fit(train_csv, val_csv)
        exp_b = str(tmp_path / "interrupted")
        MolTrain(save_path=exp_b, stop_after_epoch=2, **common).fit(
            train_csv, val_csv
        )
        assert [r["epoch"] for r in rows(exp_b)] == [1, 2]
        MolTrain(save_path=exp_b, resume=True, **common).fit(train_csv, val_csv)

        hist_a, hist_b = rows(exp_a), rows(exp_b)
        assert [r["epoch"] for r in hist_b] == [1, 2, 3, 4]
        for ra, rb in zip(hist_a, hist_b):
            for k in scalar_keys:
                assert ra[k] == rb[k], (ra["epoch"], k, ra[k], rb[k])


    def test_abort_after_snapshot_resumes_exact_trajectory(self, tmp_path):
        """Fault injection (VERDICT r4 #8): the run is ABORTED mid-training —
        after epoch 2's async train-state snapshot lands but before fit
        returns (no clean stop_after_epoch boundary, no final best
        checkpoint) — and a resume=True run must still reproduce the
        uninterrupted trajectory bit-exactly from the snapshot."""
        import json
        import os

        import pandas as pd

        from mmdti_tpu import MolTrain
        from mmdti_tpu.train.trainer import Trainer
        from tests.conftest import SMALL_ARCH, SMILES_20

        rng = np.random.RandomState(5)
        df = pd.DataFrame({
            "smiles": SMILES_20, "y": rng.randn(len(SMILES_20)).astype(float),
        })
        train_csv = str(tmp_path / "train.csv")
        val_csv = str(tmp_path / "val.csv")
        df.iloc[:16].to_csv(train_csv, index=False)
        df.iloc[16:].to_csv(val_csv, index=False)
        common = dict(
            task="regression", batch_size=8, metrics="mse", smiles_col="smiles",
            target_cols=["y"], seed=0, compute_dtype="float32",
            use_pallas=False, early_stopping=10, epochs=4,
            checkpoint_interval=1, **SMALL_ARCH,
        )

        def rows(exp):
            with open(os.path.join(exp, "history_0.json")) as f:
                return json.load(f)

        exp_a = str(tmp_path / "uninterrupted")
        MolTrain(save_path=exp_a, **common).fit(train_csv, val_csv)

        exp_b = str(tmp_path / "aborted")
        orig = Trainer._save_epoch_state

        class _Killed(BaseException):
            pass

        def save_then_die(self, ckpt_saver, dump_dir, fold, epoch, *a, **kw):
            out = orig(self, ckpt_saver, dump_dir, fold, epoch, *a, **kw)
            if epoch == 1:  # 0-based: after the 2nd epoch's save submitted
                ckpt_saver.wait()  # the async snapshot has LANDED on disk
                raise _Killed()    # ... and the process "dies" here
            return out

        Trainer._save_epoch_state = save_then_die
        try:
            with pytest.raises(_Killed):
                MolTrain(save_path=exp_b, **common).fit(train_csv, val_csv)
        finally:
            Trainer._save_epoch_state = orig
        # no final best checkpoint was written — only the train state
        assert not os.path.exists(os.path.join(exp_b, "model_0.ckpt"))
        assert os.path.exists(os.path.join(exp_b, "train_state_0.ckpt"))

        MolTrain(save_path=exp_b, resume=True, **common).fit(train_csv, val_csv)
        hist_a, hist_b = rows(exp_a), rows(exp_b)
        assert [r["epoch"] for r in hist_b] == [1, 2, 3, 4]
        for ra, rb in zip(hist_a, hist_b):
            for k in ("train_loss", "m_loss", "infonce_loss", "ct_loss",
                      "val_loss", "val_mse"):
                assert ra[k] == rb[k], (ra["epoch"], k, ra[k], rb[k])
        assert os.path.exists(os.path.join(exp_b, "model_0.ckpt"))

    def test_corrupt_train_state_fails_loudly(self, tmp_path):
        """A truncated/corrupted train_state artifact must abort the resume
        with an exception — silently restarting from scratch would discard
        the user's training budget without telling them."""
        import os

        import pandas as pd

        from mmdti_tpu import MolTrain
        from mmdti_tpu.train.trainer import train_state_path
        from tests.conftest import SMALL_ARCH, SMILES_20

        rng = np.random.RandomState(7)
        df = pd.DataFrame({
            "smiles": SMILES_20, "y": rng.randn(len(SMILES_20)).astype(float),
        })
        train_csv = str(tmp_path / "train.csv")
        val_csv = str(tmp_path / "val.csv")
        df.iloc[:16].to_csv(train_csv, index=False)
        df.iloc[16:].to_csv(val_csv, index=False)
        exp = str(tmp_path / "exp")
        common = dict(
            task="regression", batch_size=8, metrics="mse", smiles_col="smiles",
            save_path=exp, target_cols=["y"], seed=0, compute_dtype="float32",
            use_pallas=False, checkpoint_interval=1, early_stopping=10,
            **SMALL_ARCH,
        )
        MolTrain(epochs=2, **common).fit(train_csv, val_csv)
        path = train_state_path(exp, 0)
        blob = open(path, "rb").read()
        with open(path, "wb") as f:
            f.write(blob[: len(blob) // 3])  # truncate mid-stream
        with pytest.raises(Exception):
            MolTrain(epochs=4, resume=True, **common).fit(train_csv, val_csv)

    def test_corrupt_best_checkpoint_fails_loudly(self, tmp_path):
        """A corrupted model_{fold}.ckpt must fail MolPredict loudly, not
        serve garbage weights."""
        import os

        import pandas as pd

        from mmdti_tpu import MolPredict, MolTrain
        from tests.conftest import SMALL_ARCH, SMILES_20

        rng = np.random.RandomState(9)
        df = pd.DataFrame({
            "smiles": SMILES_20, "y": rng.randn(len(SMILES_20)).astype(float),
        })
        train_csv = str(tmp_path / "train.csv")
        val_csv = str(tmp_path / "val.csv")
        df.iloc[:16].to_csv(train_csv, index=False)
        df.iloc[16:].to_csv(val_csv, index=False)
        exp = str(tmp_path / "exp")
        MolTrain(
            task="regression", epochs=1, batch_size=8, metrics="mse",
            smiles_col="smiles", save_path=exp, target_cols=["y"], seed=0,
            compute_dtype="float32", use_pallas=False, **SMALL_ARCH,
        ).fit(train_csv, val_csv)
        ckpt = os.path.join(exp, "model_0.ckpt")
        blob = open(ckpt, "rb").read()
        with open(ckpt, "wb") as f:
            f.write(blob[: len(blob) // 2])
        with pytest.raises(Exception):
            MolPredict(load_model=exp).predict(val_csv)


class TestLossStateResume:
    def test_loss_state_roundtrips_through_train_state(self, tmp_path):
        """GHM's EMA bin counts must survive save/load (a resume would
        otherwise silently restart gradient-density weighting)."""
        from mmdti_tpu.train.trainer import load_train_state, save_train_state

        model = _tiny_model()
        feats, _ = _batch(B=2)
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, **feats, deterministic=True)["params"]
        tx, _ = make_optimizer(1e-3, 100, 0.1, 1.0)
        opt_state = tx.init(params)
        loss_state = (jnp.arange(10.0), jnp.ones(()))
        save_train_state(str(tmp_path), 0, params, opt_state, None, epoch=1,
                         global_step=10, loss_state=loss_state)
        _, _, _, _, _, extra = load_train_state(str(tmp_path), 0, tx.init(params))
        leaves = extra["loss_state_leaves"]
        assert leaves is not None and len(leaves) == 2
        np.testing.assert_allclose(np.asarray(leaves[0]), np.arange(10.0))
        restored = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(loss_state),
            [jnp.asarray(x) for x in leaves],
        )
        np.testing.assert_allclose(np.asarray(restored[1]), 1.0)


class TestPadModes:
    def _csv(self, tmp_path, tag):
        import pandas as pd

        # alternate tiny (atom bucket 32) and large (bucket 48+) molecules so
        # consecutive single-sample batches land in different width buckets
        small = ["CCO", "CCN", "CCS", "CCC"]
        big = ["CC(C)Cc1ccc(cc1)C(C)C(=O)O",
               "CCN(CC)C(=O)C1CN(C)C2Cc3c[nH]c4cccc(C2=C1)c34",
               "CC(=O)Oc1ccccc1C(=O)OCCCCCC",
               "CCCCCCCCCCCCCCCCCC"]
        smiles = [m for pair in zip(small, big) for m in pair]
        rng = np.random.RandomState(2)
        df = pd.DataFrame({"smiles": smiles * 2, "y": rng.randn(16).astype(float)})
        train_csv = str(tmp_path / f"train_{tag}.csv")
        val_csv = str(tmp_path / f"val_{tag}.csv")
        df.iloc[:12].to_csv(train_csv, index=False)
        df.iloc[12:].to_csv(val_csv, index=False)
        return train_csv, val_csv

    def test_bucket_mode_with_fused_dispatch(self, tmp_path):
        """pad_mode='bucket' + steps_per_call>1: mixed-width batches must be
        flushed as single steps, not jnp.stack-crashed (review finding)."""
        from mmdti_tpu import MolTrain
        from tests.conftest import SMALL_ARCH

        train_csv, val_csv = self._csv(tmp_path, "bucket")
        exp = str(tmp_path / "exp_bucket")
        m = MolTrain(
            task="regression", epochs=1, batch_size=1, metrics="mse",
            smiles_col="smiles", save_path=exp, target_cols=["y"], seed=0,
            compute_dtype="float32", use_pallas=False, pad_mode="bucket",
            steps_per_call=4, mesh_shape=(1, 1), **SMALL_ARCH,
        )
        m.fit(train_csv, val_csv)
        assert np.isfinite(np.asarray(m.cv_pred)).all()

    def test_fixed_mode_static_shapes(self, tmp_path):
        """pad_mode='fixed' pads to config-wide constants (max_atoms+2,
        smiles_pad_len) independent of the dataset."""
        from mmdti_tpu import MolTrain
        from tests.conftest import SMALL_ARCH

        train_csv, val_csv = self._csv(tmp_path, "fixed")
        exp = str(tmp_path / "exp_fixed")
        m = MolTrain(
            task="regression", epochs=1, batch_size=8, metrics="mse",
            smiles_col="smiles", save_path=exp, target_cols=["y"], seed=0,
            compute_dtype="float32", use_pallas=False, pad_mode="fixed",
            max_atoms=62, smiles_pad_len=32, **SMALL_ARCH,
        )
        m.fit(train_csv, val_csv)
        assert m.model.atom_pad == 64   # up(62 + 2) at pad_multiple 16
        assert m.model.smiles_pad == 32
        assert np.isfinite(np.asarray(m.cv_pred)).all()

    def test_unknown_pad_mode_rejected(self):
        from mmdti_tpu.data.batching import BatchCollator

        with pytest.raises(ValueError):
            BatchCollator(_FakeTokenizer(), pad_idx=1, pad_mode="nope")


class _FakeTokenizer:
    """Deterministic stand-in for the SMILES tokenizer in collation tests."""

    def __call__(self, smiles, pad_to=None):
        L = pad_to or 10
        ids = np.zeros((len(smiles), L), np.int32)
        mask = np.zeros((len(smiles), L), np.int32)
        for i, s in enumerate(smiles):
            n = min(len(s), L)
            ids[i, :n] = [(ord(c) % 50) + 4 for c in s[:n]]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


class TestValLossPadding:
    """Padded trailing rows must not bias the validation loss (VERDICT r1 #3):
    val loss for len(valid)=9 must be identical at batch_size=8 (one padded
    trailing batch) and batch_size=9 (one exact batch)."""

    def _dataset(self, n=9, N=8):
        from mmdti_tpu.data.batching import MolDataset

        rng = np.random.RandomState(3)
        feats = []
        for i in range(n):
            toks = rng.randint(4, 30, (N,))
            toks[0], toks[-1] = 0, 2
            feats.append({
                "src_tokens": toks.astype(np.int32),
                "src_distance": (rng.rand(N, N) * 4).astype(np.float32),
                "src_edge_type": rng.randint(0, 35 * 35, (N, N)).astype(np.int32),
                "smile": "CC" * (i + 1),
            })
        labels = rng.randn(n, 1).astype(np.float32)
        return MolDataset(feats, labels)

    def _val_loss(self, loss_fn, batch_size, dataset, model, params):
        from mmdti_tpu.data.batching import BatchCollator
        from mmdti_tpu.train.trainer import Trainer, _weighted_loss_mean

        trainer = Trainer(
            task="regression", metrics="mse", batch_size=batch_size,
            mesh=make_mesh((1, 1), devices=jax.devices()[:1]),
        )
        collate = BatchCollator(_FakeTokenizer(), pad_idx=1, pad_mode="dataset",
                                atom_pad=8, smiles_pad=20)
        _, val_losses, _ = trainer.predict(
            model, params, dataset, loss_fn, lambda x: x,
            dump_dir="/tmp", fold=0, collate_fn=collate, load_model=False,
        )
        return _weighted_loss_mean(val_losses)

    def test_mse_val_loss_independent_of_batch_size(self):
        from mmdti_tpu.losses.zoo import mse_loss

        model = _tiny_model()
        ds = self._dataset()
        feats, _ = _batch(B=2, N=8, L=20)
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, **feats,
                            deterministic=True)["params"]
        l8 = self._val_loss(mse_loss, 8, ds, model, params)
        l9 = self._val_loss(mse_loss, 9, ds, model, params)
        np.testing.assert_allclose(l8, l9, rtol=1e-5)

    def test_nan_maskable_val_loss_independent_of_batch_size(self):
        from mmdti_tpu.losses.zoo import mae_with_nan

        model = _tiny_model()
        ds = self._dataset()
        feats, _ = _batch(B=2, N=8, L=20)
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, **feats,
                            deterministic=True)["params"]
        l8 = self._val_loss(mae_with_nan, 8, ds, model, params)
        l9 = self._val_loss(mae_with_nan, 9, ds, model, params)
        np.testing.assert_allclose(l8, l9, rtol=1e-5)


class TestDeterminism:
    def test_two_runs_identical(self):
        """Fixed-seed end-to-end determinism (SURVEY §4)."""
        model = _tiny_model()
        feats, labels = _batch(B=4)
        tx, _ = make_optimizer(1e-3, 20, 0.1, 1.0)

        def run():
            key = jax.random.PRNGKey(7)
            params = model.init(
                {"params": key, "dropout": key}, **feats, deterministic=True
            )["params"]
            opt = tx.init(params)

            @jax.jit
            def step(p, o, i):
                def lf(p):
                    out = model.apply(
                        {"params": p}, **feats, deterministic=False,
                        rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(7), i)},
                    )
                    return jnp.mean((out["logits"] - labels) ** 2) + 0.1 * out["infonce_loss"]

                loss, g = jax.value_and_grad(lf)(p)
                u, o = tx.update(g, o, p)
                return jax.tree.map(lambda a, b: a + b, p, u), o, loss

            losses = []
            for i in range(3):
                params, opt, l = step(params, opt, i)
                losses.append(float(l))
            return losses

        np.testing.assert_array_equal(run(), run())


class TestTrainerDPxTP:
    """Full MolTrain.fit on an explicit (data=4, model=2) mesh (VERDICT r2
    weak #3): the real Trainer.fit_predict path — FDS smoothing, InfoNCE+CT
    losses, early stopping, checkpointing — under DPxTP parameter sharding
    (TP_RULES over the 'model' axis), matching the default data-parallel run."""

    def _fit(self, tmp_path, tag, **extra):
        import os

        import pandas as pd

        from mmdti_tpu import MolTrain
        from tests.conftest import SMALL_ARCH, SMILES_20

        rng = np.random.RandomState(0)
        df = pd.DataFrame({
            "smiles": SMILES_20, "y": rng.randn(len(SMILES_20)).astype(float),
        })
        train_csv = str(tmp_path / f"train_{tag}.csv")
        val_csv = str(tmp_path / f"val_{tag}.csv")
        df.iloc[:16].to_csv(train_csv, index=False)
        df.iloc[16:].to_csv(val_csv, index=False)
        exp = str(tmp_path / f"exp_{tag}")
        m = MolTrain(
            task="regression", epochs=2, batch_size=8, metrics="mse",
            smiles_col="smiles", save_path=exp, target_cols=["y"],
            seed=0, compute_dtype="float32", use_pallas=False,
            fds=True, using_infonce=True, using_ct=True, early_stopping=2,
            **SMALL_ARCH, **extra,
        )
        m.fit(train_csv, val_csv)
        assert os.path.exists(os.path.join(exp, "model_0.ckpt"))
        return np.asarray(m.cv_pred)

    def test_dptp_matches_dp(self, tmp_path):
        pred_dp = self._fit(tmp_path, "dp")                       # (8,1) default
        pred_tp = self._fit(tmp_path, "tp", mesh_shape=(4, 2))    # DPxTP
        assert pred_tp.shape == pred_dp.shape
        assert np.isfinite(pred_tp).all()
        # TP repartitions the matmul reductions; agreement is to accumulated
        # float tolerance after 2 epochs of training, not bitwise
        np.testing.assert_allclose(pred_tp, pred_dp, atol=5e-3, rtol=1e-2)


class TestGradAccumulation:
    """accumulate_steps=K at batch B must equal one update at batch K*B:
    the loader's seeded permutation makes K consecutive micro-batches exactly
    the rows of one large batch, MultiSteps averages their gradients, and the
    LR schedule runs in optimizer updates — so the two runs take the same
    parameter trajectory (all dropout zeroed; batch-coupled losses off)."""

    def _fit(self, tmp_path, tag, batch_size, accumulate_steps):
        import os

        import pandas as pd

        from mmdti_tpu import MolTrain
        from tests.conftest import SMALL_ARCH, SMILES_20

        rng = np.random.RandomState(5)
        smiles = SMILES_20 * 2
        df = pd.DataFrame({
            "smiles": smiles, "y": rng.randn(len(smiles)).astype(float),
        })
        train_csv = str(tmp_path / f"train_{tag}.csv")
        val_csv = str(tmp_path / f"val_{tag}.csv")
        df.iloc[:32].to_csv(train_csv, index=False)
        df.iloc[32:].to_csv(val_csv, index=False)
        exp = str(tmp_path / f"exp_{tag}")
        m = MolTrain(
            task="regression", epochs=2, batch_size=batch_size, metrics="mse",
            smiles_col="smiles", save_path=exp, target_cols=["y"],
            seed=0, compute_dtype="float32", use_pallas=False,
            accumulate_steps=accumulate_steps,
            crossmodal_overrides={
                "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
            },
            **SMALL_ARCH,
        )
        m.fit(train_csv, val_csv)
        assert os.path.exists(os.path.join(exp, "model_0.ckpt"))
        return np.asarray(m.cv_pred)

    def test_accumulation_matches_large_batch(self, tmp_path):
        big = self._fit(tmp_path, "big", batch_size=16, accumulate_steps=1)
        acc = self._fit(tmp_path, "acc", batch_size=8, accumulate_steps=2)
        assert acc.shape == big.shape
        # identical update math up to fp32 summation order
        np.testing.assert_allclose(acc, big, atol=2e-4, rtol=1e-3)


class TestDebugNans:
    def test_flag_enables_jax_nan_checking(self):
        from mmdti_tpu.train.trainer import Trainer

        assert not jax.config.jax_debug_nans
        try:
            Trainer(task="regression", metrics="mse", debug_nans=True,
                    mesh=make_mesh((1, 1), devices=jax.devices()[:1]))
            assert jax.config.jax_debug_nans
            with pytest.raises(FloatingPointError):
                jax.jit(lambda x: x / 0.0)(jnp.zeros(()))
        finally:
            jax.config.update("jax_debug_nans", False)


class TestAutoRematPolicy:
    def test_pallas_threshold_follows_measured_memory_contour(self):
        """The engaged-Pallas no-remat window holds the measured HBM byte
        contour of the bf16 pair chain, B*H*N^2*L (B=64/N=256 at the flagship
        H=64/L=15 fits on the v5e and runs 18% faster without remat; see
        docs/PERF.md), capped at the validated B=32 value 320.  atom_pad >=
        threshold engages remat."""
        from mmdti_tpu.train.nnmodel import pallas_remat_threshold

        assert pallas_remat_threshold(32) == 320   # round-2 validated cap
        assert pallas_remat_threshold(8) == 320    # small batches stay capped
        assert pallas_remat_threshold(64) == 257   # N=256 measured to fit
        assert pallas_remat_threshold(128) == 182  # shrinks along contour
        assert pallas_remat_threshold(256) == 129  # no stale 160 floor: big
        # batches engage remat before the old floor would have allowed
        for b in (32, 64, 128, 256, 512):
            n = pallas_remat_threshold(b) - 1
            assert b * n * n <= 64 * 256 * 256 or n == 319
        # bigger architectures shrink the window instead of inheriting the
        # flagship envelope: 2x layers ~ 1/sqrt(2) the pad window
        assert pallas_remat_threshold(64, encoder_layers=30) == 182
        assert pallas_remat_threshold(64, attention_heads=128) == 182
        # small archs may widen it but never past the validated cap
        assert pallas_remat_threshold(64, attention_heads=8, encoder_layers=2) == 320
