"""Fold-parallel (vmapped lockstep) k-fold training — equality vs the
sequential trainer and end-to-end artifact contract."""

import numpy as np
import pytest

from vit_deep_radiomics_tpu.data.datasets import TokenItem, batch_items
from vit_deep_radiomics_tpu.engine.foldpar import (
    ParallelFoldTrainer,
    stack_fold_batches,
    train_kfold_parallel,
)
from vit_deep_radiomics_tpu.engine.train import FoldTrainer, TrainerConfig


def _cfg(feature_dim=16, num_epochs=3, virtual_batch=4, batch=2):
    return {
        "models": {
            "transformer": {
                "learning_rate": 5e-4, "feature_dim": feature_dim,
                "batch_size": batch, "virtual_batch_size": virtual_batch,
                "num_epochs": num_epochs, "patience": 15,
                "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
                "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
            },
            "conv": {
                "learning_rate": 5e-4, "feature_dim": feature_dim,
                "batch_size": 1, "virtual_batch_size": virtual_batch,
                "num_epochs": num_epochs, "patience": 15,
                "ct": {"div": 2}, "pet": {"div": 2},
            },
        },
    }


def _items(rng, n, length, feature_dim=16, tag="p"):
    """Token items with IDENTICAL lengths so sequential and lockstep
    batches share shapes exactly (same buckets, same dropout draws)."""
    out = []
    for i in range(n):
        label = np.zeros(2, np.float32)
        label[i % 2] = 1.0
        out.append(TokenItem(
            tokens_ct=rng.normal(size=(length, feature_dim))
            .astype(np.float32),
            tokens_pet=rng.normal(size=(length, feature_dim))
            .astype(np.float32),
            label_onehot=label,
            patient_id=f"{tag}{i}",
        ))
    return out


class TestStackFoldBatches:
    def test_pads_to_shared_shapes_and_weights(self, rng):
        a = next(batch_items(_items(rng, 2, 10), 2))
        b = next(batch_items(_items(rng, 1, 200, tag="q"), 2))
        stacked, real = stack_fold_batches([a, b, None], 2)
        # token axis = max bucket (256), batch axis = 2, fold axis = 3
        assert stacked["ct"].shape == (3, 2, 256, 16)
        assert stacked["ct_mask"].shape == (3, 2, 256)
        np.testing.assert_array_equal(
            stacked["example_weight"],
            [[1.0, 1.0], [1.0, 0.0], [0.0, 0.0]])
        assert real[0] == (2, ["p0", "p1"])
        assert real[1] == (1, ["q0"])
        assert real[2] == (0, [])
        # real rows land unchanged in their fold slots
        np.testing.assert_array_equal(
            stacked["ct"][0, :, :128], a["ct"])
        np.testing.assert_array_equal(
            stacked["ct"][1, 0, :256], b["ct"][0])
        assert not stacked["ct_mask"][2].any()


class TestLockstepEquality:
    """Same items, same seeds, aligned shapes → the vmapped lockstep
    trajectory must match per-fold sequential training."""

    @pytest.mark.parametrize("modality,loss", [
        ("ct", "focal"), ("petct", "crossmodal"),
    ])
    def test_matches_sequential(self, rng, modality, loss):
        cfg = _cfg()
        tcfg = TrainerConfig(
            arch="transformer", modality=modality, loss=loss,
            dataset="stanford", batch_size=2, precision="parity",
        )
        # fold 0: 8 items (4 batches, applies at steps 2 and 4);
        # fold 1: 6 items (3 batches, applies at 2 and the remainder 3)
        fold_items = [_items(rng, 8, 100, tag="a"),
                      _items(rng, 6, 100, tag="b")]
        fold_batches = [list(batch_items(it, 2)) for it in fold_items]

        seq_trainers = []
        seq_results = []
        for f in range(2):
            t = FoldTrainer(cfg, tcfg)
            t.init_params(fold_batches[f][0])
            seq_trainers.append(t)
        for epoch in range(2):
            epoch_out = []
            for f, t in enumerate(seq_trainers):
                tr = t.run_epoch(fold_batches[f], epoch, train=True,
                                 rng_seed=tcfg.seed)
                te = t.run_epoch(fold_batches[f], epoch, train=False)
                epoch_out.append((tr, te))
            seq_results.append(epoch_out)

        par = ParallelFoldTrainer(cfg, tcfg, n_folds=2)
        par.init_stacked(fold_batches[0][0])
        for epoch in range(2):
            tr_par = par.run_lockstep_epoch(
                fold_batches, epoch, train=True, rng_seed=tcfg.seed)
            te_par = par.run_lockstep_epoch(
                fold_batches, epoch, train=False)
            for f in range(2):
                (tr_seq, te_seq) = seq_results[epoch][f]
                for (seq, parr) in ((tr_seq, tr_par[f]),
                                    (te_seq, te_par[f])):
                    assert parr[0] == pytest.approx(seq[0], rel=2e-4), \
                        f"loss fold {f} epoch {epoch}"
                    np.testing.assert_array_equal(parr[1], seq[1])
                    np.testing.assert_allclose(
                        parr[2], seq[2], rtol=2e-4, atol=2e-5)
                    assert parr[3] == seq[3]
        # final parameters coincide too
        import jax

        for f in range(2):
            p_par, _ = par.fold_state(f)
            flat_par = jax.tree.leaves(p_par)
            flat_seq = jax.tree.leaves(seq_trainers[f].params)
            for a, b in zip(flat_par, flat_seq):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_exhausted_fold_state_frozen(self, rng):
        """A fold with an empty batch list rides along bit-frozen."""
        cfg = _cfg()
        tcfg = TrainerConfig(
            arch="transformer", modality="ct", loss="focal",
            batch_size=2, precision="parity",
        )
        batches = [list(batch_items(_items(rng, 4, 64), 2)), []]
        par = ParallelFoldTrainer(cfg, tcfg, n_folds=2)
        par.init_stacked(batches[0][0])
        import jax

        before = [np.asarray(x) for x in jax.tree.leaves(
            jax.tree.map(lambda v: v[1], par.params))]
        res = par.run_lockstep_epoch(batches, 0, train=True)
        after = [np.asarray(x) for x in jax.tree.leaves(
            jax.tree.map(lambda v: v[1], par.params))]
        for a, b in zip(before, after):
            np.testing.assert_array_equal(a, b)
        assert res[1][3] == [] and res[1][0] == 0.0
        # the active fold DID move
        moved = any(
            not np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(
                jax.tree.leaves(jax.tree.map(lambda v: v[0], par.params)),
                before)
        )
        assert moved


class TestTrainKfoldParallel:
    def test_end_to_end_artifacts(self, extracted):
        """train_kfold(fold_parallel=True) produces the sequential
        path's artifact contract for every fold in one run."""
        cfg = _cfg(num_epochs=2)
        cfg["kfold_patients"] = extracted["folds"]
        tcfg = TrainerConfig(
            arch="transformer", modality="petct", loss="crossmodal",
            dataset="stanford", batch_size=2, precision="parity",
            max_epochs=2, fold_parallel=True,
        )
        from vit_deep_radiomics_tpu.engine.train import train_kfold

        models_dir = extracted["dir"] / "models_foldpar"
        # fold-parallel never resumes: artifacts left by a previous,
        # longer run must not survive to be picked up by latest_epoch/
        # best-epoch consumers after this (shorter) run
        stale_dir = (models_dir / "petct" / "medsam_transformer_stanford"
                     / "petct" / "kfold_0")
        stale_dir.mkdir(parents=True)
        (stale_dir / "model_epoch_0099.msgpack").write_bytes(b"stale")
        (stale_dir / "test_metrics_99.json").write_text("{}")
        results = train_kfold(
            extracted["df"], cfg, tcfg,
            extracted["hdf5_ct"], extracted["hdf5_pet"], models_dir,
            folds=[0, 1], log=lambda *_: None,
        )
        from vit_deep_radiomics_tpu.engine import checkpoint as ckpt

        assert not (stale_dir / "model_epoch_0099.msgpack").exists()
        assert not (stale_dir / "test_metrics_99.json").exists()
        for k in (0, 1):
            hist = results[k]
            assert len(hist) == 2
            assert np.isfinite(hist["train_loss"]).all()
            fold_dir = (models_dir / "petct" / "medsam_transformer_stanford"
                        / "petct" / f"kfold_{k}")
            assert (fold_dir / "train_metrics_0.json").exists()
            assert (fold_dir / "test_metrics_1.json").exists()
            assert (fold_dir / "losses.html").exists()
            assert ckpt.best_epochs(fold_dir)

    def test_conv_arch_smoke(self, extracted):
        cfg = _cfg(num_epochs=1)
        cfg["kfold_patients"] = extracted["folds"]
        tcfg = TrainerConfig(
            arch="conv", modality="ct", loss="focal",
            dataset="stanford", batch_size=1, precision="parity",
            max_epochs=1, fold_parallel=True,
        )
        results = train_kfold_parallel(
            extracted["df"], cfg, tcfg,
            extracted["hdf5_ct"], extracted["hdf5_pet"],
            extracted["dir"] / "models_foldpar_conv",
            folds=[0, 1], log=lambda *_: None,
        )
        for k in (0, 1):
            assert np.isfinite(results[k]["train_loss"]).all()

    def test_fold_mesh_matches_single_device(self, rng, devices):
        """Folds sharded one-per-device over the mesh's data axis (stack
        padded 2 → 8 with frozen dummy folds) produce the same per-fold
        trajectories as the unsharded lockstep."""
        from jax.sharding import Mesh

        cfg = _cfg()
        tcfg = TrainerConfig(
            arch="transformer", modality="ct", loss="focal",
            batch_size=2, precision="parity",
        )
        fold_batches = [
            list(batch_items(_items(rng, 8, 100, tag="a"), 2)),
            list(batch_items(_items(rng, 6, 100, tag="b"), 2)),
        ]
        mesh = Mesh(np.array(devices[:8]).reshape(8, 1),
                    ("data", "model"))
        plain = ParallelFoldTrainer(cfg, tcfg, n_folds=2)
        plain.init_stacked(fold_batches[0][0])
        sharded = ParallelFoldTrainer(cfg, tcfg, n_folds=2,
                                      fold_mesh=mesh)
        assert sharded._stack_n == 8
        sharded.init_stacked(fold_batches[0][0])
        for epoch in range(2):
            a = plain.run_lockstep_epoch(
                fold_batches, epoch, train=True, rng_seed=0)
            b = sharded.run_lockstep_epoch(
                fold_batches, epoch, train=True, rng_seed=0)
            for f in range(2):
                assert b[f][0] == pytest.approx(a[f][0], rel=2e-4)
                np.testing.assert_allclose(
                    b[f][2], a[f][2], rtol=2e-4, atol=2e-5)
                assert b[f][3] == a[f][3]
        import jax

        for f in range(2):
            pa, _ = plain.fold_state(f)
            pb, _ = sharded.fold_state(f)
            for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-5)

    def test_rejects_multiprocess_and_model_axis(
        self, devices, monkeypatch
    ):
        from jax.sharding import Mesh

        cfg = _cfg(num_epochs=1)
        tcfg = TrainerConfig(fold_parallel=True, max_epochs=1,
                             precision="parity")
        with pytest.raises(ValueError, match="must be 1"):
            ParallelFoldTrainer(
                cfg, tcfg, n_folds=2,
                fold_mesh=Mesh(np.array(devices[:8]).reshape(4, 2),
                               ("data", "model")))
        # single-process runs can't build a real multi-host mesh, so
        # simulate one: the guard must fire before any axis validation
        from vit_deep_radiomics_tpu.core import mesh as mesh_mod

        monkeypatch.setattr(
            mesh_mod, "mesh_spans_processes", lambda m: True)
        with pytest.raises(ValueError, match="single-process"):
            ParallelFoldTrainer(
                cfg, tcfg, n_folds=2,
                fold_mesh=Mesh(np.array(devices[:8]).reshape(8, 1),
                               ("data", "model")))

    def test_rejects_whole_volume(self):
        with pytest.raises(ValueError, match="whole_volume"):
            ParallelFoldTrainer(
                _cfg(), TrainerConfig(whole_volume=True), n_folds=2)


class TestLockstepResume:
    def test_snapshot_resume_matches_uninterrupted(self, extracted):
        """Kill-and-resume reproduces the uninterrupted trajectory: a
        2-epoch run + resumed 4-epoch run equals one 4-epoch run —
        params path, metric histories, sampler RNG streams and patience
        state all continue exactly (VERDICT r2 item 9)."""
        from vit_deep_radiomics_tpu.engine import checkpoint as ckpt

        cfg = _cfg(num_epochs=4)
        cfg["kfold_patients"] = extracted["folds"]

        def tc(max_e):
            return TrainerConfig(
                arch="transformer", modality="petct", loss="crossmodal",
                dataset="stanford", batch_size=2, precision="parity",
                max_epochs=max_e, fold_parallel=True,
            )

        kw = dict(folds=[0, 1], log=lambda *_: None)
        full = train_kfold_parallel(
            extracted["df"], cfg, tc(4),
            extracted["hdf5_ct"], extracted["hdf5_pet"],
            extracted["dir"] / "m_fp_full", **kw)
        ckpt.wait_pending()

        # "kill" the process right after the epoch-1 snapshot lands —
        # same num_epochs as the full run, so the cosine LR schedule
        # (T_max = 0.8·num_epochs) is identical; a shorter max_epochs
        # would train epochs 0-1 under a DIFFERENT schedule and could
        # never match the uninterrupted trajectory
        from vit_deep_radiomics_tpu.engine import foldpar as fp

        real_save = fp._save_lockstep_snapshot

        def killing_save(base, epoch, *a, **k):
            real_save(base, epoch, *a, **k)
            if epoch == 1:
                raise KeyboardInterrupt("simulated kill")

        fp._save_lockstep_snapshot = killing_save
        try:
            with pytest.raises(KeyboardInterrupt):
                train_kfold_parallel(
                    extracted["df"], cfg, tc(4),
                    extracted["hdf5_ct"], extracted["hdf5_pet"],
                    extracted["dir"] / "m_fp_resume", **kw)
        finally:
            fp._save_lockstep_snapshot = real_save
        ckpt.wait_pending()
        snap = (extracted["dir"] / "m_fp_resume" / "petct"
                / "medsam_transformer_stanford" / "petct"
                / "foldpar_resume.msgpack")
        assert snap.exists()

        # ...then resumed to the full 4 epochs
        resumed = train_kfold_parallel(
            extracted["df"], cfg, tc(4),
            extracted["hdf5_ct"], extracted["hdf5_pet"],
            extracted["dir"] / "m_fp_resume", **kw)
        ckpt.wait_pending()

        for k in (0, 1):
            assert len(resumed[k]) == len(full[k]) == 4
            for col in full[k].columns:
                np.testing.assert_allclose(
                    np.asarray(resumed[k][col], np.float64),
                    np.asarray(full[k][col], np.float64),
                    rtol=1e-6, atol=1e-7,
                    err_msg=f"fold {k} column {col}")

    def test_resume_false_restarts_fresh(self, extracted):
        cfg = _cfg(num_epochs=2)
        cfg["kfold_patients"] = extracted["folds"]
        tcfg = TrainerConfig(
            arch="transformer", modality="petct", loss="crossmodal",
            dataset="stanford", batch_size=2, precision="parity",
            max_epochs=2, fold_parallel=True,
        )
        kw = dict(folds=[0, 1], log=lambda *_: None)
        d = extracted["dir"] / "m_fp_fresh"
        first = train_kfold_parallel(
            extracted["df"], cfg, tcfg,
            extracted["hdf5_ct"], extracted["hdf5_pet"], d, **kw)
        again = train_kfold_parallel(
            extracted["df"], cfg, tcfg,
            extracted["hdf5_ct"], extracted["hdf5_pet"], d,
            resume=False, **kw)
        for k in (0, 1):
            assert len(again[k]) == 2
            np.testing.assert_allclose(
                np.asarray(again[k]["train_loss"], np.float64),
                np.asarray(first[k]["train_loss"], np.float64),
                rtol=1e-6)
