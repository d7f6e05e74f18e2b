"""Fold-parallel k-fold training: every fold in ONE vmapped program.

The reference trains its 5 folds strictly sequentially on one GPU
(/root/reference/src/train_models.py:561 — the outer fold loop around
the whole epoch loop).  The sequential rebuild already shares compiled
steps across folds, but still dispatches one device call per fold per
micro-batch — and the downstream classifiers are tiny (feature_dim 256,
batch ≤ 8), so each call underfills the MXU and pays the full
per-dispatch latency of the host→device link.

TPU-first alternative: stack the folds on a leading axis and train them
in lockstep with ``jax.vmap`` —

* one jitted micro-step advances ALL folds (params, grad accumulators
  and optimizer states are stacked pytrees),
* per-fold virtual-batch cadence survives via a ``do_apply`` mask into
  the (vmapped) optimizer application: folds whose accumulation group
  ends this step apply AdamW, the rest carry their accumulator,
* folds with fewer batches this epoch (or already early-stopped) ride
  along on zero-weight dummy batches — ``example_weight = 0`` rows
  contribute exactly 0 to the focal losses and gradients
  (models/losses.py), so their state is bit-frozen,
* per-step batches are host-stacked to shared bucket shapes (token
  buckets / conv shape buckets are per-step maxima across folds; the
  models are mask-aware, so the extra padding only costs compute).

Semantics match the sequential path (same item order, same dropout key
table, same optimizer cadence, same checkpoint/early-stop rules);
equality is asserted in tests/test_foldpar.py.  Crash recovery: a
stacked-state snapshot (params + optimizer states of ALL folds, plus
metric histories and stop flags) is written atomically after every
completed epoch, and ``resume=True`` continues a killed run on the
exact uninterrupted trajectory (sampler / dataset RNG bit-generator
states restored from the snapshot sidecar).  Not supported here: multi-process meshes /
whole-volume sequence parallelism (the fold axis replaces the data axis
as the batch-level parallelism).

On-chip A/B (round 3, artifacts/bench_all_r3.jsonl): lockstep measured
0.85× the sequential path — the dispatch-amortization thesis did NOT
hold on the tunnel backend (the deep queue already hides per-call
latency), so this stays an opt-in (``--fold-parallel``) rather than the
default.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np
import optax
import pandas as pd

import jax
import jax.numpy as jnp

from ..analysis import reports
from ..data.datasets import PETCTDataset, batch_items
from ..engine import checkpoint as ckpt
from .train import (
    FoldBookkeeping,
    FoldTrainer,
    TrainerConfig,
    _bucket_sorted,
    _draw_train_indices,
    _patient_weights,
    cosine_lr,
)

__all__ = ["ParallelFoldTrainer", "train_kfold_parallel"]


def stack_fold_batches(
    batches: Sequence[dict | None], batch_size: int
) -> tuple[dict, list]:
    """Stack one lockstep step's per-fold batches into (F, ...) arrays.

    Every ndarray key pads to the max shape across folds (batch axis to
    ``batch_size``, token/volume axes to the per-step maxima); bools pad
    False, floats pad 0.  Adds ``example_weight``: 1 for real rows, 0
    for padding and for folds with no batch this step (``None``), which
    zeroes their loss and gradients exactly.

    Returns ``(stacked, real)`` where ``real[f]`` is ``(n_real_rows,
    patient_ids)`` for host-side bookkeeping.
    """
    template = next(b for b in batches if b is not None)
    keys = [k for k, v in template.items() if isinstance(v, np.ndarray)]
    # target shape per key: max over folds, batch axis = batch_size
    target: dict[str, tuple] = {}
    for k in keys:
        dims = np.array(template[k].shape, np.int64)
        for b in batches:
            if b is not None:
                dims = np.maximum(dims, np.array(b[k].shape))
        dims[0] = batch_size
        target[k] = tuple(int(d) for d in dims)

    stacked = {
        k: np.zeros((len(batches),) + target[k], template[k].dtype)
        for k in keys
    }
    weight = np.zeros((len(batches), batch_size), np.float32)
    real = []
    for f, b in enumerate(batches):
        if b is None:
            real.append((0, []))
            continue
        n = b[keys[0]].shape[0]
        for k in keys:
            arr = b[k]
            stacked[k][(f,) + tuple(slice(0, e) for e in arr.shape)] = arr
        weight[f, :n] = 1.0
        real.append((n, list(b["patient_ids"])))
    stacked["example_weight"] = weight
    return stacked, real


class ParallelFoldTrainer(FoldTrainer):
    """FoldTrainer whose params/opt_state carry a leading fold axis and
    whose jitted steps are vmapped over it.

    With ``fold_mesh`` (a single-process mesh) the FOLD axis shards over
    the mesh's ``data`` axis — k-fold cross-validation is embarrassingly
    parallel, so k folds land on k devices with zero collectives (the
    stack pads to a multiple of the axis size with frozen dummy folds).
    Without a mesh the lockstep still wins on a high-latency link by
    collapsing k dispatches into one."""

    def __init__(self, cfg, tcfg: TrainerConfig, n_folds: int,
                 modality_a: str = "pet", modality_b: str = "ct",
                 step_cache: dict | None = None, fold_mesh=None):
        if tcfg.whole_volume:
            raise ValueError(
                "fold_parallel does not compose with whole_volume "
                "sequence parallelism; run the sequential trainer")
        super().__init__(cfg, tcfg, mesh=None, modality_a=modality_a,
                         modality_b=modality_b, step_cache=step_cache)
        self.n_folds = n_folds
        self.fold_mesh = None
        self._stack_n = n_folds
        if fold_mesh is not None:
            from ..core.mesh import DATA_AXIS, mesh_spans_processes

            if mesh_spans_processes(fold_mesh):
                raise ValueError(
                    "fold-parallel training is single-process; use the "
                    "sequential trainer + --data-parallel across hosts")
            axis = int(fold_mesh.shape[DATA_AXIS])
            for name, size in fold_mesh.shape.items():
                if name != DATA_AXIS and int(size) != 1:
                    raise ValueError(
                        f"fold_mesh axis {name!r} must be 1 (folds shard "
                        f"over {DATA_AXIS!r} only); got {size}")
            if axis > 1:
                self.fold_mesh = fold_mesh
                self._stack_n = -(-n_folds // axis) * axis

    # -- setup -----------------------------------------------------------

    def _put_fold_sharded(self, tree):
        """Pin the leading fold axis of every leaf over the mesh's data
        axis (no-op without a fold mesh)."""
        if self.fold_mesh is None:
            return tree
        from ..core.mesh import data_sharding

        return jax.tree.map(
            lambda x: jax.device_put(
                x, data_sharding(self.fold_mesh, x.ndim)),
            tree)

    def init_stacked(self, sample_batch: dict) -> None:
        """Init once (all folds start from PRNGKey(seed) like the
        sequential path, so the stacks are tiles of one init)."""
        super().init_params(sample_batch)
        tile = lambda x: jnp.broadcast_to(  # noqa: E731
            x[None], (self._stack_n,) + x.shape)
        self.params = self._put_fold_sharded(
            jax.tree.map(tile, self.params))
        self.opt_state = self._put_fold_sharded(
            jax.tree.map(tile, self.opt_state))

    def fold_state(self, f: int) -> tuple:
        """(params, opt_state) of fold *f*, shaped like the sequential
        trainer's — checkpoint-compatible with evaluate/convert/umap."""
        take = lambda x: x[f]  # noqa: E731
        return (jax.tree.map(take, self.params),
                jax.tree.map(take, self.opt_state))

    # -- vmapped steps -----------------------------------------------------

    def _get_vstep(self, shape_key, train: bool):
        key = ("foldpar", shape_key, train)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def forward(params, batch, rng):
            args, kwargs = self._model_inputs(batch, deterministic=not train)
            if train:
                kwargs["rngs"] = {"dropout": rng}
            outputs = self.model.apply(params, *args, **kwargs)
            return outputs if isinstance(outputs, tuple) else (outputs,)

        if train:
            def one(params, grad_accum, batch, rng, scale):
                def loss_fn(p):
                    outputs = forward(p, batch, rng)
                    loss = self._loss_from_outputs(
                        outputs, batch["labels"], batch["example_weight"])
                    return loss * scale, outputs[0]

                (loss, logits), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                grad_accum = jax.tree.map(
                    jnp.add, grad_accum, grads["params"])
                return grad_accum, loss, logits

            # rng broadcasts: the sequential path uses the SAME key table
            # for every fold (train.py run_epoch), so lockstep does too
            fn = jax.jit(
                jax.vmap(one, in_axes=(0, 0, 0, None, 0)),
                donate_argnums=(1,),
            )
        else:
            def one(params, batch):
                outputs = forward(params, batch, None)
                loss = self._loss_from_outputs(
                    outputs, batch["labels"], batch["example_weight"])
                return loss, outputs[0]

            fn = jax.jit(jax.vmap(one, in_axes=(0, 0)))
        self._jit_cache[key] = fn
        return fn

    def _get_vapply(self):
        """Vmapped AdamW application gated per fold by ``do_apply``:
        applied folds update params/opt_state and zero their accumulator,
        the rest pass every piece of state through unchanged."""
        key = ("foldpar", "apply_accum")
        if key in self._jit_cache:
            return self._jit_cache[key]

        def one(params, opt_state, grad_accum, lr, do_apply):
            updates, new_opt = self.tx.update(
                grad_accum, opt_state, params["params"])
            updates = jax.tree.map(lambda u: u * lr, updates)
            new_params = {
                "params": optax.apply_updates(params["params"], updates)
            }
            sel = lambda a, b: jnp.where(do_apply, a, b)  # noqa: E731
            return (
                jax.tree.map(sel, new_params, params),
                jax.tree.map(sel, new_opt, opt_state),
                jax.tree.map(
                    lambda g: jnp.where(do_apply, jnp.zeros_like(g), g),
                    grad_accum),
            )

        fn = jax.jit(
            jax.vmap(one, in_axes=(0, 0, 0, None, 0)),
            donate_argnums=(0, 1, 2),
        )
        self._jit_cache[key] = fn
        return fn

    # -- lockstep epoch -----------------------------------------------------

    def run_lockstep_epoch(
        self, fold_batches: Sequence[list], epoch: int, train: bool,
        rng_seed: int = 0,
    ) -> list[tuple]:
        """One epoch for every fold at once; returns the sequential
        ``run_epoch`` tuple ``(avg_loss, y_true, y_score, patient_ids)``
        per fold (empty-batch folds get empty results)."""
        assert len(fold_batches) == self.n_folds
        # dummy folds pad the stack to the fold-mesh axis size; they see
        # only zero-weight batches and never fire the optimizer
        fold_batches = list(fold_batches) + [
            [] for _ in range(self._stack_n - self.n_folds)
        ]
        lr = cosine_lr(epoch, self.lr0, self.num_epochs)
        n_steps = max((len(b) for b in fold_batches), default=0)
        bsz = max(1, self.tcfg.batch_size)

        if train:
            n_micro = max(1, -(-self.virtual_batch // bsz))
            accum = [min(n_micro, max(1, len(b))) for b in fold_batches]
            scale = jnp.asarray(
                [1.0 / (a * bsz) for a in accum], jnp.float32)
            rngs = np.asarray(jax.random.split(
                jax.random.PRNGKey(rng_seed * 100003 + epoch),
                max(1, n_steps)))
            lr_dev = jnp.float32(lr)
            grad_accum = jax.tree.map(jnp.zeros_like, self.params["params"])
            vapply = self._get_vapply()

        cast_bf16 = self.policy.compute_dtype == jnp.bfloat16
        losses, step_logits = [], []
        reals: list[list] = []
        for s in range(n_steps):
            step_batches = [
                b[s] if s < len(b) else None for b in fold_batches
            ]
            stacked, real = stack_fold_batches(step_batches, bsz)
            reals.append(real)
            if cast_bf16:
                import ml_dtypes

                for k in ("ct", "pet"):
                    v = stacked.get(k)
                    if v is not None and v.dtype == np.float32:
                        stacked[k] = v.astype(ml_dtypes.bfloat16)
            skey = self._shape_key(stacked)
            stacked = self._put_fold_sharded(stacked)
            if train:
                vstep = self._get_vstep(skey, True)
                grad_accum, loss, logits = vstep(
                    self.params, grad_accum, stacked, rngs[s], scale)
                # per-fold cadence: fire on the fold's accum boundary or
                # its trailing remainder (train_models.py:685); exhausted
                # or stopped folds never fire.  The mask is pure host
                # data, so steps where NO fold is at a boundary skip the
                # optimizer dispatch entirely (the sequential trainer
                # only calls apply on boundaries too)
                do_apply = [
                    s < len(b) and ((s + 1) % a == 0 or s + 1 == len(b))
                    for b, a in zip(fold_batches, accum)
                ]
                if any(do_apply):
                    self.params, self.opt_state, grad_accum = vapply(
                        self.params, self.opt_state, grad_accum, lr_dev,
                        jnp.asarray(do_apply))
            else:
                vstep = self._get_vstep(skey, False)
                loss, logits = vstep(self.params, stacked)
            losses.append(loss)
            step_logits.append(logits)

        results = []
        if n_steps:
            # two device pulls for the whole epoch, same as sequential —
            # every step's logits share the (F, bsz, C) shape (the batch
            # axis is padded to bsz by stack_fold_batches), so one stack
            # covers the epoch
            loss_mat = np.asarray(jnp.stack(losses, axis=0))   # (S, F)
            logit_mats = np.asarray(
                jnp.stack(step_logits, axis=0).astype(jnp.float32)
            )                                                   # (S,F,bsz,C)
        for f, batches in enumerate(fold_batches):
            if not batches:
                results.append((
                    0.0, np.empty((0,), np.int64),
                    np.empty((0,), np.float32), []))
                continue
            pids: list = []
            y_true_parts, logit_parts = [], []
            for s in range(len(batches)):
                n, p = reals[s][f]
                pids.extend(p)
                y_true_parts.append(
                    np.argmax(batches[s]["labels"], axis=-1))
                logit_parts.append(logit_mats[s][f, :n])
            rescale = (accum[f] * bsz) if train else 1.0
            total_loss = float(loss_mat[: len(batches), f].sum()) * rescale
            lg = np.concatenate(logit_parts, axis=0)
            lg = lg - lg.max(axis=-1, keepdims=True)
            e = np.exp(lg)
            y_score = (e / e.sum(axis=-1, keepdims=True))[:, 1]
            results.append((
                total_loss / max(1, len(pids)),
                np.concatenate(y_true_parts),
                y_score,
                pids,
            ))
        return results[: self.n_folds]


def _snapshot_paths(base: Path) -> tuple[Path, Path]:
    return base / "foldpar_resume.msgpack", base / "foldpar_resume.json"


def _save_lockstep_snapshot(
    base: Path, epoch: int, trainer, history, stopped, fold_keys,
    sampler_rngs, train_dss,
) -> None:
    """Atomic stacked-state snapshot after epoch *epoch* completes.

    One msgpack (stacked params + optimizer states, all folds) + one
    JSON sidecar (epoch, per-fold metric history, stopped flags, and the
    exact PCG64 states of the per-fold sampler RNGs AND the datasets'
    internal augmentation RNGs — JSON carries the 128-bit state ints
    natively).  Histories reconstruct the patience countdown on restore
    (FoldBookkeeping replays early-stop state from history); the RNG
    states make the resumed run draw the exact augmentations the
    uninterrupted run would have.
    """
    import json

    from flax import serialization

    mpath, jpath = _snapshot_paths(base)
    blob = serialization.to_bytes({
        "params": jax.device_get(trainer.params),
        "opt_state": jax.device_get(trainer.opt_state),
    })
    tmp = mpath.with_suffix(".msgpack.tmp")
    with open(tmp, "wb") as fh:
        fh.write(blob)
    tmp.replace(mpath)
    tmp = jpath.with_suffix(".json.tmp")
    with open(tmp, "w") as fh:
        json.dump({
            "epoch": epoch,
            "fold_keys": [str(k) for k in fold_keys],
            "history": {str(k): history[f]
                        for f, k in enumerate(fold_keys)},
            "stopped": list(map(bool, stopped)),
            "sampler_rng": [r.bit_generator.state for r in sampler_rngs],
            "dataset_rng": [ds.rng.bit_generator.state
                            for ds in train_dss],
        }, fh)
    tmp.replace(jpath)


def _load_lockstep_snapshot(base: Path, trainer, fold_keys,
                            sampler_rngs, train_dss):
    """Restore a snapshot if present and consistent; None otherwise.

    Returns ``(next_epoch, history, stopped)`` with trainer params /
    opt_state replaced in place (fold-sharded like init_stacked's) and
    the sampler/dataset RNG streams set to their exact killed-run
    states."""
    import json

    from flax import serialization

    mpath, jpath = _snapshot_paths(base)
    if not (mpath.exists() and jpath.exists()):
        return None
    with open(jpath) as fh:
        meta = json.load(fh)
    if meta.get("fold_keys") != [str(k) for k in fold_keys]:
        return None  # different fold selection: start fresh
    with open(mpath, "rb") as fh:
        state = serialization.from_bytes(
            {"params": jax.device_get(trainer.params),
             "opt_state": jax.device_get(trainer.opt_state)},
            fh.read())
    trainer.params = trainer._put_fold_sharded(state["params"])
    trainer.opt_state = trainer._put_fold_sharded(state["opt_state"])
    for rng, st in zip(sampler_rngs, meta["sampler_rng"]):
        rng.bit_generator.state = st
    for ds, st in zip(train_dss, meta["dataset_rng"]):
        ds.rng.bit_generator.state = st
    history = [meta["history"][str(k)] for k in fold_keys]
    return meta["epoch"] + 1, history, list(meta["stopped"])


def train_kfold_parallel(
    df: pd.DataFrame,
    cfg: dict,
    tcfg: TrainerConfig,
    hdf5_ct_path,
    hdf5_pet_path,
    models_dir,
    mesh=None,
    folds: Sequence | None = None,
    log=print,
    step_cache: dict | None = None,
    resume: bool = True,
) -> dict:
    """`train_kfold` with every fold in one lockstep vmapped program.

    Same inputs/outputs/artifacts as the sequential
    :func:`engine.train.train_kfold` (per-fold report JSONs, losses.html,
    gated checkpoints, early stopping).  A single-process ``mesh`` shards
    the FOLD axis over its ``data`` axis — one fold per device, zero
    collectives.  ``resume=True`` (default) restores the stacked-state
    snapshot written after every completed epoch
    (``foldpar_resume.msgpack`` + JSON sidecar under the experiment
    dir) and continues the killed run's exact trajectory: parameters,
    optimizer moments, metric histories, patience countdowns and the
    per-fold sampler / dataset RNG streams (exact PCG64 bit-generator
    states, not replays) all match the uninterrupted run
    (tests/test_foldpar.py).
    """
    from ..core.mesh import enable_persistent_compile_cache
    from ..data.datasets import prepare_windows

    enable_persistent_compile_cache()

    modality_a = "pet"
    modality_b = "chest" if "chest" in tcfg.modality else "ct"
    df = df.copy()
    df["flip"] = df["flip"].astype(str)
    df = prepare_windows(df, modality_a, modality_b,
                         whole_volume=tcfg.whole_volume)

    fold_map = cfg["kfold_patients"][modality_b][tcfg.dataset]
    fold_keys = list(folds) if folds is not None else list(fold_map.keys())
    base = (
        Path(models_dir) / tcfg.experiment
        / f"{tcfg.backbone}_{tcfg.arch}_{tcfg.dataset}" / tcfg.modality
    )

    trainer = ParallelFoldTrainer(
        cfg, tcfg, n_folds=len(fold_keys),
        modality_a=modality_a, modality_b=modality_b,
        step_cache=step_cache, fold_mesh=mesh)

    ds_kwargs = dict(
        hdf5_ct_path=hdf5_ct_path, hdf5_pet_path=hdf5_pet_path,
        modality_a=modality_a, modality_b=modality_b,
        feature_dim=trainer.feature_dim, arch=tcfg.arch,
        num_classes=tcfg.num_classes,
    )
    train_dss, test_dss, save_dirs = [], [], []
    for kfold in fold_keys:
        train_p = fold_map[kfold]["train"]
        test_p = fold_map[kfold]["test"]
        df_train = df[df["patient_id"].isin(train_p)].reset_index(drop=True)
        df_test = df[df["patient_id"].isin(test_p)].reset_index(drop=True)
        log(f"fold {kfold}: {len(train_p)} train / {len(test_p)} test "
            "patients")
        train_dss.append(PETCTDataset(df_train, use_augmentation=True,
                                      seed=tcfg.seed, **ds_kwargs))
        test_dss.append(PETCTDataset(df_test, use_augmentation=False,
                                     seed=tcfg.seed + 1, **ds_kwargs))
        d = base / f"kfold_{kfold}"
        d.mkdir(parents=True, exist_ok=True)
        save_dirs.append(d)

    trainer.init_stacked(next(batch_items([test_dss[0][0]], 1)))

    # one rng per fold, all seeded like the sequential path (every fold
    # sees the same stream there too — train_fold builds it from
    # tcfg.seed); a restored snapshot overwrites these streams' states
    sampler_rngs = [np.random.default_rng(tcfg.seed + 17)
                    for _ in fold_keys]
    restored = (
        _load_lockstep_snapshot(
            base, trainer, fold_keys, sampler_rngs, train_dss)
        if resume else None)
    if restored is None:
        # fresh run: stale per-epoch artifacts from a previous (possibly
        # longer) run in the same directory would mix with this run's —
        # latest_epoch/best-epoch consumers (evaluate, convert, umap,
        # aggregation) would pick checkpoints or report JSONs belonging
        # to the abandoned run — so clear them up front
        for d in save_dirs:
            for stale in (*d.glob("model_epoch_*.msgpack"),
                          *d.glob("train_metrics_*.json"),
                          *d.glob("test_metrics_*.json")):
                stale.unlink()
        start_epoch = 0
        history = [
            {k: [] for k in (
                "epoch", "train_loss", "test_loss", "train_auc",
                "test_auc", "train_f1", "test_f1", "target_metric")}
            for _ in fold_keys
        ]
        stopped = [False] * len(fold_keys)
    else:
        start_epoch, history, stopped = restored
        log(f"fold-parallel resume: continuing at epoch {start_epoch}")

    # per-fold bookkeeping: the SAME FoldBookkeeping the sequential
    # train_fold runs (one source of truth for the target metric,
    # checkpoint gate and patience rule); restored histories replay the
    # patience countdown inside its ctor
    books = [
        FoldBookkeeping(history[f], trainer.patience, save_dirs[f],
                        kfold, tcfg.dataset, log=log)
        for f, kfold in enumerate(fold_keys)
    ]
    for epoch in range(start_epoch, trainer.num_epochs):
        if all(stopped):
            break
        train_fb, test_fb = [], []
        for f in range(len(fold_keys)):
            if stopped[f]:
                train_fb.append([])
                test_fb.append([])
                continue
            items = _bucket_sorted(
                [train_dss[f][i] for i in _draw_train_indices(
                    train_dss[f], tcfg, sampler_rngs[f])])
            t_items = _bucket_sorted(
                [test_dss[f][i] for i in range(len(test_dss[f]))])
            train_fb.append(list(batch_items(items, tcfg.batch_size)))
            test_fb.append(list(batch_items(t_items, tcfg.batch_size)))

        train_res = trainer.run_lockstep_epoch(
            train_fb, epoch, train=True, rng_seed=tcfg.seed)
        test_res = trainer.run_lockstep_epoch(
            test_fb, epoch, train=False)

        for f, kfold in enumerate(fold_keys):
            if stopped[f]:
                continue
            tr_loss, tr_y, tr_s, tr_pids = train_res[f]
            te_loss, te_y, te_s, te_pids = test_res[f]
            tr_rep = reports.device_epoch_report(
                tr_y, tr_s, _patient_weights(tr_pids), kfold=kfold,
                loss=tr_loss, epoch=epoch, split="train")
            te_rep = reports.device_epoch_report(
                te_y, te_s, _patient_weights(te_pids), kfold=kfold,
                loss=te_loss, epoch=epoch, split="test")
            stopped[f] = books[f].record_epoch(
                epoch, tr_loss, te_loss, tr_rep, te_rep,
                lambda f=f: dict(zip(("params", "opt_state"),
                                     trainer.fold_state(f))))
        _save_lockstep_snapshot(
            base, epoch, trainer, history, stopped, fold_keys,
            sampler_rngs, train_dss)
    ckpt.wait_pending()
    return {k: pd.DataFrame(history[f]) for f, k in enumerate(fold_keys)}
