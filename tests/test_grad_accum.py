"""Virtual-batch gradient accumulation: parameter-trajectory parity.

The reference accumulates gradients across
``iters_to_accumulate = min(virtual_batch_size, len(loader))``
micro-batches (loss pre-divided by the factor) and steps AdamW once per
group AND on the trailing remainder (train_models.py:653-655, 674,
685-688).  These tests run that exact torch update loop and
``FoldTrainer.run_epoch`` on identical weights/data and assert the
parameter trajectories match, including a non-divisible remainder group.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.core.precision import PARITY
from vit_deep_radiomics_tpu.engine.train import FoldTrainer, TrainerConfig
from vit_deep_radiomics_tpu.models.classifiers import (
    TransformerNoduleClassifier,
)
from vit_deep_radiomics_tpu.models.convert import (
    transformer_classifier_params_from_torch,
)

torch = pytest.importorskip("torch")

D, HEADS, LAYERS, FF, NCLS = 16, 2, 1, 32, 2
SEQ, BATCH = 6, 2


class _TorchMLPHead(torch.nn.Module):
    def __init__(self, d, hidden, out):
        super().__init__()
        self.dense1 = torch.nn.Linear(d, hidden)
        self.activation = torch.nn.GELU()
        self.dense2 = torch.nn.Linear(hidden, out)

    def forward(self, x):
        return self.dense2(self.activation(self.dense1(x)))


class _TorchUnimodal(torch.nn.Module):
    """Reference-contract unimodal classifier (models_archs.py:127-147),
    dropout 0 so train-mode forwards are deterministic."""

    def __init__(self):
        super().__init__()
        layer = torch.nn.TransformerEncoderLayer(
            d_model=D, nhead=HEADS, dim_feedforward=FF, activation="gelu",
            batch_first=True, dropout=0.0,
        )
        self.transformer_encoder = torch.nn.TransformerEncoder(layer, LAYERS)
        self.norm = torch.nn.LayerNorm(D)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, D))
        self.classifier = _TorchMLPHead(D, D * 2, NCLS)

    def forward(self, x):
        b = x.shape[0]
        x = torch.cat([self.cls_token.repeat(b, 1, 1), x], dim=1)
        x = self.norm(x)
        x = self.transformer_encoder(x)
        cls = x[:, 0]
        return self.classifier(cls), cls


def _torch_focal(logits, target_idx, alpha=(0.25, 0.75), gamma=2.0):
    """FocalLoss semantics (train_models.py:381-405): sum reduction."""
    logpt = torch.log_softmax(logits, dim=-1)
    pt = logpt.exp()
    focal = (1.0 - pt) ** gamma * logpt
    picked = focal.gather(1, target_idx[:, None])[:, 0]
    a = torch.as_tensor(alpha, dtype=logits.dtype)[target_idx]
    return -(a * picked).sum()


def _make_batches(rng, n_batches):
    batches = []
    for i in range(n_batches):
        tokens = rng.normal(size=(BATCH, SEQ, D)).astype(np.float32)
        labels = np.eye(NCLS, dtype=np.float32)[
            rng.integers(0, NCLS, size=BATCH)]
        batches.append({
            "ct": tokens,
            "ct_mask": np.ones((BATCH, SEQ), bool),
            "labels": labels,
            "patient_ids": [f"p{i}_{j}" for j in range(BATCH)],
        })
    return batches


def _make_trainer(virtual_batch, n_epochs=10):
    cfg = {
        "models": {
            "transformer": {
                "learning_rate": 5e-4, "feature_dim": D, "batch_size": BATCH,
                "virtual_batch_size": virtual_batch,
                "num_epochs": n_epochs, "patience": 15,
                "ct": {"num_layers": LAYERS, "num_heads": HEADS,
                       "mlp_ratio": FF / D},
                "pet": {"num_layers": LAYERS, "num_heads": HEADS,
                        "mlp_ratio": FF / D},
            },
        },
    }
    tcfg = TrainerConfig(arch="transformer", modality="ct", loss="focal",
                         precision="parity", batch_size=BATCH)
    trainer = FoldTrainer(cfg, tcfg)
    # dropout off so the torch (dropout-0) trajectory is deterministic
    trainer.model = TransformerNoduleClassifier(
        input_dim=D, ffn_dim=FF, num_heads=HEADS, num_classes=NCLS,
        num_layers=LAYERS, policy=PARITY, dropout_rate=0.0,
    )
    return trainer


def _torch_reference_epoch(tm, batches, accum_samples, lr):
    """The reference train loop for one epoch (train_models.py:653-688).

    The reference only ever runs batch 1 (train_models.py:579 TODO), so
    its iters_to_accumulate counts SAMPLES; our batched trainer must
    reproduce that sample-stream dynamics — flatten the micro-batches
    into the reference's one-sample steps."""
    opt = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=0.01)
    tm.train()
    opt.zero_grad()
    total = 0.0
    samples = [
        (b["ct"][j:j + 1], np.argmax(b["labels"][j], axis=-1))
        for b in batches for j in range(b["ct"].shape[0])
    ]
    n = len(samples)
    for i, (x, y) in enumerate(samples):
        logits, _ = tm(torch.as_tensor(x))
        loss = _torch_focal(logits, torch.as_tensor(y)[None]) / accum_samples
        total += loss.item() * accum_samples
        loss.backward()
        if (i + 1) % accum_samples == 0 or i + 1 == n:
            opt.step()
            opt.zero_grad()
    return total / n


class TestGradAccumulationParity:
    @pytest.mark.parametrize("n_batches,vb", [(7, 6), (6, 6), (4, 16)])
    def test_trajectory_matches_torch(self, rng, n_batches, vb):
        """Identical weights + data → identical params after one epoch vs
        the reference's BATCH-1 sample-stream loop, covering an
        exact-multiple run, a trailing remainder, and the
        virtual_batch > epoch-samples clamp.  virtual_batch_size counts
        samples, so our batch-2 micro-steps must land on the same update
        boundaries with the same mean-gradient scale."""
        torch.manual_seed(3)
        tm = _TorchUnimodal()
        state0 = {k: v.detach().numpy().copy()
                  for k, v in tm.state_dict().items()}
        batches = _make_batches(rng, n_batches)

        trainer = _make_trainer(virtual_batch=vb)
        trainer.init_params(batches[0])
        trainer.params = jax.tree.map(
            jnp.asarray,
            {"params": transformer_classifier_params_from_torch(
                state0, LAYERS)},
        )
        trainer.opt_state = trainer.tx.init(trainer.params["params"])
        with jax.default_matmul_precision("highest"):
            avg_loss, *_ = trainer.run_epoch(batches, epoch=0, train=True)

        # the trainer clamps to ceil(vb/B) micro-batches and divides by
        # the full nominal virtual batch accum·B
        eff_accum = min(-(-vb // BATCH), n_batches) * BATCH
        ref_loss = _torch_reference_epoch(
            tm, batches, eff_accum, lr=trainer.lr0)

        assert avg_loss == pytest.approx(ref_loss, rel=2e-5)
        # compare parameter DELTAS from init: fp32/Adam noise on
        # near-zero-gradient elements is ~3e-5, while a cadence defect
        # (e.g. stepping every micro-batch) shifts deltas by the full
        # ~n_steps·lr ≈ 1e-3+ — atol 1e-4 separates the two regimes
        init = transformer_classifier_params_from_torch(state0, LAYERS)
        want = transformer_classifier_params_from_torch(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()},
            LAYERS,
        )
        got = trainer.params["params"]
        flat = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(want)}
        flat0 = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(init)}
        for key, ours in jax.tree_util.tree_leaves_with_path(got):
            ks = jax.tree_util.keystr(key)
            np.testing.assert_allclose(
                np.asarray(ours) - flat0[ks], flat[ks] - flat0[ks],
                atol=1e-4, err_msg=ks)

    def test_update_cadence(self, rng):
        """7 micro-batches of 2 samples @ virtual batch 6 samples →
        3 micro-batches per update → exactly 3 optimizer applications
        (i = 2, 5 and the trailing remainder at 6)."""
        batches = _make_batches(rng, 7)
        trainer = _make_trainer(virtual_batch=6)
        trainer.init_params(batches[0])

        calls = []
        orig = trainer._get_apply_step

        def counted():
            fn = orig()

            def wrapper(*a):
                calls.append(1)
                return fn(*a)

            return wrapper

        trainer._get_apply_step = counted
        trainer.run_epoch(batches, epoch=0, train=True)
        assert len(calls) == 3

    def test_trajectory_invariant_to_batch_size(self, rng):
        """The same sample stream at batch 1 and batch 2 (same
        virtual_batch_size in SAMPLES) lands on identical update
        boundaries with identical mean gradients → identical params.
        Pre-fix, batch 2 applied 2x the per-update gradient."""
        batches2 = _make_batches(rng, 3)  # 6 samples at B=2
        batches1 = []
        for b in batches2:
            for j in range(BATCH):
                batches1.append({
                    "ct": b["ct"][j:j + 1],
                    "ct_mask": b["ct_mask"][j:j + 1],
                    "labels": b["labels"][j:j + 1],
                    "patient_ids": [b["patient_ids"][j]],
                })

        seed_trainer = _make_trainer(virtual_batch=4)
        seed_trainer.init_params(batches2[0])
        params0 = jax.device_get(seed_trainer.params)

        finals = []
        for bsz, batches in ((1, batches1), (2, batches2)):
            trainer = _make_trainer(virtual_batch=4)
            trainer.tcfg = TrainerConfig(
                arch="transformer", modality="ct", loss="focal",
                precision="parity", batch_size=bsz)
            trainer.init_params(batches2[0])
            trainer.params = jax.tree.map(jnp.asarray, params0)
            trainer.opt_state = trainer.tx.init(trainer.params["params"])
            with jax.default_matmul_precision("highest"):
                trainer.run_epoch(batches, epoch=0, train=True)
            finals.append(jax.device_get(trainer.params))
        # atol 1e-4: fp32 reduction-order noise through Adam's
        # grad/(sqrt(v)+eps) on near-zero-gradient elements is ~5e-5; a
        # scale defect (the pre-fix 2x per-update gradient) shifts
        # params by ~1e-3+
        for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(finals[0]),
            jax.tree_util.tree_leaves_with_path(finals[1]),
        ):
            np.testing.assert_allclose(a, b, atol=1e-4, err_msg=str(ka))

    def test_params_frozen_between_boundaries(self, rng):
        """Micro-batches inside a virtual batch must NOT move params
        (the round-1 defect: the optimizer stepped every micro-batch)."""
        batches = _make_batches(rng, 3)
        trainer = _make_trainer(virtual_batch=6)
        trainer.init_params(batches[0])
        before = jax.tree.map(np.asarray, trainer.params)

        # run just the first two micro-batches: no boundary is crossed,
        # so params must be bit-identical afterwards
        accum_dev = jnp.float32(1.0 / 3)
        grad_accum = jax.tree.map(jnp.zeros_like, trainer.params["params"])
        rngs = np.asarray(jax.random.split(jax.random.PRNGKey(0), 2))
        for i in range(2):
            step = trainer._get_step(trainer._shape_key(batches[i]), True)
            dev = {k: v for k, v in batches[i].items()
                   if isinstance(v, np.ndarray)}
            grad_accum, _, _ = step(
                trainer.params, grad_accum, dev, rngs[i], accum_dev)
        after = jax.tree.map(np.asarray, trainer.params)
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(before),
            jax.tree_util.tree_leaves_with_path(after),
        ):
            np.testing.assert_array_equal(a, b, err_msg=str(ka))
