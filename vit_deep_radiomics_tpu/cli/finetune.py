"""End-to-end backbone fine-tuning CLI.

Beyond-the-reference capability (its encoders are frozen external
checkpoints, tfds_dense_descriptor.py:87/104 in /root/reference): train
the ViT backbone itself, slice-supervised with patient EGFR labels, via
``engine/finetune.py``'s custom-VJP flash-attention trainer.

Reads the same isotropic-HDF5 + metadata-CSV contract as the extract
CLI; CT slices are HU-windowed, nodule-cropped (the reference's 2x
square-box arithmetic) and resized on device; the nodule mask pools the
feature grid.

Example::

    python -m vit_deep_radiomics_tpu.cli.finetune \
        -h5 data/iso.hdf5 -df data/iso.csv -s models/finetune \
        --epochs 3 --batch-size 2 --freeze-below 6
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("-h5", "--hdf5-path", required=True)
    p.add_argument("-df", "--df-path", required=True,
                   help="metadata CSV (patient_id, egfr, dataset)")
    p.add_argument("-s", "--save-dir", default="models/finetune")
    p.add_argument("--backbone", default="medsam")
    p.add_argument("--modality", default="ct", choices=["ct", "chest"])
    p.add_argument("--datasets", nargs="*",
                   default=["santa_maria", "stanford"])
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--freeze-below", type=int, default=0,
                   help="freeze transformer blocks [0, N)")
    p.add_argument("--precision", default="fast")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state over the data axis "
                        "(ZeRO-1; needs a >1-device mesh)")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient microbatching: split each batch into "
                        "N microbatches, average grads, one optimizer "
                        "apply — effective large batches past the "
                        "backend's physical-batch wall (B>=16)")
    p.add_argument("--remat", nargs="?", const="block", default="none",
                   choices=("none", "block", "mlp"),
                   help="rematerialise in the backward: 'block' recomputes"
                        " whole blocks (max memory saving, ~25%% step "
                        "cost); 'mlp' recomputes only the MLP hidden "
                        "activations (the dominant stored term, near-free"
                        " recompute).  Bare --remat means 'block'.")
    p.add_argument("--ct-window", type=float, nargs=2, default=(800, 40),
                   metavar=("WIDTH", "LEVEL"))
    p.add_argument("--seed", type=int, default=0)
    # smoke-scale backbone overrides (tests / dry runs)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--num-heads", type=int, default=None)
    p.add_argument("--window-size", type=int, default=None)
    return p


def _load_samples(args):
    """(images, masks, labels_onehot) slice-level arrays on host."""
    import dataclasses as dc

    import numpy as np
    import pandas as pd

    import jax
    import jax.numpy as jnp

    from ..data.synthetic import read_isotropic_hdf5
    from ..engine.finetune import FineTuneConfig
    from ..ops import preprocess as pp
    from ..ops import roi

    cfg = FineTuneConfig(backbone=args.backbone)
    bcfg = cfg.resolve_backbone()
    overrides = {
        k: getattr(args, a) for k, a in (
            ("image_size", "image_size"), ("depth", "depth"),
            ("width", "width"), ("num_heads", "num_heads"),
            ("window_size", "window_size"),
        ) if getattr(args, a) is not None
    }
    if overrides:
        bcfg = dc.replace(bcfg, **overrides)
    img_size = bcfg.image_size
    grid = img_size // bcfg.patch_size

    meta = pd.read_csv(args.df_path)
    meta = meta[meta["dataset"].isin(args.datasets)]
    images, masks, labels = [], [], []
    for row in meta.itertuples():
        vol, mask, _res = read_isotropic_hdf5(
            args.hdf5_path, row.patient_id, args.modality)
        w, l = args.ct_window
        norm = np.asarray(pp.apply_window_ct(jnp.asarray(vol), w, l))
        union = mask.sum(-1) > 0
        if not union.any():
            continue
        xmin, ymin, xmax, ymax = roi.square_crop_box(union, margin=2)
        crop = roi.crop_image(norm, xmin, ymin, xmax, ymax)
        mcrop = roi.crop_image(mask.astype(np.float32),
                               xmin, ymin, xmax, ymax)
        label = int(row.egfr == "Mutant")
        for k in range(crop.shape[2]):
            img = jax.image.resize(
                jnp.asarray(crop[:, :, k]), (img_size, img_size), "linear")
            images.append(np.repeat(
                np.asarray(img)[..., None], 3, axis=-1))
            gm = jax.image.resize(
                jnp.asarray(mcrop[:, :, k]), (grid, grid), "nearest")
            masks.append(np.asarray(gm) > 0.5)
            labels.append(label)
    images = np.stack(images).astype(np.float32)
    masks = np.stack(masks)
    onehot = np.eye(2, dtype=np.float32)[np.asarray(labels)]
    return bcfg, images, masks, onehot


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import numpy as np

    import jax

    from ..core.distributed import initialize_from_env
    from ..core.mesh import enable_persistent_compile_cache, make_mesh
    from ..engine.checkpoint import save_checkpoint_async, wait_pending
    from ..engine.finetune import FineTuneConfig, FineTuner

    initialize_from_env()
    if jax.process_count() > 1:
        # the fine-tune loop builds its mesh over all visible devices and
        # writes checkpoints ungated — running it per-process would race
        # identical writes; refuse loudly until multi-process fine-tuning
        # is a supported regime
        raise SystemExit(
            "cli.finetune does not support multi-process launches; run "
            "it single-process (it data-parallelises over the local "
            "devices by itself)")
    enable_persistent_compile_cache()
    bcfg, images, masks, onehot = _load_samples(args)
    n = images.shape[0]
    if n < args.batch_size:
        raise SystemExit(
            f"only {n} slices with nodule masks; need at least "
            f"--batch-size ({args.batch_size})")
    print(f"{n} slices, backbone {bcfg.name} @{bcfg.image_size}")

    # data-parallel mesh only when the batch splits evenly over devices
    nd = jax.device_count()
    mesh = make_mesh() if nd > 1 and args.batch_size % nd == 0 else None
    if args.zero1 and mesh is None:
        raise SystemExit(
            "--zero1 needs a multi-device mesh (batch size divisible "
            f"by device count; have {nd} device(s), batch {args.batch_size})"
        )
    cfg = FineTuneConfig(
        backbone=args.backbone, backbone_cfg=bcfg,
        learning_rate=args.lr, freeze_below=args.freeze_below,
        precision=args.precision, remat=args.remat, zero1=args.zero1,
        accum_steps=args.accum_steps,
    )
    tuner = FineTuner(cfg, mesh=mesh)
    bs = args.batch_size
    state = tuner.init(jax.random.PRNGKey(args.seed), images[:bs],
                       masks[:bs])

    rng = np.random.default_rng(args.seed)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        # drop the ragged tail: static batch shapes, one executable
        batches = (
            (images[idx], masks[idx], onehot[idx])
            for idx in np.array_split(order[: n - n % bs], max(1, n // bs))
            if len(idx) == bs
        )
        state, losses = tuner.fit(state, batches)
        print(f"epoch {epoch}: mean loss {losses.mean():.4f} "
              f"({len(losses)} steps)")
        save_checkpoint_async(
            {"params": state["params"], "epoch": epoch}, args.save_dir,
            epoch)
    wait_pending()
    print(f"checkpoints in {args.save_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
