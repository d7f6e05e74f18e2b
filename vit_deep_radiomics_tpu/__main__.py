"""Top-level command dispatcher: ``python -m vit_deep_radiomics_tpu <cmd>``.

Maps subcommands onto the cli/ entry points (which mirror the
reference's per-script CLIs).
"""

from __future__ import annotations

import sys

COMMANDS = {
    "extract": "vit_deep_radiomics_tpu.cli.extract",
    "merge": "vit_deep_radiomics_tpu.cli.merge",
    "split": "vit_deep_radiomics_tpu.cli.split",
    "train": "vit_deep_radiomics_tpu.cli.train",
    "finetune": "vit_deep_radiomics_tpu.cli.finetune",
    "sweep": "vit_deep_radiomics_tpu.cli.sweep",
    "evaluate": "vit_deep_radiomics_tpu.cli.evaluate",
    "aggregate": "vit_deep_radiomics_tpu.cli.aggregate",
    "umap": "vit_deep_radiomics_tpu.cli.umap_embed",
    "pointcloud": "vit_deep_radiomics_tpu.cli.pointcloud",
    "fusion": "vit_deep_radiomics_tpu.cli.fusion",
    "serve": "vit_deep_radiomics_tpu.cli.serve",
    "convert": "vit_deep_radiomics_tpu.cli.convert",
}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print("usage: python -m vit_deep_radiomics_tpu <command> [args]")
        print("commands:", ", ".join(COMMANDS))
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    import importlib

    mod = importlib.import_module(COMMANDS[argv[0]])
    return mod.main(argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
