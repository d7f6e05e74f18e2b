"""Config tree: merged YAML parameter files + project-root discovery.

Capability-equivalent of the reference's ``src/config_manager.py``
(/root/reference/src/config_manager.py:12-44): the project root is the
nearest ancestor directory containing ``.git``, and the configuration is
the dict-union of every ``conf/parameters*.y(a)ml`` under it.  The same
contract lets generated configs (e.g. the k-fold patient assignment YAML
written by :mod:`vit_deep_radiomics_tpu.data.splits`) be picked up
automatically on the next load.

Differences from the reference (deliberate):

* the root search walks *all* ancestors instead of two levels plus a
  hard-coded ``src`` path-component hack,
* an explicit ``root`` argument supports hermetic tests,
* deep-merge instead of top-level ``dict.update`` so multiple files can
  contribute to one section.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Mapping

import yaml

__all__ = [
    "get_project_dir",
    "load_all_ymls",
    "load_conf",
    "deep_merge",
    "save_yaml",
]


def get_project_dir(start: str | os.PathLike | None = None) -> Path:
    """Nearest ancestor of *start* (default: cwd) that contains ``.git``.

    Mirrors reference ``get_project_dir`` (config_manager.py:15-26) but
    walks every ancestor.
    """
    here = Path(start or os.getcwd()).resolve()
    for candidate in (here, *here.parents):
        if (candidate / ".git").exists():
            return candidate
    raise FileNotFoundError(
        f"no project root (directory containing .git) above {here}"
    )


def deep_merge(base: dict, update: Mapping) -> dict:
    """Recursively merge *update* into a copy of *base* (update wins)."""
    out = dict(base)
    for key, val in update.items():
        if (
            key in out
            and isinstance(out[key], dict)
            and isinstance(val, Mapping)
        ):
            out[key] = deep_merge(out[key], val)
        else:
            out[key] = val
    return out


def load_all_ymls(
    config_folder: str | os.PathLike, startswith: str = "parameters"
) -> dict[str, Any]:
    """Merge every ``{startswith}*.yml|yaml`` in *config_folder* into one dict.

    Mirrors reference ``load_all_ymls`` (config_manager.py:28-38); files are
    merged in sorted-name order for determinism.
    """
    folder = Path(config_folder)
    config: dict[str, Any] = {}
    if not folder.is_dir():
        return config
    for path in sorted(folder.iterdir()):
        if path.name.startswith(startswith) and path.suffix in (".yml", ".yaml"):
            with open(path, "r") as fh:
                data = yaml.safe_load(fh)
            if data:
                config = deep_merge(config, data)
    return config


def load_conf(
    startswith: str = "parameters",
    root: str | os.PathLike | None = None,
) -> dict[str, Any]:
    """Load the merged config tree from ``<project>/conf``.

    Mirrors reference ``load_conf`` (config_manager.py:40-44).
    """
    project_dir = get_project_dir(root)
    return load_all_ymls(project_dir / "conf", startswith)


def save_yaml(data: Mapping, path: str | os.PathLike) -> None:
    """Write a YAML file (used for generated configs like the k-fold map)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        yaml.dump(dict(data), fh)
