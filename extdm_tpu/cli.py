"""Console entry points (`pyproject.toml [project.scripts]`).

The runnable drivers live in the repo's `scripts/` directory (mirroring the
reference layout `scripts/{AE,DM}/{run,valid}.py`); these wrappers load them
by file path so `extdm-train-dm ...` works from a checkout / editable
install (`pip install -e .`).
"""
from __future__ import annotations

import importlib.util
import os
import sys


def _load_script(name: str):
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(os.path.dirname(here), "scripts", f"{name}.py")
    if not os.path.exists(path):
        raise SystemExit(
            f"extdm-tpu: driver script {path} not found. The CLI drivers ship "
            "in the repository's scripts/ directory — run from a checkout or "
            "editable install (pip install -e .)."
        )
    sys.path.insert(0, os.path.dirname(os.path.dirname(path)))
    sys.path.insert(0, os.path.dirname(path))
    spec = importlib.util.spec_from_file_location(f"extdm_scripts.{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def train_ae_main():
    _load_script("train_ae").main()


def train_dm_main():
    _load_script("train_dm").main()


def valid_ae_main():
    _load_script("valid_ae").main()


def valid_dm_main():
    _load_script("valid_dm").main()


def make_dataset_main():
    _load_script("make_dataset").main()
