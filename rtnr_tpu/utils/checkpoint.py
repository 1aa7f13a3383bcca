"""Checkpoint / cache subsystem.

The reference's persistence story (SURVEY.md section 5): a binary scene
cache (``pcd.oct``), AOT-compiled model files per resolution
(``trt_<W>x<H>.ts`` / ``model.pt``), and torch ``model.pth.tar`` weights.
TPU-native equivalents:

- scene cache: ``Scene.save_cache`` (npz) — rtnr_tpu/scene.py
- model weights: Flax variables serialized with Orbax (directory
  checkpoints, async-capable) or single-file msgpack (flax.serialization)
- compiled executables: the XLA persistent compilation cache, keyed by
  program — ``enable_compilation_cache()`` replaces the reference's
  per-resolution TensorRT engine files.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import numpy as np


def enable_compilation_cache(cache_dir: Union[str, Path, None] = None) -> Path:
    """Turn on XLA's persistent compilation cache (the reference's
    ~/.render_cache analog for compiled programs)."""
    cache_dir = Path(cache_dir or os.path.expanduser("~/.render_cache/xla"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir


# ---------------------------------------------------------------------------
# Flax variable checkpoints
# ---------------------------------------------------------------------------

def save_msgpack(path: Union[str, Path], variables: Dict[str, Any]) -> None:
    """Single-file msgpack checkpoint (portable, no torch needed)."""
    from flax import serialization

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    variables = jax.tree.map(np.asarray, variables)
    path.write_bytes(serialization.msgpack_serialize(variables))


def load_msgpack(path: Union[str, Path]) -> Dict[str, Any]:
    from flax import serialization

    return serialization.msgpack_restore(Path(path).read_bytes())


def save_orbax(path: Union[str, Path], variables: Dict[str, Any]) -> None:
    """Directory checkpoint via Orbax (multi-host-safe, async-capable)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, variables), force=True)


def load_orbax(path: Union[str, Path]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(Path(path).absolute())


def load_unet_variables(path: Union[str, Path]) -> Dict[str, Any]:
    """Load U-Net variables from any supported container: torch
    .pth/.pth.tar (converted), flax .msgpack, or an Orbax directory."""
    path = Path(path)
    if path.is_dir():
        return load_orbax(path)
    if path.suffix in (".pth", ".tar") or path.name.endswith(".pth.tar"):
        from rtnr_tpu.models.convert import load_torch_checkpoint

        return load_torch_checkpoint(str(path))
    return load_msgpack(path)
