"""PyTorch checkpoint -> Flax variable conversion for the U-Net.

The reference ships pretrained weights as a torch ``state_dict``
(reference model/model.pth.tar, loaded at export_pt.py:6-8). This module
maps that state dict onto the Flax UNet of rtnr_tpu.models.unet.

Key layout of the reference torch module (model/model.py:21-45):
  downs.{i}.conv.{0|3}.*      two Conv2d per DoubleConv
  downs.{i}.conv.{1|4}.*      two BatchNorm2d per DoubleConv
  bottleneck.conv.*           DoubleConv
  ups.{2k}.*                  ConvTranspose2d
  ups.{2k+1}.conv.*           DoubleConv
  final_conv.*                1x1 Conv2d

Tensor layout maps (NCHW torch -> NHWC flax):
  Conv2d weight            (O,I,kh,kw) -> (kh,kw,I,O)
  ConvTranspose2d weight   (I,O,kh,kw) -> (kh,kw,I,O), spatially flipped
                           (lax.conv_transpose correlates; torch's
                           transposed conv convolves)
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convT_w(w: np.ndarray) -> np.ndarray:
    # (I, O, kh, kw) -> (kh, kw, I, O) with spatial flip
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _double_conv(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    params, stats = {}, {}
    for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
        params[f"conv{j}"] = {"kernel": _conv_w(np.asarray(sd[f"{prefix}.conv.{ci}.weight"]))}
        params[f"bn{j}"] = {
            "scale": np.asarray(sd[f"{prefix}.conv.{bi}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.conv.{bi}.bias"]),
        }
        stats[f"bn{j}"] = {
            "mean": np.asarray(sd[f"{prefix}.conv.{bi}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.conv.{bi}.running_var"]),
        }
    return {"params": params, "batch_stats": stats}


def convert_state_dict(
    sd: Mapping[str, np.ndarray], features: Sequence[int] = (64, 128, 256, 512)
) -> Dict:
    """Map a torch UNet state dict (arrays as numpy) to Flax variables."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    for i in range(len(features)):
        dc = _double_conv(sd, f"downs.{i}")
        params[f"down{i}"] = dc["params"]
        stats[f"down{i}"] = dc["batch_stats"]

    dc = _double_conv(sd, "bottleneck")
    params["bottleneck"] = dc["params"]
    stats["bottleneck"] = dc["batch_stats"]

    for k in range(len(features)):
        params[f"up{k}"] = {
            "kernel": _convT_w(sd[f"ups.{2 * k}.weight"]),
            "bias": np.asarray(sd[f"ups.{2 * k}.bias"]),
        }
        dc = _double_conv(sd, f"ups.{2 * k + 1}")
        params[f"updc{k}"] = dc["params"]
        stats[f"updc{k}"] = dc["batch_stats"]

    params["final_conv"] = {
        "kernel": _conv_w(sd["final_conv.weight"]),
        "bias": np.asarray(sd["final_conv.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str, features: Sequence[int] = (64, 128, 256, 512)) -> Dict:
    """Load a .pth/.pth.tar state_dict with torch (CPU) and convert.

    Accepts either a bare state_dict or a dict holding one under common
    wrapper keys ('state_dict', 'model').
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and not any(k.startswith("downs.") for k in obj):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in obj:
                obj = obj[key]
                break
    sd = {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}
    return convert_state_dict(sd, features)
