"""BatchNorm folding for inference.

At inference the reference runs BatchNorm with frozen running statistics
(TorchScript eval mode, reference export_pt.py:9); a BN after a bias-free
conv is then an affine map foldable into the conv:

    W'[..., o] = W[..., o] * scale[o] / sqrt(var[o] + eps)
    b'[o]      = bias[o] - mean[o] * scale[o] / sqrt(var[o] + eps)

Folding halves the number of elementwise passes per DoubleConv and lets XLA
fuse conv+bias+ReLU into one kernel — a pure-win inference transform on the
TPU's HBM-bandwidth budget. ``fold_batchnorm(variables)`` produces variables
for ``UNet(fold_bn=True)``; outputs match the unfolded net to float
tolerance (tested).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


_EPS = 1e-5


def _fold_double_conv(params: Dict, stats: Dict) -> Dict:
    out = {}
    for j in range(2):
        kernel = np.asarray(params[f"conv{j}"]["kernel"], np.float32)
        scale = np.asarray(params[f"bn{j}"]["scale"], np.float32)
        bias = np.asarray(params[f"bn{j}"]["bias"], np.float32)
        mean = np.asarray(stats[f"bn{j}"]["mean"], np.float32)
        var = np.asarray(stats[f"bn{j}"]["var"], np.float32)
        inv = scale / np.sqrt(var + _EPS)
        out[f"conv{j}"] = {
            "kernel": kernel * inv[None, None, None, :],
            "bias": bias - mean * inv,
        }
    return out


def fold_batchnorm(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold all DoubleConv BNs; pass-through ConvTranspose/final_conv."""
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    folded: Dict[str, Any] = {}
    for name, p in params.items():
        if name in stats:  # a DoubleConv block
            folded[name] = _fold_double_conv(p, stats[name])
        else:  # up{k} ConvTranspose / final_conv carry over
            folded[name] = p
    return {"params": folded}
