"""LPIPS (VGG16 variant) in Flax.

Architecture mirrors the `lpips` package with net="vgg" (used by the
reference at /root/reference/src/loss/loss_lpips.py and
/root/reference/src/evaluation/metrics.py): inputs scaled by the LPIPS
scaling layer, VGG16 features from the five ReLU stages, per-channel unit
normalization, squared differences, learned 1x1 "lin" weights, spatial
mean, sum over stages.

Pretrained weights (VGG16 + lin heads) are loaded from an .npz exported by
`tools/export_lpips_weights.py` (requires torch + lpips, run where egress
exists). Without the file, `LPIPS.random_params` gives architecture-correct
random weights — fine for exercising code paths, NOT for metric parity.
"""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before).
_VGG16_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# Indices (into conv list) after whose ReLU LPIPS taps features:
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
_TAPS = [1, 3, 6, 9, 12]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS_PATH = Path(__file__).resolve().parents[2] / "weights" / "lpips_vgg.npz"


class _VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        """x: (n, h, w, 3) -> list of five tap features (NHWC)."""
        taps = []
        for i, (ch, pool) in enumerate(_VGG16_PLAN):
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), name=f"conv{i}")(x)
            x = nn.relu(x)
            if i in _TAPS:
                taps.append(x)
        return taps


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, img_a: jax.Array, img_b: jax.Array) -> jax.Array:
        """img_a, img_b: (n, 3, h, w) in [0, 1] -> (n,) LPIPS distances."""

        def prep(img):
            x = img * 2.0 - 1.0  # lpips operates on [-1, 1]
            x = (x - jnp.asarray(_SHIFT)[:, None, None]) / jnp.asarray(_SCALE)[
                :, None, None
            ]
            return x.transpose(0, 2, 3, 1)

        vgg = _VGG16Features(name="vgg")
        taps_a = vgg(prep(img_a))
        taps_b = vgg(prep(img_b))

        total = 0.0
        for i, (fa, fb) in enumerate(zip(taps_a, taps_b)):
            na = fa / jnp.sqrt((fa * fa).sum(-1, keepdims=True) + 1e-10)
            nb = fb / jnp.sqrt((fb * fb).sum(-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(diff)
            total = total + lin.mean(axis=(1, 2, 3))
        return total


@lru_cache(maxsize=1)
def load_lpips_params(path: Optional[str] = None):
    """Load pretrained LPIPS params from .npz, or None if unavailable."""
    p = Path(path) if path else DEFAULT_WEIGHTS_PATH
    if not p.exists():
        return None
    data = np.load(p)
    params = {"vgg": {}, **{}}
    for i in range(len(_VGG16_PLAN)):
        params["vgg"][f"conv{i}"] = {
            "kernel": jnp.asarray(data[f"vgg_conv{i}_kernel"]),
            "bias": jnp.asarray(data[f"vgg_conv{i}_bias"]),
        }
    for i in range(len(_TAPS)):
        params[f"lin{i}"] = {"kernel": jnp.asarray(data[f"lin{i}_kernel"])}
    return {"params": params}


@lru_cache(maxsize=1)
def random_lpips_params(seed: int = 0):
    """Architecture-correct random params (for tests / smoke runs)."""
    model = LPIPS()
    dummy = jnp.zeros((1, 3, 64, 64))
    return model.init(jax.random.PRNGKey(seed), dummy, dummy)


def get_lpips_params(allow_random: bool = True):
    params = load_lpips_params()
    if params is None:
        if not allow_random:
            raise FileNotFoundError(
                f"LPIPS weights not found at {DEFAULT_WEIGHTS_PATH}; export them "
                "with tools/export_lpips_weights.py"
            )
        return random_lpips_params(), False
    return params, True


def compute_lpips(img_a: jax.Array, img_b: jax.Array, params=None) -> jax.Array:
    """(n, 3, h, w) pairs in [0,1] -> (n,) distances."""
    if params is None:
        params, _ = get_lpips_params()
    return LPIPS().apply(params, img_a, img_b)
