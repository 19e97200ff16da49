"""Stage-by-stage localization of torch<->JAX encoder divergence.

Runs the reference torch EncoderEpipolar and the Flax one on shared
weights (tests/test_golden_encoder.py setup) and prints max-abs
differences of corresponding intermediates.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import test_golden_encoder as tge

BACKBONE = sys.argv[1] if len(sys.argv) > 1 else "resnet"

tge._reference()
h = w = 32
pos_grid = h // 16
tcfg = tge._torch_cfg(BACKBONE, pos_grid)

from src.model.encoder.encoder_epipolar import EncoderEpipolar as TorchEnc

torch.manual_seed(0)
tenc = TorchEnc(tcfg)
tenc.eval()
with torch.no_grad():
    tenc.depth_predictor.projection[1].weight.mul_(10.0)
    tenc.depth_predictor.projection[1].bias.mul_(10.0)

image, extr, intr, near, far = tge._context(h=h, w=w)
tctx = {
    "image": torch.from_numpy(image),
    "extrinsics": torch.from_numpy(extr),
    "intrinsics": torch.from_numpy(intr),
    "near": torch.from_numpy(near),
    "far": torch.from_numpy(far),
}
global_step = 5000

captured: dict = {}


def hook(name):
    def fn(mod, args, out):
        captured[name] = out

    return fn


tenc.backbone.register_forward_hook(hook("backbone"))
tenc.epipolar_transformer.downscaler.register_forward_hook(hook("downscaler"))

# The reference calls .forward() explicitly in places, which bypasses
# forward hooks - wrap the bound methods instead.
def wrap_forward(mod, name):
    orig = mod.forward

    def wrapped(*a, **kw):
        out = orig(*a, **kw)
        captured[name] = out
        return out

    mod.forward = wrapped


wrap_forward(tenc.epipolar_transformer.epipolar_sampler, "sampler")
wrap_forward(tenc.depth_predictor, "depth_predictor")
wrap_forward(tenc.epipolar_transformer.transformer, "et_transformer")
tenc.epipolar_transformer.depth_encoding.register_forward_hook(hook("depth_enc"))
tenc.epipolar_transformer.transformer.register_forward_hook(hook("et_transformer"))
tenc.backbone_projection.register_forward_hook(hook("backbone_projection"))
tenc.epipolar_transformer.register_forward_hook(hook("epipolar_transformer"))
tenc.high_resolution_skip.register_forward_hook(hook("skip"))
tenc.depth_predictor.register_forward_hook(hook("depth_predictor"))
tenc.to_gaussians.register_forward_hook(hook("to_gaussians"))

sd32 = {k: v.detach().clone() for k, v in tenc.state_dict().items()}
with torch.no_grad():
    tg = tenc.forward(tctx, global_step, deterministic=True)

import tempfile
from pathlib import Path

tmp = Path(tempfile.mkdtemp())
torch.save({"state_dict": {f"encoder.{k}": v for k, v in sd32.items()}}, tmp / "g.ckpt")

from pixelsplat_tpu.interop.torch_import import load_lightning_checkpoint
from pixelsplat_tpu.model.encoder.encoder_epipolar import EncoderEpipolar

jcfg = tge._jax_cfg(BACKBONE, pos_grid)
variables = load_lightning_checkpoint(tmp / "g.ckpt", jcfg)
jenc = EncoderEpipolar(jcfg)
jctx = {
    "image": jnp.asarray(image),
    "extrinsics": jnp.asarray(extr),
    "intrinsics": jnp.asarray(intr),
    "near": jnp.asarray(near),
    "far": jnp.asarray(far),
}
jg, state = jenc.apply(
    variables,
    jctx,
    jnp.asarray(global_step),
    deterministic=True,
    capture_intermediates=True,
    mutable=["intermediates"],
)

inter = state["intermediates"]


def get_inter(path):
    node = inter
    for p in path.split("/"):
        node = node[p]
    out = node["__call__"][0]
    return out


def diff(name, j, t, transpose=None):
    j = np.asarray(j, np.float64)
    t = t.detach().cpu().numpy().astype(np.float64)
    if transpose is not None:
        t = np.transpose(t, transpose)
    if j.shape != t.shape:
        print(f"{name:28s} SHAPE MISMATCH {j.shape} vs {t.shape}")
        return
    d = np.abs(j - t)
    print(
        f"{name:28s} max {d.max():.3e} rel {d.max() / (np.abs(t).max() + 1e-9):.3e}"
    )


# backbone: torch (b,v,c,h,w) -> JAX channels-last (b,v,h,w,c)
diff(
    "backbone",
    get_inter("backbone"),
    captured["backbone"],
    transpose=(0, 1, 3, 4, 2),
)
# backbone_projection: torch applied on (b,v,h,w,c)
diff(
    "backbone_projection",
    get_inter("backbone_projection"),
    captured["backbone_projection"],
)
# inside the epipolar transformer
jds = get_inter("epipolar_transformer/downscaler")
diff("et.downscaler", jds, captured["downscaler"], transpose=(0, 2, 3, 1))

from pixelsplat_tpu.model.encoder.epipolar.epipolar_sampler import (
    sample_along_epipolar_lines,
)

bb, vv = 1, 2
jfeat = jds.reshape(bb, vv, jds.shape[1], jds.shape[2], jds.shape[3])
jsampling = sample_along_epipolar_lines(
    jfeat,
    jctx["extrinsics"],
    jctx["intrinsics"],
    jctx["near"],
    jctx["far"],
    jcfg.epipolar_transformer.num_samples,
)
tsampling = captured["sampler"]
diff("et.sampling.xy_sample", jsampling.xy_sample, tsampling.xy_sample)
diff("et.sampling.features", jsampling.features, tsampling.features)
diff(
    "et.sampling.valid",
    jsampling.valid.astype(np.float32),
    tsampling.valid.float(),
)
diff("et.sampling.origins", jsampling.origins, tsampling.origins)
diff("et.sampling.directions", jsampling.directions, tsampling.directions)
diff("et.depth_enc", get_inter("epipolar_transformer/depth_proj"), captured["depth_enc"])
jt = get_inter("epipolar_transformer/transformer")
diff(
    "et.transformer",
    np.asarray(jt).reshape(-1, jt.shape[-1]),
    captured["et_transformer"].reshape(-1, jt.shape[-1]),
)

# epipolar transformer: torch returns (features (b,v,c,h,w), sampling)
jet = get_inter("epipolar_transformer")
if isinstance(jet, tuple):
    jet = jet[0]
diff(
    "epipolar_transformer",
    jet,
    captured["epipolar_transformer"][0],
    transpose=(0, 1, 3, 4, 2),
)
# skip: torch (b*v, c, h, w); JAX (b*v, h, w, c) pre-relu conv out
# (capture only checks final features instead)
jdp = get_inter("depth_predictor")
tdp = captured["depth_predictor"]
diff("depths", jdp[0], tdp[0])
diff("densities", jdp[1], tdp[1])
diff("to_gaussians", get_inter("to_gaussians"), captured["to_gaussians"])

for name, jv, tv in [
    ("means", jg.means, tg.means),
    ("covariances", jg.covariances, tg.covariances),
    ("harmonics", jg.harmonics, tg.harmonics),
    ("opacities", jg.opacities, tg.opacities),
]:
    diff(name, jv, tv)
