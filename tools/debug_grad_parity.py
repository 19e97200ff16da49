"""Localize the torch↔JAX gradient divergence seen in
tests/test_golden_encoder.py::test_encoder_golden_gradient_parity.

Computes the input-image gradient with a loss on each Gaussian field
separately, so the diverging backward path can be identified.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "tests")

import numpy as np
import torch

import jax
import jax.numpy as jnp

import test_golden_encoder as T


class _MP:
    def setattr(self, mod, name, value):
        setattr(mod, name, value)


def main(backbone_kind="resnet"):
    T._reference()
    h = w = 32
    pos_grid = h // 16
    tcfg = T._torch_cfg(backbone_kind, pos_grid)

    from src.model.encoder.encoder_epipolar import EncoderEpipolar as TorchEnc

    torch.manual_seed(0)
    tenc = TorchEnc(tcfg)
    tenc.eval()

    T._patch_torch_sampler()
    T._patch_jax_sampler(_MP())

    image, extr, intr, near, far = T._context(h=h, w=w)
    global_step = 5000

    sd32 = {k: v.detach().clone() for k, v in tenc.state_dict().items()}

    import tempfile, pathlib

    tmp = pathlib.Path(tempfile.mkdtemp())
    ckpt_path = tmp / "golden_grad.ckpt"
    torch.save(
        {"state_dict": {f"encoder.{k}": v for k, v in sd32.items()}}, ckpt_path
    )

    from pixelsplat_tpu.interop.torch_import import load_lightning_checkpoint
    from pixelsplat_tpu.model.encoder.encoder_epipolar import EncoderEpipolar

    jcfg = T._jax_cfg(backbone_kind, pos_grid)
    variables = load_lightning_checkpoint(ckpt_path, jcfg)
    jenc = EncoderEpipolar(jcfg)

    jextr, jintr = jnp.asarray(extr), jnp.asarray(intr)
    jnear, jfar = jnp.asarray(near), jnp.asarray(far)

    # torch forward once to get shapes
    timg0 = torch.from_numpy(image)
    tctx0 = {
        "image": timg0,
        "extrinsics": torch.from_numpy(extr),
        "intrinsics": torch.from_numpy(intr),
        "near": torch.from_numpy(near),
        "far": torch.from_numpy(far),
    }
    with torch.no_grad():
        tg0 = tenc.forward(tctx0, global_step, deterministic=False)
    shapes = {
        "means": tuple(tg0.means.shape),
        "covariances": tuple(tg0.covariances.shape),
        "harmonics": tuple(tg0.harmonics.shape),
        "opacities": tuple(tg0.opacities.shape),
    }
    weights = T._loss_weights(shapes)

    for field in ["means", "covariances", "harmonics", "opacities"]:
        # --- torch grad ---
        timg = torch.from_numpy(image).requires_grad_(True)
        tctx = dict(tctx0)
        tctx["image"] = timg
        tg = tenc.forward(tctx, global_step, deterministic=False)
        tloss = (getattr(tg, field) * torch.from_numpy(weights[field])).sum()
        tloss.backward()
        t_imgg = timg.grad.detach().numpy()

        # --- jax grad ---
        def loss_fn(img):
            ctx = {
                "image": img,
                "extrinsics": jextr,
                "intrinsics": jintr,
                "near": jnear,
                "far": jfar,
            }
            g = jenc.apply(
                variables,
                ctx,
                jnp.asarray(global_step),
                deterministic=False,
                rngs={"sample": jax.random.PRNGKey(0)},
            )
            return (getattr(g, field) * weights[field]).sum()

        j_imgg = np.asarray(jax.grad(loss_fn)(jnp.asarray(image)), np.float64)
        scale = np.abs(t_imgg).max() + 1e-12
        err = np.abs(j_imgg - t_imgg).max() / scale
        print(f"{field:12s}: img_err={err:.3e}  (scale={scale:.3e})")


if __name__ == "__main__":
    main(*sys.argv[1:])
