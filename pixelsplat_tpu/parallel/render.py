"""View-parallel rendering over a device mesh.

A TPU-native capability the reference does not have (its CUDA rasterizer
renders one view per kernel launch on one GPU): shard the target-view axis
of a decoding pass across the mesh with `shard_map`, replicating the
Gaussians. Test-time evaluation renders hundreds of target views per scene
(the reference chunks them 32 at a time on one GPU,
/root/reference/src/model/model_wrapper.py:171-181); on a TPU pod slice
the view axis is embarrassingly parallel over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..model.decoder.decoder_splatting import DecoderOutput, DecoderSplatting
from ..model.types import Gaussians


def render_views_sharded(
    decoder: DecoderSplatting,
    mesh: Mesh,
    gaussians: Gaussians,
    extrinsics: jax.Array,  # (b, v, 4, 4)
    intrinsics: jax.Array,  # (b, v, 3, 3)
    near: jax.Array,  # (b, v)
    far: jax.Array,  # (b, v)
    image_shape: tuple[int, int],
    depth_mode: Optional[str] = None,
    axis: str = "data",
) -> DecoderOutput:
    """Render (b, v) target views with v sharded across `axis`.

    The view count is padded up to a multiple of the mesh size (padded
    views render from the last real camera and are dropped). Gaussians and
    cameras are closed over / replicated; each device renders its view
    shard independently — no collectives are needed until the caller
    gathers the output (XLA inserts the all-gather on use).
    """
    n_dev = mesh.shape[axis]
    b, v = near.shape
    v_pad = -(-v // n_dev) * n_dev

    def pad_views(x):
        pad = [(0, 0)] * x.ndim
        pad[1] = (0, v_pad - v)
        return jnp.pad(x, pad, mode="edge")

    extrinsics_p = pad_views(extrinsics)
    intrinsics_p = pad_views(intrinsics)
    near_p = pad_views(near)
    far_p = pad_views(far)

    view_spec = P(None, axis)
    out_specs = view_spec if depth_mode is None else (view_spec, view_spec)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), view_spec, view_spec, view_spec, view_spec),
        out_specs=out_specs,
        check_vma=False,
    )
    def shard(gs, e, k, n, f):
        out = decoder(gs, e, k, n, f, image_shape, depth_mode=depth_mode)
        return out.color if depth_mode is None else (out.color, out.depth)

    out = shard(gaussians, extrinsics_p, intrinsics_p, near_p, far_p)
    if depth_mode is None:
        return DecoderOutput(color=out[:, :v], depth=None)
    return DecoderOutput(color=out[0][:, :v], depth=out[1][:, :v])
