"""Tiny q/k attention producing a discrete pdf.

Counterpart of /root/reference/src/model/encoder/epipolar/distribution.py
(not used by the main epipolar path, kept for capability parity): a single
query/key projection pair whose scaled dot products, softmaxed over the
sample axis, form a probability distribution; `force_last_token` optionally
concentrates all mass on the final sample.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class Distribution(nn.Module):
    dim: int

    @nn.compact
    def __call__(
        self,
        features: jax.Array,  # (..., sample, channel)
        force_last_token: jax.Array | None = None,  # (...,) bool
    ) -> jax.Array:
        q = nn.Dense(self.dim, name="to_q")(features[..., :1, :])  # (..., 1, d)
        k = nn.Dense(self.dim, name="to_k")(features)  # (..., s, d)
        logits = jnp.einsum("...id,...sd->...s", q, k) / jnp.sqrt(
            jnp.asarray(self.dim, features.dtype)
        )
        if force_last_token is not None:
            s = logits.shape[-1]
            last_only = jnp.full_like(logits, -1e9).at[..., -1].set(0.0)
            logits = jnp.where(force_last_token[..., None], last_only, logits)
        return jax.nn.softmax(logits, axis=-1)
