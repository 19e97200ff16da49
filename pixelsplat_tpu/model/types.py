"""Inter-layer types (reference: /root/reference/src/model/types.py)."""

from __future__ import annotations

from typing import NamedTuple

import jax


class Gaussians(NamedTuple):
    """The encoder→decoder contract: a flat set of Gaussians per batch element."""

    means: jax.Array  # (batch, gaussian, 3)
    covariances: jax.Array  # (batch, gaussian, 3, 3)
    harmonics: jax.Array  # (batch, gaussian, 3, d_sh)
    opacities: jax.Array  # (batch, gaussian)
