"""Sinusoidal positional encoding for [0, 1]-ranged inputs.

Functional port of the reference PositionalEncoding
(/root/reference/src/model/encodings/positional_encoding.py): per octave o,
frequency 2*pi*2^o, phases (0, pi/2) i.e. (sin, cos). Output layout is
(dim, octave, phase) flattened, matching d_out = 2 * octaves * dim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def positional_encoding(samples: jax.Array, num_octaves: int) -> jax.Array:
    """samples (..., d) -> (..., d * num_octaves * 2)."""
    octaves = jnp.arange(num_octaves, dtype=samples.dtype)
    frequencies = 2.0 * jnp.pi * 2.0**octaves  # (f,)
    phases = jnp.asarray([0.0, 0.5 * jnp.pi], samples.dtype)  # (p,)
    scaled = samples[..., None, None] * frequencies[:, None] + phases  # (..., d, f, p)
    encoded = jnp.sin(scaled)
    return encoded.reshape(*samples.shape[:-1], -1)


def positional_encoding_d_out(dimensionality: int, num_octaves: int) -> int:
    return 2 * num_octaves * dimensionality
