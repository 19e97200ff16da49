"""Generic pre-norm transformer stack in Flax linen.

Functional counterpart of the reference's vendored srt transformer
(/root/reference/src/model/transformer/*.py): LayerNorm pre-norm residual
blocks of multi-head attention (self or cross via a separate kv input) and
a pluggable feed-forward module. Attention matmuls run in bf16-friendly
einsums with f32 accumulation (MXU path).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class _DenseKernel(nn.Module):
    """Bare Dense kernel parameter (same path/init as nn.Dense, no apply).

    Lets the cross-attention path read the to_kv weights for the
    reassociated contraction while staying checkpoint-compatible with a
    bias-free nn.Dense named "to_kv".
    """

    shape: tuple

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )


class Attention(nn.Module):
    """Multi-head attention; self-attention if kv is None else cross."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    selfatt: bool = True
    kv_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jax.Array, z: Optional[jax.Array] = None) -> jax.Array:
        inner = self.dim_head * self.heads

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        scale = self.dim_head**-0.5
        if z is None:
            qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
            q, k, v = (split_heads(t) for t in jnp.split(qkv, 3, axis=-1))
            logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        else:
            # Cross attention, reassociated so k and v are never
            # materialized: logits = (q Wk^T) z^T and out = (attn z) Wv.
            # Exact same math (matmul associativity); on TPU the kv tokens
            # outnumber queries per pixel, and writing/re-reading
            # (tokens, heads*dim_head) k/v arrays was pure HBM traffic.
            q = split_heads(
                nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            )
            kv_dim = z.shape[-1]
            kv_kernel = _DenseKernel((kv_dim, inner * 2), name="to_kv")()
            if self.dtype is not None:
                kv_kernel = kv_kernel.astype(self.dtype)
                z = z.astype(self.dtype)
            wk = kv_kernel[:, :inner].reshape(kv_dim, self.heads, self.dim_head)
            wv = kv_kernel[:, inner:].reshape(kv_dim, self.heads, self.dim_head)
            q_proj = jnp.einsum("bhid,chd->bhic", q, wk)  # (b, h, nq, kv_dim)
            logits = jnp.einsum("bhic,bjc->bhij", q_proj, z) * scale

        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if self.dtype is not None:
            attn = attn.astype(self.dtype)
        # Capture attention maps for the encoder visualizer (reference
        # hooks the softmax module; here `sow` is free unless the
        # "intermediates" collection is requested).
        self.sow("intermediates", "attention", attn)
        if z is None:
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        else:
            ctx = jnp.einsum("bhij,bjc->bhic", attn, z)  # (b, h, nq, kv_dim)
            out = jnp.einsum("bhic,chd->bhid", ctx, wv)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)

        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return out.astype(x.dtype)


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, **_: Any) -> jax.Array:
        in_dtype = x.dtype
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        # Exact (erf) GELU: torch nn.GELU parity (ref feed_forward.py:33).
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x).astype(in_dtype)


class Transformer(nn.Module):
    """depth x (prenorm attention + prenorm feed-forward), both residual.

    `feed_forward_factory(dim, mlp_dim) -> nn.Module`; the FF module's
    __call__ receives **ff_kwargs (used by the image-self-attention FF to
    learn spatial structure).
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    selfatt: bool = True
    kv_dim: Optional[int] = None
    feed_forward_factory: Optional[Callable[..., nn.Module]] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        z: Optional[jax.Array] = None,
        **ff_kwargs: Any,
    ) -> jax.Array:
        for i in range(self.depth):
            attn_in = nn.LayerNorm(epsilon=1e-5, name=f"attn_norm_{i}")(x)
            x = (
                Attention(
                    self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    selfatt=self.selfatt,
                    kv_dim=self.kv_dim,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(attn_in, z=z)
                + x
            )
            ff_in = nn.LayerNorm(epsilon=1e-5, name=f"ff_norm_{i}")(x)
            if self.feed_forward_factory is None:
                ff = FeedForward(self.dim, self.mlp_dim, dtype=self.dtype, name=f"ff_{i}")
            else:
                ff = self.feed_forward_factory(self.dim, self.mlp_dim, name=f"ff_{i}")
            x = ff(ff_in, **ff_kwargs) + x
        return x
