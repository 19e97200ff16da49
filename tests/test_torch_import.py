"""Numeric validation of torch->Flax weight conversion.

Builds torch modules with the reference's layouts (Sequential indices,
PreNorm wrappers, torchvision block names), converts their state_dicts, and
checks the Flax modules produce the same outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pixelsplat_tpu.interop.torch_import import (
    convert_conv,
    convert_conv_transpose,
    convert_dino_vit,
    convert_image_self_attention,
    convert_linear,
    convert_resnet,
    convert_transformer,
)

RTOL = 2e-4
ATOL = 2e-4


def to_np(t):
    return t.detach().cpu().numpy()


def test_linear_conversion():
    import flax.linen as nn

    torch.manual_seed(0)
    lin = torch.nn.Linear(6, 4)
    x = torch.randn(5, 6)
    expected = to_np(lin(x))
    sd = {f"l.{k}": v for k, v in lin.state_dict().items()}
    params = {"params": convert_linear(sd, "l")}
    got = nn.Dense(4).apply(params, jnp.asarray(to_np(x)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=RTOL, atol=ATOL)


def test_conv_conversion_stride2_pad1():
    import flax.linen as nn

    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    x = torch.randn(2, 3, 16, 16)
    expected = to_np(conv(x)).transpose(0, 2, 3, 1)
    sd = {"c.weight": conv.weight}
    params = {"params": convert_conv(sd, "c", bias=False)}
    got = nn.Conv(8, (3, 3), strides=2, padding=((1, 1), (1, 1)), use_bias=False).apply(
        params, jnp.asarray(to_np(x).transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=RTOL, atol=ATOL)


def test_conv_transpose_conversion():
    import flax.linen as nn

    torch.manual_seed(0)
    conv = torch.nn.ConvTranspose2d(6, 4, 4, stride=4)
    x = torch.randn(2, 6, 8, 8)
    expected = to_np(conv(x)).transpose(0, 2, 3, 1)
    sd = {"c.weight": conv.weight, "c.bias": conv.bias}
    params = {"params": convert_conv_transpose(sd, "c")}
    got = nn.ConvTranspose(4, (4, 4), strides=(4, 4), padding="VALID").apply(
        params, jnp.asarray(to_np(x).transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=RTOL, atol=ATOL)


# --- torch fixtures with the reference's module layouts -------------------


class TorchPreNorm(torch.nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = torch.nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x, **kw):
        return self.fn(self.norm(x), **kw)


class TorchAttention(torch.nn.Module):
    def __init__(self, dim, heads, dim_head, selfatt=True, kv_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head**-0.5
        if selfatt:
            self.to_qkv = torch.nn.Linear(dim, inner * 3, bias=False)
        else:
            self.to_q = torch.nn.Linear(dim, inner, bias=False)
            self.to_kv = torch.nn.Linear(kv_dim, inner * 2, bias=False)
        self.to_out = torch.nn.Sequential(torch.nn.Linear(inner, dim))
        self.selfatt = selfatt

    def forward(self, x, z=None):
        if z is None:
            q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        else:
            q = self.to_q(x)
            k, v = self.to_kv(z).chunk(2, dim=-1)
        b, n, _ = q.shape
        m = k.shape[1]

        def heads(t, n_):
            return t.reshape(b, n_, self.heads, -1).transpose(1, 2)

        q, k, v = heads(q, n), heads(k, m), heads(v, m)
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.scale, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class TorchFeedForward(torch.nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.net = torch.nn.Sequential(
            torch.nn.Linear(dim, hidden),
            torch.nn.GELU(),
            torch.nn.Dropout(0.0),
            torch.nn.Linear(hidden, dim),
            torch.nn.Dropout(0.0),
        )

    def forward(self, x):
        return self.net(x)


class TorchTransformer(torch.nn.Module):
    def __init__(self, dim, depth, heads, dim_head, mlp_dim, selfatt=True, kv_dim=None):
        super().__init__()
        self.layers = torch.nn.ModuleList()
        for _ in range(depth):
            self.layers.append(
                torch.nn.ModuleList(
                    [
                        TorchPreNorm(
                            dim, TorchAttention(dim, heads, dim_head, selfatt, kv_dim)
                        ),
                        TorchPreNorm(dim, TorchFeedForward(dim, mlp_dim)),
                    ]
                )
            )

    def forward(self, x, z=None):
        for attn, ff in self.layers:
            x = attn(x, z=z) + x
            x = ff(x) + x
        return x


def test_transformer_conversion_self_attention():
    from pixelsplat_tpu.model.transformer.transformer import Transformer

    torch.manual_seed(0)
    dim, depth, heads, dim_head, mlp = 16, 2, 2, 8, 32
    tt = TorchTransformer(dim, depth, heads, dim_head, mlp)
    x = torch.randn(3, 7, dim)
    expected = to_np(tt(x))

    params = {"params": convert_transformer(tt.state_dict(), "", depth, selfatt=True)}
    ft = Transformer(dim=dim, depth=depth, heads=heads, dim_head=dim_head, mlp_dim=mlp)
    got = ft.apply(params, jnp.asarray(to_np(x)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3, atol=1e-3)


def test_transformer_conversion_cross_attention():
    from pixelsplat_tpu.model.transformer.transformer import Transformer

    torch.manual_seed(1)
    dim, depth, heads, dim_head, mlp, kv_dim = 16, 1, 2, 8, 32, 16
    tt = TorchTransformer(dim, depth, heads, dim_head, mlp, selfatt=False, kv_dim=kv_dim)
    x = torch.randn(3, 1, dim)
    z = torch.randn(3, 9, kv_dim)
    expected = to_np(tt(x, z=z))

    params = {"params": convert_transformer(tt.state_dict(), "", depth, selfatt=False)}
    ft = Transformer(
        dim=dim, depth=depth, heads=heads, dim_head=dim_head, mlp_dim=mlp,
        selfatt=False, kv_dim=kv_dim,
    )
    got = ft.apply(params, jnp.asarray(to_np(x)), z=jnp.asarray(to_np(z)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3, atol=1e-3)


def _make_torch_bottleneck(inplanes, planes, stride, with_downsample):
    """torchvision-style Bottleneck with BatchNorm (eval mode)."""
    m = torch.nn.Module()
    m.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
    m.bn1 = torch.nn.BatchNorm2d(planes)
    m.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
    m.bn2 = torch.nn.BatchNorm2d(planes)
    m.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
    m.bn3 = torch.nn.BatchNorm2d(planes * 4)
    if with_downsample:
        m.downsample = torch.nn.Sequential(
            torch.nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            torch.nn.BatchNorm2d(planes * 4),
        )
    # Randomize batchnorm stats so the test is nontrivial.
    for bn in [m.bn1, m.bn2, m.bn3] + (
        [m.downsample[1]] if with_downsample else []
    ):
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.data.normal_(1, 0.2)
        bn.bias.data.normal_(0, 0.2)

    def forward(x):
        out = torch.relu(m.bn1(m.conv1(x)))
        out = torch.relu(m.bn2(m.conv2(out)))
        out = m.bn3(m.conv3(out))
        identity = m.downsample(x) if with_downsample else x
        return torch.relu(out + identity)

    m.forward = forward
    return m


def test_bottleneck_batchnorm_conversion():
    from pixelsplat_tpu.model.encoder.backbone.resnet import Bottleneck

    torch.manual_seed(0)
    tm = _make_torch_bottleneck(16, 8, stride=2, with_downsample=True)
    tm.eval() if hasattr(tm, "eval") else None
    for mod in tm.children():
        mod.eval()
    x = torch.randn(2, 16, 8, 8)
    with torch.no_grad():
        expected = to_np(tm.forward(x)).transpose(0, 2, 3, 1)

    sd = {f"m.layer1.0.{k}": v for k, v in tm.state_dict().items()}
    from pixelsplat_tpu.interop.torch_import import (
        convert_batchnorm,
        convert_conv,
    )

    blk = {
        "conv1": convert_conv(sd, "m.layer1.0.conv1", bias=False),
        "bn1": convert_batchnorm(sd, "m.layer1.0.bn1"),
        "conv2": convert_conv(sd, "m.layer1.0.conv2", bias=False),
        "bn2": convert_batchnorm(sd, "m.layer1.0.bn2"),
        "conv3": convert_conv(sd, "m.layer1.0.conv3", bias=False),
        "bn3": convert_batchnorm(sd, "m.layer1.0.bn3"),
        "downsample": convert_conv(sd, "m.layer1.0.downsample.0", bias=False),
        "bn_ds": convert_batchnorm(sd, "m.layer1.0.downsample.1"),
    }
    got = Bottleneck(8, stride=2, norm_mode="batch").apply(
        {"params": blk}, jnp.asarray(to_np(x).transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3, atol=1e-3)


def test_dino_vit_block_conversion():
    """DINO-style ViT block: prenorm attention with fused qkv."""
    from pixelsplat_tpu.model.encoder.backbone.dino import ViTBlock

    torch.manual_seed(0)
    dim, heads = 24, 3

    class TorchViTBlock(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(dim)
            self.norm2 = torch.nn.LayerNorm(dim)

            class Attn(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.qkv = torch.nn.Linear(dim, dim * 3, bias=True)
                    self.proj = torch.nn.Linear(dim, dim)

                def forward(self, x):
                    b, n, _ = x.shape
                    qkv = self.qkv(x).reshape(b, n, 3, heads, dim // heads)
                    qkv = qkv.permute(2, 0, 3, 1, 4)
                    q, k, v = qkv[0], qkv[1], qkv[2]
                    attn = torch.softmax(
                        q @ k.transpose(-2, -1) * (dim // heads) ** -0.5, dim=-1
                    )
                    out = (attn @ v).transpose(1, 2).reshape(b, n, dim)
                    return self.proj(out)

            self.attn = Attn()

            class Mlp(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.fc1 = torch.nn.Linear(dim, dim * 4)
                    self.fc2 = torch.nn.Linear(dim * 4, dim)

                def forward(self, x):
                    return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

            self.mlp = Mlp()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    tb = TorchViTBlock()
    x = torch.randn(2, 10, dim)
    with torch.no_grad():
        expected = to_np(tb(x))

    sd = {f"vit.blocks.0.{k}": v for k, v in tb.state_dict().items()}
    sd["vit.patch_embed.proj.weight"] = torch.randn(dim, 3, 8, 8)
    sd["vit.patch_embed.proj.bias"] = torch.randn(dim)
    sd["vit.cls_token"] = torch.randn(1, 1, dim)
    sd["vit.pos_embed"] = torch.randn(1, 5, dim)
    sd["vit.norm.weight"] = torch.ones(dim)
    sd["vit.norm.bias"] = torch.zeros(dim)

    params = convert_dino_vit(sd, "vit", depth=1, dim=dim, heads=heads)
    # Blocks stack along a leading depth axis (the nn.scan layout).
    block0 = jax.tree.map(lambda a: a[0], params["blocks"])
    got = ViTBlock(dim, heads).apply({"params": block0}, jnp.asarray(to_np(x)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3, atol=1e-3)


def test_image_self_attention_conversion():
    """Patchify conv + PE + transformer + ConvTranspose resampler."""
    from pixelsplat_tpu.model.encoder.epipolar.image_self_attention import (
        ImageSelfAttention,
        ImageSelfAttentionCfg,
    )

    torch.manual_seed(0)
    d_in, d_token, patch = 8, 16, 2

    class TorchISA(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.positional_encoding = torch.nn.Sequential(
                torch.nn.Identity(), torch.nn.Linear(2 * 4 * 2, d_token)
            )
            self.patch_embedder = torch.nn.Sequential(
                torch.nn.Conv2d(d_in, d_token, patch, patch), torch.nn.ReLU()
            )
            self.transformer = TorchTransformer(d_token, 1, 2, 8, 32)
            self.resampler = torch.nn.ConvTranspose2d(d_token, d_in, patch, patch)

    tisa = TorchISA()
    sd = tisa.state_dict()
    params = convert_image_self_attention(sd, "", depth=1)
    # Strip the leading "." the empty prefix produced? convert uses
    # f"{prefix}.patch_embedder.0" -> ".patch_embedder.0"; rebuild with a
    # proper prefix instead.
    sd2 = {f"isa.{k}": v for k, v in sd.items()}
    params = convert_image_self_attention(sd2, "isa", depth=1)

    cfg = ImageSelfAttentionCfg(
        patch_size=patch, num_octaves=4, num_layers=1, num_heads=2,
        d_token=d_token, d_dot=8, d_mlp=32,
    )
    module = ImageSelfAttention(cfg, d_in)
    x = np.random.default_rng(0).normal(size=(2, 8, 8, d_in)).astype(np.float32)
    # Verify the converted params have the right structure to apply
    # (channels-last: the module runs NHWC end to end).
    got = module.apply({"params": params}, jnp.asarray(x))
    assert got.shape == (2, 8, 8, d_in)
    assert bool(jnp.isfinite(got).all())
