"""Dependency shims that make the reference's torch EncoderEpipolar
importable in this environment (no torchvision / e3nn / omegaconf, no
network for torch.hub) so golden parity tests can run the real reference
module graph against the Flax implementation.

The shim modules reproduce the *architectures* the reference constructs
through those dependencies — torchvision ResNet (state-dict compatible
with torchvision's layer naming) and the facebookresearch/dino
VisionTransformer (state-dict compatible with the hub checkpoint layout:
patch_embed.proj, blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,
mlp.fc2}, cls_token, pos_embed, norm) — with random initialization. The
reference's e3nn-based `rotate_sh` is replaced by a torch wrapper around
this repo's resampling-based rotation (itself validated against exact
polynomial identities in tests/test_sh.py), since e3nn is unavailable.

Reference counterparts:
  /root/reference/src/model/encoder/backbone/backbone_resnet.py:45
  /root/reference/src/model/encoder/backbone/backbone_dino.py:25
  /root/reference/src/misc/sh_rotation.py:10
"""

from __future__ import annotations

import sys
import types

import torch
from torch import nn

# Grid of the shimmed DINO ViT's positional embedding. Tests set this to
# (input size / patch size) so neither framework hits its pos-embed
# interpolation path (whose bicubic kernels differ between torch and
# jax.image and are exercised by their own tests instead).
DINO_POS_GRID = 8


# ---------------------------------------------------------------------------
# torchvision.models.ResNet (standard architecture, torchvision naming)


def _conv3x3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride, 1, bias=False)


def _conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = _conv3x3(inplanes, planes, stride)
        self.bn1 = norm_layer(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = _conv3x3(planes, planes)
        self.bn2 = norm_layer(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = _conv1x1(inplanes, planes)
        self.bn1 = norm_layer(planes)
        self.conv2 = _conv3x3(planes, planes, stride)
        self.bn2 = norm_layer(planes)
        self.conv3 = _conv1x1(planes, planes * self.expansion)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, norm_layer=None):
        super().__init__()
        self._norm_layer = norm_layer or nn.BatchNorm2d
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = self._norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, 1000)

    def _make_layer(self, block, planes, blocks, stride=1):
        norm_layer = self._norm_layer
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * block.expansion, stride),
                norm_layer(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample, norm_layer)]
        self.inplanes = planes * block.expansion
        layers += [
            block(self.inplanes, planes, norm_layer=norm_layer)
            for _ in range(1, blocks)
        ]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


_RESNET_LAYERS = {
    "resnet18": (BasicBlock, [2, 2, 2, 2]),
    "resnet34": (BasicBlock, [3, 4, 6, 3]),
    "resnet50": (Bottleneck, [3, 4, 6, 3]),
    "resnet101": (Bottleneck, [3, 4, 23, 3]),
    "resnet152": (Bottleneck, [3, 8, 36, 3]),
}


def _resnet_factory(name):
    def make(norm_layer=None, **kw):
        block, layers = _RESNET_LAYERS[name]
        return ResNet(block, layers, norm_layer=norm_layer)

    return make


# ---------------------------------------------------------------------------
# facebookresearch/dino VisionTransformer (hub state-dict layout)


class _PatchEmbed(nn.Module):
    def __init__(self, patch, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, patch)


class _Attention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class _Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = _Mlp(dim, dim * 4)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class DinoVisionTransformer(nn.Module):
    def __init__(self, patch, dim, depth, heads, grid):
        super().__init__()
        self.patch_embed = _PatchEmbed(patch, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + grid * grid, dim))
        self.blocks = nn.ModuleList(_Block(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim)
        nn.init.normal_(self.pos_embed, std=0.02)
        nn.init.normal_(self.cls_token, std=0.02)

    def prepare_tokens(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        assert x.shape[1] == self.pos_embed.shape[1], (
            "shim ViT has no pos-embed interpolation: input grid must equal "
            f"DINO_POS_GRID ({x.shape[1]} vs {self.pos_embed.shape[1]} tokens)"
        )
        return x + self.pos_embed

    def get_intermediate_layers(self, x, n=1):
        x = self.prepare_tokens(x)
        out = []
        depth = len(self.blocks)
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if depth - i <= n:
                out.append(self.norm(x))
        return out


_VIT_SPECS = {
    "dino_vits16": dict(patch=16, dim=384, depth=12, heads=6),
    "dino_vits8": dict(patch=8, dim=384, depth=12, heads=6),
    "dino_vitb16": dict(patch=16, dim=768, depth=12, heads=12),
    "dino_vitb8": dict(patch=8, dim=768, depth=12, heads=12),
}


def _fake_hub_load(repo, name, **kw):
    assert repo == "facebookresearch/dino:main", repo
    if name == "dino_resnet50":
        return _resnet_factory("resnet50")()  # default BatchNorm2d
    spec = _VIT_SPECS[name]
    return DinoVisionTransformer(
        spec["patch"], spec["dim"], spec["depth"], spec["heads"], DINO_POS_GRID
    )


# ---------------------------------------------------------------------------
# module registration


class _FakeDictConfig(dict):
    """Attribute-access dict standing in for omegaconf.DictConfig."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e
        return _FakeDictConfig(v) if isinstance(v, dict) else v


def install_shims() -> None:
    """Register fake torchvision / e3nn / omegaconf modules and patch
    torch.hub.load. Idempotent; call before importing `src.*`."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        transforms = types.ModuleType("torchvision.transforms")
        models.ResNet = ResNet
        for name in _RESNET_LAYERS:
            setattr(models, name, _resnet_factory(name))

        class ToTensor:  # dataset_re10k constructs this lazily
            def __call__(self, pil):
                raise NotImplementedError

        transforms.ToTensor = ToTensor
        tv.models = models
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.transforms"] = transforms

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.DictConfig = _FakeDictConfig
        oc.OmegaConf = types.SimpleNamespace
        sys.modules["omegaconf"] = oc

    if "colorspacious" not in sys.modules:
        cs = types.ModuleType("colorspacious")

        def cspace_convert(x, src, dst):  # pragma: no cover
            raise NotImplementedError("colorspacious shim")

        cs.cspace_convert = cspace_convert
        sys.modules["colorspacious"] = cs

    if "plyfile" not in sys.modules:
        ply = types.ModuleType("plyfile")
        ply.PlyData = object
        ply.PlyElement = object
        sys.modules["plyfile"] = ply

    if "wandb" not in sys.modules:
        wandb = types.ModuleType("wandb")
        wandb.Image = object
        wandb.Object3D = object
        sys.modules["wandb"] = wandb

    if "lightning" not in sys.modules:
        lightning = types.ModuleType("lightning")
        lpt = types.ModuleType("lightning.pytorch")

        class LightningModule(nn.Module):
            pass

        lpt.LightningModule = LightningModule
        lightning.pytorch = lpt
        sys.modules["lightning"] = lightning
        sys.modules["lightning.pytorch"] = lpt

    if "dacite" not in sys.modules:
        dacite = types.ModuleType("dacite")

        class Config:
            def __init__(self, *a, **kw):
                pass

        def from_dict(*a, **kw):  # pragma: no cover
            raise NotImplementedError("dacite shim")

        dacite.Config = Config
        dacite.from_dict = from_dict
        sys.modules["dacite"] = dacite

    if "e3nn" not in sys.modules:
        e3nn = types.ModuleType("e3nn")
        o3 = types.ModuleType("e3nn.o3")

        def _unavailable(*a, **kw):  # pragma: no cover
            raise RuntimeError(
                "e3nn shim: rotate_sh must be monkeypatched before use"
            )

        o3.matrix_to_angles = _unavailable
        o3.wigner_D = _unavailable
        e3nn.o3 = o3
        sys.modules["e3nn"] = e3nn
        sys.modules["e3nn.o3"] = o3

    torch.hub.load = _fake_hub_load


def install_reference(num_context_views: int = 2):
    """Make /root/reference importable as `src.*` with shims active, set
    its global cfg, and patch rotate_sh. Returns the src package root."""
    install_shims()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    import src.global_cfg as global_cfg

    global_cfg.set_cfg(
        _FakeDictConfig(
            {
                "seed": 0,
                "dataset": {
                    "view_sampler": {"num_context_views": num_context_views}
                },
            }
        )
    )

    import src.misc.sh_rotation as sh_rotation

    import jax.numpy as jnp
    import numpy as np

    from pixelsplat_tpu.ops.sh import full_sh_rotation_matrix

    def torch_rotate_sh(sh_coefficients, rotations):
        # rotate_sh is linear in the coefficients: out = M(R) @ sh. The
        # only model-path call site rotates by c2w extrinsics
        # (gaussian_adapter.py:89) — constants under autograd — so M is
        # built grad-free via numpy and applied as a torch matmul,
        # keeping the autograd chain through sh_coefficients intact
        # (the old numpy round-trip detached harmonics entirely, which
        # broke gradient-parity testing).
        rot_np = rotations.detach().cpu().numpy()
        n = sh_coefficients.shape[-1]
        degree = int(round(n**0.5)) - 1
        m_np = np.asarray(
            full_sh_rotation_matrix(jnp.asarray(rot_np), degree),
            dtype=np.float32,
        )  # (*rot_batch, n, n)
        m = torch.from_numpy(m_np).to(sh_coefficients.dtype)
        return (m @ sh_coefficients.unsqueeze(-1)).squeeze(-1)

    sh_rotation.rotate_sh = torch_rotate_sh
    return sh_rotation
