"""CLIP ModifiedResNet tower vs a torch oracle built from nn primitives.

The oracle assembles the publicly documented architecture (3-conv stem +
blur-pool, bottlenecks with avgpool-before-stride, attention pooling) with
torch layers and CLIP's state-dict key naming, so the test covers our
converter (incl. BN folding) and the JAX forward in one shot.
"""

from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
from torch import nn

import jax
import jax.numpy as jnp

from eventclip_tpu.models.clip.convert import (
    convert_clip_state_dict,
    infer_config_from_state_dict,
)
from eventclip_tpu.models.clip.resnet import (
    ResNetVisionConfig,
    encode_image_resnet,
    init_resnet_visual,
)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.stride = stride
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(OrderedDict([
                ("-1", nn.AvgPool2d(stride) if stride > 1 else nn.Identity()),
                ("0", nn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", nn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        out = TF.relu(self.bn1(self.conv1(x)))
        out = TF.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        sc = x if self.downsample is None else self.downsample(x)
        return TF.relu(out + sc)


class AttentionPool2d(nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5
        )
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        B, C, H, W = x.shape
        x = x.flatten(2).permute(2, 0, 1)  # [HW, B, C]
        x = torch.cat([x.mean(0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None]
        return self._manual(x, C)

    def _manual(self, x, C):
        # torch's separated-proj MHA path concatenates the three biases;
        # do the math explicitly to sidestep version-specific signatures
        q = TF.linear(x[:1], self.q_proj.weight, self.q_proj.bias)
        k = TF.linear(x, self.k_proj.weight, self.k_proj.bias)
        v = TF.linear(x, self.v_proj.weight, self.v_proj.bias)
        S, B, _ = k.shape
        h = self.num_heads
        dh = C // h

        def split(t):
            return t.permute(1, 0, 2).reshape(B, -1, h, dh).transpose(1, 2)

        qh, kh, vh = split(q), split(k), split(v)
        attn = torch.softmax(qh @ kh.transpose(-1, -2) / dh ** 0.5, dim=-1)
        o = (attn @ vh).transpose(1, 2).reshape(B, 1, C)[:, 0]
        return TF.linear(o, self.c_proj.weight, self.c_proj.bias)


class ModifiedResNetOracle(nn.Module):
    def __init__(self, layers, width, image_size, heads, output_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0], 1)
        self.layer2 = self._make_layer(width * 2, layers[1], 2)
        self.layer3 = self._make_layer(width * 4, layers[2], 2)
        self.layer4 = self._make_layer(width * 8, layers[3], 2)
        self.attnpool = AttentionPool2d(
            image_size // 32, width * 32, heads, output_dim
        )

    def _make_layer(self, planes, blocks, stride):
        mods = [Bottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            mods.append(Bottleneck(self._inplanes, planes))
        return nn.Sequential(*mods)

    def forward(self, x):
        x = TF.relu(self.bn1(self.conv1(x)))
        x = TF.relu(self.bn2(self.conv2(x)))
        x = TF.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return self.attnpool(x)


@pytest.fixture
def oracle(rng):
    torch.manual_seed(0)
    m = ModifiedResNetOracle(
        layers=(1, 2, 1, 1), width=16, image_size=64, heads=8, output_dim=32
    ).eval()
    # non-trivial BN running stats so folding is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0.0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
    return m


def oracle_state_dict(m):
    # CLIP naming: visual.* for the tower, plus a minimal text side so the
    # converter's config inference has everything it needs
    sd = {f"visual.{k}": v for k, v in m.state_dict().items()}
    sd["token_embedding.weight"] = torch.zeros(128, 32)
    sd["positional_embedding"] = torch.zeros(16, 32)
    sd["ln_final.weight"] = torch.ones(32)
    sd["ln_final.bias"] = torch.zeros(32)
    sd["text_projection"] = torch.eye(32)
    sd["logit_scale"] = torch.tensor(2.0)
    for i in range(2):
        pre = f"transformer.resblocks.{i}"
        sd[f"{pre}.ln_1.weight"] = torch.ones(32)
        sd[f"{pre}.ln_1.bias"] = torch.zeros(32)
        sd[f"{pre}.ln_2.weight"] = torch.ones(32)
        sd[f"{pre}.ln_2.bias"] = torch.zeros(32)
        sd[f"{pre}.attn.in_proj_weight"] = torch.zeros(96, 32)
        sd[f"{pre}.attn.in_proj_bias"] = torch.zeros(96)
        sd[f"{pre}.attn.out_proj.weight"] = torch.zeros(32, 32)
        sd[f"{pre}.attn.out_proj.bias"] = torch.zeros(32)
        sd[f"{pre}.mlp.c_fc.weight"] = torch.zeros(128, 32)
        sd[f"{pre}.mlp.c_fc.bias"] = torch.zeros(128)
        sd[f"{pre}.mlp.c_proj.weight"] = torch.zeros(32, 128)
        sd[f"{pre}.mlp.c_proj.bias"] = torch.zeros(32)
    return sd


def test_convert_and_forward_matches_oracle(oracle, rng):
    sd = oracle_state_dict(oracle)
    cfg = infer_config_from_state_dict(sd)
    assert isinstance(cfg.vision, ResNetVisionConfig)
    assert cfg.vision.layers == (1, 2, 1, 1)
    assert cfg.vision.width == 16
    assert cfg.vision.image_size == 64
    params = convert_clip_state_dict(sd)

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    want = oracle(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(
        encode_image_resnet(params["visual"], cfg.vision, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_resnet_arch_table():
    from eventclip_tpu.models.clip.config import clip_arch_config

    rn50 = clip_arch_config("RN50")
    assert rn50.vision.layers == (3, 4, 6, 3)
    assert rn50.vision.embed_dim == 2048
    assert rn50.vision.output_dim == 1024
    assert rn50.text.width == 512
    x64 = clip_arch_config("RN50x64")
    assert x64.vision.image_size == 448
    assert x64.vision.heads == 64


def test_random_init_forward(rng):
    cfg = ResNetVisionConfig(image_size=32, layers=(1, 1, 1, 1), width=8,
                             heads=4, output_dim=32)
    visual = init_resnet_visual(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))
    out = encode_image_resnet(visual, cfg, x)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()
