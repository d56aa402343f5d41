"""Torch oracle for CLIP-tower parity tests.

Implements the reference model equations (OpenAI CLIP ViT + text transformer,
QuickGELU, pre-norm blocks) directly with torch primitives, consuming the
*torch-format state dict* that our converter also consumes. This gives an
independent implementation to cross-check eventclip_tpu.models.clip against.
"""

import numpy as np
import torch
import torch.nn.functional as F


def _t(sd, k):
    v = sd[k]
    return v if isinstance(v, torch.Tensor) else torch.tensor(np.asarray(v))


def quick_gelu(x):
    return x * torch.sigmoid(1.702 * x)


def block(sd, prefix, x, heads, attn_mask=None):
    d = x.shape[-1]
    h = F.layer_norm(x, (d,), _t(sd, f"{prefix}.ln_1.weight"), _t(sd, f"{prefix}.ln_1.bias"))
    h, _ = F.multi_head_attention_forward(
        h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
        d, heads,
        _t(sd, f"{prefix}.attn.in_proj_weight"), _t(sd, f"{prefix}.attn.in_proj_bias"),
        None, None, False, 0.0,
        _t(sd, f"{prefix}.attn.out_proj.weight"), _t(sd, f"{prefix}.attn.out_proj.bias"),
        training=False, need_weights=False, attn_mask=attn_mask,
    )
    x = x + h.transpose(0, 1)
    h = F.layer_norm(x, (d,), _t(sd, f"{prefix}.ln_2.weight"), _t(sd, f"{prefix}.ln_2.bias"))
    h = F.linear(h, _t(sd, f"{prefix}.mlp.c_fc.weight"), _t(sd, f"{prefix}.mlp.c_fc.bias"))
    h = F.linear(quick_gelu(h), _t(sd, f"{prefix}.mlp.c_proj.weight"), _t(sd, f"{prefix}.mlp.c_proj.bias"))
    return x + h


def encode_image_torch(sd, images, heads, layers):
    x = torch.tensor(np.asarray(images), dtype=torch.float32)
    conv_w = _t(sd, "visual.conv1.weight")
    ps = conv_w.shape[-1]
    d = conv_w.shape[0]
    x = F.conv2d(x, conv_w, stride=ps)  # [B, d, g, g]
    x = x.reshape(x.shape[0], d, -1).permute(0, 2, 1)
    cls = _t(sd, "visual.class_embedding").expand(x.shape[0], 1, d)
    x = torch.cat([cls, x], dim=1)
    x = x + _t(sd, "visual.positional_embedding")
    x = F.layer_norm(x, (d,), _t(sd, "visual.ln_pre.weight"), _t(sd, "visual.ln_pre.bias"))
    for i in range(layers):
        x = block(sd, f"visual.transformer.resblocks.{i}", x, heads)
    x = F.layer_norm(x[:, 0], (d,), _t(sd, "visual.ln_post.weight"), _t(sd, "visual.ln_post.bias"))
    return (x @ _t(sd, "visual.proj")).numpy()


def encode_text_torch(sd, tokens, heads, layers):
    tokens = torch.tensor(np.asarray(tokens), dtype=torch.long)
    x = _t(sd, "token_embedding.weight")[tokens]
    T, d = tokens.shape[-1], x.shape[-1]
    x = x + _t(sd, "positional_embedding")[:T]
    mask = torch.full((T, T), float("-inf")).triu(1)
    for i in range(layers):
        x = block(sd, f"transformer.resblocks.{i}", x, heads, attn_mask=mask)
    x = F.layer_norm(x, (d,), _t(sd, "ln_final.weight"), _t(sd, "ln_final.bias"))
    eot = tokens.argmax(dim=-1)
    x = x[torch.arange(x.shape[0]), eot]
    return (x @ _t(sd, "text_projection")).numpy()


def random_clip_state_dict(rng, *, width=64, layers=2, patch=8, image=32,
                           t_width=32, t_layers=2, vocab=128, context=16,
                           embed=48):
    """A torch-format CLIP state dict with random weights (tiny shapes)."""
    g = torch.Generator().manual_seed(int(rng.integers(0, 2**31)))

    def r(*shape, s=0.05):
        return torch.randn(*shape, generator=g) * s

    sd = {
        "visual.conv1.weight": r(width, 3, patch, patch),
        "visual.class_embedding": r(width),
        "visual.positional_embedding": r((image // patch) ** 2 + 1, width),
        "visual.ln_pre.weight": 1 + 0.1 * r(width),
        "visual.ln_pre.bias": 0.1 * r(width),
        "visual.ln_post.weight": 1 + 0.1 * r(width),
        "visual.ln_post.bias": 0.1 * r(width),
        "visual.proj": r(width, embed),
        "token_embedding.weight": r(vocab, t_width),
        "positional_embedding": r(context, t_width),
        "ln_final.weight": 1 + 0.1 * r(t_width),
        "ln_final.bias": 0.1 * r(t_width),
        "text_projection": r(t_width, embed),
        "logit_scale": torch.tensor(np.log(1 / 0.07), dtype=torch.float32),
    }

    def add_blocks(prefix, L, d):
        for i in range(L):
            sd.update({
                f"{prefix}.{i}.ln_1.weight": 1 + 0.1 * r(d),
                f"{prefix}.{i}.ln_1.bias": 0.1 * r(d),
                f"{prefix}.{i}.ln_2.weight": 1 + 0.1 * r(d),
                f"{prefix}.{i}.ln_2.bias": 0.1 * r(d),
                f"{prefix}.{i}.attn.in_proj_weight": r(3 * d, d),
                f"{prefix}.{i}.attn.in_proj_bias": 0.1 * r(3 * d),
                f"{prefix}.{i}.attn.out_proj.weight": r(d, d),
                f"{prefix}.{i}.attn.out_proj.bias": 0.1 * r(d),
                f"{prefix}.{i}.mlp.c_fc.weight": r(4 * d, d),
                f"{prefix}.{i}.mlp.c_fc.bias": 0.1 * r(4 * d),
                f"{prefix}.{i}.mlp.c_proj.weight": r(d, 4 * d),
                f"{prefix}.{i}.mlp.c_proj.bias": 0.1 * r(d),
            })

    add_blocks("visual.transformer.resblocks", layers, width)
    add_blocks("transformer.resblocks", t_layers, t_width)
    return sd


# ---------------------------------------------------------------------------
# RandAugment oracles (torchvision is not installed; these replicate its
# documented uint8 semantics with pure torch / numpy)
# ---------------------------------------------------------------------------
import numpy as _np


def _blend_u8(a, b, factor):
    out = b + factor * (a.astype(_np.float32) - b)
    return _np.clip(out, 0, 255).astype(_np.uint8)  # trunc via uint8 cast


def _gray_u8(img):
    l = (0.2989 * img[0] + 0.587 * img[1] + 0.114 * img[2])
    return l.astype(_np.uint8)[None].astype(_np.float32)


def brightness_oracle(img, mag):
    return _blend_u8(img, _np.zeros_like(img, _np.float32), 1.0 + mag)


def color_oracle(img, mag):
    return _blend_u8(img, _gray_u8(img), 1.0 + mag)


def contrast_oracle(img, mag):
    # PIL ImageEnhance.Contrast: degenerate = gray mean rounded HALF-UP
    # (int(mean + 0.5)); the reference augments PIL images
    mean = _np.floor(_gray_u8(img).mean() + 0.5)
    return _blend_u8(img, _np.full(img.shape, mean, _np.float32), 1.0 + mag)


def sharpness_oracle(img, mag):
    import torch.nn.functional as TF
    x = torch.from_numpy(img.astype(_np.float32))[None]
    k = torch.tensor([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    k = k.expand(3, 1, 3, 3)
    blurred = TF.conv2d(TF.pad(x, (1, 1, 1, 1), mode="constant"), k, groups=3)[0]
    blurred = blurred.round().clamp(0, 255).numpy()
    result = img.astype(_np.float32).copy()
    result[:, 1:-1, 1:-1] = blurred[:, 1:-1, 1:-1]
    return _blend_u8(img, result, 1.0 + mag)


def autocontrast_oracle(img):
    out = img.astype(_np.float32).copy()
    for c in range(img.shape[0]):
        lo, hi = img[c].min(), img[c].max()
        if hi > lo:
            out[c] = ((img[c] - float(lo)) * (255.0 / (hi - lo)))
    return out.astype(_np.uint8)


def equalize_oracle(img):
    out = img.copy()
    for c in range(img.shape[0]):
        hist = _np.bincount(img[c].ravel(), minlength=256)
        nonzero = hist[hist != 0]
        step = (int(nonzero.sum()) - int(nonzero[-1])) // 255
        if step == 0:
            continue
        lut = (_np.cumsum(hist) + step // 2) // step
        lut = _np.clip(_np.concatenate([[0], lut[:-1]]), 0, 255)
        out[c] = lut[img[c]].astype(_np.uint8)
    return out


def affine_bicubic_oracle(img, matrix, fill=255.0):
    """Inverse-affine warp via torch grid_sample (bicubic, zeros padding,
    warped-mask fill blending) — the exact machinery torchvision F.affine
    uses for tensors."""
    import torch.nn.functional as TF

    C, H, W = img.shape
    m0, m1, m2, m3, m4, m5 = [float(v) for v in matrix]
    ys, xs = _np.meshgrid(_np.arange(H), _np.arange(W), indexing="ij")
    ox = xs + 0.5 - W / 2.0
    oy = ys + 0.5 - H / 2.0
    sx = m0 * ox + m1 * oy + m2 + W / 2.0 - 0.5
    sy = m3 * ox + m4 * oy + m5 + H / 2.0 - 0.5
    # normalized grid for align_corners=False
    gx = (2.0 * sx + 1.0) / W - 1.0
    gy = (2.0 * sy + 1.0) / H - 1.0
    grid = torch.from_numpy(
        _np.stack([gx, gy], axis=-1).astype(_np.float32)
    )[None]
    x = torch.from_numpy(img.astype(_np.float32))[None]
    ones = torch.ones(1, 1, H, W)
    warped = TF.grid_sample(x, grid, mode="bicubic", padding_mode="zeros",
                            align_corners=False)[0]
    mask = TF.grid_sample(ones, grid, mode="bicubic", padding_mode="zeros",
                          align_corners=False)[0].clamp(0, 1)
    out = warped * mask + fill * (1.0 - mask)
    return out.round().clamp(0, 255).numpy().astype(_np.uint8)
