"""TransformerAdapter parity vs torch.nn.TransformerEncoder."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from eventclip_tpu.models.adapter import (
    AdapterConfig,
    apply_adapter,
    init_adapter_params,
)


def torch_adapter(params, cfg, feats, valid):
    """Reference adapter (models/adapter.py:53-109) built from torch modules,
    loaded with our parameter values."""
    enc_layer = torch.nn.TransformerEncoderLayer(
        d_model=cfg.d_model,
        nhead=cfg.num_heads,
        dim_feedforward=cfg.ffn_dim,
        norm_first=True,
        batch_first=True,
    )
    encoder = torch.nn.TransformerEncoder(enc_layer, num_layers=cfg.num_layers)
    in_proj = torch.nn.Linear(cfg.in_dim, cfg.d_model)
    out_proj = torch.nn.Linear(cfg.d_model, cfg.in_dim)

    def t(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        in_proj.weight.copy_(t(params["in_proj"]["w"]))
        in_proj.bias.copy_(t(params["in_proj"]["b"]))
        out_proj.weight.copy_(t(params["out_proj"]["w"]))
        out_proj.bias.copy_(t(params["out_proj"]["b"]))
        b = params["blocks"]
        for i, layer in enumerate(encoder.layers):
            layer.self_attn.in_proj_weight.copy_(t(b["attn"]["wqkv"][i]))
            layer.self_attn.in_proj_bias.copy_(t(b["attn"]["bqkv"][i]))
            layer.self_attn.out_proj.weight.copy_(t(b["attn"]["wo"][i]))
            layer.self_attn.out_proj.bias.copy_(t(b["attn"]["bo"][i]))
            layer.linear1.weight.copy_(t(b["mlp"]["w1"][i]))
            layer.linear1.bias.copy_(t(b["mlp"]["b1"][i]))
            layer.linear2.weight.copy_(t(b["mlp"]["w2"][i]))
            layer.linear2.bias.copy_(t(b["mlp"]["b2"][i]))
            layer.norm1.weight.copy_(t(b["ln_1"]["scale"][i]))
            layer.norm1.bias.copy_(t(b["ln_1"]["bias"][i]))
            layer.norm2.weight.copy_(t(b["ln_2"]["scale"][i]))
            layer.norm2.bias.copy_(t(b["ln_2"]["bias"][i]))
    encoder.eval()
    with torch.no_grad():
        x = in_proj(torch.tensor(np.asarray(feats)))
        x = encoder(x, src_key_padding_mask=~torch.tensor(np.asarray(valid)))
        x = out_proj(x)
    new = x.numpy()
    return np.asarray(feats) * cfg.residual + new * (1.0 - cfg.residual)


def test_transformer_adapter_matches_torch(rng):
    cfg = AdapterConfig(
        adapter_type="trans", in_dim=24, d_model=16, num_heads=2,
        ffn_dim=32, num_layers=2, residual=0.8,
    )
    params = init_adapter_params(jax.random.PRNGKey(0), cfg)
    feats = rng.normal(size=(3, 5, 24)).astype(np.float32)
    valid = np.ones((3, 5), dtype=bool)
    valid[0, 3:] = False
    valid[2, 1:] = False
    got = np.asarray(
        apply_adapter(params, cfg, jnp.asarray(feats), jnp.asarray(valid), train=False)
    )
    want = torch_adapter(params, cfg, feats, valid)
    # padded positions may differ (we zero NaN rows); compare valid only
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=1e-5)


def test_identity_adapter(rng):
    cfg = AdapterConfig(adapter_type="identity")
    feats = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    out = apply_adapter(None, cfg, feats, jnp.ones((2, 4), bool))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))


def test_residual_value_mapping():
    assert AdapterConfig.residual_value(True) == 0.5
    assert AdapterConfig.residual_value(False) == 0.0
    assert AdapterConfig.residual_value(0.8) == 0.8


def test_dropout_only_in_train(rng):
    cfg = AdapterConfig(adapter_type="trans", in_dim=8, d_model=8, num_heads=2,
                        ffn_dim=16, num_layers=1, residual=0.0, dropout=0.5)
    params = init_adapter_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(rng.normal(size=(2, 3, 8)).astype(np.float32))
    valid = jnp.ones((2, 3), bool)
    e1 = apply_adapter(params, cfg, feats, valid, train=False)
    e2 = apply_adapter(params, cfg, feats, valid, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = apply_adapter(params, cfg, feats, valid, train=True, rng=jax.random.PRNGKey(1))
    t2 = apply_adapter(params, cfg, feats, valid, train=True, rng=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 1e-6
