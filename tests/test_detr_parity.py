"""DETR transformer layer parity vs torch.nn.TransformerEncoderLayer /
DecoderLayer equivalents (post-norm, reference: src/models/transformer.py:
149-162, 212-233). The reference vendors torch's MultiheadAttention, so
torch modules ARE the oracle here."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gwdepth_tpu.models.detr import EncoderLayer, DecoderLayer

RNG = np.random.default_rng(41)


def _mha_params(tm):
    return {
        "in_proj_weight": tm.in_proj_weight.detach().numpy(),
        "in_proj_bias": tm.in_proj_bias.detach().numpy(),
        "out_proj": {"kernel": tm.out_proj.weight.detach().numpy().T,
                     "bias": tm.out_proj.bias.detach().numpy()},
    }


def _lin(tl):
    return {"kernel": tl.weight.detach().numpy().T,
            "bias": tl.bias.detach().numpy()}


def _ln(tn):
    return {"scale": tn.weight.detach().numpy(),
            "bias": tn.bias.detach().numpy()}


class TorchPostNormEncoderLayer(torch.nn.Module):
    """Reference encoder layer (transformer.py:128-162): q=k=src+pos,
    post-norm residuals."""

    def __init__(self, C, nH, FF):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(C, nH, batch_first=True)
        self.linear1 = torch.nn.Linear(C, FF)
        self.linear2 = torch.nn.Linear(FF, C)
        self.norm1 = torch.nn.LayerNorm(C)
        self.norm2 = torch.nn.LayerNorm(C)

    def forward(self, src, pos, key_valid):
        qk = src + pos
        attn, _ = self.self_attn(qk, qk, src, key_padding_mask=~key_valid,
                                 need_weights=False)
        src = self.norm1(src + attn)
        ff = self.linear2(torch.relu(self.linear1(src)))
        return self.norm2(src + ff)


def test_encoder_layer_matches_torch():
    B, N, C, nH, FF = 2, 11, 32, 4, 48
    tl = TorchPostNormEncoderLayer(C, nH, FF)
    params = {
        "self_attn": _mha_params(tl.self_attn),
        "linear1": _lin(tl.linear1), "linear2": _lin(tl.linear2),
        "norm1": _ln(tl.norm1), "norm2": _ln(tl.norm2),
    }
    src = RNG.normal(size=(B, N, C)).astype(np.float32)
    pos = RNG.normal(size=(B, N, C)).astype(np.float32)
    valid = np.ones((B, N), bool)
    valid[1, -3:] = False
    layer = EncoderLayer(C, nH, FF, 0.0)
    got = layer.apply({"params": params}, jnp.asarray(src), jnp.asarray(pos),
                      jnp.asarray(valid))
    with torch.no_grad():
        want = tl(torch.from_numpy(src), torch.from_numpy(pos),
                  torch.from_numpy(valid))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-5)


class TorchPostNormDecoderLayer(torch.nn.Module):
    """Reference decoder layer (transformer.py:212-233)."""

    def __init__(self, C, nH, FF):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(C, nH, batch_first=True)
        self.multihead_attn = torch.nn.MultiheadAttention(C, nH,
                                                          batch_first=True)
        self.linear1 = torch.nn.Linear(C, FF)
        self.linear2 = torch.nn.Linear(FF, C)
        self.norm1 = torch.nn.LayerNorm(C)
        self.norm2 = torch.nn.LayerNorm(C)
        self.norm3 = torch.nn.LayerNorm(C)

    def forward(self, tgt, memory, pos, query_pos, key_valid):
        qk = tgt + query_pos
        a, _ = self.self_attn(qk, qk, tgt, need_weights=False)
        tgt = self.norm1(tgt + a)
        a, _ = self.multihead_attn(tgt + query_pos, memory + pos, memory,
                                   key_padding_mask=~key_valid,
                                   need_weights=False)
        tgt = self.norm2(tgt + a)
        ff = self.linear2(torch.relu(self.linear1(tgt)))
        return self.norm3(tgt + ff)


def test_decoder_layer_matches_torch():
    B, N, Q, C, nH, FF = 2, 9, 5, 32, 4, 48
    tl = TorchPostNormDecoderLayer(C, nH, FF)
    params = {
        "self_attn": _mha_params(tl.self_attn),
        "multihead_attn": _mha_params(tl.multihead_attn),
        "linear1": _lin(tl.linear1), "linear2": _lin(tl.linear2),
        "norm1": _ln(tl.norm1), "norm2": _ln(tl.norm2), "norm3": _ln(tl.norm3),
    }
    tgt = RNG.normal(size=(B, Q, C)).astype(np.float32)
    mem = RNG.normal(size=(B, N, C)).astype(np.float32)
    pos = RNG.normal(size=(B, N, C)).astype(np.float32)
    qpos = RNG.normal(size=(B, Q, C)).astype(np.float32)
    valid = np.ones((B, N), bool)
    valid[0, -2:] = False
    layer = DecoderLayer(C, nH, FF, 0.0)
    got = layer.apply({"params": params}, jnp.asarray(tgt), jnp.asarray(mem),
                      jnp.asarray(pos), jnp.asarray(qpos), jnp.asarray(valid))
    with torch.no_grad():
        want = tl(torch.from_numpy(tgt), torch.from_numpy(mem),
                  torch.from_numpy(pos), torch.from_numpy(qpos),
                  torch.from_numpy(valid))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-5)
