"""Faithful torch stand-in for ``x_transformers.Encoder`` (not installed in
this image), implementing exactly the configuration the reference
instantiates (``/root/reference/duett/duett.py:95-105``):

    Encoder(dim, depth=1, heads=2, pre_norm=True, use_scalenorm=True,
            attn_dim_head=d_embedding//heads, ff_glu=False,
            ff_mult=d_feedforward/dim, attn_dropout=p, ff_dropout=p)

Semantics implemented (the contract this repo's flax
``models/layers.py::TransformerEncoder`` was built to, and which
``tests/test_ref_encoder_parity.py`` pins against it):

- pre-norm residual blocks: x + attn(norm(x)); x + ff(norm(x)); final norm.
- ScaleNorm: g · x / max(‖x‖ · d^-1/2, eps), single learned scalar g, eps 1e-5.
- attention with decoupled head dim: inner = heads · attn_dim_head (24, far
  below the 600/840 token dim); q/k/v projections WITHOUT bias, out
  projection WITH bias; softmax in f32; scale dh^-1/2.
- feedforward: Linear(dim → int(dim·ff_mult)) → GELU(exact) → Dropout →
  Linear(→ dim) → Dropout. ff_glu unsupported (the reference passes False).

This makes the reference's full ``Model.encode``/``train_teacher`` runnable
under torch for loop-level parity testing without copying x_transformers.
"""
from __future__ import annotations

import torch
import torch.nn as nn


class ScaleNormT(nn.Module):
    def __init__(self, dim: int, eps: float = 1e-5):
        super().__init__()
        self.g = nn.Parameter(torch.ones(1))
        self.scale = dim ** -0.5
        self.eps = eps

    def forward(self, x):
        norm = x.float().norm(dim=-1, keepdim=True) * self.scale
        return x / norm.clamp(min=self.eps).to(x.dtype) * self.g


class _Attention(nn.Module):
    def __init__(self, dim: int, heads: int, dim_head: int, dropout: float):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(dim, inner, bias=False)
        self.to_v = nn.Linear(dim, inner, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=True)
        self.drop = nn.Dropout(dropout)

    def forward(self, x):
        B, N, _ = x.shape
        H, dh = self.heads, self.dim_head

        def split(t):
            return t.view(B, N, H, dh)

        q, k, v = split(self.to_q(x)), split(self.to_k(x)), split(self.to_v(x))
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) * dh ** -0.5
        w = torch.softmax(logits.float(), dim=-1).to(x.dtype)
        w = self.drop(w)
        out = torch.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, N, H * dh)
        return self.to_out(out)


class _FeedForward(nn.Module):
    def __init__(self, dim: int, ff_mult: float, dropout: float):
        super().__init__()
        inner = int(dim * ff_mult)
        self.net = nn.Sequential(
            nn.Linear(dim, inner), nn.GELU(), nn.Dropout(dropout),
            nn.Linear(inner, dim), nn.Dropout(dropout))

    def forward(self, x):
        return self.net(x)


class _Layer(nn.Module):
    def __init__(self, dim, heads, dim_head, ff_mult, attn_dropout,
                 ff_dropout):
        super().__init__()
        self.norm_attn = ScaleNormT(dim)
        self.attn = _Attention(dim, heads, dim_head, attn_dropout)
        self.norm_ff = ScaleNormT(dim)
        self.ff = _FeedForward(dim, ff_mult, ff_dropout)

    def forward(self, x):
        x = x + self.attn(self.norm_attn(x))
        x = x + self.ff(self.norm_ff(x))
        return x


class FaithfulEncoder(nn.Module):
    """Drop-in for ``x_transformers.Encoder(**kwargs)`` under the reference's
    exact configuration. Unsupported x_transformers options are rejected
    rather than silently ignored."""

    def __init__(self, dim: int, depth: int = 1, heads: int = 2,
                 pre_norm: bool = True, use_scalenorm: bool = True,
                 attn_dim_head: int = 64, ff_glu: bool = False,
                 ff_mult: float = 4.0, attn_dropout: float = 0.0,
                 ff_dropout: float = 0.0, **kwargs):
        super().__init__()
        if not pre_norm or not use_scalenorm or ff_glu:
            raise NotImplementedError(
                "FaithfulEncoder implements the reference's config only: "
                "pre_norm=True, use_scalenorm=True, ff_glu=False "
                f"(got pre_norm={pre_norm}, use_scalenorm={use_scalenorm}, "
                f"ff_glu={ff_glu})")
        if kwargs:
            raise NotImplementedError(f"unsupported Encoder kwargs: {kwargs}")
        self.layers = nn.ModuleList([
            _Layer(dim, heads, attn_dim_head, ff_mult, attn_dropout,
                   ff_dropout) for _ in range(depth)])
        self.final_norm = ScaleNormT(dim)

    def forward(self, x, **kwargs):
        for layer in self.layers:
            x = layer(x)
        return self.final_norm(x)


# =============================================================================
# torch → flax transplant
# =============================================================================
def encoder_params_from(enc: FaithfulEncoder) -> dict:
    """FaithfulEncoder → flax ``TransformerEncoder`` params tree."""

    def t2n(t):
        return t.detach().cpu().numpy()

    def dense(lin):
        out = {"kernel": t2n(lin.weight).T}
        if lin.bias is not None:
            out["bias"] = t2n(lin.bias)
        return out

    params = {}
    for i, layer in enumerate(enc.layers):
        params[f"layer_{i}"] = {
            "norm_attn": {"g": t2n(layer.norm_attn.g)},
            "attn": {"q": {"kernel": t2n(layer.attn.to_q.weight).T},
                     "k": {"kernel": t2n(layer.attn.to_k.weight).T},
                     "v": {"kernel": t2n(layer.attn.to_v.weight).T},
                     "out": dense(layer.attn.to_out)},
            "norm_ff": {"g": t2n(layer.norm_ff.g)},
            "ff_in": dense(layer.ff.net[0]),
            "ff_out": dense(layer.ff.net[3]),
        }
    params["final_norm"] = {"g": t2n(enc.final_norm.g)}
    return params
