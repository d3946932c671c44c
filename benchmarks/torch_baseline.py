"""Faithful PyTorch reimplementation of the reference teacher's compute, used
only to anchor ``vs_baseline`` (the reference repo publishes no throughput —
BASELINE.md: "step 1 ... measure the reference recipe itself (or a faithful
reimplementation)"). Written from our own design docs, matching the
reference's FLOP structure: frozen ViT-B/14 @518 forward, DuETT dual-axis
encode, perceiver fusion, 3-branch masked BCE, backward on trainable parts.
"""
from __future__ import annotations

import time

import torch
import torch.nn as nn


class TorchDualAxis(nn.Module):
    def __init__(self, V=34, T=24, d=24, d_ff=512, n_layers=2):
        super().__init__()
        self.V, self.T, self.d = V, T, d
        self.embed1 = nn.Parameter(torch.randn(V, 2, 64) * 0.05)
        self.embed2 = nn.Parameter(torch.randn(V, 64, d) * 0.05)
        et, tt = d * (T + 1), d * (V + 1)
        self.event_attn = nn.ModuleList(
            [nn.MultiheadAttention(et, 2, batch_first=True)
             for _ in range(n_layers)])
        self.event_ff = nn.ModuleList(
            [nn.Sequential(nn.Linear(et, d_ff), nn.GELU(),
                           nn.Linear(d_ff, et)) for _ in range(n_layers)])
        self.time_attn = nn.ModuleList(
            [nn.MultiheadAttention(tt, 2, batch_first=True)
             for _ in range(n_layers)])
        self.time_ff = nn.ModuleList(
            [nn.Sequential(nn.Linear(tt, d_ff), nn.GELU(),
                           nn.Linear(d_ff, tt)) for _ in range(n_layers)])
        self.tab = nn.Sequential(nn.Linear(18, 128), nn.ReLU(),
                                 nn.Linear(128, d))

    def forward(self, x_ts, x_static):
        B = x_ts.shape[0]
        V, T, d = self.V, self.T, self.d
        cell = torch.stack([x_ts[..., :V], x_ts[..., V:2 * V]], dim=-1)
        h = torch.einsum("btvc,vcd->btvd", cell, self.embed1).relu()
        h = torch.einsum("btvd,vdo->btvo", h, self.embed2)
        static = self.tab(x_static)[:, None, None, :].expand(B, T, 1, d)
        psi = torch.cat([h, static], dim=2)
        psi = torch.cat([psi, psi[:, :1]], dim=1)           # REP row
        for ea, ef, ta, tf in zip(self.event_attn, self.event_ff,
                                  self.time_attn, self.time_ff):
            ev = psi.transpose(1, 2).flatten(2)
            ev = ev + ea(ev, ev, ev, need_weights=False)[0]
            ev = ev + ef(ev)
            psi = ev.view(B, V + 1, T + 1, d).transpose(1, 2)
            tt = psi.flatten(2)
            tt = tt + ta(tt, tt, tt, need_weights=False)[0]
            tt = tt + tf(tt)
            psi = tt.view(B, T + 1, V + 1, d)
        return psi.flatten(2)


class TorchViT(nn.Module):
    def __init__(self, img=518, patch=14, d=768, layers=12, heads=12):
        super().__init__()
        self.proj = nn.Conv2d(3, d, patch, patch)
        n = (img // patch) ** 2
        self.pos = nn.Parameter(torch.randn(1, n + 1, d) * 0.02)
        self.cls = nn.Parameter(torch.zeros(1, 1, d))
        self.blocks = nn.ModuleList()
        for _ in range(layers):
            self.blocks.append(nn.ModuleDict({
                "n1": nn.LayerNorm(d), "n2": nn.LayerNorm(d),
                "attn": nn.MultiheadAttention(d, heads, batch_first=True),
                "mlp": nn.Sequential(nn.Linear(d, 4 * d), nn.GELU(),
                                     nn.Linear(4 * d, d)),
            }))
        self.norm = nn.LayerNorm(d)

    def forward(self, pixels):
        x = self.proj(pixels).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls.expand(x.shape[0], -1, -1), x], dim=1)
        x = x + self.pos
        for b in self.blocks:
            h = b["n1"](x)
            x = x + b["attn"](h, h, h, need_weights=False)[0]
            x = x + b["mlp"](b["n2"](x))
        x = self.norm(x)
        return x[:, 0], x[:, 1:]


class TorchTeacher(nn.Module):
    def __init__(self, V=34, T=24, K=7, d_latent=256):
        super().__init__()
        self.duett = TorchDualAxis(V, T)
        self.vit = TorchViT()
        for p in self.vit.parameters():
            p.requires_grad = False
        self.img_proj = nn.Linear(768, d_latent)
        self.queries = nn.Parameter(torch.randn(K, d_latent) * 0.02)
        self.ts_proj = nn.Linear(24 * (V + 1), d_latent)
        self.cross = nn.ModuleList(
            [nn.MultiheadAttention(d_latent, 4, batch_first=True)
             for _ in range(4)])
        self.heads = nn.ModuleList(
            [nn.Sequential(nn.Linear(d_latent, 64), nn.GELU(),
                           nn.Linear(64, 1)) for _ in range(3)])
        self.beta = nn.Parameter(torch.ones(K))

    def forward(self, x_ts, x_static, pixels):
        ts = self.duett(x_ts, x_static)
        with torch.no_grad():
            _, patches = self.vit(pixels)
        pk = self.img_proj(patches)
        B = x_ts.shape[0]
        q = self.queries[None].expand(B, -1, -1)
        I = q + self.cross[0](q, pk, pk, need_weights=False)[0]
        I = I + self.cross[1](I, I, I, need_weights=False)[0]
        tk = self.ts_proj(ts[:, :-1])
        Tq = q + self.cross[2](q, tk, tk, need_weights=False)[0]
        Tq = Tq + self.cross[3](Tq, Tq, Tq, need_weights=False)[0]
        img_l = self.heads[0](I).squeeze(-1)
        ts_l = self.heads[1](Tq).squeeze(-1)
        fus_l = img_l.detach() + self.beta * self.heads[2](Tq).squeeze(-1)
        return img_l, ts_l, fus_l


def measure_torch_baseline(batch_size: int = 4, n_steps: int = 2,
                           V: int = 34, T: int = 24, K: int = 7) -> float:
    """samples/sec for the reference-equivalent train step on host CPU."""
    torch.manual_seed(0)
    model = TorchTeacher(V, T, K)
    opt = torch.optim.AdamW([p for p in model.parameters()
                             if p.requires_grad], lr=8e-5)
    x_ts = torch.randn(batch_size, T, 2 * V)
    x_static = torch.randn(batch_size, 18)
    pixels = torch.randn(batch_size, 3, 518, 518)
    y = torch.randint(0, 2, (batch_size, K)).float()
    bce = nn.BCEWithLogitsLoss()

    def step():
        opt.zero_grad()
        img_l, ts_l, fus_l = model(x_ts, x_static, pixels)
        loss = 0.5 * bce(img_l, y) + 0.5 * bce(ts_l, y) + bce(fus_l, y)
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.time()
    for _ in range(n_steps):
        step()
    dt = time.time() - t0
    return batch_size * n_steps / dt
