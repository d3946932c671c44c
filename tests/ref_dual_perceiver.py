"""Faithful torch transcriptions of the reference's COMMENTED perceivers.

Three of the reference's four teacher perceiver classes are commented out in
its checked-in tree (``/root/reference/models/main_architecture_duett.py``:
TemporalPerceiver :176-290, PathologyPerceiver :293-399,
DualPathologyPerceiver :659-741), yet its trainers hard-require them:
``train_teacher`` dispatches all four by name behind ImportError guards
(``training_duett/trainer.py:38-44, 291-340``) and ``train_student`` only
accepts 'dual' teachers (``:778-800``). To run the reference's REAL training
loops end to end for loop-level parity, this module transcribes the
commented classes faithfully — the same move as
``ref_encoder.FaithfulEncoder`` for the missing x_transformers dependency
(endorsed in VERDICT r2 item 1). They live in tests/ only and are injected
via monkeypatch; the framework has its own TPU-native implementations in
``models/perceiver.py``, unit-parity-tested against these in
``test_reference_parity.py`` and loop-parity-tested through the reference's
own trainers in ``test_trainer_loop_parity.py`` /
``test_student_loop_parity.py``.
"""
from __future__ import annotations

import torch
from torch import nn

from ref_harness import load_reference

REF = load_reference()


def _mk_head(d_latent: int, head_hidden: int, head_dropout: float):
    return nn.Sequential(
        nn.Linear(d_latent, head_hidden), nn.GELU(), nn.Dropout(head_dropout),
        nn.Linear(head_hidden, 1),
    )


class FaithfulTemporalPerceiver(nn.Module):
    """Drop-in for the commented reference TemporalPerceiver, variant [3]
    (:281-290) — the image-first latent interleave the legacy TeacherModel
    path consumes with projected ``img_kv`` (:1179-1191). ``d_img`` is
    accepted (trainer dispatch passes it, :331-339) but unused: variant 3
    receives already-projected image kv."""

    def __init__(self, d_ts: int, d_img: int, d_latent: int = 256,
                 n_latents: int = 16, n_layers: int = 2, n_heads: int = 4,
                 dropout: float = 0.1):
        super().__init__()
        block = REF["models"]._PerceiverBlock
        self.d_latent = d_latent
        self.n_latents = n_latents
        self.latents = nn.Parameter(torch.randn(n_latents, d_latent) * 0.02)
        self.ts_proj = nn.Linear(d_ts, d_latent)
        self.ts_blocks = nn.ModuleList(
            [block(d_latent, n_heads, dropout) for _ in range(n_layers)])
        self.img_blocks = nn.ModuleList(
            [block(d_latent, n_heads, dropout) for _ in range(n_layers)])
        self.norm_out = nn.LayerNorm(d_latent)

    def forward(self, ts_tokens: torch.Tensor,
                img_kv: torch.Tensor) -> torch.Tensor:
        B = ts_tokens.size(0)
        ts_kv = self.ts_proj(ts_tokens)
        latents = self.latents.unsqueeze(0).expand(B, -1, -1)
        for ts_blk, img_blk in zip(self.ts_blocks, self.img_blocks):
            latents = img_blk(latents, img_kv)   # image first (variant 3)
            latents = ts_blk(latents, ts_kv)
        latents = self.norm_out(latents)
        return latents.mean(dim=1)


class FaithfulPathologyPerceiver(nn.Module):
    """Drop-in for the commented reference PathologyPerceiver (:293-399) —
    'single' mode: query bank → image cross-attn → self → TS cross-attn →
    self, per-label stage2/stage4 MLP heads, ts_ablation default 'full'.
    Required by train_teacher's live 'single' dispatch (trainer.py:318-327).
    """

    def __init__(self, n_pathologies: int, d_ts: int, d_latent: int = 256,
                 n_heads: int = 4, dropout: float = 0.1,
                 head_hidden: int = 64, head_dropout: float = 0.1):
        super().__init__()
        block = REF["models"]._PerceiverBlock
        self.n_pathologies = n_pathologies
        self.d_latent = d_latent
        self.queries = nn.Parameter(
            torch.randn(n_pathologies, d_latent) * 0.02)
        self.ts_proj = nn.Linear(d_ts, d_latent)
        self.img_cross = block(d_latent, n_heads, dropout)
        self.stage2_self = block(d_latent, n_heads, dropout)
        self.ts_cross = block(d_latent, n_heads, dropout)
        self.stage4_self = block(d_latent, n_heads, dropout)
        self.stage2_heads = nn.ModuleList(
            [_mk_head(d_latent, head_hidden, head_dropout)
             for _ in range(n_pathologies)])
        self.stage4_heads = nn.ModuleList(
            [_mk_head(d_latent, head_hidden, head_dropout)
             for _ in range(n_pathologies)])

    def forward(self, ts_tokens: torch.Tensor,
                img_patches_proj: torch.Tensor, return_attn: bool = False,
                ts_ablation: str = "full") -> dict:
        B = ts_tokens.size(0)
        queries = self.queries.unsqueeze(0).expand(B, -1, -1)
        if ts_ablation == "full":
            ts_selected = ts_tokens
        elif ts_ablation == "hourly_only":
            ts_selected = ts_tokens[:, :-1, :]
        elif ts_ablation == "rep_only":
            ts_selected = ts_tokens[:, -1:, :]
        else:
            raise ValueError(f"unknown ts_ablation={ts_ablation!r}")
        ts_kv = self.ts_proj(ts_selected)

        img_attn = ts_attn = None
        if return_attn:
            img_tokens, img_attn = self.img_cross(queries, img_patches_proj,
                                                  return_attn=True)
        else:
            img_tokens = self.img_cross(queries, img_patches_proj)
        stage2_tokens = self.stage2_self(img_tokens, img_tokens)
        if return_attn:
            mm_tokens, ts_attn = self.ts_cross(stage2_tokens, ts_kv,
                                               return_attn=True)
        else:
            mm_tokens = self.ts_cross(stage2_tokens, ts_kv)
        stage4_tokens = self.stage4_self(mm_tokens, mm_tokens)

        stage2_logits = torch.stack(
            [h(stage2_tokens[:, i]).squeeze(-1)
             for i, h in enumerate(self.stage2_heads)], dim=1)
        stage4_logits = torch.stack(
            [h(stage4_tokens[:, i]).squeeze(-1)
             for i, h in enumerate(self.stage4_heads)], dim=1)
        out = {
            "stage2_logits": stage2_logits,
            "stage4_logits": stage4_logits,
            "stage2_tokens": stage2_tokens,
            "stage4_tokens": stage4_tokens,
        }
        if return_attn:
            out["img_attn"] = img_attn
            out["ts_attn"] = ts_attn
        return out


class FaithfulDualPerceiver(nn.Module):
    """Drop-in for the commented reference DualPathologyPerceiver."""

    def __init__(self, n_pathologies: int, d_ts: int, d_latent: int = 256,
                 n_heads: int = 4, dropout: float = 0.1,
                 head_hidden: int = 64, head_dropout: float = 0.1):
        super().__init__()
        block = REF["models"]._PerceiverBlock
        self.n_pathologies = n_pathologies
        self.d_latent = d_latent
        self.temporal_queries = nn.Parameter(
            torch.randn(n_pathologies, d_latent) * 0.02)
        self.ts_proj = nn.Linear(d_ts, d_latent)
        self.ts_cross = block(d_latent, n_heads, dropout)
        self.ts_self = block(d_latent, n_heads, dropout)
        self.temporal_heads = nn.ModuleList(
            [_mk_head(d_latent, head_hidden, head_dropout)
             for _ in range(n_pathologies)])
        self.residual_heads = nn.ModuleList(
            [_mk_head(d_latent, head_hidden, head_dropout)
             for _ in range(n_pathologies)])

    def forward(self, ts_tokens: torch.Tensor, img_logits: torch.Tensor,
                return_attn: bool = False,
                ts_ablation: str = "hourly_only") -> dict:
        B = ts_tokens.size(0)
        if ts_ablation == "full":
            ts_selected = ts_tokens
        elif ts_ablation == "hourly_only":
            ts_selected = ts_tokens[:, :-1, :]
        elif ts_ablation == "rep_only":
            ts_selected = ts_tokens[:, -1:, :]
        else:
            raise ValueError(f"unknown ts_ablation={ts_ablation!r}")
        ts_kv = self.ts_proj(ts_selected)

        ts_q = self.temporal_queries.unsqueeze(0).expand(B, -1, -1)
        ts_attn = None
        if return_attn:
            T_tok, ts_attn = self.ts_cross(ts_q, ts_kv, return_attn=True)
        else:
            T_tok = self.ts_cross(ts_q, ts_kv)
        T_tok = self.ts_self(T_tok, T_tok)

        ts_logits = torch.stack(
            [h(T_tok[:, k]).squeeze(-1)
             for k, h in enumerate(self.temporal_heads)], dim=1)
        residuals = torch.stack(
            [h(T_tok[:, k]).squeeze(-1)
             for k, h in enumerate(self.residual_heads)], dim=1)
        fusion_logits = img_logits + residuals

        out = {
            "img_logits": img_logits,
            "ts_logits": ts_logits,
            "fusion_logits": fusion_logits,
            "ts_tokens": T_tok,
            "residuals": residuals,
        }
        if return_attn:
            out["ts_attn"] = ts_attn
        return out
