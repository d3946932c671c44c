"""Harness for importing the ACTUAL reference code (`/root/reference`) under
torch and transplanting its randomly-initialized weights into the flax models.

This replaces the round-1 "golden" tests (which compared against this repo's
own numpy/torch re-derivations) with parity against the reference source
itself, catching semantic drift the self-referential tests cannot.

What is genuinely the reference's code in these tests:
  - ``models/main_architecture_duett.py`` — PatchDualPathologyPerceiver,
    _PerceiverBlock, TeacherModel, StudentModel, LocalTrajectoryEncoder,
    DuettFeatureExtractor (everything except the x_transformers encoders).
  - ``loss/losses_duett.py`` — all losses (pure torch, imported unmodified).
  - ``training_duett/data_processing.py`` + ``duett/mimic_dataset.py`` —
    build_anchors / split_anchors / DuettAnchorDataset / build_stay_tensor /
    encode_static (pure pandas+torch).

What is stubbed (and why it is safe):
  - ``x_transformers`` is not installed in this image (zero egress). The stub
    ``Encoder`` below is an *identity* module. DuETT-encode parity therefore
    covers every part of ``encode()`` EXCEPT the transformer blocks (count-bin
    embedding, per-variable MLPs+BN, tab encoder, special/masked embeddings,
    cve time embedding, event/time positional adds, the axis-fold reshapes) —
    the transformer block internals themselves are covered separately by
    ``tests/test_duett_numpy_parity.py``'s independently-derived goldens.
  - ``lightning.pytorch.LightningModule`` → plain ``nn.Module`` + no-op
    logging hooks; ``torchmetrics`` → no-op metrics. Neither participates in
    any forward computation under test.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF_ROOT = "/root/reference"


# =============================================================================
# Stub modules
# =============================================================================
class _IdentityEncoder(nn.Module):
    """x_transformers.Encoder stand-in: records kwargs, forwards identity."""

    def __init__(self, **kwargs):
        super().__init__()
        self.kwargs = kwargs

    def forward(self, x, **kwargs):
        return x


class _NoopMetric:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return torch.tensor(0.0)

    def update(self, *a, **k):
        pass

    def compute(self):
        return torch.tensor(0.0)

    def reset(self):
        pass

    def to(self, *a, **k):
        return self


class _LightningModule(nn.Module):
    """Minimal LightningModule: nn.Module + the hooks the reference calls."""

    def __init__(self):
        super().__init__()

    @property
    def device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")

    def save_hyperparameters(self, *a, **k):
        pass

    def log(self, *a, **k):
        pass

    def log_dict(self, *a, **k):
        pass

    @classmethod
    def load_from_checkpoint(cls, ckpt_path, strict=True, **kwargs):
        """Lightning-semantics subset used by ``load_duett_backbone``
        (models/main_architecture_duett.py:106-117): construct with the
        caller's kwargs, load ``state_dict`` with the given strictness."""
        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        model = cls(**kwargs)
        model.load_state_dict(ckpt["state_dict"], strict=strict)
        return model


def install_stubs():
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        tm.AUROC = _NoopMetric
        tm.AveragePrecision = _NoopMetric
        sys.modules["torchmetrics"] = tm
    if "lightning" not in sys.modules:
        lightning = types.ModuleType("lightning")
        lpt = types.ModuleType("lightning.pytorch")
        lpt.LightningModule = _LightningModule
        lightning.pytorch = lpt
        sys.modules["lightning"] = lightning
        sys.modules["lightning.pytorch"] = lpt
    if "x_transformers" not in sys.modules:
        xt = types.ModuleType("x_transformers")
        xt.Encoder = _IdentityEncoder
        sys.modules["x_transformers"] = xt


_cache = {}


class use_encoder:
    """Context manager: swap the ``x_transformers.Encoder`` stub for another
    implementation (e.g. ``ref_encoder.FaithfulEncoder``) while constructing
    reference models. The reference binds ``x_transformers.Encoder`` late
    (module-attribute lookup at Model.__init__, duett/duett.py:95-105), so
    models built inside the context get the chosen encoder; models built
    outside keep the identity stub the module-parity tests rely on."""

    def __init__(self, impl):
        self.impl = impl

    def __enter__(self):
        install_stubs()
        xt = sys.modules["x_transformers"]
        self._prev = xt.Encoder
        xt.Encoder = self.impl
        return self

    def __exit__(self, *exc):
        sys.modules["x_transformers"].Encoder = self._prev
        return False


def load_reference():
    """Import the reference packages (with stubs) and return them."""
    if _cache:
        return _cache
    install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import models.main_architecture_duett as ref_models          # noqa: E501
    import loss.losses_duett as ref_losses
    import training_duett.data_processing as ref_data
    import duett.mimic_dataset as ref_mimic
    import duett.duett as ref_duett
    _cache.update(models=ref_models, losses=ref_losses, data=ref_data,
                  mimic=ref_mimic, duett=ref_duett)
    return _cache


# =============================================================================
# Weight randomization (make BN stats & all params non-trivial)
# =============================================================================
def randomize_module(mod: nn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for name, b in mod.named_buffers():
            if b.dtype.is_floating_point:
                if name.endswith("running_var"):
                    b.copy_(0.5 + torch.rand(b.shape, generator=g))
                elif name.endswith("running_mean"):
                    b.copy_(torch.randn(b.shape, generator=g) * 0.2)
    return mod


# =============================================================================
# torch → flax transplant helpers
# =============================================================================
def t2n(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy()


def dense_from(lin: nn.Linear) -> dict:
    out = {"kernel": t2n(lin.weight).T}
    if lin.bias is not None:
        out["bias"] = t2n(lin.bias)
    return out


def ln_from(ln: nn.LayerNorm) -> dict:
    return {"scale": t2n(ln.weight), "bias": t2n(ln.bias)}


def mha_from(attn: nn.MultiheadAttention) -> dict:
    """torch nn.MultiheadAttention → MultiHeadAttention({q,k,v,out}) params."""
    d = attn.embed_dim
    w = t2n(attn.in_proj_weight)           # [3d, d]
    b = t2n(attn.in_proj_bias)             # [3d]
    return {
        "q": {"kernel": w[:d].T, "bias": b[:d]},
        "k": {"kernel": w[d:2 * d].T, "bias": b[d:2 * d]},
        "v": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "out": {"kernel": t2n(attn.out_proj.weight).T,
                "bias": t2n(attn.out_proj.bias)},
    }


def perceiver_block_from(blk) -> dict:
    """reference _PerceiverBlock → flax PerceiverBlock params."""
    return {
        "norm_q": ln_from(blk.norm_q),
        "norm_kv": ln_from(blk.norm_kv),
        "attn": mha_from(blk.attn),
        "norm_ff": ln_from(blk.norm_ff),
        "ff_in": dense_from(blk.ff[0]),
        "ff_out": dense_from(blk.ff[3]),
    }


def head_from(seq: nn.Sequential) -> dict:
    """reference _mk_head Sequential(Linear, GELU, Dropout, Linear) → _Head."""
    out = {"in": dense_from(seq[0]), "out": dense_from(seq[3])}
    return out


def patch_dual_perceiver_params(ref) -> dict:
    """reference PatchDualPathologyPerceiver → flax params tree."""
    return {
        "shared_queries": t2n(ref.shared_queries),
        "image_label_bias": t2n(ref.image_label_bias),
        "temporal_label_bias": t2n(ref.temporal_label_bias),
        "beta": t2n(ref.beta),
        "ts_proj": dense_from(ref.ts_proj),
        "img_cross": perceiver_block_from(ref.img_cross),
        "img_self": perceiver_block_from(ref.img_self),
        "ts_cross": perceiver_block_from(ref.ts_cross),
        "ts_self": perceiver_block_from(ref.ts_self),
        "image_head": head_from(ref.image_head),
        "temporal_head": head_from(ref.temporal_head),
        "correction_head": {
            "norm": ln_from(ref.correction_head[0]),
            "head": {"in": dense_from(ref.correction_head[1]),
                     "out": dense_from(ref.correction_head[4])},
        },
    }


def stacked_heads_from(heads) -> dict:
    """torch ModuleList of K × Sequential(Linear, GELU, Dropout, Linear) →
    flax StackedLabelHeads params ([K,·,·] stacks)."""
    import numpy as np
    return {
        "w1": np.stack([t2n(h[0].weight).T for h in heads]),
        "b1": np.stack([t2n(h[0].bias) for h in heads]),
        "w2": np.stack([t2n(h[3].weight).T for h in heads]),
        "b2": np.stack([t2n(h[3].bias) for h in heads]),
    }


def dual_perceiver_params(ref) -> dict:
    """FaithfulDualPerceiver (the reference's commented 'dual' class,
    :659-741) → flax DualPathologyPerceiver params tree."""
    return {
        "shared_queries": t2n(ref.temporal_queries),
        "ts_proj": dense_from(ref.ts_proj),
        "ts_cross": perceiver_block_from(ref.ts_cross),
        "ts_self": perceiver_block_from(ref.ts_self),
        "temporal_heads": stacked_heads_from(ref.temporal_heads),
        "residual_heads": stacked_heads_from(ref.residual_heads),
    }


def pathology_perceiver_params(ref) -> dict:
    """FaithfulPathologyPerceiver (the reference's commented 'single' class,
    :293-399) → flax PathologyPerceiver params tree."""
    return {
        "pathology_queries": t2n(ref.queries),
        "ts_proj": dense_from(ref.ts_proj),
        "img_cross": perceiver_block_from(ref.img_cross),
        "img_self": perceiver_block_from(ref.stage2_self),
        "ts_cross": perceiver_block_from(ref.ts_cross),
        "ts_self": perceiver_block_from(ref.stage4_self),
        "stage2_heads": stacked_heads_from(ref.stage2_heads),
        "stage4_heads": stacked_heads_from(ref.stage4_heads),
    }


def temporal_perceiver_params(ref) -> dict:
    """FaithfulTemporalPerceiver (the reference's commented 'legacy'
    variant 3, :281-290) → flax TemporalPerceiver params tree."""
    out = {
        "latents": t2n(ref.latents),
        "ts_proj": dense_from(ref.ts_proj),
        "norm_out": ln_from(ref.norm_out),
    }
    for i, (tb, ib) in enumerate(zip(ref.ts_blocks, ref.img_blocks)):
        out[f"ts_block_{i}"] = perceiver_block_from(tb)
        out[f"img_block_{i}"] = perceiver_block_from(ib)
    return out


def bn_from(bn1d: nn.BatchNorm1d):
    """→ (params, stats) for the flax BatchNormLastDim inner BatchNorm_0."""
    params = {"scale": t2n(bn1d.weight), "bias": t2n(bn1d.bias)}
    stats = {"mean": t2n(bn1d.running_mean), "var": t2n(bn1d.running_var)}
    return params, stats


def simple_mlp_from(seq: nn.Sequential, n_hidden: int = 1):
    """reference simple_mlp(n_hidden=1, hidden_batch_norm=True) →
    flax SimpleMLP params/batch_stats: Linear ReLU Dropout BN Linear."""
    assert n_hidden == 1
    bn_p, bn_s = bn_from(seq[3].batch_norm)
    params = {"in": dense_from(seq[0]),
              "bn_out": {"BatchNorm_0": bn_p},
              "out": dense_from(seq[4])}
    stats = {"bn_out": {"BatchNorm_0": bn_s}}
    return params, stats


def cve_from(seq: nn.Sequential, batch_norm: bool = True):
    """reference cve Sequential(Linear, Tanh, [BN], Linear) → flax CVE."""
    if batch_norm:
        bn_p, bn_s = bn_from(seq[2].batch_norm)
        params = {"in": dense_from(seq[0]), "bn": {"BatchNorm_0": bn_p},
                  "out": dense_from(seq[3])}
        stats = {"bn": {"BatchNorm_0": bn_s}}
    else:
        params = {"in": dense_from(seq[0]), "out": dense_from(seq[2])}
        stats = {}
    return params, stats


def duett_encoder_params(ref_model, with_transformers: bool = False
                         ) -> tuple[dict, dict]:
    """reference DuettFeatureExtractor (duett.Model) → flax DuettEncoder
    (params, batch_stats). By default transformer params are NOT produced
    (identity-tx parity mode); ``with_transformers=True`` additionally
    transplants ``ref_encoder.FaithfulEncoder`` dual-axis encoders (the model
    must have been built under ``use_encoder(FaithfulEncoder)``)."""
    V = ref_model.d_time_series_num

    # per-variable MLPs: V × Sequential(Linear(2,64), ReLU, Drop, BN, Linear)
    w1 = np.stack([t2n(el[0].weight).T for el in ref_model.embedding_layers])
    b1 = np.stack([t2n(el[0].bias) for el in ref_model.embedding_layers])
    w2 = np.stack([t2n(el[4].weight).T for el in ref_model.embedding_layers])
    b2 = np.stack([t2n(el[4].bias) for el in ref_model.embedding_layers])
    bn_scale = np.stack([t2n(el[3].batch_norm.weight)
                         for el in ref_model.embedding_layers])
    bn_bias = np.stack([t2n(el[3].batch_norm.bias)
                        for el in ref_model.embedding_layers])
    bn_mean = np.stack([t2n(el[3].batch_norm.running_mean)
                        for el in ref_model.embedding_layers])
    bn_var = np.stack([t2n(el[3].batch_norm.running_var)
                       for el in ref_model.embedding_layers])

    tab_p, tab_s = simple_mlp_from(ref_model.tab_encoder)
    cve_p, cve_s = cve_from(ref_model.full_time_embedding, batch_norm=True)

    params = {
        "n_obs_embedding": {"embedding": t2n(ref_model.n_obs_embedding.weight)},
        "embedding_layers": {"w1": w1, "b1": b1, "w2": w2, "b2": b2,
                             "bn_scale": bn_scale, "bn_bias": bn_bias},
        "tab_encoder": tab_p,
        "special_embeddings": t2n(ref_model.special_embeddings.weight),
        "full_time_embedding": cve_p,
        "full_rep_embedding": t2n(ref_model.full_rep_embedding.weight)[:, 0],
        "full_event_embedding": t2n(ref_model.full_event_embedding.weight),
    }
    batch_stats = {
        "embedding_layers": {"mean": bn_mean, "var": bn_var},
        "tab_encoder": tab_s,
        "full_time_embedding": cve_s,
    }
    if with_transformers:
        from ref_encoder import FaithfulEncoder, encoder_params_from
        for i, (et, tt) in enumerate(zip(ref_model.event_transformers,
                                         ref_model.time_transformers)):
            assert isinstance(et, FaithfulEncoder), \
                "build the reference model under use_encoder(FaithfulEncoder)"
            params[f"event_transformer_{i}"] = encoder_params_from(et)
            params[f"time_transformer_{i}"] = encoder_params_from(tt)
    return params, batch_stats
