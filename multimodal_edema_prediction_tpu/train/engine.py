"""Jitted per-batch steps (the reference's ``training_duett/engine.py``).

Every step is one XLA program: device-side window gather → augmentation →
model fwd/bwd → optimizer update. Host work per step is handing over a small
index/label batch. Steps donate the train state (params/opt buffers update
in place in HBM).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DuettConfig, TrainConfig
from ..data.pipeline import gather_windows
from ..models.duett import feats_to_input, pretrain_prep_batch
from ..ops import losses as L
from ..ops.attention import scoped_vmem_compiler_options
from .state import TrainState


def _jit_opts(model) -> dict:
    """jit kwargs for steps that trace a ViT flash kernel.

    ``ViTConfig.flash_block_b > 1`` needs ~19 MiB of scoped VMEM — over
    XLA's default 16 MiB limit — so any step that traces it must be
    compiled with a raised ``xla_tpu_scoped_vmem_limit_kib``
    (ops/attention.py::scoped_vmem_compiler_options; measured +10%
    samples/s at the production shape, benchmarks/flash_step_probe.py)."""
    vit = getattr(getattr(model, "cfg", None), "vit", None)
    bb = getattr(vit, "flash_block_b", 1) if vit is not None else 1
    return {"compiler_options": scoped_vmem_compiler_options(bb)}


def _prep_inputs(grid, static, batch, n_timesteps, dtype, rng=None,
                 aug_noise=0.0, aug_mask=0.0, train=False):
    x_ts = gather_windows(grid, batch["stay_rows"], batch["slot_idx"],
                          n_timesteps)
    x_static = static[batch["stay_rows"]]
    x_in, x_static = feats_to_input(rng, x_ts, x_static, aug_noise, aug_mask,
                                    train=train)
    return x_in.astype(dtype), x_static.astype(dtype), \
        batch["bin_ends"].astype(dtype)


# =============================================================================
# Supervised TS-only (student-architecture) training
# =============================================================================
def make_supervised_ts_step(model, duett_cfg: DuettConfig,
                            n_timesteps: int, dtype=jnp.bfloat16,
                            pos_weight: Optional[float] = None,
                            jit: bool = True):
    pw = None if pos_weight is None else jnp.float32(pos_weight)

    def step(state: TrainState, grid, static, batch, rng):
        r_aug, r_drop = jax.random.split(rng)
        x_in, x_static, times = _prep_inputs(
            grid, static, batch, n_timesteps, dtype, r_aug,
            duett_cfg.aug_noise, duett_cfg.aug_mask, train=True)

        def loss_fn(params):
            logits, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_in, x_static, times, train=True,
                rngs={"dropout": r_drop}, mutable=["batch_stats"])
            loss = L.bce_with_logits(logits, batch["y"], pos_weight=pw)
            return loss, (mut, logits)

        (loss, (mut, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, mut["batch_stats"])
        return new_state, {"loss": loss,
                           "logits": logits.astype(jnp.float32)}

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,))


def make_supervised_ts_eval(model, n_timesteps: int, dtype=jnp.bfloat16):
    @jax.jit
    def step(params, batch_stats, grid, static, batch):
        x_in, x_static, times = _prep_inputs(
            grid, static, batch, n_timesteps, dtype)
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x_in, x_static, times, train=False)
        return logits.astype(jnp.float32)

    return step


# =============================================================================
# DuETT SSL pretraining step (duett/duett.py:329-358)
# =============================================================================
def make_ssl_step(model, duett_cfg: DuettConfig, n_timesteps: int,
                  dtype=jnp.bfloat16, jit: bool = True):
    def step(state: TrainState, grid, static, batch, rng):
        r_mask, r_drop = jax.random.split(rng)
        x_ts = gather_windows(grid, batch["stay_rows"], batch["slot_idx"],
                              n_timesteps)
        x_static = static[batch["stay_rows"]].astype(dtype)
        times = batch["bin_ends"].astype(dtype)
        pb = pretrain_prep_batch(
            r_mask, x_ts, duett_cfg.pretrain_masked_steps,
            duett_cfg.pretrain_dropout, duett_cfg.predict_events,
            mask_idx=batch.get("ssl_mask_idx"),
            event_var=batch.get("ssl_event_var"))
        pb = pb._replace(x_in=pb.x_in.astype(dtype))

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pb, x_static, times, train=True,
                rngs={"dropout": r_drop}, mutable=["batch_stats"])
            parts = L.ssl_pretrain_loss(
                out["y_hat_value"], out["y_hat_presence"],
                out["y_hat_events"], out["y_hat_events_presence"],
                pb.y_value, pb.y_presence_mask, pb.y_events, pb.y_events_mask,
                pretrain_value=duett_cfg.pretrain_value,
                pretrain_presence=duett_cfg.pretrain_presence,
                presence_weight=duett_cfg.pretrain_presence_weight,
                predict_events=duett_cfg.predict_events)
            return parts["total"], (mut, parts)

        (loss, (mut, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, mut["batch_stats"])
        return new_state, {k: v for k, v in parts.items()}

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,))


# =============================================================================
# Teacher (dual_patch / dual) — training_duett/engine.py:135-264
# =============================================================================
def default_image_source(batch):
    """Pixel batch from the host pipeline. Two layouts:

    - ``pixel_values``: decoded+normalized float32 (JPEG host path);
    - ``pixel_u8``: decode-once uint8 cache — ¼ the host→device bytes of
      f32; the [0,1]-scale + mean/std normalization fuses into the jitted
      step here (device work, effectively free next to the ViT).
    """
    if "pixel_u8" in batch:
        from ..models.vit import normalize_image
        return normalize_image(batch["pixel_u8"].astype(jnp.float32) / 255.0)
    return batch["pixel_values"]


def _cxr_inputs(batch, image_source, feature_source, dtype):
    """(pixels, cxr_feats) for the teacher forward: the encode-once tier
    (``feature_source``, data/features.py) replaces the frozen-ViT forward
    with a cached-token gather; otherwise pixels flow to the in-step ViT."""
    if feature_source is None:
        return image_source(batch).astype(dtype), None
    cls, patches = feature_source(batch)
    return None, (cls.astype(dtype), patches.astype(dtype))


def make_teacher_step(model, cfg: TrainConfig, duett_cfg: DuettConfig,
                      n_timesteps: int, label_weights,
                      pos_weight=None, dtype=jnp.bfloat16,
                      image_source: Callable = default_image_source,
                      lp_mode: bool = False, lp_beta_l2: float = 0.0,
                      lp_corr_l2: float = 0.0,
                      feature_source: Optional[Callable] = None,
                      jit: bool = True):
    """One fused teacher step: window gather + image fetch + fwd/bwd + update.

    ``lp_mode`` reproduces the correction-only linear-probing step
    (engine.py:196-264): the optimizer must already mask everything except
    correction_head+beta; this flag adds the L2 regularizers and turns
    dropout off everywhere (teacher.eval() semantics).

    ``feature_source`` (encode-once tier): batch → cached frozen-ViT
    (cls, patches); the step skips the ViT forward entirely.

    ``jit=False`` returns the raw (untraced) step for composition into a
    larger jitted program — see :func:`scan_steps`.
    """
    lw = jnp.asarray(label_weights, jnp.float32)
    pw = None if pos_weight is None else jnp.asarray(pos_weight, jnp.float32)

    def step(state: TrainState, grid, static, batch, rng):
        r_aug, r_drop = jax.random.split(rng)
        train_flag = not lp_mode
        x_in, x_static, times = _prep_inputs(
            grid, static, batch, n_timesteps, dtype, r_aug,
            duett_cfg.aug_noise, duett_cfg.aug_mask, train=train_flag)
        pixels, feats = _cxr_inputs(batch, image_source, feature_source,
                                    dtype)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_in, x_static, times, pixels, train=train_flag,
                rngs={"dropout": r_drop}, mutable=["batch_stats"],
                cxr_feats=feats)
            losses = L.dual_pathology_loss(
                out["img_logits"], out["ts_logits"], out["fusion_logits"],
                batch["y_multi"], batch["y_multi_mask"], lw, pw,
                cfg.alpha_img, cfg.alpha_ts, cfg.alpha_fus)
            total = losses["total"]
            if cfg.aux_residual_alpha > 0.0:
                aux = L.aux_residual_kl(out["img_logits"],
                                        out["scaled_correction"],
                                        batch["y_multi"],
                                        batch["y_multi_mask"])
                losses["aux_residual"] = aux
                total = total + cfg.aux_residual_alpha * aux
            if lp_mode:
                # expose the regularizer terms for telemetry
                # (trainer.py:506-517 logs reg_beta_l2/reg_corr_l2)
                beta = params["perceiver"]["beta"]
                reg_b = lp_beta_l2 * (beta ** 2).mean()
                reg_c = lp_corr_l2 * (out["scaled_correction"] ** 2).mean()
                losses["reg_beta_l2"] = reg_b
                losses["reg_corr_l2"] = reg_c
                total = total + reg_b + reg_c
            losses["total"] = total
            return total, (mut, losses, out)

        (_, (mut, losses, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, mut["batch_stats"])
        metrics = {k: v for k, v in losses.items()}
        metrics["main_logit"] = out["main_logit"].astype(jnp.float32)
        return new_state, metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,), **_jit_opts(model))


def scan_steps(raw_step, model=None):
    """Fuse K sequential train steps into ONE jitted XLA program.

    ``raw_step(state, grid, static, batch, rng) -> (state, metrics)`` is a
    step factory's un-jitted body (``jit=False``); the wrapper ``lax.scan``s
    it over a K-stacked batch pytree (leading axis K on every field — see
    ``mesh.shard_batch(..., stacked=True)``) and a (K,)-stacked key array.

    Why: at encode-once-tier step times (~tens of ms) the per-call host
    work — batch device_put + dispatch, each a round trip on remote/tunneled
    TPU backends — bounds throughput, not the device. One call per K steps
    amortizes it. Sequential semantics are preserved exactly (scan carries
    the state; the parity test asserts bit-identity with K single calls).
    The reference has no analogue (per-batch ``optimizer.step()`` under DDP,
    training_duett/trainer.py:406-470).

    Returned metrics: per-step scalars are SUMMED over K (the loops
    accumulate sums); the raw per-step values ride in ``out["per_step"]``
    for --log_every; non-scalar metrics (e.g. ``main_logit``) stay stacked
    with leading axis K.
    """
    opts = _jit_opts(model) if model is not None else {}

    @partial(jax.jit, donate_argnums=(0,), **opts)
    def multi(state: TrainState, grid, static, batches, rngs, *consts):
        def body(st, xs):
            b, r = xs
            st, m = raw_step(st, *consts, grid, static, b, r)
            return st, m
        state, ms = jax.lax.scan(body, state, (batches, rngs))
        out = {k: (v.sum(0) if v.ndim == 1 else v) for k, v in ms.items()}
        out["per_step"] = {k: v for k, v in ms.items() if v.ndim == 1}
        return state, out

    return multi


@partial(jax.jit, static_argnums=(1,))
def split_chain(key, k: int):
    """(new_key, (k,) stacked subkeys) by the loops' exact per-step chain
    ``key, sub = jax.random.split(key)`` — one device call instead of k.
    Accepts typed keys or raw uint32 key bits (multi-host form)."""
    def body(c, _):
        ks = jax.random.split(c)
        return ks[0], ks[1]
    return jax.lax.scan(body, key, None, length=k)


def make_teacher_pathology_step(model, cfg: TrainConfig,
                                duett_cfg: DuettConfig, n_timesteps: int,
                                label_weights, pos_weight=None,
                                dtype=jnp.bfloat16,
                                alpha_stage2: float = 1.0,
                                alpha_stage4: float = 0.5,
                                image_source: Callable = default_image_source,
                                feature_source: Optional[Callable] = None):
    """'single'-mode teacher step: stage2 + stage4 masked multi-label BCE
    (training_duett/engine.py:94-129)."""
    lw = jnp.asarray(label_weights, jnp.float32)
    pw = None if pos_weight is None else jnp.asarray(pos_weight, jnp.float32)

    @partial(jax.jit, donate_argnums=(0,), **_jit_opts(model))
    def step(state: TrainState, grid, static, batch, rng):
        r_aug, r_drop = jax.random.split(rng)
        x_in, x_static, times = _prep_inputs(
            grid, static, batch, n_timesteps, dtype, r_aug,
            duett_cfg.aug_noise, duett_cfg.aug_mask, train=True)
        pixels, feats = _cxr_inputs(batch, image_source, feature_source,
                                    dtype)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_in, x_static, times, pixels, train=True,
                rngs={"dropout": r_drop}, mutable=["batch_stats"],
                cxr_feats=feats)
            losses = L.pathology_multilabel_loss(
                out["stage2_logits"], out["stage4_logits"],
                batch["y_multi"], batch["y_multi_mask"], lw, pw,
                alpha_stage2, alpha_stage4)
            return losses["total"], (mut, losses, out)

        (_, (mut, losses, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, mut["batch_stats"])
        metrics = {k: v for k, v in losses.items()}
        metrics["main_logit"] = out["main_logit"].astype(jnp.float32)
        return new_state, metrics

    return step


def make_teacher_eval(model, n_timesteps: int, dtype=jnp.bfloat16,
                      image_source: Callable = default_image_source,
                      feature_source: Optional[Callable] = None):
    @partial(jax.jit, **_jit_opts(model))
    def step(params, batch_stats, grid, static, batch):
        x_in, x_static, times = _prep_inputs(
            grid, static, batch, n_timesteps, dtype)
        pixels, feats = _cxr_inputs(batch, image_source, feature_source,
                                    dtype)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x_in, x_static, times, pixels, train=False,
                          cxr_feats=feats)
        return {k: out[k].astype(jnp.float32)
                for k in ("main_logit", "img_logits", "ts_logits",
                          "fusion_logits", "scaled_correction")}

    return step


def make_teacher_legacy_step(model, cfg: TrainConfig, duett_cfg: DuettConfig,
                             n_timesteps: int, dtype=jnp.bfloat16,
                             aux_alpha: float = 0.0,
                             image_source: Callable = default_image_source):
    """'legacy'-mode teacher step: main BCE (+ aux CXR-head BCE)
    (training_duett/engine.py:42-73)."""
    @partial(jax.jit, donate_argnums=(0,), **_jit_opts(model))
    def step(state: TrainState, grid, static, batch, rng):
        r_aug, r_drop = jax.random.split(rng)
        x_in, x_static, times = _prep_inputs(
            grid, static, batch, n_timesteps, dtype, r_aug,
            duett_cfg.aug_noise, duett_cfg.aug_mask, train=True)
        pixels = image_source(batch).astype(dtype)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_in, x_static, times, pixels, train=True,
                rngs={"dropout": r_drop}, mutable=["batch_stats"])
            main_loss = L.bce_with_logits(out["main_logit"], batch["y"])
            aux_loss = L.bce_with_logits(out["aux_logit"], batch["y"]) \
                if aux_alpha > 0 else 0.0
            total = main_loss + aux_alpha * aux_loss
            return total, (mut, {"loss": total, "main_loss": main_loss,
                                 "aux_loss": aux_loss,
                                 "logits": out["main_logit"]})

        (_, (mut, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, mut["batch_stats"]), metrics

    return step


def make_teacher_pathology_eval(model, n_timesteps: int, dtype=jnp.bfloat16,
                                image_source: Callable = default_image_source,
                                feature_source: Optional[Callable] = None):
    """'single'-mode eval: stage2/stage4 logits."""
    @partial(jax.jit, **_jit_opts(model))
    def step(params, batch_stats, grid, static, batch):
        x_in, x_static, times = _prep_inputs(
            grid, static, batch, n_timesteps, dtype)
        pixels, feats = _cxr_inputs(batch, image_source, feature_source,
                                    dtype)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x_in, x_static, times, pixels, train=False,
                          cxr_feats=feats)
        return {k: out[k].astype(jnp.float32)
                for k in ("main_logit", "stage2_logits", "stage4_logits")}

    return step


def make_teacher_eval_from_windows(model, dtype=jnp.bfloat16,
                                   image_source: Callable = default_image_source,
                                   return_attn: bool = False,
                                   feature_source: Optional[Callable] = None):
    """Teacher eval on explicit [B,T,2V] windows (analysis counterfactuals
    transform the windows on host before calling). ``feature_source``
    (encode-once tier): counterfactuals perturb only the TS windows, so the
    frozen ViT's cached tokens serve every condition without recompute."""
    @partial(jax.jit, **_jit_opts(model))
    def step(params, batch_stats, x_ts, x_static, batch):
        x_in, x_static2 = feats_to_input(None, x_ts.astype(dtype),
                                         x_static.astype(dtype))
        pixels, feats = _cxr_inputs(batch, image_source, feature_source,
                                    dtype)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x_in, x_static2, batch["bin_ends"].astype(dtype),
                          pixels, train=False, return_attn=return_attn,
                          cxr_feats=feats)
        keys = ["main_logit", "img_logits", "ts_logits", "fusion_logits",
                "scaled_correction"]
        if return_attn:
            keys += ["img_attn", "ts_attn", "event_attn", "img_tokens",
                     "ts_tokens", "fusion_tokens"]
        return {k: out[k].astype(jnp.float32) for k in keys if k in out}

    return step


# =============================================================================
# Student KD (training_duett/engine.py:270-301): one jitted step runs the
# frozen teacher forward and the student fwd/bwd together.
# =============================================================================
def make_kd_step(student_model, teacher_model, cfg: TrainConfig,
                 duett_cfg: DuettConfig, n_timesteps: int,
                 dtype=jnp.bfloat16,
                 image_source: Callable = default_image_source,
                 feature_source: Optional[Callable] = None,
                 jit: bool = True):
    def step(state: TrainState, teacher_params, teacher_stats, grid, static,
             batch, rng):
        r_aug, r_drop = jax.random.split(rng)
        # teacher sees un-augmented inputs (its loader has no aug)
        x_in_t, x_static_t, times = _prep_inputs(
            grid, static, batch, n_timesteps, dtype)
        pixels, feats = _cxr_inputs(batch, image_source, feature_source,
                                    dtype)
        t_out = teacher_model.apply(
            {"params": teacher_params, "batch_stats": teacher_stats},
            x_in_t, x_static_t, times, pixels, train=False, cxr_feats=feats)
        z_t = jax.lax.stop_gradient(t_out["main_logit"])

        x_in, x_static, _ = _prep_inputs(
            grid, static, batch, n_timesteps, dtype, r_aug,
            duett_cfg.aug_noise, duett_cfg.aug_mask, train=True)

        def loss_fn(params):
            z_s, mut = student_model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_in, x_static, times, train=True,
                rngs={"dropout": r_drop}, mutable=["batch_stats"])
            losses = L.student_kd_loss(z_s, z_t, batch["y"],
                                       cfg.kd_T, cfg.kd_alpha,
                                       kd_name=cfg.kd_name)
            return losses["total"], (mut, losses, z_s)

        (_, (mut, losses, z_s)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, mut["batch_stats"])
        out = {k: v for k, v in losses.items()}
        out["logits"] = z_s.astype(jnp.float32)
        return new_state, out

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,), **_jit_opts(teacher_model))


def make_ssl_eval(model, duett_cfg: DuettConfig, n_timesteps: int,
                  dtype=jnp.bfloat16):
    """Validation loss with deterministic-per-batch masking rng.

    Reference quirk mirrored exactly (pinned by test_ssl_loop_parity):
    ``validation_step`` omits the event-PRESENCE term that
    ``training_step`` includes (duett/duett.py:394-399 vs :355-358), so the
    min-val-loss checkpoint selection criterion is value + presence +
    event-value only; the full-composition total is returned alongside as
    ``total_all_terms``."""
    @jax.jit
    def step(params, batch_stats, grid, static, batch, rng):
        x_ts = gather_windows(grid, batch["stay_rows"], batch["slot_idx"],
                              n_timesteps)
        x_static = static[batch["stay_rows"]].astype(dtype)
        times = batch["bin_ends"].astype(dtype)
        pb = pretrain_prep_batch(
            rng, x_ts, duett_cfg.pretrain_masked_steps,
            duett_cfg.pretrain_dropout, duett_cfg.predict_events,
            mask_idx=batch.get("ssl_mask_idx"),
            event_var=batch.get("ssl_event_var"))
        pb = pb._replace(x_in=pb.x_in.astype(dtype))
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          pb, x_static, times, train=False)
        parts = L.ssl_pretrain_loss(
            out["y_hat_value"], out["y_hat_presence"], out["y_hat_events"],
            out["y_hat_events_presence"], pb.y_value, pb.y_presence_mask,
            pb.y_events, pb.y_events_mask,
            pretrain_value=duett_cfg.pretrain_value,
            pretrain_presence=duett_cfg.pretrain_presence,
            presence_weight=duett_cfg.pretrain_presence_weight,
            predict_events=duett_cfg.predict_events)
        parts = dict(parts)
        parts["total_all_terms"] = parts["total"]
        if duett_cfg.predict_events and duett_cfg.pretrain_presence:
            parts["total"] = parts["total"] - parts["event_presence"]
        return parts

    return step
