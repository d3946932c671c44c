"""Loop-level SSL pretraining parity against the reference's ACTUAL
``Model.training_step``/``validation_step`` pretrain branch
(`/root/reference/duett/duett.py:189-237,329-418`) driven the way
``duett/train_duett_ssl.py`` drives it (AdamW + WarmUp invsqrt callback +
grad-clip 1.0 + min-val-loss best checkpoint).

Completes the loop-parity matrix: teacher (dual_patch / dual / single /
legacy) and student-KD loops are covered by test_trainer_loop_parity /
test_student_loop_parity; this covers the remaining live reference
training path — SSL pretraining.

Same deterministic-transplant design as the teacher test:

- one shared window set (this repo's z-scored grid), fed to both loops;
- x_transformers replaced by the parity-pinned ``FaithfulEncoder``;
- the torch model's initial weights transplanted into the flax
  ``DuettPretrainModel``;
- the ONE irreducibly stochastic part of SSL — which timestep / which
  variable gets masked (``self.rng`` numpy draws, duett.py:205-215) — is
  transplanted too: a shared deterministic mask function feeds a scripted
  rng on the torch side and the ``ssl_mask_idx``/``ssl_event_var`` batch
  override on the jax side (models/duett.py::pretrain_prep_batch);
- full-batch training (1 step/epoch), dropout 0 ⇒ the comparison is
  deterministic and per-epoch train/val losses must agree to float32
  accumulation tolerance.

Also pins the WarmUp callback's exact off-by-one: its first train batch
runs with lr == 0 (steps counter starts at 0), so step 0 only seeds the
Adam moments — train/optim.py::invsqrt_warmup reproduces this.
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_harness import (dense_from, duett_encoder_params, load_reference,
                         use_encoder, randomize_module)
from ref_encoder import FaithfulEncoder

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    TrainConfig)
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.data.sliding import (
    SlidingSSLDataset, build_sliding_ssl_dataset)

REF = load_reference()

V, T = 6, 8
D_EMB, D_FF, N_HEADS, N_LAYERS = 8, 32, 2, 1
D_HID_EMB, D_HID_TAB, D_HID_PRE = 16, 16, 16
LR, WD, WARMUP, EPOCHS, SEED = 1e-3, 0.1, 2, 4, 0


def _masks_for(rows: np.ndarray, starts: np.ndarray, seed: int):
    """Shared deterministic mask choice — a pure function of the sample
    identity and the epoch seed, so batch order cannot matter."""
    m = (rows.astype(np.int64) * 31 + starts * 7 + seed * 11) % T
    e = (rows.astype(np.int64) * 13 + starts * 5 + seed * 3) % V
    return m.astype(np.int32), e.astype(np.int32)


class _MaskedSSL(SlidingSSLDataset):
    """Production dataset + transplanted masks riding the batch dict."""

    def iter_batches(self, name, batch_size, shuffle, seed=0, limit=0):
        for b in super().iter_batches(name, batch_size, shuffle, seed,
                                      limit):
            rows = np.asarray(b["stay_rows"], np.int64)
            starts = np.asarray(b["slot_idx"], np.int64) - self.n_timesteps
            eseed = seed if name == "train" else 0
            m, e = _masks_for(rows, starts, eseed)
            b["ssl_mask_idx"] = m[:, None]
            b["ssl_event_var"] = e
            yield b


class _ScriptedRng:
    """Stands in for the reference Model's ``self.rng``: returns the
    transplanted choices in the exact order pretrain_prep_batch draws them
    (per sample: masked timestep, then masked variable)."""

    def __init__(self, mask_idx, event_var):
        self.q = []
        for m, e in zip(mask_idx, event_var):
            self.q += [int(m), int(e)]

    def choice(self, a, size=None):
        assert size is None, "masked_steps == 1 in this recipe"
        return self.q.pop(0)

    def random(self, *a, **k):   # pretrain_dropout == 0 → never drawn
        raise AssertionError("unexpected rng.random draw")


@pytest.fixture(scope="module")
def rig():
    ds = S.make_synthetic(seed=3, n_subjects=24, n_stays=30, n_variables=V,
                          min_len=26, max_len=40, obs_rate=0.5)
    dcfg = DataConfig(n_timesteps=T)
    meta = P.meta_from_events(ds, dcfg)
    base = build_sliding_ssl_dataset(ds, meta, n_timesteps=T, stride=12)
    ssl_ds = _MaskedSSL(grid=base.grid, static=base.static,
                        samples=base.samples, meta=meta, n_timesteps=T)
    n_train = ssl_ds.split_size("train")
    n_val = ssl_ds.split_size("val")
    assert n_train >= 16 and 1 <= n_val < n_train

    with use_encoder(FaithfulEncoder):
        ref = REF["duett"].Model(
            d_static_num=1 + len(ds.onehot_names), d_time_series_num=V,
            d_target=1, lr=LR, weight_decay=WD, d_embedding=D_EMB,
            d_feedforward=D_FF, n_transformer_head=N_HEADS,
            n_duett_layers=N_LAYERS, n_hidden_mlp_embedding=1,
            d_hidden_mlp_embedding=D_HID_EMB, d_hidden_tab_encoder=D_HID_TAB,
            n_hidden_tab_encoder=1, max_len=T, pretrain=True,
            pretrain_masked_steps=1, pretrain_n_hidden=0,
            pretrain_d_hidden=D_HID_PRE, pretrain_dropout=0.0,
            pretrain_value=True, pretrain_presence=True,
            pretrain_presence_weight=0.2, predict_events=True,
            transformer_dropout=0.0, seed=SEED,
            masked_transform_timesteps=T)
    randomize_module(ref, seed=7)
    return {"ds": ds, "meta": meta, "ssl": ssl_ds, "ref": ref,
            "n_train": n_train, "n_val": n_val,
            "d_static": 1 + len(ds.onehot_names)}


def _torch_batch(ssl_ds, b):
    """Materialize the window tensors exactly as the jax step gathers them
    (engine.gather_windows: rows [start, start+T) of the z-scored grid)."""
    grid = np.asarray(ssl_ds.grid)
    static = np.asarray(ssl_ds.static)
    rows = np.asarray(b["stay_rows"])
    starts = np.asarray(b["slot_idx"]) - ssl_ds.n_timesteps
    x_ts = np.stack([grid[r, s:s + T] for r, s in zip(rows, starts)])
    x_static = static[rows]
    times = np.asarray(b["bin_ends"], np.float32)
    return (torch.tensor(x_ts, dtype=torch.float32),
            torch.tensor(x_static, dtype=torch.float32),
            torch.tensor(times, dtype=torch.float32))


def _warmup_lr(step: int) -> float:
    """The WarmUp callback formula (train_duett_ssl.py:39-50),
    decay == warmup."""
    if step < WARMUP:
        return step / WARMUP * LR
    return LR * (WARMUP / (step - WARMUP + WARMUP)) ** 0.5


def _run_reference(rig) -> dict:
    ref = rig["ref"]
    ssl_ds = rig["ssl"]
    opt = ref.configure_optimizers()[0]
    val_log = []
    ref.log = lambda name, value, **k: val_log.append(
        (name, float(value.detach()) if torch.is_tensor(value)
         else float(value)))

    train_losses, val_losses, step = [], [], 0
    for epoch in range(EPOCHS):
        ref.train()
        for b in ssl_ds.iter_batches("train", rig["n_train"], shuffle=True,
                                     seed=SEED + epoch):
            x = _torch_batch(ssl_ds, b)
            xb = (x[0].clone(), list(x[1]), [t for t in x[2]])
            ref.rng = _ScriptedRng(b["ssl_mask_idx"][:, 0],
                                   b["ssl_event_var"])
            for pg in opt.param_groups:     # WarmUp on_train_batch_start
                pg["lr"] = _warmup_lr(step)
            step += 1
            y = torch.zeros(x[0].shape[0])
            loss = ref.training_step((xb, y), 0)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
            opt.step()
            train_losses.append(float(loss.detach()))

        ref.eval()
        epoch_val = []
        with torch.no_grad():
            for b in ssl_ds.iter_batches("val", rig["n_val"],
                                         shuffle=False):
                x = _torch_batch(ssl_ds, b)
                xb = (x[0].clone(), list(x[1]), [t for t in x[2]])
                ref.rng = _ScriptedRng(b["ssl_mask_idx"][:, 0],
                                       b["ssl_event_var"])
                val_log.clear()
                y_val = torch.zeros(x[0].shape[0])
                ref.validation_step((xb, y_val), 0)
                epoch_val.append(dict(val_log)["val_loss"])
        val_losses.append(float(np.mean(epoch_val)))
    return {"train": train_losses, "val": val_losses}


def _transplant(ref, dcfg, n_train, d_static):
    """torch init → flax DuettPretrainModel variables (tree-checked)."""
    from multimodal_edema_prediction_tpu.models.duett import (
        DuettPretrainModel, PretrainBatch)
    enc_p, enc_s = duett_encoder_params(ref, with_transformers=True)
    params = {
        "encoder": enc_p,
        "pretrain_value_proj": {"out": dense_from(ref.pretrain_value_proj[0])},
        "pretrain_presence_proj": {
            "out": dense_from(ref.pretrain_presence_proj[0])},
        "predict_events_proj": {
            "out": dense_from(ref.predict_events_proj[0])},
        "predict_events_presence_proj": {
            "out": dense_from(ref.predict_events_presence_proj[0])},
    }
    batch_stats = {"encoder": enc_s}

    model = DuettPretrainModel(dcfg)
    pb = PretrainBatch(
        x_in=np.zeros((n_train, T, 2 * V + 1), np.float32),
        mask_idx=np.zeros((n_train, 1), np.int32),
        y_value=np.zeros((n_train, 1, V), np.float32),
        y_presence_mask=np.zeros((n_train, 1, V), np.float32),
        event_var=np.zeros((n_train,), np.int32),
        y_events=np.zeros((n_train, T), np.float32),
        y_events_mask=np.zeros((n_train, T), np.float32))
    template = model.init(jax.random.key(0), pb,
                          np.zeros((n_train, d_static), np.float32),
                          np.zeros((n_train, T), np.float32))

    def assert_same_tree(a, b, path=""):
        ka, kb = set(a), set(b)
        assert ka == kb, f"{path}: {ka ^ kb}"
        for k in ka:
            if isinstance(a[k], dict):
                assert_same_tree(a[k], b[k], f"{path}/{k}")
            else:
                assert np.shape(a[k]) == np.shape(b[k]), \
                    f"{path}/{k}: {np.shape(a[k])} vs {np.shape(b[k])}"

    assert_same_tree(dict(template["params"]), params)
    assert_same_tree(dict(template["batch_stats"]), batch_stats)
    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, batch_stats)}


@pytest.mark.slow
def test_ssl_loop_matches_reference(rig, tmp_path):
    dcfg = DuettConfig(
        n_variables=V, n_timesteps=T, d_static=rig["d_static"],
        d_embedding=D_EMB, n_layers=N_LAYERS, n_heads=N_HEADS,
        d_feedforward=D_FF, n_hidden_mlp_embedding=1,
        d_hidden_mlp_embedding=D_HID_EMB, d_hidden_tab_encoder=D_HID_TAB,
        n_hidden_tab_encoder=1, transformer_dropout=0.0,
        pretrain_masked_steps=1, pretrain_n_hidden=0,
        pretrain_d_hidden=D_HID_PRE, pretrain_dropout=0.0,
        pretrain_presence_weight=0.2)
    cfg = TrainConfig(batch_size=rig["n_train"], epochs=EPOCHS,
                      patience=EPOCHS + 1, seed=SEED, dtype="float32",
                      n_data=1, n_model=1)
    # capture the torch INITIAL weights before the reference loop trains
    variables = _transplant(rig["ref"], dcfg, rig["n_train"],
                            rig["d_static"])
    ref_traj = _run_reference(rig)

    from multimodal_edema_prediction_tpu.train.ssl_loop import train_ssl
    res = train_ssl(rig["ssl"], dcfg, cfg, str(tmp_path / "ssl"),
                    lr=LR, weight_decay=WD, warmup_steps=WARMUP,
                    grad_clip=1.0, init_variables=variables)

    assert len(res.history) == EPOCHS
    for e in range(EPOCHS):
        r_tr, m_tr = ref_traj["train"][e], res.history[e]["train_loss"]
        assert abs(r_tr - m_tr) <= 2e-3 + 5e-3 * abs(r_tr), (
            f"epoch {e} train: ref={r_tr:.6f} mine={m_tr:.6f}")
        r_va, m_va = ref_traj["val"][e], res.history[e]["val_loss"]
        assert abs(r_va - m_va) <= 2e-3 + 5e-3 * abs(r_va), (
            f"epoch {e} val: ref={r_va:.6f} mine={m_va:.6f}")

    # best checkpoint = min val loss on both sides
    assert res.best_metric == pytest.approx(min(ref_traj["val"]), rel=5e-3,
                                            abs=2e-3)
