"""Golden tests: losses must match the reference torch formulas."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from multimodal_edema_prediction_tpu.ops import losses as L


def _np(x):
    return np.asarray(x)


def test_bce_with_logits_matches_torch(rng):
    x = rng.normal(size=(64,)).astype(np.float32)
    y = (rng.random(64) < 0.5).astype(np.float32)
    ours = _np(L.bce_with_logits(jnp.array(x), jnp.array(y)))
    theirs = F.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.tensor(y)).numpy()
    assert abs(ours - theirs) < 5e-6


def test_bce_pos_weight_matches_torch(rng):
    x = rng.normal(size=(64, 7)).astype(np.float32)
    y = (rng.random((64, 7)) < 0.5).astype(np.float32)
    pw = rng.uniform(0.5, 3.0, size=(7,)).astype(np.float32)
    ours = _np(L.bce_with_logits(jnp.array(x), jnp.array(y),
                                 pos_weight=jnp.array(pw)))
    theirs = F.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.tensor(y), pos_weight=torch.tensor(pw)).numpy()
    assert abs(ours - theirs) < 1e-6


def test_masked_per_label_bce_matches_reference_loop(rng):
    """Reference DualPathologyLoss._per_pathology_bce (losses_duett.py:152-164)."""
    B, K = 128, 7
    logits = rng.normal(size=(B, K)).astype(np.float32)
    y = (rng.random((B, K)) < 0.4).astype(np.float32)
    mask = (rng.random((B, K)) < 0.8).astype(np.float32)
    ours = _np(L.masked_per_label_bce(jnp.array(logits), jnp.array(y),
                                      jnp.array(mask)))
    lt, yt, mt = map(torch.tensor, (logits, y, mask))
    expected = []
    for k in range(K):
        l = F.binary_cross_entropy_with_logits(lt[:, k], yt[:, k],
                                               reduction="none")
        expected.append(((l * mt[:, k]).sum() / (mt[:, k].sum() + 1e-6)).item())
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_dual_pathology_loss_composition(rng):
    B, K = 64, 7
    args = [jnp.array(rng.normal(size=(B, K)).astype(np.float32))
            for _ in range(3)]
    y = jnp.array((rng.random((B, K)) < 0.4).astype(np.float32))
    m = jnp.array((rng.random((B, K)) < 0.9).astype(np.float32))
    lw = jnp.ones(K)
    out = L.dual_pathology_loss(*args, y, m, lw,
                                alpha_img=0.5, alpha_ts=0.5, alpha_fus=1.0)
    expect = 0.5 * out["img_total"] + 0.5 * out["ts_total"] + out["fus_total"]
    assert abs(float(out["total"]) - float(expect)) < 1e-6


def test_binary_kl_kd_matches_reference(rng):
    """VanillaKLKD (losses_duett.py:8-25)."""
    z_s = rng.normal(size=(128,)).astype(np.float32) * 3
    z_t = rng.normal(size=(128,)).astype(np.float32) * 3
    T, eps = 4.0, 1e-7
    ours = float(L.binary_kl_kd(jnp.array(z_s), jnp.array(z_t), T=T))
    zs, zt = torch.tensor(z_s), torch.tensor(z_t)
    p_t = torch.sigmoid(zt / T).clamp(eps, 1 - eps)
    p_s = torch.sigmoid(zs / T).clamp(eps, 1 - eps)
    kl = p_t * (p_t.log() - p_s.log()) + \
        (1 - p_t) * ((1 - p_t).log() - (1 - p_s).log())
    theirs = float((T ** 2) * kl.mean())
    assert abs(ours - theirs) < 1e-5


def test_student_kd_loss_alpha_blend(rng):
    z_s = jnp.array(rng.normal(size=(32,)).astype(np.float32))
    z_t = jnp.array(rng.normal(size=(32,)).astype(np.float32))
    y = jnp.array((rng.random(32) < 0.5).astype(np.float32))
    out = L.student_kd_loss(z_s, z_t, y, kd_T=4.0, kd_alpha=0.5)
    assert abs(float(out["total"])
               - (0.5 * float(out["bce"]) + 0.5 * float(out["kd"]))) < 1e-6


def test_aux_residual_kl_zero_when_correction_matches_smooth_label(rng):
    """If σ(anchor+corr) == y_smooth exactly, KL must be 0."""
    B, K = 16, 7
    y = (rng.random((B, K)) < 0.5).astype(np.float32)
    eps = 0.05
    y_smooth = y * (1 - eps) + (1 - y) * eps
    target_logit = np.log(y_smooth / (1 - y_smooth)).astype(np.float32)
    img = rng.normal(size=(B, K)).astype(np.float32)
    corr = target_logit - img
    out = L.aux_residual_kl(jnp.array(img), jnp.array(corr), jnp.array(y),
                            jnp.ones((B, K)))
    assert float(out) < 1e-9


def test_ssl_pretrain_loss_matches_reference_formula(rng):
    """duett.py:337-358, pretrain_masked_steps=2 branch."""
    B, S, V, T = 8, 2, 34, 24
    yhv = rng.normal(size=(B, S, V)).astype(np.float32)
    yhp = rng.normal(size=(B, S, V)).astype(np.float32)
    yhe = rng.normal(size=(B, T)).astype(np.float32)
    yhep = rng.normal(size=(B, T)).astype(np.float32)
    yv = rng.normal(size=(B, S, V)).astype(np.float32)
    pm = (rng.random((B, S, V)) < 0.3).astype(np.float32)
    ye = rng.normal(size=(B, T)).astype(np.float32)
    em = (rng.random((B, T)) < 0.5).astype(np.float32)

    out = L.ssl_pretrain_loss(*(jnp.array(a) for a in
                                (yhv, yhp, yhe, yhep, yv, pm, ye, em)))

    t = lambda a: torch.tensor(a)  # noqa: E731
    loss = 0
    for i in range(S):
        loss = loss + F.mse_loss(t(yhv)[:, i] * t(pm)[:, i],
                                 t(yv)[:, i] * t(pm)[:, i])
    loss = loss / S
    pres = 0
    for i in range(S):
        pres = pres + F.binary_cross_entropy_with_logits(
            t(yhp)[:, i], t(pm)[:, i]) * 0.2
    pres = pres / S
    loss = loss + pres
    loss = loss + F.mse_loss(t(yhe) * t(em), t(ye) * t(em))
    loss = loss + F.binary_cross_entropy_with_logits(t(yhep), t(em)) * 0.2
    assert abs(float(out["total"]) - float(loss)) < 1e-5
