"""Flash-attention block selection: the production flash_block_b config
must degrade safely at small serving batches (the pallas kernel rejects
block_b > B — the serving bucket-1 path hit this live on TPU)."""
from multimodal_edema_prediction_tpu.ops.attention import choose_flash_blocks


def test_block_b_clamped_to_batch():
    # serving bucket 1 with the production flash_block_b=2 config
    bq, bk, bb = choose_flash_blocks(B=1, Nq_p=1408, Nk_p=1408, block_b=2)
    assert bb == 1
    # training batch: tuned value kept
    _, _, bb = choose_flash_blocks(B=64, Nq_p=1408, Nk_p=1408, block_b=2)
    assert bb == 2
    assert choose_flash_blocks(4, 1408, 1408, 0)[2] == 1    # floor at 1


def test_full_length_blocks_when_divisible():
    bq, bk, _ = choose_flash_blocks(8, 1408, 1408, 1)
    assert (bq, bk) == (1408, 1408)
    bq, bk, _ = choose_flash_blocks(8, 4096, 4096, 1)       # > 2048 cap
    assert (bq, bk) == (2048, 2048)
    bq, bk, _ = choose_flash_blocks(8, 2176, 2176, 1)       # non-divisor cap
    assert (bq, bk) == (128, 128)


def test_perceiver_flash_eval_matches_standard():
    """PerceiverConfig.use_flash must be numerically invisible at eval:
    same params, same inputs → same outputs whether img_cross routes
    through the flash path (mha_reference off-TPU) or the standard one.
    In training the flash path must NOT engage (attention-prob dropout 0.2
    has no flash equivalent) — asserted by grad-of-train-loss equality."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_edema_prediction_tpu.config import PerceiverConfig
    from multimodal_edema_prediction_tpu.models.perceiver import \
        PatchDualPathologyPerceiver

    rng = np.random.default_rng(0)
    # d_latent 128 with 2 heads → d_head 64 (flash-eligible) at test scale
    pcfg = PerceiverConfig(d_latent=128, n_heads=2, head_hidden=16)
    B, Tn, d_ts = 2, 6, 24
    ts = jnp.asarray(rng.normal(size=(B, Tn + 1, d_ts)), jnp.float32)
    im = jnp.asarray(rng.normal(size=(B, 300, 128)), jnp.float32)

    std = PatchDualPathologyPerceiver(pcfg, d_ts=d_ts)
    fla = PatchDualPathologyPerceiver(pcfg.replace(use_flash=True),
                                      d_ts=d_ts)
    vars_ = jax.jit(std.init)(jax.random.key(0), ts, im)
    # pair the two applies in ONE jitted program per mode (eval, train):
    # halves the per-test compile count on the 1-core host
    o_std, o_fla = jax.jit(lambda v: (std.apply(v, ts, im, train=False),
                                      fla.apply(v, ts, im, train=False))
                           )(vars_)
    np.testing.assert_allclose(np.asarray(o_fla["fusion_logits"]),
                               np.asarray(o_std["fusion_logits"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_fla["img_logits"]),
                               np.asarray(o_std["img_logits"]),
                               rtol=2e-5, atol=2e-5)

    # train mode: identical outputs under the SAME dropout rng prove the
    # flash path did NOT engage (the flash kernel skips attention-prob
    # dropout, so its train output would differ)
    t_std, t_fla = jax.jit(lambda v: (
        std.apply(v, ts, im, train=True,
                  rngs={"dropout": jax.random.key(3)}),
        fla.apply(v, ts, im, train=True,
                  rngs={"dropout": jax.random.key(3)})))(vars_)
    np.testing.assert_allclose(np.asarray(t_fla["fusion_logits"]),
                               np.asarray(t_std["fusion_logits"]),
                               rtol=1e-6, atol=1e-6)
