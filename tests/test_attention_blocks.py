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
