"""The vendored x_transformers-equivalent torch Encoder (tests/ref_encoder.py)
must match this repo's flax ``TransformerEncoder`` exactly — it is the bridge
that makes the reference's full ``Model.encode``/``train_teacher`` runnable
for loop-level parity (VERDICT r2 item 1)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_encoder import FaithfulEncoder, encoder_params_from
from ref_harness import randomize_module
from multimodal_edema_prediction_tpu.models.layers import TransformerEncoder

ATOL = 2e-5


@pytest.mark.parametrize("dim,heads,dh,depth", [
    (600, 2, 12, 1),     # DuETT event axis: et_dim = 24·(24+1)
    (840, 2, 12, 1),     # DuETT time axis:  tt_dim = 24·(34+1)
    (64, 4, 16, 2),
])
def test_encoder_parity(dim, heads, dh, depth):
    torch.manual_seed(0)
    ff_mult = 512 / dim                      # duett/duett.py:98,103
    enc = FaithfulEncoder(dim=dim, depth=depth, heads=heads, pre_norm=True,
                          use_scalenorm=True, attn_dim_head=dh, ff_glu=False,
                          ff_mult=ff_mult).eval()
    randomize_module(enc, seed=1)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 11, dim)).astype(np.float32)
    with torch.no_grad():
        t_out = enc(torch.tensor(x)).numpy()

    mod = TransformerEncoder(n_layers=depth, n_heads=heads, d_head=dh,
                             d_feedforward=int(dim * ff_mult), dropout=0.0,
                             scalenorm=True)
    params = encoder_params_from(enc)
    j_out = mod.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=ATOL, rtol=1e-4)


def test_rejects_unsupported_config():
    with pytest.raises(NotImplementedError):
        FaithfulEncoder(dim=32, pre_norm=False)
    with pytest.raises(NotImplementedError):
        FaithfulEncoder(dim=32, ff_glu=True)
    with pytest.raises(NotImplementedError):
        FaithfulEncoder(dim=32, rotary_pos_emb=True)


def test_gradients_flow_both_sides():
    """Sanity: both implementations train (nonzero grads through attention)."""
    torch.manual_seed(0)
    enc = FaithfulEncoder(dim=24, depth=1, heads=2, attn_dim_head=12,
                          ff_mult=2.0)
    x = torch.randn(2, 5, 24)
    enc(x).sum().backward()
    g = enc.layers[0].attn.to_q.weight.grad
    assert g is not None and float(g.abs().sum()) > 0
