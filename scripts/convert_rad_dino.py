#!/usr/bin/env python
"""Convert microsoft/rad-dino (HF Dinov2) weights to this repo's flax format.

Reference anchor: the frozen RAD-DINO backbone is the dominant-FLOPs branch of
the teacher (``/root/reference/models/main_architecture_duett.py:129-158``,
loaded via ``AutoModel.from_pretrained("microsoft/rad-dino")``).

Usage:
    python scripts/convert_rad_dino.py --source microsoft/rad-dino \
        --out runs/rad_dino_flax.msgpack
    python scripts/convert_rad_dino.py --source /path/to/hf_dir --out ...
    python scripts/convert_rad_dino.py --source /path/to/state_dict.pt --out ...

Outputs:
    <out>                  msgpack (save_checkpoint format: {"params": ...})
    <out>.manifest.json    parameter shapes + sha256 + image-norm constants

When the torch model is loadable the converted flax params are numerically
verified against it on random 518x518 inputs before anything is written
(CLS + patch tokens, atol 2e-4 / rtol 1e-3 in f32).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_edema_prediction_tpu.config import ViTConfig  # noqa: E402
from multimodal_edema_prediction_tpu.models.vit import (  # noqa: E402
    DinoViT, IMAGE_MEAN, IMAGE_STD, convert_hf_dinov2)


def load_state_dict(source: str):
    """Returns (state_dict numpy, torch_model_or_None, norm_constants)."""
    mean, std = list(IMAGE_MEAN), list(IMAGE_STD)
    if os.path.isfile(source):  # raw state dict (.pt / .bin / .safetensors)
        if source.endswith(".safetensors"):
            from safetensors.torch import load_file
            sd_t = load_file(source)
        else:
            import torch
            sd_t = torch.load(source, map_location="cpu", weights_only=True)
            if "state_dict" in sd_t:
                sd_t = sd_t["state_dict"]
        sd = {k: np.asarray(v) for k, v in sd_t.items()}
        return sd, None, (mean, std)

    # hub id or local HF directory
    from transformers import AutoModel
    model = AutoModel.from_pretrained(source)
    model.eval()
    try:
        from transformers import AutoImageProcessor
        proc = AutoImageProcessor.from_pretrained(source)
        mean = [float(x) for x in proc.image_mean]
        std = [float(x) for x in proc.image_std]
    except Exception:
        pass
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return sd, model, (mean, std)


def verify(model, params, cfg: ViTConfig, atol=2e-4, rtol=1e-3, batch=2):
    import jax
    import torch
    rng = np.random.default_rng(0)
    px = rng.random((batch, cfg.image_size, cfg.image_size, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        t_out = model(pixel_values=torch.tensor(
            px.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    # full f32 matmuls: on TPU the default precision is bf16 passes, which
    # would fail the tolerance for reasons unrelated to the conversion
    with jax.default_matmul_precision("highest"):
        cls, patches = DinoViT(cfg).apply({"params": params}, px,
                                          train=False)
    ours = np.concatenate(
        [np.asarray(cls)[:, None, :], np.asarray(patches)], axis=1)
    np.testing.assert_allclose(ours, t_out, atol=atol, rtol=rtol)
    return float(np.abs(ours - t_out).max())


def shape_manifest(params) -> dict:
    import jax
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(getattr(p, "key", str(getattr(p, "idx", p)))
                       for p in path)
        out[key] = list(np.asarray(leaf).shape)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser("rad-dino → flax converter")
    ap.add_argument("--source", default="microsoft/rad-dino",
                    help="HF hub id, local HF dir, or state-dict file")
    ap.add_argument("--out", default="runs/rad_dino_flax.msgpack")
    ap.add_argument("--image_size", type=int, default=518)
    ap.add_argument("--patch_size", type=int, default=14)
    ap.add_argument("--d_model", type=int, default=768)
    ap.add_argument("--n_layers", type=int, default=12)
    ap.add_argument("--n_heads", type=int, default=12)
    ap.add_argument("--d_feedforward", type=int, default=3072)
    ap.add_argument("--skip_verify", action="store_true")
    args = ap.parse_args(argv)

    cfg = ViTConfig(image_size=args.image_size, patch_size=args.patch_size,
                    d_model=args.d_model, n_layers=args.n_layers,
                    n_heads=args.n_heads, d_feedforward=args.d_feedforward,
                    use_flash_attention=False)
    sd, model, (mean, std) = load_state_dict(args.source)
    params = convert_hf_dinov2(sd, cfg)

    max_err = None
    if model is not None and not args.skip_verify:
        max_err = verify(model, params, cfg)
        print(f"[convert] verified vs torch: max |diff| = {max_err:.2e}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    from multimodal_edema_prediction_tpu.train.checkpoint import (
        save_checkpoint)
    save_checkpoint(args.out, params, None, step=0, metric=0.0,
                    config={"vit": cfg.to_dict(), "source": args.source,
                            "image_mean": mean, "image_std": std})
    digest = hashlib.sha256(open(args.out, "rb").read()).hexdigest()
    manifest = {
        "source": args.source,
        "sha256": digest,
        "image_mean": mean, "image_std": std,
        "vit_config": cfg.to_dict(),
        "verified_max_abs_err": max_err,
        "n_params": int(sum(np.asarray(x).size for x in
                            __import__("jax").tree.leaves(params))),
        "shapes": shape_manifest(params),
    }
    with open(args.out + ".manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"[convert] wrote {args.out} (sha256 {digest[:16]}…) "
          f"+ manifest ({manifest['n_params']:,} params)")


if __name__ == "__main__":
    main()
