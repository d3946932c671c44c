"""TPU-native multimodal ICU edema-prediction framework.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of the
reference PyTorch project ``lastdancewithyou/multimodal_edema_prediction``:

- DuETT dual-axis transformer over irregular ICU time-series
  (reference: ``duett/duett.py``), SSL-pretrained with masked value / presence /
  event reconstruction.
- Frozen RAD-DINO-style ViT CXR encoder
  (reference: ``models/main_architecture_duett.py:129-158``).
- Pathology-query Perceiver fusion with residual logit correction
  (reference: ``models/main_architecture_duett.py:538-654``).
- Teacher multi-branch masked-BCE training, student KD distillation
  (reference: ``training_duett/``, ``loss/losses_duett.py``).
- A statistical analysis suite interrogating whether fusion uses the
  temporal modality (reference: ``analysis/``).

Everything is designed TPU-first: fixed shapes, jit-compiled train/eval steps,
GSPMD sharding over a `jax.sharding.Mesh`, device-resident input pipeline,
Pallas kernels for the hot fused ops.
"""

__version__ = "0.1.0"
