"""Config system: dict round trips (checkpoint-as-config), diff tags,
validation invariants."""
import pytest

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    OptimConfig,
                                                    PerceiverConfig,
                                                    StudentConfig,
                                                    TeacherConfig, TrainConfig,
                                                    ViTConfig)


def test_teacher_config_round_trip():
    cfg = TeacherConfig(
        duett=DuettConfig(n_variables=8, d_embedding=16),
        vit=ViTConfig(image_size=56, d_model=32),
        perceiver=PerceiverConfig(d_latent=64, dropout=0.3),
        perceiver_type="dual", freeze_duett=True)
    back = TeacherConfig.from_dict(cfg.to_dict())
    assert back == cfg
    assert back.duett.n_variables == 8
    assert back.vit.image_size == 56
    assert back.perceiver.dropout == 0.3


def test_train_config_round_trip_with_optim():
    cfg = TrainConfig(batch_size=64, epochs=7, kd_T=2.0,
                      optim=OptimConfig(lr=1e-3, warmup_steps=50))
    back = TrainConfig.from_dict(cfg.to_dict())
    assert back == cfg
    assert back.optim.lr == 1e-3


def test_student_config_round_trip():
    cfg = StudentConfig(duett=DuettConfig(n_variables=5), pool="rep_token")
    back = StudentConfig.from_dict(cfg.to_dict())
    assert back == cfg


def test_diff_tag_reflects_non_defaults():
    assert TrainConfig().diff_tag() == "default"
    tag = TrainConfig(batch_size=64, epochs=7).diff_tag()
    assert "batch_size=64" in tag and "epochs=7" in tag
    # excluded (non-semantic) fields don't contribute
    assert DataConfig(data_dir="/x").diff_tag() == "default"


def test_pathology_label_invariant():
    with pytest.raises(ValueError, match="pathology_labels"):
        DataConfig(label_col="label_effusion")


def test_quant_requires_frozen_cxr():
    """int8 ViT quant with an unfrozen CXR branch would train through
    jnp.round's zero gradient — rejected at config construction, not just
    in the CLI."""
    from multimodal_edema_prediction_tpu.config import TeacherConfig, ViTConfig
    with pytest.raises(ValueError, match="freeze_cxr"):
        TeacherConfig(vit=ViTConfig(quant="int8"), freeze_cxr=False)
    # frozen is fine
    TeacherConfig(vit=ViTConfig(quant="int8"), freeze_cxr=True)
