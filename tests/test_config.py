from eprecon_tpu.config import default_config, apply_overrides, load_config


def test_defaults_match_reference_train_yaml():
    cfg = default_config()
    assert cfg.model.n_vox == (96, 96, 96)
    assert cfg.model.voxel_size == 0.04
    assert cfg.model.train_num_sample == (15000, 60000, 120000)
    assert cfg.model.lw == (1.0, 0.8, 0.64, 1.2)
    assert cfg.model.pos_weight == 1.5
    assert cfg.model.fusion.fusion_on and cfg.model.fusion.full
    assert cfg.train.accumulation_steps == 8
    assert cfg.model.n_scales == 2
    assert cfg.model.backbone2d.alpha == 1.0


def test_overrides():
    cfg = default_config()
    cfg = apply_overrides(cfg, [("model.voxel_size", 0.08),
                                ("train.lr", "3e-4"),
                                ("model.n_vox", [64, 64, 64])])
    assert cfg.model.voxel_size == 0.08
    assert cfg.train.lr == 3e-4
    assert cfg.model.n_vox == (64, 64, 64)


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("model:\n  voxel_size: 0.02\ntrain:\n  epochs: 7\n")
    cfg = load_config(str(p))
    assert cfg.model.voxel_size == 0.02
    assert cfg.train.epochs == 7
