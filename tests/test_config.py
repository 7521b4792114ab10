"""Config composition tests (group swap + dotted overrides, Hydra-like)."""

from bsms_gnn_tpu.config import load_config


def test_default_config_matches_reference_defaults():
    cfg = load_config()
    assert cfg.datasets.name == "airfoil"
    assert cfg.model.unet_depth == 7
    assert cfg.model.out_dim == 3
    assert cfg.model.consistent_mesh is True
    assert cfg.opt.peak_lr == 1e-4
    assert cfg.opt.warmup_steps == 20000
    assert cfg.batch == 48
    assert cfg.datasets.noise_level == [10, 10, 0.01]


def test_group_swap_pairs_model():
    cfg = load_config(["datasets=cylinder_flow"])
    assert cfg.datasets.name == "cylinder_flow"
    assert cfg.model.unet_depth == 5
    assert cfg.model.out_dim == 2
    assert cfg.model.consistent_mesh is False
    assert cfg.datasets.noise_level == [0.02, 0.02]


def test_dotted_overrides():
    cfg = load_config(["opt.peak_lr=3e-4", "batch=16", "model.latent_dim=64",
                       "datasets.consist_mesh=false"])
    assert cfg.opt.peak_lr == 3e-4
    assert cfg.batch == 16
    assert cfg.model.latent_dim == 64
    assert cfg.datasets.consist_mesh is False


def test_deforming_plate_group():
    cfg = load_config(["datasets=deforming_plate"])
    assert cfg.datasets.mesh_type == "tetra"
    assert cfg.model.pos_dim == 3
