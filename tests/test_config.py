"""Config system: defaults, deep merge, YAML inheritance, schema guard."""

import pytest

from mast3r_slam_tpu.config import (
    Config,
    default_config,
    get_config,
    load_config,
    set_config,
)


def test_defaults_match_reference_hyperparameters():
    """The tuned SLAM hyperparameters of the reference must survive
    (reference DEFAULT_CONFIG, config.py:55-114)."""
    cfg = default_config()
    assert cfg.use_calib is False
    assert cfg.dataset.img_size == 512
    assert cfg.matching.max_iter == 10
    assert cfg.matching.lambda_init == 1e-8
    assert cfg.matching.dist_thresh == 0.1
    assert cfg.tracking.Q_conf == 1.5
    assert cfg.tracking.sigma_ray == 0.003
    assert cfg.tracking.sigma_dist == 10.0
    assert cfg.tracking.huber == 1.345
    assert cfg.tracking.match_frac_thresh == 0.333
    assert cfg.local_opt.pin == 1
    assert cfg.retrieval.k == 3
    assert cfg.retrieval.min_thresh == 0.005
    assert cfg.reloc.min_match_frac == 0.3


def test_from_dict_partial_nested():
    cfg = Config.from_dict({"tracking": {"sigma_ray": 0.01}, "use_calib": True})
    assert cfg.tracking.sigma_ray == 0.01
    assert cfg.tracking.sigma_dist == 10.0  # untouched default
    assert cfg.use_calib is True


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        Config.from_dict({"tracking": {"sigma_rey": 0.01}})


def test_yaml_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("tracking:\n  sigma_ray: 0.005\n  max_iters: 7\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"inherit: {base}\ntracking:\n  sigma_ray: 0.009\n")
    cfg = load_config(child)
    assert cfg.tracking.sigma_ray == 0.009  # child overrides
    assert cfg.tracking.max_iters == 7  # base survives
    assert cfg.tracking.sigma_dist == 10.0  # defaults survive


def test_global_accessor():
    assert get_config().tracking.Q_conf == 1.5
    set_config(Config.from_dict({"tracking": {"Q_conf": 2.0}}))
    assert get_config().tracking.Q_conf == 2.0


def test_dense_kernel_validated():
    """'pallas' was deleted in round 5; the knob survives for config
    compatibility but only 'xla'/'auto' pass validation."""
    import pytest

    with pytest.raises(ValueError, match="dense matcher was deleted"):
        Config.from_dict({"matching": {"dense_kernel": "pallas"}})
    assert (
        Config.from_dict({"matching": {"dense_kernel": "auto"}})
        .matching.dense_kernel
        == "auto"
    )
