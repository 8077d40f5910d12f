"""Int8 weight-streaming quantization (models/quant.py).

Pins: per-leaf quantization error bound, pytree mechanics, and the
end-to-end output deviation of a quantized model forward — the accuracy
band the on-chip A/B (scripts/measure_weight_quant.py) rides on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.models.mast3r import MASt3RConfig, MASt3RModel
from mast3r_slam_tpu.models.quant import (
    dequantize_params,
    is_quantized_leaf,
    quantize_params,
    quantized_fraction,
)


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.3, (64, 128)).astype(np.float32))
    q = quantize_params({"k": w}, min_elems=1)
    assert is_quantized_leaf(q["k"])
    assert q["k"]["__w8__"].dtype == jnp.int8
    back = dequantize_params(q, dtype=jnp.float32)["k"]
    # symmetric per-output-channel: error <= scale/2 = absmax/254 per column
    col_absmax = jnp.max(jnp.abs(w), axis=0)
    err = jnp.max(jnp.abs(back - w), axis=0)
    assert bool(jnp.all(err <= col_absmax / 254.0 + 1e-7))


def test_small_leaves_untouched():
    params = {
        "bias": jnp.ones((64,)),
        "norm": jnp.ones((4, 8)),  # 32 elems < min_elems
        "kernel": jnp.ones((64, 64)),
    }
    q = quantize_params(params, min_elems=1024)
    assert not is_quantized_leaf(q["bias"])
    assert not is_quantized_leaf(q["norm"])
    assert is_quantized_leaf(q["kernel"])
    frac = quantized_fraction(q)
    assert 0.9 < frac < 1.0  # kernel dominates the scalar count


@pytest.fixture(scope="module")
def tiny_models():
    base = MASt3RModel.create(resolution=64, _test_cfg=MASt3RConfig.tiny())
    quant = MASt3RModel.create(resolution=64, _test_cfg=MASt3RConfig.tiny())
    quant.quantize_weights("int8", min_elems=1024)
    return base, quant


def test_quantize_weights_idempotent_and_none(tiny_models):
    _, quant = tiny_models
    params_before = quant.params
    quant.quantize_weights("int8", min_elems=1024)  # no-op second time
    assert quant.params is params_before
    base = MASt3RModel.create(resolution=64, _test_cfg=MASt3RConfig.tiny())
    p = base.params
    base.quantize_weights("none")
    assert base.params is p
    with pytest.raises(ValueError):
        base.quantize_weights("int4")


def test_forward_deviation_band(tiny_models):
    """Quantized reconstruct stays within the int8 accuracy band of the
    exact model: descriptors (unit-norm) deviate at the ~1% level; pts3d
    deviates relative to its magnitude."""
    base, quant = tiny_models
    assert quantized_fraction(quant.params) > 0.5
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 48, 64, 3)).astype(np.float32))
    o1, _ = base.reconstruct(img, img)
    q1, _ = quant.reconstruct(img, img)
    d_desc = float(jnp.max(jnp.abs(o1["desc"] - q1["desc"])))
    assert np.isfinite(d_desc) and d_desc < 0.1
    scale = float(jnp.max(jnp.abs(o1["pts3d"]))) + 1e-6
    d_pts = float(jnp.max(jnp.abs(o1["pts3d"] - q1["pts3d"]))) / scale
    assert d_pts < 0.15


def test_quantized_model_through_fused_tracking(tiny_models):
    """The fused tracker program accepts the quantized param tree (params
    flow through jit as a pytree; dequant happens inside the trace)."""
    from mast3r_slam_tpu.config import Config, set_config
    from mast3r_slam_tpu.frame import Keyframes, create_frame
    from mast3r_slam_tpu.inference import (
        mast3r_inference_mono,
        mast3r_match_asymmetric,
    )
    from mast3r_slam_tpu.tracker import FrameTracker

    _, quant = tiny_models
    set_config(Config.from_dict({"matching": {"method": "dense"}}))
    h, w = quant._out_hw
    rng = np.random.default_rng(2)
    base_img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    kfs = Keyframes(h, w)
    kf = create_frame(0, jnp.asarray(base_img))
    X, C, feat, pos = mast3r_inference_mono(quant, kf)
    kf.X_canon, kf.C, kf.feat, kf.pos = X, C, feat, pos
    kf.N = kf.N_updates = 1
    kfs.append(kf)
    tracker = FrameTracker(quant, kfs)
    frame = create_frame(
        1, jnp.asarray(np.clip(base_img + 0.01, 0, 1))
    )
    tracker.track(frame, mast3r_match_asymmetric)
    assert np.all(np.isfinite(np.asarray(frame.T_WC)))
