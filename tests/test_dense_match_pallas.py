"""Parity: Pallas VMEM-tiled matcher vs the XLA shifted-tap matcher.

The Pallas kernel (ops/dense_match_pallas.py) must be an exact semantic
twin of `match_dense_window` — same tap order, same strict-< argmin, same
bf16 streams, same f32 occlusion gate, same hit factorization. These tests
run the kernel in interpreter mode on CPU against the XLA twin on the same
inputs. The two paths may differ in f32 summation order, so near-tie
argmins can legitimately flip; assertions use a 99.5% agreement floor plus
exactness on everything conditioned on idx agreement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.ops.dense_match import match_dense_window
from mast3r_slam_tpu.ops.dense_match_pallas import match_dense_window_pallas


def _world(key, b, h, w, d, noise=0.05):
    """Two co-registered views: X21 is X11 plus small noise, descriptors
    correlated so the dense window has real structure."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    X11 = jax.random.normal(k1, (b, h, w, 3)) + jnp.array([0.0, 0.0, 3.0])
    X21 = X11 + noise * jax.random.normal(k2, (b, h, w, 3))
    D11 = jax.random.normal(k3, (b, h, w, d))
    D11 = D11 / jnp.linalg.norm(D11, axis=-1, keepdims=True)
    D21 = D11 + 0.1 * jax.random.normal(k4, (b, h, w, d))
    D21 = D21 / jnp.linalg.norm(D21, axis=-1, keepdims=True)
    return X11, X21, D11, D21


def _scatter_hit(idx, valid):
    """Ground-truth hit = zeros.at[idx].max(valid), from given outputs."""
    b, n = idx.shape
    hit = np.zeros((b, n), bool)
    for bi in range(b):
        np.maximum.at(hit[bi], idx[bi], valid[bi, :, 0])
    return hit


def _compare(ref, ker, min_agree=0.995):
    """idx agreement >= floor; valid/payload exact where idx agrees; hit
    EXACTLY equals the scatter ground truth of each path's own idx/valid
    (near-tie argmin flips change idx, never the hit formula)."""
    idx_r, valid_r = np.asarray(ref[0]), np.asarray(ref[1])
    idx_k, valid_k = np.asarray(ker[0]), np.asarray(ker[1])
    same = idx_r == idx_k
    agree = same.mean()
    assert agree >= min_agree, f"idx agreement {agree:.4f}"
    assert (valid_r[..., 0] == valid_k[..., 0])[same].all()
    for r, k in zip(ref[2:], ker[2:]):
        r, k = np.asarray(r), np.asarray(k)
        if r.dtype == np.bool_:
            np.testing.assert_array_equal(r, _scatter_hit(idx_r, valid_r))
            np.testing.assert_array_equal(k, _scatter_hit(idx_k, valid_k))
        else:
            np.testing.assert_allclose(
                r[same].astype(np.float32), k[same].astype(np.float32), atol=1e-6
            )


@pytest.mark.parametrize("b", [1, 2])
def test_parity_full(b):
    """Payload + hit path, H a multiple of the band."""
    h, w, d, p = 32, 48, 8, 5
    X11, X21, D11, D21 = _world(jax.random.PRNGKey(0), b, h, w, d)
    pay = jax.random.normal(jax.random.PRNGKey(9), (b, h, w, p))
    kw = dict(radius=2, dilations=(1,), desc_weight=1.0, dist_thresh=0.3)
    ref = match_dense_window(X11, X21, D11, D21, payload=pay, want_hit=True, **kw)
    ker = match_dense_window_pallas(
        X11, X21, D11, D21, payload=pay, want_hit=True, band=16, interpret=True,
        **kw
    )
    _compare(ref, ker)


def test_parity_dilated_no_extras():
    """Dilated lattice, no payload/hit, H not a multiple of the band."""
    b, h, w, d = 1, 40, 64, 6
    X11, X21, D11, D21 = _world(jax.random.PRNGKey(1), b, h, w, d, noise=0.1)
    kw = dict(radius=2, dilations=(2, 1), desc_weight=0.5, dist_thresh=0.5)
    ref = match_dense_window(X11, X21, D11, D21, **kw)
    ker = match_dense_window_pallas(
        X11, X21, D11, D21, band=16, interpret=True, **kw
    )
    _compare(ref, ker)


def test_parity_degenerate_points():
    """Zero-norm pointmap rows (NaN rays) must stay unmatched, like XLA."""
    b, h, w, d = 1, 32, 32, 4
    X11, X21, D11, D21 = _world(jax.random.PRNGKey(2), b, h, w, d)
    X21 = X21.at[:, 8:12, :, :].set(0.0)  # NaN rays for these rows
    kw = dict(radius=2, dilations=(1,), desc_weight=1.0, dist_thresh=0.3)
    ref = match_dense_window(X11, X21, D11, D21, want_hit=True, **kw)
    ker = match_dense_window_pallas(
        X11, X21, D11, D21, want_hit=True, band=16, interpret=True, **kw
    )
    valid_k = np.asarray(ker[1])[0, :, 0].reshape(h, w)
    assert not valid_k[8:12].any()
    _compare(ref, ker)


def test_parity_fast_sum():
    """Pairwise bf16 pre-reduction: near-tie flips only (lower floor)."""
    b, h, w, d = 1, 32, 48, 8
    X11, X21, D11, D21 = _world(jax.random.PRNGKey(6), b, h, w, d)
    kw = dict(radius=2, dilations=(1,), desc_weight=1.0, dist_thresh=0.3)
    ref = match_dense_window(X11, X21, D11, D21, want_hit=True, **kw)
    ker = match_dense_window_pallas(
        X11, X21, D11, D21, want_hit=True, band=16, interpret=True,
        fast_sum=True, **kw
    )
    _compare(ref, ker, min_agree=0.98)


def test_dispatch_through_match():
    """config.matching.dense_kernel='pallas' routes matching.match through
    the kernel (interpreter mode off-TPU) with identical results."""
    from mast3r_slam_tpu.config import Config, set_config
    from mast3r_slam_tpu.matching import match

    b, h, w, d = 1, 32, 32, 4
    X11, X21, D11, D21 = _world(jax.random.PRNGKey(4), b, h, w, d)
    pay = jax.random.normal(jax.random.PRNGKey(5), (b, h, w, 3))
    outs = {}
    for kernel in ("xla", "pallas"):
        cfg = Config()
        cfg.matching.method = "dense"
        cfg.matching.dense_radius = 2
        cfg.matching.dense_kernel = kernel
        set_config(cfg)
        outs[kernel] = match(X11, X21, D11, D21, payload=pay, want_hit=True)
    set_config(Config())
    _compare(outs["xla"], outs["pallas"])


def test_serving_vmap_composition(tiny_model, rng):
    """The serving program vmaps match() per lane (and optionally scans
    microbatches); the Pallas kernel must survive that composition with
    the same poses as the XLA matcher."""
    import numpy as np

    from mast3r_slam_tpu.config import Config, set_config
    from mast3r_slam_tpu.serving import BatchTracker

    B = 2
    h, w = tiny_model._out_hw
    feats, poss, Xs, Cs = [], [], [], []
    for _ in range(B):
        img = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
        f, p = tiny_model.encode(img)
        X, C = tiny_model.mono(f[0], p[0])
        feats.append(f[0]); poss.append(p[0]); Xs.append(X); Cs.append(C)
    feats, poss = jnp.stack(feats), jnp.stack(poss)
    Xs, Cs = jnp.stack(Xs), jnp.stack(Cs)

    outs = {}
    for kernel in ("xla", "pallas"):
        set_config(
            Config.from_dict(
                {
                    "matching": {
                        "method": "dense",
                        "dense_radius": 2,
                        "dense_kernel": kernel,
                        "dist_thresh": 1e6,
                    },
                    "tracking": {"min_match_frac": 0.0},
                    "runtime": {"serving_microbatch": 0},
                }
            )
        )
        bt = BatchTracker(tiny_model)
        bt.init_from_keyframes(feats, poss, Xs, Cs)
        outs[kernel] = bt.step(feats, poss)
    set_config(Config())
    np.testing.assert_allclose(
        np.asarray(outs["pallas"]["poses"]),
        np.asarray(outs["xla"]["poses"]),
        atol=1e-3,
    )
    np.testing.assert_array_equal(
        outs["pallas"]["tracked"], outs["xla"]["tracked"]
    )


def test_halo_guard():
    b, h, w, d = 1, 16, 16, 4
    X11, X21, D11, D21 = _world(jax.random.PRNGKey(3), b, h, w, d)
    with pytest.raises(ValueError, match="halo"):
        match_dense_window_pallas(
            X11, X21, D11, D21, radius=6, dilations=(4, 1), interpret=True
        )
