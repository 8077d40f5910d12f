"""FactorGraph unit tests: edge arena, pruning, add_factors gating."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.config import Config, set_config
from mast3r_slam_tpu.frame import Keyframes, create_frame
from mast3r_slam_tpu.global_opt import FactorGraph


def _keyframes(rng, n_kf=5, h=4, w=6):
    set_config(
        Config.from_dict(
            {
                "runtime": {"keyframe_capacity": 8},
                "local_opt": {"max_edges": 8, "window_size": 1000000},
            }
        )
    )
    kfs = Keyframes(h, w)
    n = h * w
    for i in range(n_kf):
        f = create_frame(i, jnp.zeros((h, w, 3)))
        f.X_canon = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        f.C = jnp.full((n, 1), 5.0)
        f.feat = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
        f.pos = jnp.zeros((6, 2), jnp.int32)
        f.N = f.N_updates = 1
        kfs.append(f)
    return kfs


def _fill_edges(fg, pairs):
    n = fg.n_points
    for i, j in pairs:
        e = fg.n_edges
        fg.ii[e], fg.jj[e] = i, j
        fg.idx_ii2jj = fg.idx_ii2jj.at[e].set(jnp.arange(n))
        fg.idx_jj2ii = fg.idx_jj2ii.at[e].set(jnp.arange(n))
        fg.valid_match_j = fg.valid_match_j.at[e].set(True)
        fg.valid_match_i = fg.valid_match_i.at[e].set(True)
        fg.Q_ii2jj = fg.Q_ii2jj.at[e].set(4.0)
        fg.Q_jj2ii = fg.Q_jj2ii.at[e].set(4.0)
        fg.n_edges += 1


class TestPruning:
    def test_window_prune_removes_old_edges(self, rng):
        kfs = _keyframes(rng)
        fg = FactorGraph(model=None, frames=kfs)
        _fill_edges(fg, [(0, 1), (1, 2), (2, 3), (3, 4)])
        removed = fg.prune_to_window(latest_kf=4, window_size=2)
        # window = {3, 4}: keep edges touching 3+
        assert removed == 2
        assert fg.n_edges == 2
        assert set(zip(fg.ii[:2], fg.jj[:2])) == {(2, 3), (3, 4)}

    def test_infinite_window_noop(self, rng):
        kfs = _keyframes(rng)
        fg = FactorGraph(model=None, frames=kfs)
        _fill_edges(fg, [(0, 1), (1, 2)])
        assert fg.prune_to_window(latest_kf=2) == 0
        assert fg.n_edges == 2

    def test_solve_after_prune_still_works(self, rng):
        kfs = _keyframes(rng)
        fg = FactorGraph(model=None, frames=kfs)
        _fill_edges(fg, [(0, 1), (1, 2), (2, 3)])
        fg.prune_to_window(latest_kf=3, window_size=2)
        fg.solve_GN_rays()  # must not crash; poses stay finite
        assert np.isfinite(np.asarray(kfs.T_WC)).all()


class TestUniqueIdx:
    def test_unique_kf_idx(self, rng):
        kfs = _keyframes(rng)
        fg = FactorGraph(model=None, frames=kfs)
        _fill_edges(fg, [(0, 2), (2, 4)])
        assert fg.get_unique_kf_idx().tolist() == [0, 2, 4]
