"""Oracle two-view model: a perfect MASt3R over a synthetic world.

Plays the network's role exactly — given two views it returns view-i points
in view-i's frame and view-j points in view-i's frame, from ground-truth
geometry (plus optional noise) — so the ENTIRE SLAM system (tracking,
keyframing, backend, retrieval, exports) can be validated for metric
correctness without trained weights: the estimated trajectory must match
the ground-truth trajectory.

Frame identity travels through the image: frames are rendered with pixel
(0,0) red channel = frame_id / 255.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.lie import core as lie


def render_frame_image(frame_id: int, h: int, w: int, rng) -> np.ndarray:
    img = rng.uniform(0.2, 0.8, (h, w, 3)).astype(np.float32)
    img[0, 0, 0] = frame_id / 255.0
    return (img * 255).astype(np.uint8)


class OracleModel:
    """Drop-in for MASt3RModel in the SLAM pipeline (legacy tracker path)."""

    def __init__(
        self,
        world_points: np.ndarray,  # [N, 3] in world frame (= kf0 camera frame)
        poses_gt: dict[int, np.ndarray],  # frame_id -> T_WC [8]
        h: int,
        w: int,
        desc_dim: int = 8,
        feat_dim: int = 32,
        noise: float = 0.0,
        seed: int = 0,
    ):
        self.P = np.asarray(world_points, np.float32)
        self.poses = poses_gt
        self.h, self.w = h, w
        self.noise = noise
        self.embed_dim = feat_dim
        self.patch_size = 16
        self._rng = np.random.default_rng(seed)
        n = self.P.shape[0]
        desc = self._rng.normal(size=(n, desc_dim)).astype(np.float32)
        self.desc = desc / np.linalg.norm(desc, axis=-1, keepdims=True)
        # per-frame pseudo-features: smooth function of GT position so
        # retrieval similarity correlates with spatial proximity
        self.feat_dim = feat_dim
        self._out_hw = (h, w)

    # -- model API ----------------------------------------------------------

    def encode(self, img):
        """img [1, H, W, 3] normalized to [-1, 1]; recover the frame id."""
        v = float(img[0, 0, 0, 0])
        frame_id = int(round((v + 1.0) * 0.5 * 255.0))
        t = self.poses[frame_id][:3]
        # place-recognition-friendly features: rows ~ normalized [t, 1], so
        # signature similarity correlates with camera proximity
        base = np.concatenate([t, [1.0]]).astype(np.float32)
        base = base / np.linalg.norm(base)
        feat = np.tile(base, (4, self.feat_dim // 4))[:, : self.feat_dim]
        # id rides in one scaled cell (negligible signature distortion)
        feat[0, -1] = frame_id / 1000.0
        pos = np.zeros((4, 2), np.int32)
        return jnp.asarray(feat)[None], jnp.asarray(pos)[None]

    def _frame_id_from_feat(self, feat_row) -> int:
        return int(round(float(feat_row[0, -1]) * 1000.0))

    def _view(self, fid: int):
        """World points in camera `fid`'s frame."""
        T = jnp.asarray(self.poses[fid])
        X = lie.sim3_act(lie.sim3_inv(T)[None], jnp.asarray(self.P))
        if self.noise > 0:
            X = X + self._rng.normal(size=X.shape).astype(np.float32) * self.noise
        return X

    def _visibility_q(self, X_cam) -> np.ndarray:
        """Per-point desc-confidence from frustum visibility in the viewing
        camera — the physical reason keyframe selection fires as the view
        drifts (a real net can't match content it can't see)."""
        from tests.fixtures import camera_K

        K = np.asarray(camera_K(self.h, self.w))
        X = np.asarray(X_cam)
        z = np.maximum(X[:, 2], 1e-6)
        u = K[0, 0] * X[:, 0] / z + K[0, 2]
        v = K[1, 1] * X[:, 1] / z + K[1, 2]
        vis = (X[:, 2] > 0) & (u >= 0) & (u < self.w) & (v >= 0) & (v < self.h)
        return np.where(vis, 4.0, 0.5).astype(np.float32)

    def decode(self, f1, pos1, f2, pos2):
        B = f1.shape[0]
        outs1, outs2 = [], []
        for b in range(B):
            id1 = self._frame_id_from_feat(f1[b])
            id2 = self._frame_id_from_feat(f2[b])
            X1_in_1 = self._view(id1)  # view 1 points, view-1 frame
            # view-2 points expressed in view-1's frame: same world points
            # (identical pixel ordering), so ALSO T1^-1 P (+ noise redraw)
            X2_in_1 = self._view(id1)
            h, w = self.h, self.w
            d = self.desc.shape[-1]
            mk = lambda X, q: {
                "pts3d": X.reshape(1, h, w, 3),
                "conf": jnp.full((1, h, w), 5.0),
                "desc": jnp.asarray(self.desc).reshape(1, h, w, d),
                "desc_conf": jnp.asarray(q).reshape(1, h, w),
            }
            # visibility: view-2's content must be visible in BOTH cameras
            # for the cross prediction to be confident
            q1 = self._visibility_q(X1_in_1)
            q2 = np.minimum(
                self._visibility_q(X2_in_1), self._visibility_q(self._view(id2))
            )
            outs1.append(mk(X1_in_1, q1))
            outs2.append(mk(X2_in_1, q2))
        cat = lambda outs: {
            k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
        }
        return cat(outs1), cat(outs2)

    def mono(self, feat, pos):
        fid = self._frame_id_from_feat(feat)
        X = self._view(fid)
        return X.reshape(-1, 3), jnp.full((X.shape[0], 1), 5.0)

    def reconstruct(self, img1, img2):
        f1, p1 = self.encode(img1)
        f2, p2 = self.encode(img2)
        return self.decode(f1, p1, f2, p2)


def make_oracle_world(rng, n_frames: int, h: int, w: int, step: float = 0.02):
    """Smooth GT trajectory + surface; returns (model, poses_gt [F, 8])."""
    from tests.fixtures import camera_K, world_surface

    K = camera_K(h, w)
    P = world_surface(rng, h, w, K)
    poses = {0: np.asarray(lie.sim3_identity())}
    T = jnp.asarray(poses[0])
    for i in range(1, n_frames):
        xi = np.concatenate(
            [
                rng.normal(size=3) * step,
                rng.normal(size=3) * step * 0.5,
                rng.normal(size=1) * step * 0.1,
            ]
        ).astype(np.float32)
        T = lie.sim3_retract(T, jnp.asarray(xi))
        poses[i] = np.asarray(T)
    model = OracleModel(P, poses, h, w)
    return model, np.stack([poses[i] for i in range(n_frames)])
