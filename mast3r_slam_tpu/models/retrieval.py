"""Retrieval model: whitened, attention-weighted global signatures.

The upstream system uses ASMK retrieval over MASt3R encoder features; the
reference reduced this to a global-signature model with the contract
`forward_features(feat) -> (whitened, attention)` and
`forward_global(feat) -> signature` (mast3r_utils.py:681-715). This module
implements that contract natively (learnable whitening + attention head);
weights load via models/io.py when available, else whitening initializes to
identity — which degrades gracefully to the reference's "simple retrieval"
(mean-pool + L2, mast3r_utils.py:705-715).

The database half (preallocated signature matrix + device-side top-k) lives
in retrieval_db.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class RetrievalNet(nn.Module):
    """Whitening projector + token attention + aggregation."""

    backbone_dim: int = 1024
    out_dim: int = 1024

    @nn.compact
    def __call__(self, feat: jax.Array):
        """feat: [..., N, D] backbone tokens -> (whitened [..., N, D'],
        attention [..., N, 1], signature [..., D'])."""
        # Whitening: affine map initialized to identity (PCA-whitening slot).
        w = nn.Dense(
            self.out_dim,
            kernel_init=_eye_init,
            bias_init=nn.initializers.zeros,
            name="whiten",
        )(feat)
        # Attention: positive per-token weight from feature energy.
        att_logit = nn.Dense(1, name="attention")(w)
        att = nn.softplus(att_logit) + 1e-6
        sig = jnp.sum(w * att, axis=-2) / jnp.sum(att, axis=-2)
        # Post-aggregation whitening slot (upstream naver retrieval applies
        # a second Whitener to the aggregated descriptor; identity when no
        # checkpoint is loaded, so the unfitted forward is unchanged).
        sig = nn.Dense(
            self.out_dim,
            kernel_init=_eye_init,
            bias_init=nn.initializers.zeros,
            name="postwhiten",
        )(sig)
        sig = sig / jnp.maximum(jnp.linalg.norm(sig, axis=-1, keepdims=True), 1e-8)
        return w, att, sig


def _eye_init(key, shape, dtype=jnp.float32):
    out = jnp.zeros(shape, dtype)
    n = min(shape)
    return out.at[jnp.arange(n), jnp.arange(n)].set(1.0)


class RetrievalModel:
    """Wrapper exposing the reference's RetrievalModel surface."""

    def __init__(self, backbone_dim: int = 1024, out_dim: int | None = None, seed=0):
        self.net = RetrievalNet(backbone_dim, out_dim or backbone_dim)
        feat = jnp.zeros((1, backbone_dim), jnp.float32)
        self.params = jax.jit(self.net.init)(jax.random.PRNGKey(seed), feat)
        self._apply = jax.jit(lambda p, f: self.net.apply(p, f))

    @classmethod
    def from_pretrained(cls, backbone_dim: int = 1024, checkpoint: str | None = None):
        """Build the head; with `checkpoint`, load a naver retrieval .pth
        (prewhiten/projector/attention/postwhiten — folded via
        io.import_retrieval_state_dict) or a generic state dict targeting
        our param names directly."""
        model = cls(backbone_dim)
        if checkpoint:
            from mast3r_slam_tpu.models import io

            state = io.load_state_dict_file(checkpoint)
            if io.is_retrieval_state_dict(state):
                model.params = io.import_retrieval_state_dict(
                    model.params, state
                )
            else:
                model.params = io.import_torch_state_dict(model.params, state)
        return model

    def forward_features(self, feat: jax.Array):
        w, att, _ = self._apply(self.params, feat)
        return w, att

    def forward_global(self, feat: jax.Array) -> jax.Array:
        _, _, sig = self._apply(self.params, feat)
        return sig

    def fit_whitening(self, feats: jax.Array) -> None:
        """Learn the whitening affine from accumulated local features
        (PCA-whitening, models/asmk.py) — the online substitute for the
        upstream pretrained whitening when no checkpoint is available.
        `feats`: [M, D] stacked token features from the first keyframes."""
        import flax

        from mast3r_slam_tpu.models.asmk import pca_whitening

        out_dim = self.net.out_dim
        mu, W = pca_whitening(feats.astype(jnp.float32), out_dim)
        params = flax.core.unfreeze(self.params)
        params["params"]["whiten"]["kernel"] = W
        params["params"]["whiten"]["bias"] = -(mu @ W)
        self.params = flax.core.freeze(params) if isinstance(
            self.params, flax.core.FrozenDict
        ) else params
