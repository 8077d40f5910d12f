"""MASt3R fine-tuning: confidence-weighted regression + descriptor losses,
sharded (dp, tp) training step.

Loss follows the DUSt3R/MASt3R training objectives (see PAPERS.md,
"Grounding Image Matching in 3D with MASt3R"):

* pointmap: confidence-weighted regression
    L_conf = sum conf * ||pts - gt|| - alpha * log(conf)
  (normalized-scale variant: both predictions and GT divided by their mean
  norm so scale-free scenes train stably)
* descriptors: InfoNCE over ground-truth pixel correspondences with
  temperature tau (MASt3R matching loss), applied on subsampled pixels.

The train step is jit-compiled with parameter shardings from
`sharding.infer_param_shardings` (tensor parallel) and batch sharding over
"dp" — the gradient reductions ride ICI via XLA collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mast3r_slam_tpu.models.mast3r import MASt3RNet


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def _normalized(pts: jax.Array, valid: jax.Array) -> jax.Array:
    """Scale-normalize pointmaps by mean valid-point distance."""
    d = jnp.linalg.norm(pts, axis=-1, keepdims=True)
    denom = jnp.sum(d * valid, axis=(1, 2, 3), keepdims=True) / jnp.maximum(
        jnp.sum(valid, axis=(1, 2, 3), keepdims=True), 1.0
    )
    return pts / jnp.maximum(denom, 1e-8)


def confidence_regression_loss(pred_pts, conf, gt_pts, valid, alpha: float = 0.2):
    """Per-view confidence-weighted pointmap loss."""
    v = valid.astype(pred_pts.dtype)[..., None]
    pn = _normalized(pred_pts, v)
    gn = _normalized(gt_pts, v)
    err = jnp.linalg.norm(pn - gn, axis=-1)  # [B, H, W]
    w = v[..., 0]
    per_px = conf * err - alpha * jnp.log(conf)
    return jnp.sum(per_px * w) / jnp.maximum(jnp.sum(w), 1.0)


def matching_infonce_loss(
    desc1, desc2, corr_idx1, corr_idx2, corr_valid, tau: float = 0.07
):
    """InfoNCE over sampled GT correspondences.

    desc1/2: [B, H, W, D]; corr_idx1/2: [B, M] flat pixel indices of
    corresponding pairs; corr_valid: [B, M].
    """
    b, h, w, d = desc1.shape
    f1 = jnp.take_along_axis(
        desc1.reshape(b, h * w, d), corr_idx1[..., None], axis=1
    )  # [B, M, D]
    f2 = jnp.take_along_axis(desc2.reshape(b, h * w, d), corr_idx2[..., None], axis=1)
    sim = jnp.einsum("bmd,bnd->bmn", f1, f2) / tau  # [B, M, M]
    labels = jnp.arange(sim.shape[1])
    v = corr_valid.astype(sim.dtype)
    ce_12 = optax.softmax_cross_entropy_with_integer_labels(sim, labels[None])
    ce_21 = optax.softmax_cross_entropy_with_integer_labels(
        jnp.swapaxes(sim, 1, 2), labels[None]
    )
    return jnp.sum((ce_12 + ce_21) * v) / jnp.maximum(jnp.sum(v), 1.0) * 0.5


def mast3r_loss(net: MASt3RNet, params, batch: dict, alpha=0.2, beta=1.0):
    """Total loss for a batch of view pairs.

    batch keys: img1, img2 [B,H,W,3] in [-1,1]; gt_pts1, gt_pts2 [B,H,W,3]
    (both in view-1 frame); valid1, valid2 [B,H,W]; corr_idx1, corr_idx2
    [B,M]; corr_valid [B,M].
    """
    out1, out2 = net.apply(params, batch["img1"], batch["img2"])
    l_regr = confidence_regression_loss(
        out1["pts3d"], out1["conf"], batch["gt_pts1"], batch["valid1"], alpha
    ) + confidence_regression_loss(
        out2["pts3d"], out2["conf"], batch["gt_pts2"], batch["valid2"], alpha
    )
    l_match = matching_infonce_loss(
        out1["desc"],
        out2["desc"],
        batch["corr_idx1"],
        batch["corr_idx2"],
        batch["corr_valid"],
    )
    return l_regr + beta * l_match, {"regr": l_regr, "match": l_match}


def make_train_step(
    net: MASt3RNet,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    params_example,
) -> Callable:
    """Build the sharded, jitted train step.

    Params/opt-state shard per tensor-parallel rules; batch shards over
    "dp" on the leading axis; loss/grads reduce across the mesh via the
    XLA collectives GSPMD inserts.
    """
    batch_sharding = NamedSharding(mesh, P("dp"))

    def step_fn(state_params, opt_state, batch):
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), batch
        )

        def loss_fn(p):
            loss, aux = mast3r_loss(net, p, batch)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state_params)
        updates, opt_state = optimizer.update(grads, opt_state, state_params)
        new_params = optax.apply_updates(state_params, updates)
        return new_params, opt_state, loss, aux

    # Shardings propagate from the inputs: callers pass params sharded by
    # `shard_params` (TP) and an opt_state built FROM those sharded params
    # (optax zeros_like inherits the sharding); GSPMD lays out the rest.
    return jax.jit(step_fn, donate_argnums=(0, 1))
