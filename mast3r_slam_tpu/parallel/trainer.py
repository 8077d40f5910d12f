"""Training driver: loop, synthetic data, checkpoint/resume, CLI.

`parallel/train.py` provides the sharded train STEP (losses + jit over the
(dp, tp) mesh); this module makes it runnable end to end:

* `synthetic_pair_batch` — geometrically consistent two-view pairs (smooth
  random surface, normal-map renderings, identity GT correspondences) so
  the loop has a learnable objective without any dataset in the image
  (this environment has no egress; a real-data loader plugs in as any
  callable `batch_fn(step) -> batch dict` with the `mast3r_loss` keys).
* `save_train_ckpt` / `load_train_ckpt` — npz checkpoints of the full
  (params, opt_state, step) pytrees in flatten order (the same
  structure-stable approach as utils/snapshot.py), resharded on restore.
* `train_loop` — steps the optimizer, logs losses, saves periodically,
  resumes from an existing checkpoint.
* CLI: `python -m mast3r_slam_tpu.parallel.trainer --steps 3 --devices 8`
  runs the tiny model on a virtual CPU mesh (the same validation surface
  as the driver's multichip dryrun); real weights + real chips use the
  same path with `--resolution 512` and a checkpoint.

Reference contrast: the reference repo has no training at all (inference
wrapper around released weights); this is a beyond-reference capability.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Callable

import numpy as np


def synthetic_pair_batch(rng: np.random.Generator, b: int, h: int, w: int, m: int):
    """Geometric two-view pairs: a smooth random surface rendered as its
    normal map, second view lightly perturbed; GT pointmaps co-registered
    in view-1's frame; correspondences = a random pixel sample (identity
    pairing — the views are co-registered by construction)."""
    import jax.numpy as jnp

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    xs = (xs - w / 2) / max(w, 1)
    ys = (ys - h / 2) / max(h, 1)

    imgs1, imgs2, pts = [], [], []
    for _ in range(b):
        a1, a2 = rng.uniform(2, 6, 2)
        p1, p2 = rng.uniform(0, 2 * np.pi, 2)
        z = 2.0 + 0.4 * np.sin(a1 * xs + p1) * np.cos(a2 * ys + p2)
        X = np.stack([xs * z, ys * z, z], -1)  # [H, W, 3]
        # normal-map rendering: finite-difference normals -> RGB in [-1, 1]
        gx = np.gradient(z, axis=1)
        gy = np.gradient(z, axis=0)
        nrm = np.stack([-gx, -gy, np.ones_like(z)], -1)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        img = nrm.astype(np.float32)
        imgs1.append(img + rng.normal(0, 0.02, img.shape).astype(np.float32))
        imgs2.append(img + rng.normal(0, 0.02, img.shape).astype(np.float32))
        pts.append(X.astype(np.float32))

    n = h * w
    idx = np.stack([rng.choice(n, size=m, replace=False) for _ in range(b)])
    pts = np.stack(pts)
    return dict(
        img1=jnp.asarray(np.stack(imgs1)),
        img2=jnp.asarray(np.stack(imgs2)),
        gt_pts1=jnp.asarray(pts),
        gt_pts2=jnp.asarray(pts),  # co-registered: both in view-1's frame
        valid1=jnp.ones((b, h, w), bool),
        valid2=jnp.ones((b, h, w), bool),
        corr_idx1=jnp.asarray(idx, jnp.int32),
        corr_idx2=jnp.asarray(idx, jnp.int32),
        corr_valid=jnp.ones((b, m), bool),
    )


def save_train_ckpt(path, params, opt_state, step: int) -> None:
    """npz of all (params, opt_state) leaves in flatten order + step."""
    import jax

    leaves_p = jax.tree_util.tree_leaves(params)
    leaves_o = [
        x for x in jax.tree_util.tree_leaves(opt_state)
        if hasattr(x, "shape")
    ]
    arrays = {f"p{i}": np.asarray(x) for i, x in enumerate(leaves_p)}
    arrays.update({f"o{i}": np.asarray(x) for i, x in enumerate(leaves_o)})
    arrays["step"] = np.asarray(step)
    tmp = str(path) + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    Path(tmp).rename(path)


def load_train_ckpt(path, params_like, opt_state_like):
    """Restore (params, opt_state, step) into the LIKE trees' structure and
    shardings (device_put to each like-leaf's sharding)."""
    import jax

    z = np.load(path)
    step = int(z["step"])

    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    def restore(like_tree, prefix):
        leaves, treedef = jax.tree_util.tree_flatten(like_tree)
        out, i = [], 0
        for leaf in leaves:
            if hasattr(leaf, "shape"):
                arr = z[f"{prefix}{i}"].astype(leaf.dtype)
                assert arr.shape == leaf.shape, (
                    f"ckpt leaf {prefix}{i} shape {arr.shape} != {leaf.shape}"
                )
                if isinstance(getattr(leaf, "sharding", None), NamedSharding):
                    out.append(jax.device_put(arr, leaf.sharding))
                else:
                    # e.g. optimizer step counters: keep UNCOMMITTED (a
                    # committed single-device scalar conflicts with the
                    # mesh-sharded params inside the jitted step)
                    out.append(jnp.asarray(arr))
                i += 1
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    return restore(params_like, "p"), restore(opt_state_like, "o"), step


def train_loop(
    net,
    params,
    mesh,
    steps: int,
    batch_fn: Callable[[int], dict],
    learning_rate: float = 1e-4,
    ckpt_path: str | None = None,
    save_every: int = 0,
    log: Callable[[str], None] = lambda s: print(s, file=sys.stderr),
):
    """Run `steps` sharded train steps; resume from `ckpt_path` if present.

    Returns (params, losses list). Parameters shard tensor-parallel over
    the mesh's 'tp' axis, batches over 'dp' (see train.py)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mast3r_slam_tpu.parallel.sharding import shard_params
    from mast3r_slam_tpu.parallel.train import make_train_step

    opt = optax.adamw(learning_rate)
    params = shard_params(params, mesh)
    # Donation-safe: the train step donates (params, opt_state); never hand
    # it the caller's buffers (a second train_loop on the same params would
    # otherwise hit deleted arrays). jnp.copy preserves shardings.
    params = jax.tree.map(jnp.copy, params)
    opt_state = opt.init(params)
    start = 0
    if ckpt_path and Path(ckpt_path).exists():
        params, opt_state, start = load_train_ckpt(ckpt_path, params, opt_state)
        log(f"[train] resumed from {ckpt_path} at step {start}")

    step_fn = make_train_step(net, opt, mesh, params)
    dp = NamedSharding(mesh, P("dp"))
    losses = []
    for i in range(start, steps):
        batch = jax.tree.map(lambda x: jax.device_put(x, dp), batch_fn(i))
        params, opt_state, loss, aux = step_fn(params, opt_state, batch)
        loss = float(loss)
        assert np.isfinite(loss), f"non-finite loss at step {i}"
        losses.append(loss)
        log(
            f"[train] step {i} loss={loss:.4f} "
            f"regr={float(aux['regr']):.4f} match={float(aux['match']):.4f}"
        )
        if ckpt_path and save_every and (i + 1) % save_every == 0:
            save_train_ckpt(ckpt_path, params, opt_state, i + 1)
    if ckpt_path:
        save_train_ckpt(ckpt_path, params, opt_state, steps)
    return params, losses


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=0, help="0 = 2 per dp shard")
    ap.add_argument("--devices", type=int, default=0,
                    help="force an N-device virtual CPU mesh (0 = real devices)")
    ap.add_argument("--tp", type=int, default=0, help="tensor-parallel axis (0 = auto)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--ckpt", default="", help="checkpoint path (resume if exists)")
    ap.add_argument("--save-every", type=int, default=0)
    ap.add_argument("--resolution", type=int, default=0,
                    help="full model resolution (0 = tiny test model)")
    ap.add_argument("--weights", default="", help="initial checkpoint (safetensors/npz)")
    args = ap.parse_args(argv)

    if args.devices:
        import __graft_entry__ as ge

        ge._force_cpu_mesh(args.devices)

    from mast3r_slam_tpu.models.mast3r import MASt3RNet
    from mast3r_slam_tpu.parallel.mesh import make_mesh

    if args.resolution:
        from mast3r_slam_tpu.models import MASt3RModel

        model = MASt3RModel.create(
            resolution=args.resolution,
            checkpoint=args.weights or None,
        )
    else:
        import __graft_entry__ as ge

        model = ge._tiny_model()

    import jax

    n = jax.local_device_count()
    mesh = make_mesh(n, tp=args.tp) if args.tp else make_mesh(n)
    h, w = model._out_hw
    b = args.batch or 2 * mesh.shape["dp"]
    rng = np.random.default_rng(0)
    net = MASt3RNet(model.cfg)
    _, losses = train_loop(
        net, model.params, mesh, args.steps,
        lambda i: synthetic_pair_batch(rng, b, h, w, m=16),
        learning_rate=args.lr,
        ckpt_path=args.ckpt or None,
        save_every=args.save_every,
    )
    print(f"final loss {losses[-1]:.4f} over {len(losses)} steps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
