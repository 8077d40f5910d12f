"""Subprocess body for tests/test_multihost.py — one distributed process.

Run as: python multihost_worker.py <port> <pid> <nproc> <outfile>

Each process forces the CPU backend with 2 local devices, joins the
process group, and validates the multi-host surface end-to-end:
  1. global mesh shape/locality (tp rows never cross a process),
  2. a psum spanning all hosts equals the analytic total,
  3. dp fan-out: host-local shards -> global array -> sharded compute ->
     back to host-local, equal to the local numpy oracle,
  4. broadcast_from_host0.
Results go to <outfile> as JSON; exit code 0 iff every check passed.
"""

import json
import os
import sys


def main() -> int:
    port, pid, nproc, outfile = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from mast3r_slam_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", nproc, pid)

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    res = {"pid": pid}

    # 1. Global mesh: nproc*2 devices, tp inside one process.
    mesh = multihost.make_global_mesh()
    res["mesh_shape"] = dict(mesh.shape)
    res["n_global"] = jax.device_count()
    res["n_local"] = jax.local_device_count()
    rows_local = [
        len({d.process_index for d in mesh.devices[i, :]})
        for i in range(mesh.devices.shape[0])
    ]
    res["tp_rows_single_process"] = all(r == 1 for r in rows_local)

    # 2. Cross-host psum: every device contributes (global_index + 1).
    def allsum(x):
        return jax.lax.psum(jax.lax.psum(x.sum(), "tp"), "dp")

    n_global = jax.device_count()
    contrib = np.arange(1.0, n_global + 1, dtype=np.float32)
    g = multihost.host_local_batch_to_global(
        contrib[pid * 2 : (pid + 1) * 2], mesh, P(("dp", "tp"))
    )
    with mesh:
        total = jax.jit(
            shard_map(allsum, mesh=mesh, in_specs=P(("dp", "tp")), out_specs=P())
        )(g)
    res["psum"] = float(jax.device_get(total))
    res["psum_expected"] = float(contrib.sum())

    # 3. dp fan-out round trip (the serving pattern): each host owns
    # dp_local sequences of an [B_global, 4, 3] batch.
    dp = mesh.shape["dp"]
    dp_local = dp // nproc
    x_local = (
        np.arange(dp_local * 12, dtype=np.float32).reshape(dp_local, 4, 3)
        + 100.0 * pid
    )
    xg = multihost.host_local_batch_to_global(x_local, mesh, P("dp"))

    @jax.jit
    def per_seq(v):
        v = jax.lax.with_sharding_constraint(
            v, jax.sharding.NamedSharding(mesh, P("dp"))
        )
        return (v * 2.0).sum(axis=(1, 2))

    yg = per_seq(xg)
    y_local = multihost.global_array_to_host_local(yg, mesh, P("dp"))
    res["fanout_ok"] = bool(
        np.allclose(np.asarray(y_local), (x_local * 2.0).sum(axis=(1, 2)))
    )

    # 4. Host-0 broadcast.
    val = multihost.broadcast_from_host0(np.float32(7.0 * pid + 3.0))
    res["broadcast"] = float(np.asarray(val))

    multihost.sync("done")
    ok = (
        res["n_global"] == nproc * 2
        and res["tp_rows_single_process"]
        and abs(res["psum"] - res["psum_expected"]) < 1e-5
        and res["fanout_ok"]
        and res["broadcast"] == 3.0
    )
    res["ok"] = bool(ok)
    with open(outfile, "w") as f:
        json.dump(res, f)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
