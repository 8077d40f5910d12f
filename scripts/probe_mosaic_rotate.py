"""Probe which shift mechanisms this Mosaic toolchain supports on-chip.

Each case compiles a tiny Pallas kernel exercising one mechanism the dense
matcher could be built on. Prints OK / FAIL(reason head) per case so the
kernel design can target what the installed compiler actually lowers.
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        float(jnp.asarray(out).ravel()[0])
        print(f"{name}: OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def _mk(kernel, out_sd, *args):
    return pl.pallas_call(kernel, out_shape=out_sd)(*args)


def case_dyn_rot_2d_f32():
    def k(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)

    x = jnp.ones((8, 256), jnp.float32)
    s = jnp.array([3], jnp.int32)
    return pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
    )(s, x)


def case_dyn_rot_2d_bf16():
    def k(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)

    x = jnp.ones((16, 256), jnp.bfloat16)
    s = jnp.array([3], jnp.int32)
    return pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.bfloat16),
    )(s, x)


def case_dyn_rot_3d_f32():
    def k(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=2)

    x = jnp.ones((3, 8, 256), jnp.float32)
    s = jnp.array([3], jnp.int32)
    return pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((3, 8, 256), jnp.float32),
    )(s, x)


def case_dyn_rot_3d_bf16_aligned():
    def k(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=2)

    x = jnp.ones((3, 16, 256), jnp.bfloat16)
    s = jnp.array([3], jnp.int32)
    return pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((3, 16, 256), jnp.bfloat16),
    )(s, x)


def case_static_unaligned_slice_bf16():
    # 169-tap design needs: static sublane offset (rows) + static lane
    # offset (cols), both unaligned — per-tap static slices.
    def k(x_ref, o_ref):
        acc = jnp.zeros((16, 128), jnp.float32)
        for du in (0, 3, 7):  # static unaligned lane offsets
            acc = acc + x_ref[5 : 5 + 16, du : du + 128].astype(jnp.float32)
        o_ref[:] = acc

    x = jnp.ones((40, 256), jnp.bfloat16)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32)
    )(x)


def case_static_rot_bf16():
    # Static roll amounts (python ints) — lowers to tpu.rotate, not
    # dynamic_rotate.
    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 5, axis=1)

    x = jnp.ones((16, 256), jnp.bfloat16)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 256), jnp.bfloat16)
    )(x)


def main():
    print(f"backend={jax.default_backend()}")
    for name, fn in [
        ("dyn_rot_2d_f32", case_dyn_rot_2d_f32),
        ("dyn_rot_2d_bf16", case_dyn_rot_2d_bf16),
        ("dyn_rot_3d_f32", case_dyn_rot_3d_f32),
        ("dyn_rot_3d_bf16_aligned", case_dyn_rot_3d_bf16_aligned),
        ("static_unaligned_slice_bf16", case_static_unaligned_slice_bf16),
        ("static_rot_bf16", case_static_rot_bf16),
    ]:
        probe(name, fn)
    return 0


if __name__ == "__main__":
    sys.exit(main())
