"""Flash attention kernel parity (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.ops.attention import (
    attention_reference,
    attention_xla,
    flash_attention,
)


@pytest.mark.parametrize("sq,skv,d", [(768, 768, 64), (432, 768, 64)])
def test_xla_path_matches_reference(rng, sq, skv, d):
    """The short-sequence dispatch target (ViT regime) vs the f32 oracle."""
    b, h = 2, 4
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, skv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)).astype(np.float32))
    out_ref = attention_reference(q, k, v)
    out = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5)


def test_xla_path_bf16(rng):
    """bf16 inputs: f32 accumulation keeps the error in the bf16 band."""
    b, h, s, d = 1, 4, 256, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    out_ref = attention_reference(q, k, v)
    out = attention_xla(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=3e-2)


@pytest.mark.parametrize("s,d", [(256, 64), (384, 64), (256, 128)])
def test_flash_matches_reference(rng, s, d):
    b, h = 2, 4
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    out_ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5)


@pytest.mark.parametrize("s", [432, 200])  # non-tiling lengths (DUNE: 432)
def test_flash_masked_padding(rng, s):
    b, h, d = 1, 2, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    out_ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5)


def test_flash_cross_lengths(rng):
    """Cross attention with Sq != Skv."""
    b, h, d = 1, 2, 64
    q = jnp.asarray(rng.normal(size=(b, h, 256, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, 384, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, 384, d)).astype(np.float32))
    out_ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5)


def test_flash_bf16(rng):
    b, h, s, d = 1, 2, 256, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
    out_ref = attention_reference(q, k, v).astype(jnp.float32)
    out = flash_attention(q, k, v, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=3e-2)
