"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosyvoice_tpu.models.bigvgan import anti_alias_activation


def test_snake_aa_kernel_matches_xla_twin(rng, monkeypatch):
    from jax.experimental import pallas as pl
    import cosyvoice_tpu.ops.pallas.snake_aa as mod

    # run the kernel in interpreter mode on CPU
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **dict(k, interpret=True)))
    B, T, C = 2, 700, 24
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.3)
    want = np.asarray(anti_alias_activation(x, alpha, beta, logscale=True))
    got = np.asarray(mod.snake_aa_pallas(x, alpha, beta, logscale=True))
    # interior matches tightly; edges use x-replicate instead of u-replicate
    np.testing.assert_allclose(got[:, 8:-8], want[:, 8:-8], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)


def test_lm_decode_attention_matches_naive(rng):
    """Fused decode-attention kernel (interpret mode): output matches the
    XLA DUS+einsum reference math exactly (modulo output dtype rounding) and
    the cache windows are appended bit-exactly."""
    from cosyvoice_tpu.ops.pallas.lm_decode_attention import lm_decode_attention

    B, T, KH, G, D = 4, 256, 2, 7, 64
    KHD = KH * D
    scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.standard_normal((B, G, KHD)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((B, 1, KHD)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((B, 1, KHD)).astype(np.float32))
    ck = jnp.asarray(rng.standard_normal((B, T, KHD)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((B, T, KHD)).astype(np.float32))
    seq_len = jnp.asarray([40, 17, 76, 3], jnp.int32)
    Tp = 76
    for posv in (76, 135, 255):  # chunk 0 boundary, mid, last row
        pos = jnp.asarray(posv, jnp.int32)
        jrow = jnp.arange(T)[None, :]
        valid = (jrow < seq_len[:, None]) | ((jrow >= Tp) & (jrow <= pos))
        bias_row = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)

        ck2 = jax.lax.dynamic_update_slice(ck, kn, (0, posv, 0))
        cv2 = jax.lax.dynamic_update_slice(cv, vn, (0, posv, 0))
        k4 = ck2.reshape(B, T, KH, D)
        v4 = cv2.reshape(B, T, KH, D)
        q4 = q.reshape(B, G, KH, D)
        s = jnp.einsum("bgkd,btkd->bkgt", q4, k4) * scale
        s = s + bias_row[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1)
        o_ref = jnp.einsum("bkgt,btkd->bgkd", p, v4).reshape(B, G, KHD)

        o, cko, cvo = lm_decode_attention(q, kn, vn, ck, cv, bias_row, pos,
                                          head_dim=D, sm_scale=scale,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(cko), np.asarray(ck2))
        np.testing.assert_array_equal(np.asarray(cvo), np.asarray(cv2))


def test_lm_decode_attention_per_row_pos(rng):
    """Vector pos (continuous-batching engine): every row attends over and
    appends at its OWN frontier; matches per-row scalar-pos kernel calls."""
    from cosyvoice_tpu.ops.pallas.lm_decode_attention import lm_decode_attention

    B, T, KH, G, D = 4, 256, 2, 7, 64
    KHD = KH * D
    scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.standard_normal((B, G, KHD)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((B, 1, KHD)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((B, 1, KHD)).astype(np.float32))
    ck = jnp.asarray(rng.standard_normal((B, T, KHD)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((B, T, KHD)).astype(np.float32))
    pos = jnp.asarray([40, 17, 255, 128], jnp.int32)
    bias_row = jnp.zeros((B, T), jnp.float32)

    o, cko, cvo = lm_decode_attention(q, kn, vn, ck, cv, bias_row, pos,
                                      head_dim=D, sm_scale=scale, interpret=True)
    for b in range(B):
        ob, ckb, cvb = lm_decode_attention(
            q[b:b + 1], kn[b:b + 1], vn[b:b + 1], ck[b:b + 1], cv[b:b + 1],
            bias_row[b:b + 1], pos[b], head_dim=D, sm_scale=scale, interpret=True)
        np.testing.assert_allclose(np.asarray(o[b]), np.asarray(ob[0]),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(cko[b]), np.asarray(ckb[0]))
        np.testing.assert_array_equal(np.asarray(cvo[b]), np.asarray(cvb[0]))
