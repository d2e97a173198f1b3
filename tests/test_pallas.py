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
