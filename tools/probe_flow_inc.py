"""Attribute the incremental flow chunk's steady-state cost (r5).

The engine profile showed flow_slots_chunk at ~242 ms (M=100 tokens) /
~363 ms (M=200) steady state at 8 slots — far above the ~30-40 ms the
estimator matmuls account for.  This probe times the pieces in isolation
at bench shapes: full chunk, encoder-only, estimator-scan-only, and the
encoder with the rel-pos bd term suspected dominant (it scores every query
against the FULL static-capacity espnet table: 2*756-1 cols at token rate,
2*1512-1 at mel rate, every flush).

Usage: python tools/probe_flow_inc.py [slots] [M]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from cosyvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses
    from functools import partial

    from cosyvoice_tpu.models import flow_chunk as FC
    from cosyvoice_tpu.models.flow import CausalMaskedDiffWithXvec, FlowConfig
    from cosyvoice_tpu.utils.dtype import to_bf16

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    fused = len(sys.argv) <= 3 or sys.argv[3] != "nofuse"
    cap = 756
    flow_cfg = FlowConfig()
    flow_cfg = dataclasses.replace(
        flow_cfg, encoder_dtype="bfloat16",
        estimator=dataclasses.replace(
            flow_cfg.estimator, stream=True, left_chunks=2,
            static_chunk_size=50, dtype="bfloat16", approx_gelu=True,
            fused_norm=fused))
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    rng = np.random.default_rng(0)
    k = jax.random.PRNGKey(0)
    psp1 = jnp.asarray(rng.integers(0, 6561, (1, 50)))
    params = flow.init(k, psp1, jnp.asarray([50]), jnp.zeros((1, 20, 80)),
                       jnp.zeros((1, 192)),
                       method=CausalMaskedDiffWithXvec.inference)
    params = to_bf16(params)

    state = FC.init_state(flow_cfg, S, cap, dtype=jnp.bfloat16,
                          est_dtype=jnp.bfloat16)
    state = state._replace(anchor=jnp.full((S,), 50, jnp.int32),
                           tok_pos=jnp.full((S,), 150, jnp.int32))
    tokens = jnp.asarray(rng.integers(0, 6561, (S, M)), jnp.int32)
    ctx = jnp.asarray(rng.integers(0, 6561, (S, 3)), jnp.int32)
    cl = jnp.full((S,), 3, jnp.int32)
    nv = jnp.full((S,), M, jnp.int32)
    emb = jnp.asarray(rng.standard_normal((S, 192)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((S, 2 * M, 80)).astype(np.float32))
    pfeat = jnp.zeros((S, 1, 80))
    pfl = jnp.zeros((S,), jnp.int32)

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32))))
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = fn(*args)
            float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32))))
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1e3:.0f} ms (min of 5)", flush=True)
        return out

    # 1) full chunk
    from functools import partial as _p

    @_p(jax.jit, static_argnames=("ragged",))
    def full_chunk(params, state, tokens, ctx, cl, nv, pfeat, pfl, emb, z,
                   ragged=True):
        return flow.apply(params, tokens, ctx, pfeat, pfl, emb, nv, cl,
                          state, z, first=False, ragged_tail=ragged,
                          method=FC.flow_chunk)

    timeit(f"full chunk S={S} M={M}", full_chunk, params, state, tokens,
           ctx, cl, nv, pfeat, pfl, emb, noise)
    timeit(f"full chunk static-roll S={S} M={M}",
           _p(full_chunk, ragged=False), params, state, tokens,
           ctx, cl, nv, pfeat, pfl, emb, noise)

    # 2) encoder only
    @jax.jit
    def enc_only(params, state, tokens, ctx, cl, nv):
        def m(mdl, tokens, ctx, cl, nv, state):
            mu, v2, new = FC.encoder_chunk(mdl, tokens, ctx, cl, nv, state)
            return mu
        return flow.apply(params, tokens, ctx, cl, nv, state, method=m)

    timeit(f"encoder only S={S} M={M}", enc_only, params, state, tokens,
           ctx, cl, nv)

    # 3) estimator scan only (mu/cond fixed)
    mu = jnp.asarray(rng.standard_normal((S, 2 * M, 80)).astype(np.float32))

    @jax.jit
    def est_only(params, state, mu, emb, nv, z):
        def m(mdl, mu, emb, nv, state, z):
            import flax.linen as nn

            from cosyvoice_tpu.models.flow import cosine_t_span
            cfm = mdl.decoder
            est = cfm.estimator
            B, N = mu.shape[0], mu.shape[1]
            spks = mdl.spk_embed_affine_layer(emb)
            valid2 = jnp.ones((B, N), bool)
            mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
            spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
            cond2 = jnp.zeros((2 * B, N, 80), mu.dtype)
            mask2 = jnp.ones((2 * B, N), mu.dtype)
            pos2 = jnp.tile(2 * state.tok_pos, 2)
            nv2 = jnp.tile(2 * nv, 2)
            anchor2 = jnp.tile(2 * state.anchor, 2)
            R = state.est_kv.shape[3]
            cdt = jnp.bfloat16
            bias2 = FC._est_bias(pos2, nv2, N, R, anchor2,
                                 est.cfg.static_chunk_size,
                                 est.cfg.left_chunks, cdt)
            t_span = cosine_t_span(cfm.cfg.n_timesteps, mu.dtype)
            ts_, dts = t_span[:-1], t_span[1:] - t_span[:-1]
            r = cfm.cfg.inference_cfg_rate
            x = z.astype(mu.dtype)

            def step(mdl_, x, scan_in):
                t, dt, kv_s, conv_s = scan_in
                est_ = mdl_.decoder.estimator
                t_emb = est_.time_embed(jnp.full((2 * B,), t, mu.dtype), cdt)
                x2 = jnp.concatenate([x, x], axis=0)
                v, kv_rows, conv_rows = FC.estimator_step(
                    est_, x2, mu2, t_emb, spks2, cond2, mask2, bias2, kv_s,
                    conv_s)
                dphi = (1.0 + r) * v[:B] - r * v[B:]
                kv_s = jax.vmap(FC.roll_rows, in_axes=(0, 0, None))(
                    kv_s, kv_rows.astype(kv_s.dtype), nv2)
                conv_s = {kk: FC.tail_rows(conv_rows[kk].astype(
                    conv_s[kk].dtype), nv2, 2) for kk in conv_s}
                return x + dt * dphi, (kv_s, conv_s)

            scan = nn.scan(step, variable_broadcast="params",
                           split_rngs={"params": False}, in_axes=0,
                           out_axes=0)
            mel, _ = scan(mdl, x, (ts_, dts, state.est_kv, state.est_conv))
            return mel
        return flow.apply(params, mu, emb, nv, state, z, method=m)

    timeit(f"estimator scan only S={S} M={M}", est_only, params, state, mu,
           emb, nv, noise)


if __name__ == "__main__":
    main()
