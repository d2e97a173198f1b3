"""GAN training steps for the vocoders (HiFT / BigVGAN).

Behavioral spec: reference `cosyvoice/hifigan/hifigan.py` —
forward_generator:35-78 (adversarial + 2.0x feature-match + 45x multi-mel L1
+ 1.0x TPR (tau .04) + f0 L1 + BigVGAN mel-recon) and
forward_discriminator:80-103 (LSGAN + TPR), alternated per batch by
`utils/executor.py:84-140`.

TPU-native: two jitted steps sharing one generator forward graph each;
the generator runs under stop_gradient inside the discriminator step
(the reference's torch.no_grad()).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from cosyvoice_tpu.models.discriminator import (discriminator_loss, feature_loss,
                                                generator_loss, mel_l1_loss,
                                                tpr_loss)
from cosyvoice_tpu.train.step import TrainState


@dataclass(frozen=True)
class GanLossWeights:
    mel: float = 45.0
    feat_match: float = 2.0
    tpr: float = 1.0
    tpr_tau: float = 0.04


def make_gan_loss_fns(generator_apply: Callable, discriminator_apply: Callable,
                      mel_transforms: Sequence[Callable],
                      weights: GanLossWeights = GanLossWeights()):
    """generator_apply(g_params, batch, rng) -> (wav, aux) where aux is f0
    [B, T] (HiFT), aux-mel (BigVGAN) or None;
    discriminator_apply(d_params, real, fake) -> (y_d_rs, y_d_gs, fmap_rs, fmap_gs).
    """

    def generator_loss_fn(g_params, d_params, batch, rng):
        real = batch["speech"]
        fake, aux = generator_apply(g_params, batch, rng)
        fake = fake[:, : real.shape[-1]]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = discriminator_apply(d_params, real, fake)
        loss_gen = generator_loss(y_d_gs)
        loss_fm = feature_loss(fmap_rs, fmap_gs)
        loss_mel = mel_l1_loss(real, fake, mel_transforms)
        loss_tpr = (tpr_loss(y_d_rs, y_d_gs, weights.tpr_tau)
                    if weights.tpr > 0 else 0.0)
        loss_f0 = 0.0
        if aux is not None and "pitch_feat" in batch:
            loss_f0 = jnp.mean(jnp.abs(aux - batch["pitch_feat"]))
        loss_mel_recon = 0.0
        if aux is not None and "speech_feat" in batch and aux.ndim == 3:
            T = min(aux.shape[1], batch["speech_feat"].shape[1])
            loss_mel_recon = jnp.mean(
                (aux[:, :T] - batch["speech_feat"][:, :T]) ** 2)
        loss = (loss_gen + weights.feat_match * loss_fm + weights.mel * loss_mel
                + weights.tpr * loss_tpr + loss_f0 + loss_mel_recon)
        return loss, {"loss_gen": loss_gen, "loss_fm": loss_fm,
                      "loss_mel": loss_mel, "loss_tpr": loss_tpr,
                      "loss_f0": loss_f0, "loss_mel_recon": loss_mel_recon}

    def discriminator_loss_fn(d_params, g_params, batch, rng):
        real = batch["speech"]
        fake, _ = generator_apply(g_params, batch, rng)
        fake = jax.lax.stop_gradient(fake[:, : real.shape[-1]])
        y_d_rs, y_d_gs, _, _ = discriminator_apply(d_params, real, fake)
        loss_disc = discriminator_loss(y_d_rs, y_d_gs)
        loss_tpr = (tpr_loss(y_d_rs, y_d_gs, weights.tpr_tau)
                    if weights.tpr > 0 else 0.0)
        loss = loss_disc + weights.tpr * loss_tpr
        return loss, {"loss_disc": loss_disc, "loss_tpr_d": loss_tpr}

    return generator_loss_fn, discriminator_loss_fn


def make_vits_loss_fns(generator_apply: Callable, discriminator_apply: Callable,
                       mel_transforms: Sequence[Callable],
                       hop_length: int, segment_size: int,
                       weights: GanLossWeights = GanLossWeights(),
                       kl_weight: float = 1.0):
    """VITS branch of the reference GAN wrapper (`hifigan/hifigan.py:35-78`):
    the generator emits a random SLICE of audio + posterior stats; the real
    side is the matching slice of ground-truth speech, and a KL term between
    the prior and the flowed posterior is added.

    generator_apply(g_params, batch, rng) -> (wav_slice,
        (ids, x_mask, y_mask, z, z_p, m_p, logs_p, m_q, logs_q))
    (the `VitsDecoder.__call__` return contract).
    """

    def _slices(batch, ids):
        return jax.vmap(lambda w, s: jax.lax.dynamic_slice_in_dim(
            w, s * hop_length, segment_size, axis=0))(batch["speech"], ids)

    def generator_loss_fn(g_params, d_params, batch, rng):
        fake, (ids, _, y_mask, _, z_p, m_p, logs_p, _, logs_q) = \
            generator_apply(g_params, batch, rng)
        real = _slices(batch, ids)
        fake = fake[:, : real.shape[-1]]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = discriminator_apply(d_params, real, fake)
        loss_gen = generator_loss(y_d_gs)
        loss_fm = feature_loss(fmap_rs, fmap_gs)
        loss_mel = mel_l1_loss(real, fake, mel_transforms)
        loss_tpr = (tpr_loss(y_d_rs, y_d_gs, weights.tpr_tau)
                    if weights.tpr > 0 else 0.0)
        from cosyvoice_tpu.models.vits import vits_kl_loss
        loss_kl = vits_kl_loss(z_p, logs_q, m_p, logs_p, y_mask)
        loss = (loss_gen + weights.feat_match * loss_fm + weights.mel * loss_mel
                + weights.tpr * loss_tpr + kl_weight * loss_kl)
        return loss, {"loss_gen": loss_gen, "loss_fm": loss_fm,
                      "loss_mel": loss_mel, "loss_tpr": loss_tpr,
                      "loss_kl": loss_kl}

    def discriminator_loss_fn(d_params, g_params, batch, rng):
        fake, (ids, *_) = generator_apply(g_params, batch, rng)
        real = _slices(batch, ids)
        fake = jax.lax.stop_gradient(fake[:, : real.shape[-1]])
        y_d_rs, y_d_gs, _, _ = discriminator_apply(d_params, real, fake)
        loss_disc = discriminator_loss(y_d_rs, y_d_gs)
        loss_tpr = (tpr_loss(y_d_rs, y_d_gs, weights.tpr_tau)
                    if weights.tpr > 0 else 0.0)
        loss = loss_disc + weights.tpr * loss_tpr
        return loss, {"loss_disc": loss_disc, "loss_tpr_d": loss_tpr}

    return generator_loss_fn, discriminator_loss_fn


def make_gan_steps(generator_loss_fn, discriminator_loss_fn,
                   tx_g: optax.GradientTransformation,
                   tx_d: optax.GradientTransformation):
    """Returns (g_step, d_step) matching GanExecutor's calling convention:
    g_step(g_state, (d_params, batch), rng); d_step(d_state, g_params, batch, rng)."""

    @jax.jit
    def g_step(g_state: TrainState, d_params_batch, rng):
        d_params, batch = d_params_batch

        def lf(p):
            return generator_loss_fn(p, d_params, batch, rng)

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(g_state.params)
        updates, opt_state = tx_g.update(grads, g_state.opt_state, g_state.params)
        params = optax.apply_updates(g_state.params, updates)
        return (TrainState(params, opt_state, g_state.step + 1),
                dict(metrics, loss=loss, grad_norm=optax.global_norm(grads)))

    @jax.jit
    def d_step(d_state: TrainState, g_params, batch, rng):
        def lf(p):
            return discriminator_loss_fn(p, g_params, batch, rng)

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(d_state.params)
        updates, opt_state = tx_d.update(grads, d_state.opt_state, d_state.params)
        params = optax.apply_updates(d_state.params, updates)
        return (TrainState(params, opt_state, d_state.step + 1),
                dict(metrics, loss=loss))

    return g_step, d_step
