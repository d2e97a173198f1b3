"""cosyvoice_tpu — a TPU-native (JAX/XLA/Pallas) CosyVoice-style TTS framework.

Built from scratch against the behavioral spec of duj12/CosyVoice (see SURVEY.md):
text -> speech-token LLM (Qwen2-style AR transformer) -> conditional flow matching
(token -> mel) -> HiFT / BigVGAN vocoder (mel -> waveform), plus the training
runtime, streaming inference driver and frontend that surround them.

Design stance (TPU-first, not a port):
  * functional flax.linen modules; params are pytrees sharded with jax.sharding
  * static shapes everywhere: bucketed lengths, preallocated KV caches,
    lax.while_loop decode with done-masks
  * collectives are XLA ops over a Mesh(("data","model")) — no NCCL
  * hot ops (attention decode step, anti-alias snake, ODE step) have Pallas
    kernels with XLA reference twins for parity testing
"""

__version__ = "0.1.0"
