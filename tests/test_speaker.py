"""Golden parity: style encoder / GST / speaker embedding stack."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_util import ref_state_dict
from cosyvoice_tpu.models.speaker import (GlobalStyleTokensV2, SpeakerEmbedding,
                                          SpeakerEmbeddingConfig, StyleEncoderV2,
                                          import_speaker_embedding_torch,
                                          speaker_embed)


def test_style_encoder_parity(rng):
    from cosyvoice.speaker.style_encoder import StyleEncoder_v2 as Ref

    torch.manual_seed(0)
    ref = Ref(24, style_hidden=16, style_vector_dim=20, style_kernel_size=5,
              style_head=4, dropout=0.0, num_layers=2).eval()
    x = rng.standard_normal((2, 14, 24)).astype(np.float32)
    mask = np.ones((2, 1, 14), np.float32)
    mask[1, :, 10:] = 0
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(mask)).numpy()

    sd = ref_state_dict(ref)
    model = StyleEncoderV2(hidden=16, out_dim=20, kernel_size=5, heads=4,
                           num_layers=2)
    # reuse the importer path names via a minimal local mapping
    from cosyvoice_tpu.nn.conv import torch_conv_weight

    def dense(p):
        return {"kernel": jnp.asarray(sd[f"{p}.weight"]).T,
                "bias": jnp.asarray(sd[f"{p}.bias"])}

    params = {"in_fc": dense("in_fc.fc"), "fc": dense("fc.fc")}
    for i in range(2):
        params[f"spectral_{i}_0"] = dense(f"spectral_layers.{i}.0.fc")
        params[f"spectral_{i}_1"] = dense(f"spectral_layers.{i}.3.fc")
        for gi in range(2):
            params[f"glu_{i}_{gi}"] = {"conv1": {
                "kernel": torch_conv_weight(sd[f"temporal_layers.{i}.{gi}.conv1.conv.weight"]),
                "bias": jnp.asarray(sd[f"temporal_layers.{i}.{gi}.conv1.conv.bias"])}}
        params[f"attn_{i}"] = {k: dense(f"attn_layers.{i}.{k}")
                               for k in ("w_qs", "w_ks", "w_vs", "fc")}
    out_j = model.apply({"params": params}, jnp.asarray(x),
                        jnp.asarray(mask[:, 0].astype(bool)))
    np.testing.assert_allclose(np.asarray(out_j), out_ref, atol=2e-4, rtol=1e-3)


def test_gst_parity(rng):
    from cosyvoice.speaker.style_encoder import GlobalStyleTokens_v2 as Ref

    torch.manual_seed(0)
    ref = Ref(token_num=32, embed_dim=16, num_heads=4, num_layers=2).eval()
    x = rng.standard_normal((3, 16)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    sd = ref_state_dict(ref)
    params = {}
    for i in range(2):
        params[f"embed_{i}"] = jnp.asarray(sd[f"embeds.{i}"])
        params[f"attention_{i}"] = {
            k: {"kernel": jnp.asarray(sd[f"attentions.{i}.{k}.weight"]).T}
            for k in ("W_query", "W_key", "W_value")}
    model = GlobalStyleTokensV2(token_num=32, embed_dim=16, num_heads=4,
                                num_layers=2)
    out_j = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_ref, atol=2e-5, rtol=1e-4)


def test_speaker_embedding_pipeline(rng):
    """Full 512-d stack runs end-to-end from a waveform (shape/finiteness)."""
    cfg = SpeakerEmbeddingConfig()
    model = SpeakerEmbedding(cfg)
    wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    from cosyvoice_tpu.ops.kaldi import kaldi_fbank
    from cosyvoice_tpu.models.vits import linear_spectrogram
    from cosyvoice_tpu.runtime.frontend import resample_poly

    wav16 = resample_poly(wav, 24000, 16000)
    fb = kaldi_fbank(jnp.asarray(wav16))
    fb = (fb - fb.mean(0, keepdims=True))[None]
    spec = linear_spectrogram(jnp.asarray(wav)[None], 1024, 300, 1024)
    variables = model.init(jax.random.PRNGKey(0), fb, spec,
                           jnp.asarray([spec.shape[1]]), jax.random.PRNGKey(1))
    emb = speaker_embed(model, variables, wav, jax.random.PRNGKey(2))
    assert emb.shape == (512,)
    assert np.isfinite(emb).all()
