"""Minimal torch stand-ins for the diffusers/conformer APIs the reference
imports (neither package is installed here).

Only what `cosyvoice/flow/components/{transformer,decoder}.py` actually
exercises with the CosyVoice2 config (act_fn='gelu', plain layer_norm, no
cross-attention) is implemented faithfully:
  * Attention == diffusers.models.attention_processor.Attention with
    AttnProcessor2_0: to_q/to_k/to_v (bias=False), to_out=[Linear, Dropout],
    SDPA with a FLOAT attention_mask treated as an ADDITIVE bias (this is the
    semantics the reference relies on — it passes a 0/1 float mask, which only
    adds +1 to valid positions rather than truly masking).
  * GELU == Linear proj + gelu.  get_activation('silu'/'mish'/'gelu').
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


class GELU(nn.Module):
    def __init__(self, dim_in, dim_out, approximate="none"):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)
        self.approximate = approximate

    def forward(self, x):
        return F.gelu(self.proj(x), approximate=self.approximate)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class ApproximateGELU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


class AdaLayerNorm(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()


class AdaLayerNormZero(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()


LoRACompatibleLinear = nn.Linear


def maybe_allow_in_graph(cls):
    return cls


def get_activation(name):
    return {"silu": nn.SiLU(), "mish": nn.Mish(), "gelu": nn.GELU(),
            "relu": nn.ReLU()}[name]


class Attention(nn.Module):
    """diffusers-compatible self/cross attention (AttnProcessor2_0 path)."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8, dim_head=64,
                 dropout=0.0, bias=False, upcast_attention=False, scale_qk=True,
                 **kw):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.dim_head = dim_head
        kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
        self.to_q = nn.Linear(query_dim, inner, bias=bias)
        self.to_k = nn.Linear(kv_dim, inner, bias=bias)
        self.to_v = nn.Linear(kv_dim, inner, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(dropout)])

    def forward(self, hidden_states, encoder_hidden_states=None, attention_mask=None,
                **kw):
        kv = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
        B, T, _ = hidden_states.shape
        q = self.to_q(hidden_states).view(B, T, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(kv).view(B, kv.shape[1], self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(kv).view(B, kv.shape[1], self.heads, self.dim_head).transpose(1, 2)
        if attention_mask is not None:
            attention_mask = attention_mask[:, None, :, :]  # [B, 1, Tq, Tk] float additive
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=attention_mask)
        out = out.transpose(1, 2).reshape(B, T, -1)
        return self.to_out[1](self.to_out[0](out))


class ConformerBlock(nn.Module):  # only referenced by the legacy Decoder class
    def __init__(self, *a, **k):
        super().__init__()
