"""Speaker and language encoders.

Re-provides lightning/model/speaker_encoder.py:15-167:
- "table": per-speaker embedding table
- "shared": one shared embedding for all speakers
- "encoder"/"dvec"/"scratch_encoder": GE2E d-vector LSTM encoder over
  speaker-reference mel slices (resemblyzer VoiceEncoder architecture:
  3-layer LSTM(40->256) -> Linear(256) -> relu -> L2 norm, partials
  averaged then re-normalized). "dvec" freezes the weights (handled by the
  optimizer partition in systems/), "encoder" fine-tunes pretrained weights,
  "scratch_encoder" trains from scratch.
- LanguageEncoder: language-id table, fixed capacity 100 languages.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GE2EEncoder(nn.Module):
    """GE2E d-vector encoder (resemblyzer-compatible shapes)."""
    mel_n_channels: int = 40
    hidden_size: int = 256
    num_layers: int = 3
    out_dim: int = 256

    @nn.compact
    def __call__(self, mel_slices, mask=None):
        """mel_slices: (N_slices, T, mel_n_channels) -> (out_dim,) d-vector.
        `mask` (N_slices,) marks real slices when N is padded to a static
        count (DvecRefs) — padded slices are excluded from the partial-
        embedding average (resemblyzer embed_utterance semantics)."""
        x = mel_slices
        for i in range(self.num_layers):
            # OptimizedLSTMCell: same param structure as LSTMCell but fuses
            # the gate matmuls — measured 2x faster fwd+bwd on v5e (0.15 vs
            # 0.30 ms at B=16, N=10 slices). The cell binds to THIS scope
            # (it's constructed outside nn.RNN), so name it explicitly.
            cell = nn.OptimizedLSTMCell(self.hidden_size, name=f"lstm_{i}")
            x = nn.RNN(cell)(x)
        h_last = x[:, -1]                          # (N, hidden)
        e = nn.Dense(self.out_dim, name="proj")(h_last)
        e = nn.relu(e)
        e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-5)
        if mask is None:
            d = jnp.mean(e, axis=0)
        else:
            w = mask[:, None]
            d = (e * w).sum(axis=0) / jnp.maximum(w.sum(), 1.0)
        return d / (jnp.linalg.norm(d) + 1e-5)


class SpeakerEncoder(nn.Module):
    emb_type: str = "table"
    n_speakers: int = 1
    d_model: int = 256

    @nn.compact
    def __call__(self, speaker_args):
        """speaker_args: int speaker ids (B,) for table/shared, or mel slices
        (B, N_slices, T, 40) for encoder types. Returns (B, d_model)."""
        if self.emb_type == "table":
            return nn.Embed(self.n_speakers, self.d_model, name="table")(speaker_args)
        if self.emb_type == "shared":
            return nn.Embed(1, self.d_model, name="table")(
                jnp.zeros_like(speaker_args))
        if self.emb_type in ("encoder", "dvec", "scratch_encoder"):
            enc = GE2EEncoder(out_dim=self.d_model, name="ge2e")
            if isinstance(speaker_args, (tuple, list)) and len(speaker_args) == 2:
                slices, mask = speaker_args   # DvecRefs: padded slice count
                return jax.vmap(enc)(slices, mask)
            return jax.vmap(enc)(speaker_args)
        raise ValueError(f"Unknown speaker emb_type: {self.emb_type}")


def convert_resemblyzer_checkpoint(state_dict) -> dict:
    """Convert a resemblyzer VoiceEncoder state_dict (torch LSTM weights)
    into GE2EEncoder params — the reference consumes pretrained d-vector
    weights (speaker_encoder.py:115-118 "encoder"/"dvec")."""
    import numpy as np

    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    def lstm_layer(i):
        # torch LSTM gate order: i, f, g, o; flax (Optimized)LSTMCell uses
        # separate Dense params per gate: ii/if/ig/io (input, no bias) and
        # hi/hf/hg/ho (hidden, carries the summed torch biases). Cells are
        # explicitly named lstm_{i} in GE2EEncoder.
        w_ih = t(state_dict[f"lstm.weight_ih_l{i}"])   # (4H, D)
        w_hh = t(state_dict[f"lstm.weight_hh_l{i}"])   # (4H, H)
        b = t(state_dict[f"lstm.bias_ih_l{i}"]) + t(
            state_dict[f"lstm.bias_hh_l{i}"])
        H = w_hh.shape[1]
        gates = ("i", "f", "g", "o")
        p = {}
        for gi, g in enumerate(gates):
            p[f"i{g}"] = {"kernel": w_ih[gi * H:(gi + 1) * H].T}
            p[f"h{g}"] = {"kernel": w_hh[gi * H:(gi + 1) * H].T,
                          "bias": b[gi * H:(gi + 1) * H]}
        return p

    params = {}
    for i in range(3):
        params[f"lstm_{i}"] = lstm_layer(i)
    params["proj"] = {
        "kernel": t(state_dict["linear.weight"]).T,
        "bias": t(state_dict["linear.bias"]),
    }
    return {"params": params}


class LanguageEncoder(nn.Module):
    """Language-id table; fixed at 100 languages like the reference
    (fastspeech2m.py:44-45)."""
    n_languages: int = 100
    d_model: int = 256

    @nn.compact
    def __call__(self, lang_args):
        return nn.Embed(self.n_languages, self.d_model, name="table")(lang_args)
