"""Convert a reference torch FastSpeech2 state_dict into fscl_tpu flax params.

Used by the numerical-parity test (tests/test_parity_reference.py) to prove
architectural equivalence: same weights -> same mels (the BASELINE.md
"MCD delta < 0.1" requirement). Also usable to migrate real reference
checkpoints into this framework.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _linear(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"])}


def _linear_nobias(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]).T}


def _conv1d(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])          # (out, in, k)
    out = {"kernel": w.transpose(2, 1, 0)}   # (k, in, out)
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _fft_stack(sd, prefix, n_layers):
    stack = {}
    for i in range(n_layers):
        p = f"{prefix}.layer_stack.{i}"
        stack[f"layer_{i}"] = {
            "slf_attn": {
                "w_qs": _linear(sd, f"{p}.slf_attn.w_qs"),
                "w_ks": _linear(sd, f"{p}.slf_attn.w_ks"),
                "w_vs": _linear(sd, f"{p}.slf_attn.w_vs"),
                "fc": _linear(sd, f"{p}.slf_attn.fc"),
                "layer_norm": _ln(sd, f"{p}.slf_attn.layer_norm"),
            },
            "pos_ffn": {
                "w_1": _conv1d(sd, f"{p}.pos_ffn.w_1"),
                "w_2": _conv1d(sd, f"{p}.pos_ffn.w_2"),
                "layer_norm": _ln(sd, f"{p}.pos_ffn.layer_norm"),
            },
        }
    return {"stack": stack}


def _variance_predictor(sd, prefix):
    return {
        "conv1d_1": _conv1d(sd, f"{prefix}.conv_layer.conv1d_1.conv"),
        "layer_norm_1": _ln(sd, f"{prefix}.conv_layer.layer_norm_1"),
        "conv1d_2": _conv1d(sd, f"{prefix}.conv_layer.conv1d_2.conv"),
        "layer_norm_2": _ln(sd, f"{prefix}.conv_layer.layer_norm_2"),
        "linear_layer": _linear(sd, f"{prefix}.linear_layer"),
    }


def convert_fastspeech2_state_dict(
    sd: Dict, enc_layers: int = 4, dec_layers: int = 6,
    postnet_convs: int = 5,
):
    """Returns {"params": ..., "batch_stats": ...} for models.FastSpeech2."""
    params = {
        "encoder": _fft_stack(sd, "encoder", enc_layers),
        "decoder": _fft_stack(sd, "decoder", dec_layers),
        "variance_adaptor": {
            "duration_predictor": _variance_predictor(
                sd, "variance_adaptor.duration_predictor"),
            "pitch_predictor": _variance_predictor(
                sd, "variance_adaptor.pitch_predictor"),
            "energy_predictor": _variance_predictor(
                sd, "variance_adaptor.energy_predictor"),
            "pitch_embedding": {
                "embedding": _t(sd["variance_adaptor.pitch_embedding.weight"])},
            "energy_embedding": {
                "embedding": _t(sd["variance_adaptor.energy_embedding.weight"])},
        },
        "mel_linear": _linear(sd, "mel_linear"),
    }
    postnet = {}
    bn_stats = {}
    for i in range(postnet_convs):
        postnet[f"conv_{i}"] = _conv1d(sd, f"postnet.convolutions.{i}.0.conv")
        postnet[f"bn_{i}"] = {
            "scale": _t(sd[f"postnet.convolutions.{i}.1.weight"]),
            "bias": _t(sd[f"postnet.convolutions.{i}.1.bias"]),
        }
        bn_stats[f"bn_{i}"] = {
            "mean": _t(sd[f"postnet.convolutions.{i}.1.running_mean"]),
            "var": _t(sd[f"postnet.convolutions.{i}.1.running_var"]),
        }
    params["postnet"] = postnet

    if "speaker_emb.model.weight" in sd:
        params["speaker_emb"] = {
            "table": {"embedding": _t(sd["speaker_emb.model.weight"])}}
    if "language_emb.model.weight" in sd:
        params["language_emb"] = {
            "table": {"embedding": _t(sd["language_emb.model.weight"])}}

    return {"params": params, "batch_stats": {"postnet": bn_stats}}
