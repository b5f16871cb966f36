"""Generate key-layout manifests for the released torch checkpoints the
converters target (VERDICT r1 #9: pin layouts so converter tests fail when
the expected released format drifts, not only against tiny stand-ins).

The manifests record {state_dict key: shape} for:
- facebook/hubert-large-ll60k (HF transformers HubertModel with the model
  card's config: 1024d/24L/16H/4096ffn, layer-norm feature extractor,
  stable layer norm) — models/hubert.convert_torch_checkpoint input.
- HiFi-GAN "universal" V1 generator (jik876/hifi-gan config_v1: 512 base
  channels, rates 8/8/2/2, kernels 16/16/4/4) —
  models/hifigan.convert_torch_checkpoint input.
- resemblyzer VoiceEncoder (3-layer LSTM 40->256 + linear 256->256) —
  nn/speaker_encoder converter input.

Run: python tools/gen_converter_manifests.py   (writes tests/fixtures/)
"""
from __future__ import annotations

import json
import os

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures")


def hubert_large_manifest():
    import torch
    from accelerate import init_empty_weights
    from transformers import HubertConfig, HubertModel

    cfg = HubertConfig(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, feat_extract_norm="layer", conv_bias=True,
        do_stable_layer_norm=True,
    )
    with init_empty_weights():
        model = HubertModel(cfg)
    return {k: list(v.shape) for k, v in model.state_dict().items()}


def hifigan_universal_manifest():
    # generator key layout of the released UNIVERSAL_V1 checkpoint
    # (weight-normed convs: .weight_g/.weight_v/.bias per conv)
    rates = [8, 8, 2, 2]
    kernels = [16, 16, 4, 4]
    res_kernels = [3, 7, 11]
    ch0 = 512
    m = {}

    def wn(prefix, out_c, in_c, k, transposed=False):
        shape = [in_c, out_c, k] if transposed else [out_c, in_c, k]
        m[f"{prefix}.weight_g"] = ([shape[0], 1, 1])
        m[f"{prefix}.weight_v"] = shape
        m[f"{prefix}.bias"] = [out_c]

    wn("conv_pre", ch0, 80, 7)
    for i, (r, k) in enumerate(zip(rates, kernels)):
        in_c, out_c = ch0 // (2 ** i), ch0 // (2 ** (i + 1))
        wn(f"ups.{i}", out_c, in_c, k, transposed=True)
        for j, rk in enumerate(res_kernels):
            ridx = i * 3 + j
            for c in range(3):
                wn(f"resblocks.{ridx}.convs1.{c}", out_c, out_c, rk)
                wn(f"resblocks.{ridx}.convs2.{c}", out_c, out_c, rk)
    wn("conv_post", 1, ch0 // 16, 7)
    return m


def resemblyzer_manifest():
    # resemblyzer VoiceEncoder: torch.nn.LSTM(40, 256, 3) + Linear(256, 256)
    m = {}
    for layer in range(3):
        in_dim = 40 if layer == 0 else 256
        m[f"lstm.weight_ih_l{layer}"] = [4 * 256, in_dim]
        m[f"lstm.weight_hh_l{layer}"] = [4 * 256, 256]
        m[f"lstm.bias_ih_l{layer}"] = [4 * 256]
        m[f"lstm.bias_hh_l{layer}"] = [4 * 256]
    m["linear.weight"] = [256, 256]
    m["linear.bias"] = [256]
    return m


def main():
    os.makedirs(FIXTURES, exist_ok=True)
    for name, fn in [
            ("hubert_large_ll60k", hubert_large_manifest),
            ("hifigan_universal_v1", hifigan_universal_manifest),
            ("resemblyzer_voice_encoder", resemblyzer_manifest)]:
        path = os.path.join(FIXTURES, f"manifest_{name}.json")
        manifest = fn()
        with open(path, "w") as f:
            json.dump(manifest, f, indent=0, sort_keys=True)
        print(f"{name}: {len(manifest)} keys -> {path}")


if __name__ == "__main__":
    main()
