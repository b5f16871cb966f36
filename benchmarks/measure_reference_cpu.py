"""Measure the reference's FastSpeech2 synthesis throughput on CPU PyTorch.

BASELINE.md: the reference publishes no numbers, so we measure it
behaviorally. This harness imports the reference's OWN model code
(/root/reference/transformer, lightning/model/{modules,fastspeech2m}.py)
with its missing external deps stubbed (pytorch_lightning, dlhlp_lib,
resemblyzer, Define), builds the full-size model (base.yaml: enc 4x256d /
dec 6x256d / FFN 1024), and times no-target synthesis (durations/pitch/
energy predicted) on CPU. Output: one JSON line with mel-frames/sec.

Usage: python benchmarks/measure_reference_cpu.py [--batch 8 --len 128]
Writes benchmarks/baseline_cpu.json consumed by bench.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np
import torch
import torch.nn.functional as F

REF = "/root/reference"
_HERE = os.path.dirname(os.path.abspath(__file__))


def install_stubs():
    # pytorch_lightning -> plain nn.Module
    pl = types.ModuleType("pytorch_lightning")

    class _LM(torch.nn.Module):
        @property
        def device(self):
            return torch.device("cpu")

    pl.LightningModule = _LM
    sys.modules["pytorch_lightning"] = pl

    # dlhlp_lib.audio.AUDIO_CONFIG / dlhlp_lib.utils.tool.get_mask_from_lengths
    dlhlp = types.ModuleType("dlhlp_lib")
    audio = types.ModuleType("dlhlp_lib.audio")
    audio.AUDIO_CONFIG = {
        "mel": {"n_mel_channels": 80},
        "audio": {"sampling_rate": 22050},
        "stft": {"hop_length": 256},
    }
    utils = types.ModuleType("dlhlp_lib.utils")
    tool = types.ModuleType("dlhlp_lib.utils.tool")

    def get_mask_from_lengths(lengths, max_len=None):
        max_len = max_len or int(lengths.max().item())
        ids = torch.arange(0, max_len).unsqueeze(0).expand(len(lengths), -1)
        return ids >= lengths.unsqueeze(1)   # True at PAD

    tool.get_mask_from_lengths = get_mask_from_lengths
    numeric = types.ModuleType("dlhlp_lib.utils.numeric")
    numeric.torch_exist_nan = lambda x: bool(torch.isnan(x).any())
    utils.tool = tool
    utils.numeric = numeric
    dlhlp.audio = audio
    dlhlp.utils = utils
    sys.modules.update({
        "dlhlp_lib": dlhlp, "dlhlp_lib.audio": audio,
        "dlhlp_lib.utils": utils, "dlhlp_lib.utils.tool": tool,
        "dlhlp_lib.utils.numeric": numeric,
    })

    # resemblyzer (only needed for d-vector path; stub)
    res = types.ModuleType("resemblyzer")
    res.VoiceEncoder = torch.nn.Module
    sys.modules["resemblyzer"] = res

    # unidecode / inflect (text frontend deps, unused in this benchmark)
    uni = types.ModuleType("unidecode")
    uni.unidecode = lambda s: s
    sys.modules["unidecode"] = uni
    inf = types.ModuleType("inflect")
    class _Engine:
        def number_to_words(self, *a, **k):
            return "zero"
    inf.engine = _Engine
    sys.modules["inflect"] = inf

    # Define globals
    define = types.ModuleType("Define")
    with open(os.path.join(REF, "stats.json")) as f:
        stats = json.load(f)
    define.ALLSTATS = {"global": stats["pitch"] + stats["energy"]}
    define.NOLID = False
    define.DEVICE = torch.device("cpu")
    define.DEBUG = False
    define.UPSTREAM = "hubert_large_ll60k"
    define.UPSTREAM_DIM = 1024
    define.UPSTREAM_LAYER = 25
    define.LAYER_IDX = None
    define.ATTTEMP = False
    sys.modules["Define"] = define


MODEL_CONFIG = {
    "transformer": {
        "encoder_layer": 4, "encoder_head": 2, "encoder_hidden": 256,
        "decoder_layer": 6, "decoder_head": 2, "decoder_hidden": 256,
        "conv_filter_size": 1024, "conv_kernel_size": [9, 1],
        "encoder_dropout": 0.2, "decoder_dropout": 0.2,
    },
    "variance_predictor": {"filter_size": 256, "kernel_size": 3, "dropout": 0.5},
    "variance_embedding": {
        "pitch_quantization": "linear", "energy_quantization": "linear",
        "n_bins": 256,
    },
    "pitch": {"feature": "phoneme_level", "normalization": True},
    "energy": {"feature": "phoneme_level", "normalization": True},
    "max_seq_len": 1000,
    "multi_speaker": True,
    "multi_lingual": True,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--len", type=int, default=128, dest="length")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--dur_bias", type=float, default=5.0,
                    help="pin the duration head's output bias to "
                         "log(DUR_BIAS) frames/phoneme so the untrained "
                         "model predicts realistic speech lengths "
                         "(~4-8 frames/phoneme at 22.05kHz hop 256) "
                         "instead of ~0; 0 disables. The TPU bench "
                         "applies the identical surgery "
                         "(bench.py:pin_realistic_durations).")
    args = ap.parse_args()

    if args.threads:
        torch.set_num_threads(args.threads)
    install_stubs()
    sys.path.insert(0, REF)

    # text/define.py loads MFA/<Lang>/phoneset.txt relative to cwd; give it
    # empty phonesets in a temp cwd so `from text.symbols import symbols`
    # (transformer/Models.py) imports cleanly.
    import tempfile
    tmp = tempfile.mkdtemp()
    for lang in ("French", "German", "Spanish", "Japanese", "Korean"):
        os.makedirs(os.path.join(tmp, "MFA", lang), exist_ok=True)
        with open(os.path.join(tmp, "MFA", lang, "phoneset.txt"), "w") as f:
            f.write("")
    os.chdir(tmp)

    # pre-stub lightning.utils.tool (the real one drags in matplotlib etc.)
    import lightning            # real reference package (empty __init__)
    import lightning.utils      # empty __init__
    lightning_tool = types.ModuleType("lightning.utils.tool")

    def pad(input_ele, mel_max_length=None):
        max_len = mel_max_length or max(x.size(0) for x in input_ele)
        out = []
        for batch in input_ele:
            if batch.dim() == 1:
                out.append(F.pad(batch, (0, max_len - batch.size(0))))
            else:
                out.append(F.pad(batch, (0, 0, 0, max_len - batch.size(0))))
        return torch.stack(out)

    lightning_tool.pad = pad
    sys.modules["lightning.utils.tool"] = lightning_tool
    lightning.utils.tool = lightning_tool

    from lightning.model import fastspeech2m as fs2m

    model = fs2m.FastSpeech2(
        MODEL_CONFIG,
        spk_config={"emb_type": "table", "speakers": [f"s{i}" for i in range(64)]})
    model.eval()
    if args.dur_bias:
        # realistic synthesis lengths for an untrained model: without this
        # the duration head predicts round(exp(~0)-1) = 0 frames/phoneme
        # and the "synthesis" decodes ~95 frames per 8x128 batch
        import math
        with torch.no_grad():
            model.variance_adaptor.duration_predictor.linear_layer.bias \
                .fill_(math.log(args.dur_bias))

    B, L = args.batch, args.length
    g = torch.Generator().manual_seed(0)
    emb = torch.randn(B, L, 256, generator=g)
    src_lens = torch.full((B,), L, dtype=torch.long)
    spk = torch.zeros(B, dtype=torch.long)
    lang = torch.zeros(B, dtype=torch.long)

    with torch.no_grad():
        out = model(spk, emb, src_lens, L, lang_args=lang)  # warmup
        t0 = time.time()
        frames = 0
        for _ in range(args.iters):
            out = model(spk, emb, src_lens, L, lang_args=lang)
            frames += int(out[9].sum().item())   # mel_lens
        dt = time.time() - t0

    result = {
        "metric": "mel-frames/sec (reference torch CPU synthesis)",
        "value": frames / dt,
        "batch": B, "text_len": L, "iters": args.iters,
        "torch_threads": torch.get_num_threads(),
    }
    print(json.dumps(result))
    out_path = os.path.join(_HERE, "baseline_cpu.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
