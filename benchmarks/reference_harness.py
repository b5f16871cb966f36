"""Import the reference's torch FastSpeech2 with its missing external deps
stubbed — shared by the CPU baseline benchmark and the numerical-parity
test. Measurement/validation only; no reference code is copied.
"""
from __future__ import annotations

import json
import os
import sys
import types

import torch
import torch.nn.functional as F

REF = "/root/reference"

MODEL_CONFIG = {
    "transformer": {
        "encoder_layer": 4, "encoder_head": 2, "encoder_hidden": 256,
        "decoder_layer": 6, "decoder_head": 2, "decoder_hidden": 256,
        "conv_filter_size": 1024, "conv_kernel_size": [9, 1],
        "encoder_dropout": 0.2, "decoder_dropout": 0.2,
    },
    "variance_predictor": {"filter_size": 256, "kernel_size": 3,
                           "dropout": 0.5},
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

_installed = False


def install_stubs():
    global _installed
    if _installed:
        return
    _installed = True

    pl = types.ModuleType("pytorch_lightning")

    class _LM(torch.nn.Module):
        @property
        def device(self):
            return torch.device("cpu")

    pl.LightningModule = _LM
    sys.modules["pytorch_lightning"] = pl

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
        return ids >= lengths.unsqueeze(1)

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

    res = types.ModuleType("resemblyzer")
    res.VoiceEncoder = torch.nn.Module
    sys.modules["resemblyzer"] = res

    uni = types.ModuleType("unidecode")
    uni.unidecode = lambda s: s
    sys.modules["unidecode"] = uni
    inf = types.ModuleType("inflect")

    class _Engine:
        def number_to_words(self, *a, **k):
            return "zero"

    inf.engine = _Engine
    sys.modules["inflect"] = inf

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

    # text/define.py loads MFA phonesets relative to cwd
    import tempfile
    tmp = tempfile.mkdtemp()
    for lang in ("French", "German", "Spanish", "Japanese", "Korean"):
        os.makedirs(os.path.join(tmp, "MFA", lang), exist_ok=True)
        open(os.path.join(tmp, "MFA", lang, "phoneset.txt"), "w").close()
    os.chdir(tmp)

    if REF not in sys.path:
        sys.path.insert(0, REF)

    import lightning
    import lightning.utils
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


def build_reference_fastspeech2(n_speakers: int = 64):
    install_stubs()
    from lightning.model import fastspeech2m as fs2m
    model = fs2m.FastSpeech2(
        MODEL_CONFIG,
        spk_config={"emb_type": "table",
                    "speakers": [f"s{i}" for i in range(n_speakers)]})
    model.eval()
    return model
