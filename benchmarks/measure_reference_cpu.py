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


class _TorchHiFiGANV1(torch.nn.Module):
    """Minimal torch HiFi-GAN V1 generator for CPU baseline timing only.

    The reference consumes HiFiGAN through dlhlp_lib.vocoders (external
    torch code, lightning/utils/tool.py:20-42); that package is absent in
    this image, so the baseline harness instantiates the same public V1
    architecture (conv_pre k7 80->512, 4x ConvTranspose1d upsampling
    8/8/2/2 with 3-kernel MRF resblocks, conv_post k7 + tanh) to time the
    mel->wav stage. Weights are random — throughput is weight-independent.
    """

    def __init__(self, rates=(8, 8, 2, 2), kups=(16, 16, 4, 4),
                 rks=(3, 7, 11), dils=(1, 3, 5), ch0=512):
        super().__init__()
        self.conv_pre = torch.nn.Conv1d(80, ch0, 7, padding=3)
        self.ups = torch.nn.ModuleList()
        self.res = torch.nn.ModuleList()
        ch = ch0
        for r, k in zip(rates, kups):
            self.ups.append(torch.nn.ConvTranspose1d(
                ch, ch // 2, k, stride=r, padding=(k - r) // 2))
            ch //= 2
            stage = torch.nn.ModuleList()
            for rk in rks:
                convs = torch.nn.ModuleList()
                for d in dils:
                    convs.append(torch.nn.Conv1d(
                        ch, ch, rk, dilation=d, padding=(rk - 1) // 2 * d))
                    convs.append(torch.nn.Conv1d(
                        ch, ch, rk, padding=(rk - 1) // 2))
                stage.append(convs)
            self.res.append(stage)
        self.conv_post = torch.nn.Conv1d(ch, 1, 7, padding=3)

    def forward(self, mel):                      # (B, 80, T)
        x = self.conv_pre(mel)
        for up, stage in zip(self.ups, self.res):
            x = up(F.leaky_relu(x, 0.1))
            acc = None
            for convs in stage:
                h = x
                for i in range(0, len(convs), 2):
                    y = convs[i](F.leaky_relu(h, 0.1))
                    y = convs[i + 1](F.leaky_relu(y, 0.1))
                    h = h + y
                acc = h if acc is None else acc + h
            x = acc / len(stage)
        return torch.tanh(self.conv_post(F.leaky_relu(x, 0.1)))[:, 0]


def _loss_inputs(spk, texts, src_lens, L, mels, mel_lens, T, p, e, d,
                 lang):
    """The reference batch tuple as FastSpeech2Loss consumes it: it
    unpacks EXACTLY six target fields from inputs[6:]
    (lightning/model/loss.py:15-23), i.e. the 13-field collate tuple
    without its trailing lang_ids."""
    return (None, None, spk, texts, src_lens, L, mels, mel_lens, T, p, e,
            d)


def measure_train(model, emb, iters=8, B=16, L=128, T=512):
    """Reference CPU supervised train step (fwd + loss + bwd + Adam) at
    the SAME shapes as the TPU bench row
    (benchmarks/bench_train_precision.py: B=16, L=128, T=512)."""
    from lightning.model.loss import FastSpeech2Loss

    loss_fn = FastSpeech2Loss(MODEL_CONFIG)
    model.train()
    opt = torch.optim.Adam(
        list(model.parameters()) + list(emb.parameters()),
        lr=1e-4, betas=(0.9, 0.98))   # config/train/fscl.yaml optimizer
    g = torch.Generator().manual_seed(0)
    texts = torch.randint(1, 361, (B, L), generator=g)
    src_lens = torch.full((B,), L, dtype=torch.long)
    d = torch.full((B, L), T // L, dtype=torch.long)   # fills T exactly
    mels = torch.randn(B, T, 80, generator=g)
    mel_lens = d.sum(1)
    p = torch.randn(B, L, generator=g)
    e = torch.randn(B, L, generator=g)
    spk = torch.zeros(B, dtype=torch.long)
    lang = torch.zeros(B, dtype=torch.long)

    def one_step():
        opt.zero_grad()
        out = model(spk, emb(texts), src_lens, L, mels, mel_lens, T, p, e,
                    d, lang_args=lang)
        losses = loss_fn(_loss_inputs(spk, texts, src_lens, L, mels,
                                      mel_lens, T, p, e, d, lang), out)
        losses[0].backward()
        opt.step()
        return float(losses[0].item())

    one_step()                                   # warmup
    t0 = time.time()
    for _ in range(iters):
        loss = one_step()
    dt = time.time() - t0
    return {"train_steps_per_sec": iters / dt, "train_iters": iters,
            "train_loss": loss, "train_batch": B, "train_text_len": L,
            "train_mel_len": T}


def measure_adapt(model, emb, steps=30, B=4, L=64, T=256):
    """Reference CPU few-shot adaptation inner loop at the SAME shapes as
    the TPU bench row (benchmarks/bench_adaptation.py: B=4, L=64, T=256,
    SGD lr 1e-4, fresh batch per step)."""
    from lightning.model.loss import FastSpeech2Loss

    loss_fn = FastSpeech2Loss(MODEL_CONFIG)
    model.train()
    opt = torch.optim.SGD(
        list(model.parameters()) + list(emb.parameters()), lr=1e-4)
    g = torch.Generator().manual_seed(1)
    batches = []
    for _ in range(steps + 1):
        d = torch.full((B, L), T // L, dtype=torch.long)
        batches.append((
            torch.randint(1, 100, (B, L), generator=g),
            torch.randn(B, T, 80, generator=g), d,
            torch.randn(B, L, generator=g), torch.randn(B, L, generator=g)))
    src_lens = torch.full((B,), L, dtype=torch.long)
    spk = torch.zeros(B, dtype=torch.long)
    lang = torch.zeros(B, dtype=torch.long)

    def one_step(b):
        texts, mels, d, p, e = b
        mel_lens = d.sum(1)
        opt.zero_grad()
        out = model(spk, emb(texts), src_lens, L, mels, mel_lens, T, p, e,
                    d, lang_args=lang)
        losses = loss_fn(_loss_inputs(spk, texts, src_lens, L, mels,
                                      mel_lens, T, p, e, d, lang), out)
        losses[0].backward()
        opt.step()

    one_step(batches[0])                         # warmup
    t0 = time.time()
    for b in batches[1:]:
        one_step(b)
    dt = time.time() - t0
    return {"adapt_steps_per_sec": steps / dt, "adapt_steps": steps}


def _build_ref_t2u_decoder(n_units=512, L=64):
    """Instantiate the reference's OWN Tacotron2 unit decoder
    (lightning/systems/t2u/tacotron2/tacot2u_model.py:158-362) at its own
    operating point (config/model/tacot2u.yaml: 512-d decoder/attention
    LSTMs, 256-d encoder memory, d_unit 256; n_units is data-derived —
    TacoT2U.py:22-23 — 512 for a 512-unit km codebook). NOTE: the TPU-side
    decoder (fscl_tpu/models/tacotron2_t2u.py) runs LARGER 1024-d LSTMs,
    so the vs_baseline ratio under-credits the TPU per-step work.

    The final projection's bias is pinned so unit 8 (`<eos>`,
    tacot2u_model.py:349) is never the argmax: an untrained decoder can
    emit it on step 1, and the denominator must time a full decode to
    max_decoder_ratio * L steps — the same step count the TPU bench
    always executes (static-shape scan).

    Loaded by file path under a synthetic package: importing it normally
    would execute lightning/systems/__init__.py, which drags in every
    system (s3prl, transformers heads, ...)."""
    import importlib.util
    pkgdir = os.path.join(REF, "lightning", "systems", "t2u", "tacotron2")
    pkgname = "ref_tacotron2"
    if pkgname not in sys.modules:
        pkg = types.ModuleType(pkgname)
        pkg.__path__ = [pkgdir]
        sys.modules[pkgname] = pkg
        for mod in ("hparams", "layers", "tacot2u_model"):
            spec = importlib.util.spec_from_file_location(
                f"{pkgname}.{mod}", os.path.join(pkgdir, mod + ".py"))
            m = importlib.util.module_from_spec(spec)
            sys.modules[f"{pkgname}.{mod}"] = m
            spec.loader.exec_module(m)
    tm = sys.modules[f"{pkgname}.tacot2u_model"]

    for k, v in (("decoder_rnn_dim", 512), ("attention_rnn_dim", 512),
                 ("encoder_embedding_dim", 256), ("symbols_embedding_dim",
                  256), ("d_unit", 256), ("n_units", n_units),
                 ("max_decoder_ratio", 10)):
        setattr(tm.hps, k, v)
    dec = tm.Decoder().eval()
    with torch.no_grad():
        dec.final_proj.bias[8] = -1e9
    return dec, tm.hps


def measure_t2u(iters=2, L=64, n_units=512, sr=22050, hop=256):
    """Reference CPU T2U serving rows, mirroring benchmarks/bench_t2u_pr.py:

    * t2u_unit_decode_units_per_sec — Decoder.inference
      (tacot2u_model.py:330-362). The reference decoder does NOT support
      batched inference (its own comment, line 330), so B=1 is its honest
      serving throughput; the TPU row's batched lax.scan decode (B=8) is
      an architecture advantage the ratio legitimately credits.
    * t2u_chained_tts_realtime_factor — units -> u2s FastSpeech2 ->
      HiFiGAN V1 wav (TransEmbE2ETune.py:169-193 chaining), B=1.
    """
    dec, hps = _build_ref_t2u_decoder(n_units=n_units, L=L)
    g = torch.Generator().manual_seed(3)
    memory = torch.randn(1, L, hps.encoder_embedding_dim, generator=g)
    with torch.no_grad():
        dec.inference(torch.randn(1, 8, hps.encoder_embedding_dim,
                                  generator=g))    # warmup (80 steps)
        t0 = time.time()
        steps = 0
        for _ in range(iters):
            logits, _ = dec.inference(memory)
            steps += logits.shape[1]
        dt = time.time() - t0
    units_per_sec = steps / dt
    rec = {"t2u_unit_decode_units_per_sec": units_per_sec,
           "t2u_decode_steps": steps, "t2u_decode_batch": 1,
           "t2u_note": "reference decoder is inference-unbatched "
                       "(tacot2u_model.py:330) at its own 512-d config; "
                       "TPU row decodes B=8 with 1024-d LSTMs"}
    return rec


def measure_t2u_chained(model, n_units_seq=192, L=64, n_units=512,
                        sr=22050, hop=256):
    """text -> units (reference decoder) -> u2s FastSpeech2 -> HiFiGAN V1
    wav at B=1, the reference's e2e T2U serving chain."""
    dec, hps = _build_ref_t2u_decoder(n_units=n_units, L=L)
    voc = _TorchHiFiGANV1().eval()
    g = torch.Generator().manual_seed(4)
    memory = torch.randn(1, L, hps.encoder_embedding_dim, generator=g)
    emb = torch.randn(1, n_units_seq, 256, generator=g)
    src_lens = torch.full((1,), n_units_seq, dtype=torch.long)
    spk = torch.zeros(1, dtype=torch.long)
    lang = torch.zeros(1, dtype=torch.long)
    model.eval()
    with torch.no_grad():
        voc(torch.randn(1, 80, 32, generator=g))   # warmup
        t0 = time.time()
        _ = dec.inference(memory)                  # stage 1: units
        out = model(spk, emb, src_lens, n_units_seq, lang_args=lang)
        mel = out[1][:, : int(out[9].max().item())]
        voc(mel.transpose(1, 2))                   # stage 3: wav
        dt = time.time() - t0
        audio_sec = float(out[9].sum().item()) * hop / sr
    return {"t2u_chained_tts_realtime_factor": audio_sec / dt,
            "t2u_chained_batch": 1,
            "t2u_chained_units_per_utt": n_units_seq}


def measure_pr(wav_s=4.0, iters=1, n_symbols=64, d_down=256):
    """Reference CPU protonet query transcription
    (evaluation/protonet.py:28-217): hubert-large upstream (the
    reference's Define.py:32-51 UPSTREAM, instantiated from the
    transformers hubert-large architecture since zero egress bars the
    s3prl download; throughput is weight-independent) -> weighted-sum ->
    linear downstream -> -L2 distance to per-phoneme prototypes -> frame
    argmax. B=1 on a 1-vCPU host; x-realtime normalizes by audio secs."""
    from transformers import HubertConfig, HubertModel
    hc = HubertConfig(hidden_size=1024, num_hidden_layers=24,
                      num_attention_heads=16, intermediate_size=4096)
    up = HubertModel(hc).eval()
    down = torch.nn.Linear(1024, d_down)
    protos = torch.randn(n_symbols, d_down)
    T = int(wav_s * 16000)
    g = torch.Generator().manual_seed(5)
    wav = torch.randn(1, T, generator=g) * 0.1
    with torch.no_grad():
        up(torch.randn(1, 8000, generator=g))      # warmup (0.5 s wav)
        t0 = time.time()
        for _ in range(iters):
            h = up(wav, output_hidden_states=True).hidden_states
            h = torch.stack(h, 0).mean(0)          # layer weighted-sum
            z = down(h)                            # (1, T', d)
            dist = torch.cdist(z, protos.unsqueeze(0))
            pred = dist.argmin(-1)
        dt = time.time() - t0
    return {"pr_transcription_realtime_factor": wav_s * iters / dt,
            "pr_frames_per_sec": pred.shape[1] * iters / dt,
            "pr_batch": 1, "pr_wav_seconds": wav_s,
            "pr_upstream": "hubert-large (torch CPU, 24 layers, 1024-d)"}


def measure_e2e(model, iters=1, B=8, L=128, sr=22050, hop=256):
    """Reference CPU end-to-end TTS serving (synthesis + HiFiGAN V1
    vocoder), same workload as benchmarks/bench_e2e_tts.py. Returns the
    realtime factor: seconds of audio produced per wall second. The
    vocoder dominates and runs ~minutes per full batch on a 1-vCPU host,
    so the default is ONE measured iteration after a small warmup — the
    realtime factor normalizes by audio seconds, so fewer/shorter
    iterations do not bias it."""
    voc = _TorchHiFiGANV1().eval()
    g = torch.Generator().manual_seed(2)
    emb = torch.randn(B, L, 256, generator=g)
    src_lens = torch.full((B,), L, dtype=torch.long)
    spk = torch.zeros(B, dtype=torch.long)
    lang = torch.zeros(B, dtype=torch.long)
    model.eval()
    with torch.no_grad():
        voc(torch.randn(1, 80, 32, generator=g))   # small warmup
        t0 = time.time()
        audio_sec = 0.0
        for _ in range(iters):
            out = model(spk, emb, src_lens, L, lang_args=lang)
            mel = out[1][:, : int(out[9].max().item())]
            wav = voc(mel.transpose(1, 2))
            audio_sec += float(out[9].sum().item()) * hop / sr
        dt = time.time() - t0
    return {"e2e_realtime_factor": audio_sec / dt, "e2e_iters": iters,
            "e2e_wav_samples": int(wav.shape[-1])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--len", type=int, default=128, dest="length")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--mode", default="synth",
                    choices=["synth", "train", "adapt", "adapt_full",
                             "e2e", "t2u", "pr", "all"],
                    help="which reference CPU baseline(s) to measure; "
                         "non-synth results merge into baseline_cpu.json "
                         "(VERDICT r3 #2: every headline metric gets a "
                         "non-null vs_baseline)")
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

    out_path = os.path.join(_HERE, "baseline_cpu.json")
    result = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            result = json.load(f)

    if args.mode in ("synth", "all"):
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
        result.update({
            "metric": "mel-frames/sec (reference torch CPU synthesis)",
            "value": frames / dt,
            "batch": B, "text_len": L, "iters": args.iters,
            "torch_threads": torch.get_num_threads(),
        })
    if args.mode in ("train", "all"):
        emb_table = torch.nn.Embedding(361, 256)
        result.update(measure_train(model, emb_table))
    if args.mode in ("adapt", "all"):
        emb_table = torch.nn.Embedding(361, 256)
        result.update(measure_adapt(model, emb_table))
    if args.mode in ("adapt_full", "all"):
        # the full-size protocol: the shape the language rehearsal adapts
        # at (B=8 full utterances, L=128/T=512; VERDICT r4 #8)
        emb_table = torch.nn.Embedding(361, 256)
        r = measure_adapt(model, emb_table, steps=10, B=8, L=128, T=512)
        result.update({"adapt_full_steps_per_sec": r["adapt_steps_per_sec"],
                       "adapt_full_steps": r["adapt_steps"],
                       "adapt_full_shapes": "B8/L128/T512 SGD lr 1e-4"})
    if args.mode in ("e2e", "all"):
        result.update(measure_e2e(model))
    if args.mode in ("t2u", "all"):
        result.update(measure_t2u())
        result.update(measure_t2u_chained(model))
    if args.mode in ("pr", "all"):
        result.update(measure_pr())

    print(json.dumps(result))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
