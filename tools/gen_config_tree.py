"""Generate the experiment config library under config/.

Translates the reference's full config tree (reference: config/** —
29 preprocess, 11 model, 30 train, 52 algorithm YAMLs) into this repo's
schema. The values are the reference's experiment data; the layout follows
fscl_tpu.core.config loaders (read_preprocess_config, model_config_from_yaml,
train_config_from_yaml, read_algorithm_config — all of which also accept the
reference's nested layouts, which this generator preserves where useful).

Run from the repo root:  python tools/gen_config_tree.py
Idempotent; overwrites config/{algorithm,model,preprocess,train}/**.
"""
from __future__ import annotations

import os

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "config")

AUDIO_BLOCK = """\
preprocessing:
  val_size: {val_size}
  text:
    text_cleaners: {cleaners}
    language: "{tlang}"
  audio:
    sampling_rate: 22050
    max_wav_value: 32767.0
  stft:
    filter_length: 1024
    hop_length: 256
    win_length: 1024
  mel:
    n_mel_channels: 80
    mel_fmin: 0
    mel_fmax: null
  pitch:
    feature: "phoneme_level"
    normalization: true
  energy:
    feature: "phoneme_level"
    normalization: true
"""


def write(path: str, text: str) -> None:
    full = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        f.write(text)


# ---------------------------------------------------------------------------
# preprocess/  (reference: config/preprocess/*.yaml)
# ---------------------------------------------------------------------------

def subsets_yaml(subsets: dict) -> str:
    return "subsets:\n" + "".join(
        f"  {k}: \"{v}\"\n" for k, v in subsets.items())


# (file, dataset, lang_id, corpus_path, raw_path, preprocessed_path,
#  subsets, cleaners, text_language, val_size)
PREPROCESS = [
    ("AISHELL-3", "AISHELL-3", 1, "../AISHELL-3/AISHELL-3",
     "./raw_data/AISHELL-3", "./preprocessed_data/AISHELL-3",
     {"train": "train-clean", "val": "val-clean", "test": "val-clean"},
     '["transliteration_cleaners"]', "ch", 512),
    ("LibriTTS", "LibriTTS", 0, "../LibriTTS",
     "./raw_data/LibriTTS", "./preprocessed_data/LibriTTS",
     {"train": "train-clean-100-clean", "val": "dev-clean-clean",
      "test": "test-clean-clean"},
     '["english_cleaners"]', "en", 512),
    ("VCTK", "VCTK", 0, "../VCTK-Corpus",
     "./raw_data/VCTK", "./preprocessed_data/VCTK",
     {"test": "all"}, '["english_cleaners"]', "en", 0),
]

for name, sub in [("CSS10-german", {"train": "train", "val": "val",
                                    "test": "val"}),
                  ("CSS10-german-4", {"train": "train-4", "val": "val-64",
                                      "test": "val-64"}),
                  ("CSS10-german-16", {"train": "train-16", "val": "val-64",
                                       "test": "val-64"}),
                  ("CSS10-german-64", {"train": "train-64", "val": "val-64",
                                       "test": "val-64"})]:
    PREPROCESS.append((name, "CSS10-german", 3, "../CSS10/german",
                       "./raw_data/CSS10/german",
                       "./preprocessed_data/CSS10/german", sub,
                       '["basic_cleaners"]', "en", 512))
for fname, ds, lid, lang in [("CSS10-spanish", "CSS10-spanish", 5, "spanish"),
                             ("CSS10-russian", "CSS10-russian", 4, "russian"),
                             ("CSS10-ru", "CSS10-russian", 4, "russian")]:
    PREPROCESS.append((fname, ds, lid, f"../CSS10/{lang}",
                       f"./raw_data/CSS10/{lang}",
                       f"./preprocessed_data/CSS10/{lang}",
                       {"train": "train"}, '["basic_cleaners"]', "en", 512))
for fname, lid, cc in [("CV-french", 2, "fr"), ("CV-german", 3, "de"),
                       ("CV-russian", 4, "ru")]:
    PREPROCESS.append((fname, f"CommonVoice-{fname.split('-')[1]}", lid,
                       f"../CommonVoice/clean_comvoi/{cc}",
                       f"./raw_data/CommonVoice/{cc}",
                       f"./preprocessed_data/CommonVoice/{cc}",
                       {"train": "train"}, '["basic_cleaners"]', "en", 512))
for fname, ds, lid, cc in [("GlobalPhone-cz", "GlobalPhone-czech", 7, "cz"),
                           ("GlobalPhone-de", "GlobalPhone-german", 3, "de"),
                           ("GlobalPhone-es", "GlobalPhone-spanish", 5, "es"),
                           ("GlobalPhone-fr", "GlobalPhone-french", 2, "fr")]:
    PREPROCESS.append((fname, ds, lid, f"../GlobalPhone/{cc}",
                       f"./raw_data/GlobalPhone/{cc}",
                       f"./preprocessed_data/GlobalPhone/{cc}",
                       {"train": "train-clean", "val": "val-clean",
                        "test": "val-clean"},
                       '["basic_cleaners"]', "en", 512))
for name, sub in [("JSUT", {"train": "train", "val": "val"}),
                  ("JSUT-4", {"train": "train-4", "val": "val-64",
                              "test": "val-64"}),
                  ("JSUT-16", {"train": "train-16", "val": "val-64",
                               "test": "val-64"}),
                  ("JSUT-64", {"train": "train-64", "val": "val-64",
                               "test": "val-64"})]:
    PREPROCESS.append((name, "JSUT", 6, "../jsut_ver1.1", "./raw_data/JSUT",
                       "./preprocessed_data/JSUT", sub,
                       '["transliteration_cleaners"]', "ch", 512))
for name, sub in [("JVS", {"train": "train"}),
                  ("JVS-4", {"train": "train-4", "val": "val-16",
                             "test": "val-64"}),
                  ("JVS-16", {"train": "train-16", "val": "val-16",
                              "test": "val-64"}),
                  ("JVS-64", {"train": "train-64", "val": "val-16",
                              "test": "val-64"}),
                  ("JVS-384", {"train": "train-384", "val": "val-64",
                               "test": "val-64"})]:
    PREPROCESS.append((name, "JVS", 6, "../jvs_ver1", "./raw_data/JVS",
                       "./preprocessed_data/JVS", sub,
                       '["transliteration_cleaners"]', "ch", 512))
for name, sub, cl in [
        ("kss", {"train": "train-clean", "val": "val-clean",
                 "test": "val-clean"}, '["transliteration_cleaners"]'),
        ("kss-4", {"train": "train-4", "val": "val-12", "test": "val-12"},
         '["basic_cleaners"]'),
        ("kss-16", {"train": "train-16", "val": "val-16", "test": "val-16"},
         '["basic_cleaners"]'),
        ("kss-64", {"train": "train-64", "val": "val-64", "test": "val-64"},
         '["basic_cleaners"]')]:
    PREPROCESS.append((name, "kss", 8, "../kss", "./raw_data/kss",
                       "./preprocessed_data/kss", sub, cl, "ch", 512))


def gen_preprocess():
    for (fname, ds, lid, corpus, rawp, prep, subs, cl, tl, vs) in PREPROCESS:
        head = (f"# Corpus preprocessing bundle "
                f"(reference: config/preprocess/{fname}.yaml)\n")
        body = (f"dataset: \"{ds}\"\nlang_id: {lid}\n\n"
                f"path:\n  corpus_path: \"{corpus}\"\n"
                f"  lexicon_path: \"lexicon/librispeech-lexicon.txt\"\n"
                f"  raw_path: \"{rawp}\"\n"
                f"  preprocessed_path: \"{prep}\"\n\n"
                + subsets_yaml(subs) + "\n"
                + AUDIO_BLOCK.format(val_size=vs, cleaners=cl, tlang=tl))
        write(f"preprocess/{fname}.yaml", head + body)


# ---------------------------------------------------------------------------
# train/  (reference: config/train/*.yaml)
# ---------------------------------------------------------------------------

# (file, optimizer overrides, step block, scheduler_type or None)
TRAIN = {
    "baseline": (dict(batch_size=16), dict(total_step=50000, log_step=100,
                 synth_step=1000, val_step=1000, save_step=10000), None),
    "baseline-bs64": (dict(batch_size=64), dict(total_step=50000,
                      log_step=100, synth_step=5000, val_step=5000,
                      save_step=2500), None),
    "baseline-debug": (dict(lr=0.0001, batch_size=4,
                       anneal_steps=[300000, 400000, 500000]),
                       dict(total_step=200, log_step=10, synth_step=25,
                            val_step=50, save_step=100), "sqrt"),
    "fscl": (dict(batch_size=8), dict(total_step=50000, log_step=100,
             synth_step=2500, val_step=2500, save_step=10000), None),
    "fscl-debug": (dict(batch_size=4, warm_up_step=5),
                   dict(total_step=200, log_step=10, synth_step=25,
                        val_step=50, save_step=100), None),
    "ada1": (dict(batch_size=8, warm_up_step=2000),
             dict(total_step=10000, log_step=100, synth_step=1000,
                  val_step=1000, save_step=5000), None),
    "ada2": (dict(lr=0.0001, batch_size=8, warm_up_step=None),
             dict(total_step=2000, log_step=100, synth_step=500,
                  val_step=500, save_step=2000), None),
    "tune-500": (dict(lr=0.0001, batch_size=4, warm_up_step=None,
                 anneal_steps=None),
                 dict(total_step=500, log_step=100, synth_step=100000,
                      val_step=250, save_step=500), "sqrt"),
    "tune-1500": (dict(batch_size=4, warm_up_step=None, anneal_steps=None),
                  dict(total_step=1500, log_step=100, synth_step=100000,
                       val_step=500, save_step=1500), "sqrt"),
    "tune-10000": (dict(lr=0.0001, batch_size=4, anneal_steps=None),
                   dict(total_step=10000, log_step=250, synth_step=100000,
                        val_step=250, save_step=2500), "const"),
    "tune-da": (dict(lr=0.001, batch_size=4, warm_up_step=None,
                anneal_steps=[200], anneal_rate=0.1),
                dict(total_step=2000, log_step=50, synth_step=100000,
                     val_step=250, save_step=500), "const"),
    "tune-debug": (dict(lr=0.0001, batch_size=4, warm_up_step=None,
                   anneal_steps=None),
                   dict(total_step=1500, log_step=100, synth_step=100000,
                        val_step=100, save_step=100), "const"),
    "tune-t2s-1500": (dict(batch_size=4, anneal_steps=None),
                      dict(total_step=1500, log_step=100, synth_step=250,
                           val_step=500, save_step=1500), "sqrt"),
}

OUTPUT_ONLY = ["VCTK", "debug", "exp0a", "exp0b", "exp1", "exp2", "exp3",
               "fscl", "multilingual", "pr-fscl", "pr", "tune"]


def opt_yaml(ov: dict) -> str:
    base = {"lr": None, "batch_size": 8, "betas": [0.9, 0.98],
            "eps": 1.0e-9, "weight_decay": 0.0, "grad_clip_thresh": 1.0,
            "grad_acc_step": 1, "warm_up_step": 4000,
            "anneal_steps": [30000, 40000, 50000], "anneal_rate": 0.3}
    base.update(ov)
    lines = ["optimizer:"]
    for k, v in base.items():
        if v is None:
            continue
        if isinstance(v, list):
            lines.append(f"  {k}: [{', '.join(str(x) for x in v)}]")
        elif isinstance(v, float):
            lines.append(f"  {k}: {v!r}")
        else:
            lines.append(f"  {k}: {v}")
    return "\n".join(lines) + "\n"


def gen_train():
    for fname, (ov, step, sched) in TRAIN.items():
        head = f"# Training schedule (reference: config/train/{fname}.yaml)\n"
        body = ""
        if sched:
            body += f"scheduler_type: {sched}\n"
        body += opt_yaml(ov)
        body += "step:\n" + "".join(
            f"  {k}: {v}\n" for k, v in step.items())
        write(f"train/{fname}.yaml", head + body)
    for exp in OUTPUT_ONLY:
        fname = exp if exp == "VCTK" else f"{exp}-output"
        # reference exp0a-output.yaml points at exp0b (upstream typo kept
        # out; we use each experiment's own name)
        head = (f"# Output locations "
                f"(reference: config/train/{fname}.yaml)\n")
        body = ("path:\n"
                f"  ckpt_path: \"./output/ckpt/{exp}\"\n"
                f"  log_path: \"./output/log/{exp}\"\n"
                f"  result_path: \"./output/result/{exp}\"\n")
        write(f"train/{fname}.yaml", head + body)


# ---------------------------------------------------------------------------
# model/  (reference: config/model/*.yaml)
# ---------------------------------------------------------------------------

FS2_BLOCK = """\
transformer:
  encoder_layer: {enc}
  encoder_head: 2
  encoder_hidden: 256
  decoder_layer: {dec}
  decoder_head: 2
  decoder_hidden: 256
  conv_filter_size: 1024
  conv_kernel_size: [9, 1]
  encoder_dropout: 0.2
  decoder_dropout: 0.2

variance_predictor:
  filter_size: 256
  kernel_size: 3
  dropout: 0.5

variance_embedding:
  pitch_quantization: "linear"
  energy_quantization: "linear"
  n_bins: 256

pitch:
  feature: "phoneme_level"
  normalization: true
energy:
  feature: "phoneme_level"
  normalization: true
"""

TACOTRON2_BLOCK = """\
tacotron2:
  symbols_embedding_dim: 256
  mask_padding: true
  encoder_kernel_size: 5
  encoder_n_convolutions: 3
  encoder_embedding_dim: 256
  decoder_rnn_dim: 512
  prenet_dim: 256
  max_decoder_ratio: 10
  gate_threshold: 0.5
  p_attention_dropout: 0.1
  p_decoder_dropout: 0.1
  attention_rnn_dim: 512
  attention_dim: 128
  attention_location_n_filters: 32
  attention_location_kernel_size: 31
  d_unit: 256
"""

DOWNSTREAM_BLOCK = """\
downstream:
  transformer:
    d_model: 256
    nhead: 4
    layer: 2
    dim_feedforward: [256, 256]
    dropout: 0.2
"""

VOCODER_BLOCK = """\
vocoder:
  model: "HifiGAN"
  speaker: "universal"
"""


def gen_model():
    def fs2(enc=4, dec=6, tail=""):
        return FS2_BLOCK.format(enc=enc, dec=dec) + tail

    write("model/base.yaml",
          "# FastSpeech2 base (reference: config/model/base.yaml)\n"
          + fs2(tail="\nmulti_speaker: true\nmulti_lingual: true\n"
                     "max_seq_len: 1000\n\n" + VOCODER_BLOCK))
    write("model/dev.yaml",
          "# Small dev model (reference: config/model/dev.yaml)\n"
          + fs2(enc=2, dec=2,
                tail="\nmulti_speaker: true\nmulti_lingual: true\n"
                     "max_seq_len: 1000\n\n" + VOCODER_BLOCK))
    write("model/fastspeech2.yaml",
          "# Single-lingual FastSpeech2 with d-vector speakers "
          "(reference: config/model/fastspeech2.yaml)\n"
          + fs2(tail="\nmulti_speaker: true\nmax_seq_len: 1000\n"
                     "speaker_emb: dvec\n\n" + VOCODER_BLOCK))
    write("model/multilingual-fastspeech2.yaml",
          "# Multilingual FastSpeech2 + d-vec "
          "(reference: config/model/multilingual-fastspeech2.yaml)\n"
          + fs2(tail="\nmulti_speaker: true\nmulti_lingual: true\n"
                     "max_seq_len: 1500\nspeaker_emb: dvec\n\n"
                     + VOCODER_BLOCK))
    write("model/fscl-fastspeech2.yaml",
          "# FSCL (TransEmb) model: base + codebook attention\n"
          "# (reference: config/model/fscl-fastspeech2.yaml)\n"
          "codebook_size: 128\n" + DOWNSTREAM_BLOCK + "\n"
          + fs2(tail="\nmulti_speaker: true\nmulti_lingual: true\n"
                     "max_seq_len: 1000\nspeaker_emb: dvec\n\n"
                     + VOCODER_BLOCK))
    write("model/new_dev.yaml",
          "# Dev model with a small codebook "
          "(reference: config/model/new_dev.yaml)\n"
          + fs2(tail="\nmulti_speaker: true\nmulti_lingual: true\n"
                     "max_seq_len: 1000\ncodebook_size: 30\n"
                     "representation_dim: 1024\n\n" + VOCODER_BLOCK))
    write("model/downstream.yaml",
          "# SSL downstream head (reference: config/model/downstream.yaml)\n"
          "codebook_size: 128\n" + DOWNSTREAM_BLOCK)
    write("model/tacot2u.yaml",
          "# Tacotron2 text-to-unit (reference: config/model/tacot2u.yaml)\n"
          + TACOTRON2_BLOCK)
    write("model/fscl-t2u.yaml",
          "# FSCL T2U: codebook + Tacotron2 T2U "
          "(reference: config/model/fscl-t2u.yaml)\n"
          "codebook_size: 128\n" + DOWNSTREAM_BLOCK + "\n" + TACOTRON2_BLOCK)
    write("model/fscl-t2u-e2e.yaml",
          "# E2E chain: T2U + frozen U2S from model cards "
          "(reference: config/model/fscl-t2u-e2e.yaml)\n"
          "t2u:\n  codebook_size: 128\n"
          + "".join("  " + line + "\n" for line in
                    DOWNSTREAM_BLOCK.splitlines())
          + "".join("  " + line + "\n" for line in
                    TACOTRON2_BLOCK.splitlines())
          + ("u2s:\n"
             "  model_cards: \"evaluation/_exp1/model.json\"\n"
             "  model_name: \"u2s-zhkofrdees-hubert_large_ll60k-24-512c\"\n"
             + "".join("  " + line + "\n" for line in
                       fs2(tail="\nmulti_speaker: true\nmulti_lingual: true"
                                "\nmax_seq_len: 1500\nspeaker_emb: dvec\n\n"
                                + VOCODER_BLOCK).splitlines())))


# ---------------------------------------------------------------------------
# algorithm/  (reference: config/algorithm/**.yaml)
# ---------------------------------------------------------------------------

def adapt_block(atype="lang", cls="MAML", spk="dvec",
                pe=("codebook", 128, "soft-m"), mods=None,
                task=(1, 32, 8, 0.001), steps=0, mbs=1,
                test=(20000, None, None, None), imaml=None) -> str:
    """Emit the reference-shaped nested adapt block."""
    lines = ["adapt:", f"  type: {atype}", f"  class: {cls}",
             f"  speaker_emb: {spk}"]
    if imaml is not None:
        k, reg = imaml
        lines += ["  imaml:", f"    K: {k}", f"    reg_param: {reg}"]
    if pe is not None:
        kind, size, att = pe
        lines.append("  phoneme_emb:")
        lines.append(f"    type: {kind}")
        if kind == "codebook":
            lines += [f"    size: {size}",
                      "    representation_dim: 1024",
                      "    attention:",
                      f"      type: {att}",
                      "      share: false"]
        else:
            lines.append("    refresh: false")
    mods = mods or ["encoder", "variance_adaptor", "decoder",
                    "mel_linear", "postnet"]
    lines.append("  modules:")
    lines += [f"    - {m}" for m in mods]
    ways, shots, queries, lr = task
    lines += ["  task: &task",
              f"    ways: {ways}", f"    shots: {shots}",
              f"    queries: {queries}", f"    lr: {lr}"]
    lines += ["  train:", "    <<: *task", f"    steps: {steps}",
              f"    meta_batch_size: {mbs}"]
    te_steps, te_bs, te_shots, te_q = test
    lines += ["  test:", "    <<: *task", f"    steps: {te_steps}"]
    if te_bs is not None:
        lines.append(f"    batch_size: {te_bs}")
    if te_shots is not None:
        lines.append(f"    shots: {te_shots}")
    if te_q is not None:
        lines.append(f"    queries: {te_q}")
    return "\n".join(lines) + "\n"


def algo(path, type_, name=None, deprecated=None, head_extra="",
         body_extra="", **adapt_kw):
    name = name or type_
    head = (f"# Algorithm config (reference: config/algorithm/{path})\n"
            + head_extra)
    body = f"name: {name}\ntype: {type_}\n"
    if deprecated:
        body += ("# upstream keeps this type out of its live registry "
                 "(lightning/systems/__init__.py); kept for inventory\n"
                 "deprecated: true\n")
    body += body_extra
    if adapt_kw.get("no_adapt"):
        pass
    else:
        body += "\n" + adapt_block(**{k: v for k, v in adapt_kw.items()
                                      if k != "no_adapt"})
    write(f"algorithm/{path}", head + body)


def gen_algorithm():
    std = dict()  # the common fscl-style adapt block

    # --- language/
    algo("language/baseline.yaml", "baseline", no_adapt=True)
    algo("language/baseline-tune.yaml", "baseline-tune", no_adapt=True)
    algo("language/conti-ae.yaml", "conti-ae", no_adapt=True)
    algo("language/fscl.yaml", "fscl", **std)
    algo("language/fscl-orig.yaml", "fscl-orig", **std)
    algo("language/fscl-orig-tune.yaml", "fscl-orig-tune", no_adapt=True)
    algo("language/fscl-tune.yaml", "fscl-tune", no_adapt=True)
    algo("language/fscl-ada1.yaml", "fscl-ada1",
         test=(20000, None, 32, 8), **std)
    algo("language/fscl-ada2.yaml", "fscl-ada2",
         test=(20000, None, 32, 8), **std)
    algo("language/semi-fscl.yaml", "semi-fscl",
         test=(20000, None, 32, 8), **std)
    algo("language/semi-fscl-tune.yaml", "semi-fscl-tune",
         test=(20000, None, 32, 8), **std)
    algo("language/meta.yaml", "meta",
         test=(20000, None, 32, 8), **std)
    algo("language/imaml.yaml", "imaml", cls="iMAML",
         pe=("codebook", 100, "hard"),
         mods=["encoder", "mel_linear", "postnet"],
         task=(1, 20, 5, 0.001), steps=50, test=(100, None, 20, 1),
         imaml=(5, 1))
    algo("language/hard-tune.yaml", "meta-tune", name="meta-tune",
         pe=("codebook", 128, "hard"), task=(1, 64, 16, 0.001), steps=5,
         test=(20000, 16, 64, 16), deprecated=True)
    algo("language/soft-tune.yaml", "meta-tune", name="meta-tune",
         task=(1, 64, 16, 0.001), steps=5, test=(20000, 16, 64, 16),
         deprecated=True)
    algo("language/dual.yaml", "dual-meta", test=(20000, None, 32, 8),
         deprecated=True)
    algo("language/dual-tune.yaml", "dual-tune",
         task=(1, 64, 16, 0.001), steps=5, test=(20000, 16, 64, 16),
         deprecated=True)
    algo("language/asr-center.yaml", "asr-center",
         pe=("codebook", 100, "hard"),
         mods=["encoder", "mel_linear", "postnet"],
         task=(1, 12, 4, 0.001), steps=5, test=(500, 4, 64, 4),
         deprecated=True)
    algo("language/asr.yaml", "asr-center-ref", name="asr-center-ref",
         pe=("codebook", 128, "hard"),
         mods=["encoder", "mel_linear", "postnet"],
         task=(1, 64, 16, 0.001), steps=0, test=(500, 4, 64, 4),
         deprecated=True)

    # --- legacy root configs (meta-TTS lineage)
    for fname, type_, name, spk in [
            ("base_share_emb_va_d", "baseline", "base_emb_va_d shared",
             "shared"),
            ("base_table_emb_va_d", "baseline", "base_emb_va_d table",
             "table"),
            ("meta_share_emb_va_d", "meta", "meta_emb_va_d shared",
             "shared"),
            ("meta_table_emb_va_d", "meta", "meta_emb_va_d table", "table")]:
        algo(f"{fname}.yaml", type_, name=name, atype="lang", cls="MAML",
             spk=spk, pe=None,
             mods=["speaker_emb", "variance_adaptor", "decoder",
                   "mel_linear", "postnet"],
             test=(100, None, None, 1))
    algo("dvec.yaml", "baseline", name="dvec", spk="dvec", pe=None,
         mods=[], test=(0, None, None, 1))
    algo("encoder.yaml", "baseline", name="encoder", spk="encoder", pe=None,
         mods=[], test=(0, None, None, 1))
    algo("scratch_encoder.yaml", "baseline", name="scratch encoder",
         spk="scratch_encoder", pe=None, mods=[], test=(0, None, None, 1))
    algo("dev.yaml", "imaml", name="dev meta_emb_va_d table", cls="iMAML",
         spk="table", pe=("codebook", 30, "hard"), task=(1, 10, 5, 0.001),
         steps=2, test=(100, None, 10, 1), body_extra="pretrain: 6000\n",
         imaml=(5, 1))
    algo("dev_maml.yaml", "meta", name="dev meta_emb_va_d table",
         spk="table", pe=("codebook", 30, "hard"), task=(1, 20, 5, 0.001),
         steps=5, test=(100, None, 20, 1), body_extra="pretrain: 20000\n")
    algo("meta_emb.yaml", "meta", name="meta_emb table", spk="table",
         pe=("codebook", 100, "hard"),
         mods=["encoder", "mel_linear", "postnet"],
         task=(1, 20, 5, 0.001), steps=5, test=(100, None, 20, 1),
         body_extra="pretrain: 30000\n")
    algo("meta_lingual.yaml", "meta", name="meta-lingual-debug",
         atype="lang", spk="table", pe=None, test=(100, None, None, 25),
         body_extra="meta_type: lang\n")

    # --- phoneme_recognition/
    pr_std = dict(pe=("embedding", None, None), task=(1, 20, 5, 0.001),
                  steps=5, test=(20000, 16, 64, 16))
    algo("phoneme_recognition/ssl-baseline.yaml", "pr-ssl-baseline",
         name="ssl-baseline", **pr_std)
    algo("phoneme_recognition/ssl-baseline-tune.yaml",
         "pr-ssl-baseline-tune", name="ssl-baseline-tune", **pr_std)
    algo("phoneme_recognition/ssl-linear-tune.yaml", "pr-ssl-linear-tune",
         name="ssl-linear-tune", **pr_std)
    algo("phoneme_recognition/ssl-cluster.yaml", "pr-ssl-cluster",
         name="ssl-cluster", **pr_std)
    algo("phoneme_recognition/ssl-cluster-tune.yaml", "pr-ssl-cluster-tune",
         name="ssl-cluster-tune", **pr_std)
    algo("phoneme_recognition/ssl-codebook-cluster.yaml",
         "pr-ssl-codebook-cluster", name="ssl-codebook-cluster",
         deprecated=True, **pr_std)
    algo("phoneme_recognition/ssl-protonet.yaml", "pr-ssl-protonet",
         name="ssl-protonet", test=(20000, None, 32, 8))
    algo("phoneme_recognition/pr-fscl.yaml", "pr-fscl",
         test=(20000, None, 32, 8))
    algo("phoneme_recognition/pr-fscl-tune.yaml", "pr-fscl-tune",
         test=(20000, None, 32, 8))

    # --- t2u/
    algo("t2u/tacot2u.yaml", "tacot2u", no_adapt=True)
    algo("t2u/fscl.yaml", "fscl-t2u", test=(20000, None, 32, 8))
    algo("t2u/fscl-orig.yaml", "fscl-t2u-orig", test=(20000, None, 32, 8))
    algo("t2u/fscl-c.yaml", "fscl-t2u-codebook", test=(20000, None, 32, 8))
    algo("t2u/fscl-c2.yaml", "fscl-t2u-codebook2", test=(20000, None, 32, 8))
    for fname, type_ in [("fscl-tune", "fscl-t2u-tune"),
                         ("fscl-orig-tune", "fscl-t2u-orig-tune"),
                         ("fscl-da-tune", "fscl-t2u-da-tune"),
                         ("fscl-e2e-tune", "fscl-t2u-e2e-tune"),
                         ("fscl-c-e2e-tune", "fscl-t2u-c-e2e-tune"),
                         ("fscl-c2-e2e-tune", "fscl-t2u-c2-e2e-tune"),
                         ("fscl-c-da-e2e-tune", "fscl-t2u-c-da-e2e-tune")]:
        algo(f"t2u/{fname}.yaml", type_, no_adapt=True)


if __name__ == "__main__":
    gen_preprocess()
    gen_train()
    gen_model()
    gen_algorithm()
    n = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print(f"config tree generated: {n} files under {ROOT}")
