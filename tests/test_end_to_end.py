"""End-to-end mini-corpus smoke: synthetic wavs + TextGrids -> preprocess ->
splits -> datamodule -> Trainer (3 steps) -> synthesis. Mirrors the
reference's --debug flow (SURVEY §4.3)."""
import os

import numpy as np
import pytest


PHONES = ["HH", "AY1", "W", "ER1", "L", "D", "K", "AE1", "T", "S"]


def synth_textgrid(phones, seg_dur=0.12, lead=0.05):
    xmax = lead + len(phones) * seg_dur + 0.05
    intervals = [(0.0, lead, "")]
    t = lead
    for p in phones:
        intervals.append((t, t + seg_dur, p))
        t += seg_dur
    intervals.append((t, xmax, ""))
    body = "".join(
        f"        intervals [{i+1}]:\n"
        f"            xmin = {a}\n            xmax = {b}\n"
        f"            text = \"{p}\"\n"
        for i, (a, b, p) in enumerate(intervals))
    return (
        'File type = "ooTextFile"\nObject class = "TextGrid"\n\n'
        f"xmin = 0\nxmax = {xmax}\ntiers? <exists>\nsize = 1\nitem []:\n"
        "    item [1]:\n        class = \"IntervalTier\"\n"
        "        name = \"phones\"\n"
        f"        xmin = 0\n        xmax = {xmax}\n"
        f"        intervals: size = {len(intervals)}\n" + body)


@pytest.fixture(scope="module")
def mini_corpus(tmp_path_factory):
    from fscl_tpu.core.config import DataConfig, ModelConfig
    from fscl_tpu.data.feature_store import FeatureStore, write_queries_to_txt
    from fscl_tpu.dsp.audio_io import save_wav
    from fscl_tpu.dsp.preprocess import (
        compute_stats, prepare_initial_features, preprocess_utterance,
    )

    root = tmp_path_factory.mktemp("corpus")
    store = FeatureStore(str(root / "features"))
    rng = np.random.default_rng(0)
    sr = 22050
    queries = []
    samples = []
    for i in range(6):
        n_ph = int(rng.integers(4, 8))
        phones = [PHONES[int(j)] for j in rng.integers(0, len(PHONES), n_ph)]
        dur = 0.05 + n_ph * 0.12 + 0.05
        t = np.arange(int(sr * dur)) / sr
        f = 150 + 30 * int(rng.integers(0, 4))
        wav = (0.4 * np.sin(2 * np.pi * f * t)
               + 0.05 * rng.normal(size=len(t))).astype(np.float32)
        wav_path = str(root / f"u{i}.wav")
        save_wav(wav_path, wav, sr)
        tg_path = str(root / f"u{i}.TextGrid")
        with open(tg_path, "w") as fh:
            fh.write(synth_textgrid(phones))
        q = {"spk": "spk0", "basename": f"u{i}"}
        prepare_initial_features(store, q, wav_path, "dummy text")
        s = preprocess_utterance(store, q, tg_path)
        assert s is not None
        samples.append(s)
        queries.append(q)
    compute_stats(samples, store)
    store.save_speakers(["spk0"])
    store.flush()
    split_dir = root / "splits"
    os.makedirs(split_dir, exist_ok=True)
    write_queries_to_txt(store, queries, str(split_dir / "train.txt"))
    write_queries_to_txt(store, queries[:2], str(split_dir / "val.txt"))
    dc = DataConfig(
        name="mini", lang_id=0, symbol_id="en",
        data_dir=store.root,
        subsets=(("train", str(split_dir / "train.txt")),
                 ("val", str(split_dir / "val.txt"))),
        text_cleaners=("basic_cleaners",))
    return store, dc


def test_supervised_training_end_to_end(mini_corpus):
    import jax
    from fscl_tpu.core.config import (
        ModelConfig, OptimConfig, SpeakerConfig, TrainConfig,
        TransformerConfig,
    )
    from fscl_tpu.data.datamodules import get_datamodule
    from fscl_tpu.frontend import n_symbols
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.train.trainer import Trainer

    store, dc = mini_corpus
    model_cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=32, encoder_head=2,
            decoder_head=2),
        max_seq_len=64,
        speaker=SpeakerConfig(n_speakers=1))
    train_cfg = TrainConfig(
        optim=OptimConfig(batch_size=2), total_step=3,
        log_step=1, val_step=2, save_step=100)

    dm_cls = get_datamodule("baseline")
    dm = dm_cls([dc], model_cfg, train_cfg)
    dm.setup()

    system = BaselineSystem(model_cfg, train_cfg.optim,
                            (("en", n_symbols("en")),))
    batches = dm.train_batches()
    example = next(batches)
    state = system.init_state(jax.random.PRNGKey(0), example)

    logged = []

    class Rec:
        def on_log(self, step, metrics, **kw):
            logged.append(metrics)
        def on_validation(self, step, metrics):
            logged.append(("val", metrics))
        def on_save(self, step, state):
            pass

    from fscl_tpu.obs.synth_saver import SynthSaver
    synth_dir = str(store.root) + "-synth"
    saver = SynthSaver(synth_dir, system, synth_step=2, write_audio=False)
    trainer = Trainer(system, train_cfg, callbacks=[Rec(), saver])
    state = trainer.fit(state, batches, val_loader=lambda: dm.val_batches())
    assert int(state.step) == 3
    assert any(isinstance(e, dict) for e in logged)
    assert any(isinstance(e, tuple) and e[0] == "val" for e in logged)
    # synth saver emitted recon+synth figures at the val step
    import glob
    assert glob.glob(os.path.join(synth_dir, "step2-recon.png"))
    assert glob.glob(os.path.join(synth_dir, "step2-synth.png"))

    # synthesis through the trained params
    sample = dm.train_set[0]
    import jax.numpy as jnp
    texts = jnp.asarray(sample["phonemes"][None].astype(np.int32))
    out = system.synthesize(
        state.params, state.batch_stats, texts,
        jnp.asarray([texts.shape[1]]), 64,
        jnp.asarray([0]), jnp.asarray([0]))
    assert np.isfinite(np.asarray(out.postnet_mel)).all()

    # checkpoint round-trip + resume (ModelCheckpoint/resume semantics)
    from fscl_tpu.core.checkpoint import CheckpointManager
    ckpt_dir = str(store.root) + "-ckpt"
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(int(state.step), state)
    fresh = system.init_state(jax.random.PRNGKey(7), example)
    resumed = mgr.restore_into(fresh)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(resumed.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_fscl_datamodule_episodes(mini_corpus):
    from fscl_tpu.core.config import (
        ModelConfig, OptimConfig, SpeakerConfig, TrainConfig,
        TransformerConfig, UpstreamConfig,
    )
    from fscl_tpu.data.datamodules import get_datamodule

    store, dc = mini_corpus
    model_cfg = ModelConfig(
        upstream=UpstreamConfig(name="hubert_tiny", dim=16, n_layers=2),
        speaker=SpeakerConfig(n_speakers=1))
    train_cfg = TrainConfig(optim=OptimConfig(batch_size=1))
    dm = get_datamodule("fscl")(
        [dc], model_cfg, train_cfg, shots=4, queries=2, n_tasks_per_label=2,
        exp_dir=str(store.root))
    dm.setup()
    episode = next(iter(dm.train_batches()))
    assert episode.sup.wavs.shape[0] == 4
    assert episode.qry.texts.shape[0] == 2
    val = dm.val_batches()
    assert len(val) == 2
    # deterministic replay: second call identical
    val2 = dm.val_batches()
    np.testing.assert_array_equal(val[0].qry.texts, val2[0].qry.texts)


def test_dvec_datamodule_and_train_step(mini_corpus):
    """d-vector speaker path wired through datamodule -> collate -> system:
    speaker_args arrives as DvecRefs (padded GE2E mel slices + mask) and one
    supervised train step runs on it (speaker_encoder.py:115-136 "dvec")."""
    import jax
    import jax.numpy as jnp
    from fscl_tpu.core.config import (
        ModelConfig, OptimConfig, SpeakerConfig, TrainConfig,
        TransformerConfig,
    )
    from fscl_tpu.data.batch import DvecRefs
    from fscl_tpu.data.datamodules import get_datamodule
    from fscl_tpu.frontend import n_symbols
    from fscl_tpu.systems.baseline import BaselineSystem

    _, dc = mini_corpus
    model_cfg = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=32, encoder_head=2,
            decoder_head=2),
        max_seq_len=64,
        speaker=SpeakerConfig(emb_type="dvec", n_ref_slices=4))
    train_cfg = TrainConfig(optim=OptimConfig(batch_size=2), total_step=1)

    dm = get_datamodule("baseline")([dc], model_cfg, train_cfg)
    dm.setup()
    batch = next(dm.train_batches())
    assert isinstance(batch.speaker_args, DvecRefs)
    assert batch.speaker_args.slices.shape[1:] == (4, 160, 40)
    assert batch.speaker_args.mask.max() == 1.0

    system = BaselineSystem(model_cfg, train_cfg.optim,
                            (("en", n_symbols("en")),))
    state = system.init_state(jax.random.PRNGKey(0), batch)
    state2, metrics = system.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Total Loss"]))
    # gradient flows through the GE2E d-vector encoder (not frozen here:
    # freezing for emb_type="dvec" is an optimizer partition, train/optim.py)
    grad_fn = jax.grad(
        lambda p: system.loss_and_metrics(
            p, state.batch_stats, batch, jax.random.PRNGKey(2), True)[0])
    g = grad_fn(state.params)["model"]["speaker_emb"]["ge2e"]["proj"]["kernel"]
    assert float(jnp.abs(g).max()) > 0.0
