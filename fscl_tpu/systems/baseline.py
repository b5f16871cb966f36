"""BaselineSystem: supervised multilingual FastSpeech2.

Equivalent of lightning/systems/language/FastSpeech2.py:13-141 — a
MultilingualEmbedding feeding the headless FastSpeech2, trained with the
full FastSpeech2 loss; `synthesize` mirrors the `inference()` API
(FastSpeech2.py:112-141).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fscl_tpu.core.config import ModelConfig, OptimConfig
from fscl_tpu.core.registry import SYSTEMS
from fscl_tpu.core.stats import DEFAULT_STATS, GlobalStats
from fscl_tpu.data.batch import Batch
from fscl_tpu.models.fastspeech2 import FastSpeech2
from fscl_tpu.nn.embeddings import MultilingualEmbedding
from fscl_tpu.nn.losses import fastspeech2_loss
from fscl_tpu.systems.base import System


@SYSTEMS.register("baseline", "baseline-tune")
class BaselineSystem(System):
    def __init__(
        self,
        model_cfg: ModelConfig,
        optim_cfg: OptimConfig,
        id2symbols: Tuple[Tuple[str, int], ...],
        stats: GlobalStats = DEFAULT_STATS,
    ):
        super().__init__(optim_cfg)
        self.model_cfg = model_cfg
        self.stats = stats
        self.embedding_model = MultilingualEmbedding(
            id2symbols, model_cfg.transformer.encoder_hidden)
        self.model = FastSpeech2(model_cfg, stats)

    # -- setup ---------------------------------------------------------------
    def init_variables(self, rng, batch: Batch) -> Dict[str, Any]:
        r1, r2 = jax.random.split(rng)
        from fscl_tpu.systems.base import jit_init
        emb_vars = jit_init(self.embedding_model)(r1, jnp.asarray(batch.texts))
        emb = self.embedding_model.apply(emb_vars, jnp.asarray(batch.texts))
        T = batch.mels.shape[1]
        model_vars = jit_init(self.model, static_argnums=(3,))(
            r2, emb, jnp.asarray(batch.src_lens), T,
            # speaker_args may be a DvecRefs pytree (slices, mask), not a
            # flat id array — map asarray over its leaves
            speaker_args=jax.tree.map(jnp.asarray, batch.speaker_args),
            mel_lens=jnp.asarray(batch.mel_lens),
            p_targets=jnp.asarray(batch.pitches),
            e_targets=jnp.asarray(batch.energies),
            d_targets=jnp.asarray(batch.durations),
            lang_args=jnp.asarray(batch.lang_ids),
        )
        variables = {"params": {"embedding": emb_vars["params"],
                                "model": model_vars["params"]}}
        if "batch_stats" in model_vars:
            variables["batch_stats"] = {"model": model_vars["batch_stats"]}
        return variables

    def trainable_mask(self, params):
        """emb_type="dvec" keeps the pretrained GE2E speaker encoder frozen
        ("encoder"/"scratch_encoder" fine-tune it) — reference
        speaker_encoder.py:115-136 detaches the d-vector path."""
        freeze_ge2e = self.model_cfg.speaker.emb_type == "dvec"

        def f(path, _):
            in_ge2e = any(getattr(p, "key", None) == "ge2e" for p in path)
            return not (freeze_ge2e and in_ge2e)

        return jax.tree_util.tree_map_with_path(f, params)

    # -- forward -------------------------------------------------------------
    def forward(self, params, batch_stats, batch: Batch, rng=None,
                train: bool = False, symbol_id: Optional[str] = None):
        emb = self.embedding_model.apply(
            {"params": params["embedding"]}, batch.texts, symbol_id)
        model_vars = {"params": params["model"]}
        mutable = []
        if batch_stats is not None:
            model_vars["batch_stats"] = batch_stats["model"]
            mutable = ["batch_stats"] if train else []
        rngs = {"dropout": rng} if train and rng is not None else None
        T = batch.mels.shape[1]
        out = self.model.apply(
            model_vars, emb, batch.src_lens, T,
            speaker_args=batch.speaker_args,
            mel_lens=batch.mel_lens,
            p_targets=batch.pitches, e_targets=batch.energies,
            d_targets=batch.durations,
            lang_args=batch.lang_ids,
            deterministic=not train,
            rngs=rngs, mutable=mutable if mutable else False,
        )
        new_bs = None
        if mutable:
            out, updates = out
            new_bs = {"model": updates["batch_stats"]}
        return out, new_bs

    def loss_and_metrics(self, params, batch_stats, batch: Batch, rng, train,
                         frozen=None):
        out, new_bs = self.forward(params, batch_stats, batch, rng, train)
        losses = fastspeech2_loss(
            out.mel, out.postnet_mel, out.pitch_prediction,
            out.energy_prediction, out.log_duration_prediction,
            batch.mels, batch.pitches, batch.energies, batch.durations,
            out.src_valid, out.mel_valid,
            self.model_cfg.variance.pitch_feature,
            self.model_cfg.variance.energy_feature,
        )
        return losses.total, (losses.as_dict(), new_bs)

    # -- inference -----------------------------------------------------------
    def synthesize_bucketed(self, params, batch_stats, texts, src_lens,
                            speaker_args, lang_ids,
                            symbol_id: Optional[str] = None,
                            mel_buckets=(128, 256, 512, 1000),
                            **controls):
        """Two-pass serving synthesis: (1) cheap length prediction (encoder +
        duration predictor), (2) full synthesis at the smallest static mel
        bucket covering the batch. Each (L, T) pair compiles once; avoids
        paying max_seq_len decoder cost for short utterances."""
        import numpy as np

        from fscl_tpu.models.fastspeech2 import FastSpeech2

        if not hasattr(self, "_len_fns"):
            self._len_fns = {}
            self._synth_fns = {}
        L = (texts.shape[1], symbol_id)
        if L not in self._len_fns:
            emb_fn = self.embedding_model
            model = self.model

            def predict_len(params, t, s, sp, lg):
                emb = emb_fn.apply({"params": params["embedding"]}, t,
                                   symbol_id)
                return model.apply(
                    {"params": params["model"]}, emb, s,
                    speaker_args=sp, lang_args=lg,
                    method=FastSpeech2.predict_mel_len)

            self._len_fns[L] = jax.jit(predict_len)
        mel_len = self._len_fns[L](params, texts, src_lens, speaker_args,
                                   lang_ids)
        max_len = int(np.max(np.asarray(mel_len)))
        T = next((b for b in mel_buckets if max_len <= b), mel_buckets[-1])

        key = (L, T, tuple(sorted(controls.items())))
        if key not in self._synth_fns:
            self._synth_fns[key] = jax.jit(
                lambda p, bs, t, s, sp, lg: self.synthesize(
                    p, bs, t, s, T, sp, lg, symbol_id=symbol_id, **controls))
        return self._synth_fns[key](params, batch_stats, texts, src_lens,
                                    speaker_args, lang_ids)

    def synthesize(self, params, batch_stats, texts, src_lens, max_mel_len,
                   speaker_args, lang_ids, symbol_id: Optional[str] = None,
                   p_control=1.0, e_control=1.0, d_control=1.0):
        """No-target forward: durations/pitch/energy predicted
        (language/FastSpeech2.py:112-141)."""
        emb = self.embedding_model.apply(
            {"params": params["embedding"]}, texts, symbol_id)
        model_vars = {"params": params["model"]}
        if batch_stats is not None:
            model_vars["batch_stats"] = batch_stats["model"]
        return self.model.apply(
            model_vars, emb, src_lens, max_mel_len,
            speaker_args=speaker_args, lang_args=lang_ids,
            p_control=p_control, e_control=e_control, d_control=d_control,
        )
