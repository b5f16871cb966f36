"""Batched jitted eval logits match the per-sample eager path."""
import numpy as np


def test_batched_pr_logits_match_eager():
    import jax

    from fscl_tpu.core.config import (
        ModelConfig, OptimConfig, TransformerConfig, UpstreamConfig,
    )
    from fscl_tpu.eval.protonet_eval import (
        _pr_batch_from_samples, batched_pr_logits,
    )
    from fscl_tpu.models.hubert import SSLUpstream
    from fscl_tpu.systems.pr import PRBatch, SSLLinearSystem

    cfg = ModelConfig(
        transformer=TransformerConfig(encoder_hidden=16, encoder_head=2),
        upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2))
    system = SSLLinearSystem(
        cfg, OptimConfig(), (("en", 40),),
        upstream=SSLUpstream(dim=16, n_layers=1, n_heads=2, ffn_dim=32))

    rng = np.random.default_rng(0)
    init_batch = PRBatch(
        wavs=rng.normal(size=(2, 3200)).astype(np.float32),
        wav_lens=np.full((2,), 3200, np.int32),
        avg_frames=np.full((2, 3), 3, np.int32),
        phonemes=np.ones((2, 3), np.int32),
        lang_ids=np.zeros(2, np.int32), n_symbols=40, symbol_id="en")
    variables = system.init_variables(jax.random.PRNGKey(0), init_batch)
    params = variables["params"]

    samples = []
    for i in range(5):      # odd count: exercises the pad-to-chunk path
        n_wav = int(rng.integers(2000, 6400))
        n_ph = int(rng.integers(2, 5))
        samples.append({
            "wav": rng.normal(size=n_wav).astype(np.float32),
            "avg_frames": rng.integers(1, 4, n_ph).astype(np.int64),
            "phonemes": rng.integers(1, 40, n_ph).astype(np.int64),
            "lang_id": 0,
        })

    batched = batched_pr_logits(system, params, samples, "en", 40,
                                batch_size=2)
    for s, lg in zip(samples, batched):
        eager_batch = _pr_batch_from_samples([s], "en", 40)
        eager = np.asarray(system.logits(params, eager_batch))
        n = int(np.sum(s["avg_frames"]))
        assert lg.shape == (n, eager.shape[-1])
        np.testing.assert_allclose(lg, eager[0, :n], rtol=1e-4, atol=1e-4)
