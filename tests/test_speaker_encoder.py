"""Speaker encoder variants: table/shared/GE2E d-vector."""
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.nn.speaker_encoder import GE2EEncoder, SpeakerEncoder


def test_table_and_shared():
    for emb_type in ("table", "shared"):
        enc = SpeakerEncoder(emb_type=emb_type, n_speakers=4, d_model=16)
        ids = jnp.array([0, 1, 3])
        v = enc.init(jax.random.PRNGKey(0), ids)
        out = enc.apply(v, ids)
        assert out.shape == (3, 16)
        if emb_type == "shared":
            # all speakers share one embedding
            np.testing.assert_allclose(np.asarray(out[0]),
                                       np.asarray(out[2]))


def test_ge2e_dvector():
    enc = GE2EEncoder(hidden_size=32, out_dim=16)
    slices = jax.random.normal(jax.random.PRNGKey(0), (3, 160, 40))
    v = enc.init(jax.random.PRNGKey(1), slices)
    d = enc.apply(v, slices)
    assert d.shape == (16,)
    np.testing.assert_allclose(float(jnp.linalg.norm(d)), 1.0, atol=1e-3)


def test_speaker_encoder_dvec_batch():
    enc = SpeakerEncoder(emb_type="dvec", d_model=16)
    mel_slices = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 160, 40))
    v = enc.init(jax.random.PRNGKey(1), mel_slices)
    out = enc.apply(v, mel_slices)
    assert out.shape == (2, 16)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
