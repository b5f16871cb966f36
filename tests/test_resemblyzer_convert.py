"""GE2E d-vector converter parity vs a torch resemblyzer-style encoder.

The reference consumes pretrained resemblyzer VoiceEncoder weights for the
"encoder"/"dvec" speaker paths (speaker_encoder.py:115-136). No released
checkpoint ships in this image, so parity is proven against a randomly
initialized torch module with the exact VoiceEncoder architecture
(3-layer LSTM(40->256) -> Linear(256) -> relu -> L2-normalize, partials
averaged then re-normalized).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fscl_tpu.nn.speaker_encoder import (  # noqa: E402
    GE2EEncoder, convert_resemblyzer_checkpoint,
)


class TorchVoiceEncoder(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.lstm = torch.nn.LSTM(40, 256, num_layers=3, batch_first=True)
        self.linear = torch.nn.Linear(256, 256)

    def forward(self, mels):
        _, (hidden, _) = self.lstm(mels)
        raw = torch.relu(self.linear(hidden[-1]))
        e = raw / (torch.norm(raw, dim=1, keepdim=True) + 1e-5)
        d = e.mean(dim=0)
        return d / (torch.norm(d) + 1e-5)


def test_ge2e_matches_torch_voice_encoder():
    torch.manual_seed(0)
    ref = TorchVoiceEncoder().eval()
    slices = np.random.default_rng(0).normal(
        size=(5, 160, 40)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(slices)).numpy()

    variables = convert_resemblyzer_checkpoint(ref.state_dict())
    got = np.asarray(GE2EEncoder().apply(variables, jnp.asarray(slices)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_converted_tree_matches_model_init():
    """Converted param tree must be loadable where init() puts params —
    key-structure drift between converter and model is exactly the bug
    this guards against."""
    torch.manual_seed(1)
    ref = TorchVoiceEncoder()
    converted = convert_resemblyzer_checkpoint(ref.state_dict())
    init = GE2EEncoder().init(
        jax.random.PRNGKey(0), jnp.zeros((2, 160, 40)))
    flat_c = jax.tree_util.tree_leaves_with_path(converted["params"])
    flat_i = jax.tree_util.tree_leaves_with_path(init["params"])
    paths_c = {jax.tree_util.keystr(p) for p, _ in flat_c}
    paths_i = {jax.tree_util.keystr(p) for p, _ in flat_i}
    assert paths_c == paths_i
    by_path_c = {jax.tree_util.keystr(p): a for p, a in flat_c}
    by_path_i = {jax.tree_util.keystr(p): b for p, b in flat_i}
    for k in by_path_i:
        assert np.shape(by_path_c[k]) == np.shape(by_path_i[k]), k
