"""HuBERT weight-converter parity vs a tiny HuggingFace HubertModel."""
import numpy as np
import pytest

try:
    import torch
    from transformers import HubertConfig, HubertModel
    HAVE_HF = True
except Exception:
    HAVE_HF = False

pytestmark = pytest.mark.skipif(not HAVE_HF, reason="transformers missing")


def test_hubert_conversion_parity():
    import jax.numpy as jnp
    from fscl_tpu.models.hubert import SSLUpstream, convert_torch_checkpoint

    torch.manual_seed(0)
    hf_cfg = HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[512] * 7,
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
    )
    hf = HubertModel(hf_cfg).eval()
    variables = convert_torch_checkpoint(hf.state_dict())

    ours = SSLUpstream(dim=32, n_layers=2, n_heads=2, ffn_dim=64,
                       layer_norm_first=True, pos_conv_kernel=16,
                       pos_conv_groups=4)
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(1, 8000)).astype(np.float32) * 0.1

    with torch.no_grad():
        hf_out = hf(torch.from_numpy(wav), output_hidden_states=True)
    hf_hidden = [h.numpy() for h in hf_out.hidden_states]

    hidden, _ = ours.apply(variables, jnp.asarray(wav))
    hidden = np.asarray(hidden)     # (1, T, n_layers+1, 32)

    # HF's LAST hidden state has the final encoder LayerNorm applied
    # (stable-LN variant); s3prl/fairseq layer_results (our convention)
    # do not — apply it manually for the comparison.
    ln_w = hf.state_dict()["encoder.layer_norm.weight"].numpy()
    ln_b = hf.state_dict()["encoder.layer_norm.bias"].numpy()

    def final_ln(x):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-5) * ln_w + ln_b

    for i in range(3):
        a = hidden[0, :, i, :]
        if i == 2:
            a = final_ln(a)
        b = hf_hidden[i][0]
        n = min(len(a), len(b))
        err = np.max(np.abs(a[:n] - b[:n]))
        denom = max(np.max(np.abs(b[:n])), 1e-3)
        assert err / denom < 5e-3, (i, err, denom)


def test_scan_layers_matches_unrolled():
    """scan_layers=True computes the same hidden stack as the unrolled
    model once the per-layer params are stacked."""
    import jax
    import numpy as np

    from fscl_tpu.models.hubert import (
        SSLUpstream, stack_layer_params, unstack_layer_params,
    )

    kw = dict(dim=32, n_layers=3, n_heads=2, ffn_dim=64)
    unrolled = SSLUpstream(**kw)
    scanned = SSLUpstream(**kw, scan_layers=True)
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 4000)).astype(np.float32)
    valid = np.ones_like(wav, bool)
    variables = unrolled.init(jax.random.PRNGKey(0), wav, valid)
    h_ref, v_ref = unrolled.apply(variables, wav, valid)

    stacked = {"params": stack_layer_params(variables["params"], 3)}
    h_scan, v_scan = scanned.apply(stacked, wav, valid)
    assert h_scan.shape == h_ref.shape
    np.testing.assert_allclose(np.asarray(h_scan), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(v_scan), np.asarray(v_ref))

    # round trip back to the per-layer layout
    back = unstack_layer_params(stacked["params"])
    h2, _ = unrolled.apply({"params": back}, wav, valid)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_ref),
                               rtol=1e-6, atol=1e-6)


def test_adapt_layer_layout_auto_stacks():
    """load_upstream on a scan_layers system auto-stacks a converted
    per-layer checkpoint (and the reverse direction unstacks)."""
    import jax
    import numpy as np

    from fscl_tpu.models.hubert import SSLUpstream, adapt_layer_layout

    kw = dict(dim=32, n_layers=3, n_heads=2, ffn_dim=64)
    unrolled = SSLUpstream(**kw)
    scanned = SSLUpstream(**kw, scan_layers=True)
    rng = np.random.default_rng(1)
    wav = rng.normal(size=(1, 4000)).astype(np.float32)
    valid = np.ones_like(wav, bool)
    per_layer = unrolled.init(jax.random.PRNGKey(0), wav, valid)
    h_ref, _ = unrolled.apply(per_layer, wav, valid)

    auto = adapt_layer_layout(scanned, per_layer)
    assert "layers" in auto["params"] and "layer_0" not in auto["params"]
    h_scan, _ = scanned.apply(auto, wav, valid)
    np.testing.assert_allclose(np.asarray(h_scan), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)

    # reverse: scan checkpoint into an unrolled model
    back = adapt_layer_layout(unrolled, auto)
    assert "layer_0" in back["params"] and "layers" not in back["params"]
    h2, _ = unrolled.apply(back, wav, valid)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    # already-matching layouts pass through unchanged
    assert adapt_layer_layout(unrolled, per_layer) is per_layer
    assert adapt_layer_layout(scanned, auto) is auto
