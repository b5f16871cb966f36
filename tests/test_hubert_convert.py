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


def test_hubert_large_style_layer_norm_extractor_parity():
    """hubert-large / XLSR conv extractor mode (feat_extract_norm="layer",
    conv_bias=True): per-layer conv LNs and conv biases must convert AND
    match HF numerics (VERDICT r3 missing #3/#4 — rounds 1-3 silently
    dropped these weights)."""
    import jax.numpy as jnp
    from fscl_tpu.models.hubert import SSLUpstream, convert_torch_checkpoint

    torch.manual_seed(1)
    hf_cfg = HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[512] * 7,
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        conv_bias=True,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
    )
    hf = HubertModel(hf_cfg).eval()
    variables = convert_torch_checkpoint(hf.state_dict())
    fe = variables["params"]["feature_extractor"]
    assert "conv_ln_0" in fe and "conv_ln_6" in fe and "group_norm" not in fe
    assert "bias" in fe["conv_0"]

    ours = SSLUpstream(dim=32, n_layers=2, n_heads=2, ffn_dim=64,
                       layer_norm_first=True, pos_conv_kernel=16,
                       pos_conv_groups=4, extractor_mode="layer_norm")
    rng = np.random.default_rng(1)
    wav = rng.normal(size=(1, 8000)).astype(np.float32) * 0.1
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(wav), output_hidden_states=True)
    hidden, _ = ours.apply(variables, jnp.asarray(wav))
    hidden = np.asarray(hidden)
    for i in range(2):          # pre-final-LN hiddens (s3prl convention)
        a, b = hidden[0, :, i, :], hf_out.hidden_states[i][0].numpy()
        n = min(len(a), len(b))
        err = np.max(np.abs(a[:n] - b[:n]))
        assert err / max(np.max(np.abs(b[:n])), 1e-3) < 5e-3, (i, err)


def test_wav2vec2_hf_layout_parity():
    """The reference treats wav2vec2 as an interchangeable upstream
    (Define.py:32-51); the HF Wav2Vec2Model state_dict (extra
    masked_spec_embed key, post-LN base config) must convert and match."""
    import jax.numpy as jnp
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    from fscl_tpu.models.hubert import SSLUpstream, convert_torch_checkpoint

    torch.manual_seed(2)
    hf_cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[512] * 7,
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
    )
    hf = Wav2Vec2Model(hf_cfg).eval()
    assert "masked_spec_embed" in hf.state_dict()   # ignored by converter
    variables = convert_torch_checkpoint(hf.state_dict(),
                                         layer_norm_first=False)
    ours = SSLUpstream(dim=32, n_layers=2, n_heads=2, ffn_dim=64,
                       layer_norm_first=False, pos_conv_kernel=16,
                       pos_conv_groups=4)
    rng = np.random.default_rng(2)
    wav = rng.normal(size=(1, 8000)).astype(np.float32) * 0.1
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(wav), output_hidden_states=True)
    hidden, _ = ours.apply(variables, jnp.asarray(wav))
    hidden = np.asarray(hidden)
    for i in range(3):
        a, b = hidden[0, :, i, :], hf_out.hidden_states[i][0].numpy()
        n = min(len(a), len(b))
        err = np.max(np.abs(a[:n] - b[:n]))
        assert err / max(np.max(np.abs(b[:n])), 1e-3) < 5e-3, (i, err)


def _hf_to_fairseq_keys(sd):
    """Inverse rename: build a fairseq-named state dict from an HF one
    (tiny models), to synthesize the released fairseq/s3prl layouts."""
    out = {}
    for k, v in sd.items():
        nk = k
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, what, leaf = parts[2], parts[3], parts[4]
            if what == "conv":
                nk = f"feature_extractor.conv_layers.{i}.0.{leaf}"
            else:   # layer_norm; group mode -> Sequential idx 2,
                    # layer mode -> nested Sequential ".2.1."
                layer_mode = "feature_extractor.conv_layers.1.layer_norm.weight" in sd
                mid = "2.1" if layer_mode else "2"
                nk = f"feature_extractor.conv_layers.{i}.{mid}.{leaf}"
        elif k.startswith("feature_projection.layer_norm."):
            nk = k.replace("feature_projection.", "")
        elif k.startswith("feature_projection.projection."):
            nk = k.replace("feature_projection.projection.",
                           "post_extract_proj.")
        elif k.startswith("encoder.pos_conv_embed.conv."):
            leaf = k[len("encoder.pos_conv_embed.conv."):]
            leaf = (leaf.replace("parametrizations.weight.original0",
                                 "weight_g")
                    .replace("parametrizations.weight.original1",
                             "weight_v"))
            nk = "encoder.pos_conv.0." + leaf
        elif k.startswith("encoder.layers."):
            parts = k.split(".", 3)
            sub = (parts[3]
                   .replace("attention.", "self_attn.")
                   .replace("feed_forward.intermediate_dense.", "fc1.")
                   .replace("feed_forward.output_dense.", "fc2."))
            if sub.startswith("layer_norm."):
                sub = sub.replace("layer_norm.", "self_attn_layer_norm.")
            nk = f"encoder.layers.{parts[2]}.{sub}"
        out[nk] = v
    # fairseq-only extras the converter must skip
    out["mask_emb"] = torch.zeros(sd["feature_projection.projection.bias"].shape)
    out["label_embs_concat"] = torch.zeros(4, 8)
    return out


def test_fairseq_and_s3prl_layouts_convert_identically():
    """fairseq key names (self_attn/fc1/fc2/post_extract_proj/numeric
    conv blocks/pos_conv.0/weight_g), a fairseq {"model": sd} container,
    an s3prl {"model_weight": sd} container, and a "w2v_model."-prefixed
    dict must all produce the SAME param pytree as the HF layout."""
    import jax
    from fscl_tpu.models.hubert import convert_torch_checkpoint

    torch.manual_seed(3)
    hf_cfg = HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[512] * 7,
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        conv_bias=True, layerdrop=0.0,
    )
    sd = HubertModel(hf_cfg).eval().state_dict()
    want = convert_torch_checkpoint(sd)
    fairseq_sd = _hf_to_fairseq_keys(sd)

    variants = {
        "fairseq keys": fairseq_sd,
        "fairseq container": {"model": fairseq_sd, "cfg": {"dummy": 1}},
        "s3prl container": {"model_weight": fairseq_sd},
        "w2v_model prefix": {f"w2v_model.{k}": v
                             for k, v in fairseq_sd.items()},
    }
    for name, variant in variants.items():
        got = convert_torch_checkpoint(variant)
        assert jax.tree_util.tree_structure(got) == \
            jax.tree_util.tree_structure(want), name
        for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


def test_xlsr_config_and_upstream():
    """xlsr_53 resolves to the 25-layer/1024d family
    (Define.py:48-51) with the layer-norm conv extractor."""
    from fscl_tpu.core.config import UpstreamConfig
    from fscl_tpu.models.hubert import make_upstream

    cfg = UpstreamConfig.from_name("xlsr_53")
    assert cfg.dim == 1024 and cfg.n_layers == 25
    up = make_upstream("xlsr_53", cfg)
    assert (up.dim, up.n_layers, up.extractor_mode, up.layer_norm_first) \
        == (1024, 24, "layer_norm", True)
    up2 = make_upstream("wav2vec2_large_ll60k",
                        UpstreamConfig.from_name("wav2vec2_large_ll60k"))
    assert up2.extractor_mode == "layer_norm"


def test_storage_cast_matches_per_call_cast():
    """bf16-resident frozen params (hubert.storage_cast) produce
    BIT-IDENTICAL hidden states to f32-stored params cast per call inside
    frozen_upstream_features — the cast is deterministic, so hoisting it
    to storage time changes nothing numerically while saving ~1.9 GB of
    HBM traffic per hubert-large forward (profile_upstream_r4.json)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fscl_tpu.models.hubert import (SSLUpstream, frozen_upstream_features,
                                        storage_cast)
    from fscl_tpu.ops.masking import length_mask

    up = SSLUpstream(dim=16, n_layers=2, n_heads=2, ffn_dim=32)
    rng = np.random.default_rng(3)
    wavs = (rng.normal(size=(2, 8000)).astype(np.float32) * 0.3).clip(-1, 1)
    valid = length_mask(jnp.asarray(np.array([8000, 5000], np.int32)), 8000)
    params = up.init(jax.random.PRNGKey(0), jnp.asarray(wavs))

    ref, fv_ref = frozen_upstream_features(
        up, params, jnp.asarray(wavs), valid, "bfloat16")
    stored = storage_cast(params, "bfloat16")
    assert all(jnp.asarray(x).dtype == jnp.bfloat16
               for x in jax.tree_util.tree_leaves(stored)
               if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating))
    out, fv = frozen_upstream_features(
        up, stored, jnp.asarray(wavs), valid, "bfloat16")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(fv_ref), np.asarray(fv))

    # float32 compute dtype: storage_cast is the identity
    assert storage_cast(params, "float32") is params
