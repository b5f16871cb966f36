"""SSL speech upstream (HuBERT / wav2vec2 family) in flax.

TPU-native replacement for the reference's frozen `S3PRLExtractor`
(dlhlp_lib.s3prl, used at lightning/systems/language/TransEmbOrig.py:37,60):
a wav2vec2-style conv feature extractor + transformer encoder that returns
ALL hidden states stacked — (B, T', n_layers, dim) with n_layers = 25 for
the large models (conv output + 24 layers), matching `Define.set_upstream`
(Define.py:32-51). Weights are converted from HuggingFace `HubertModel` /
`Wav2Vec2Model` checkpoints via `convert_torch_checkpoint`; random init is
used in tests.

Frame rate: 320x downsampling of 16 kHz input = 50 Hz (20 ms), which is the
frame unit of `avg_frames` segmentation in the data layer.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fscl_tpu.ops.attention import attend


# conv feature extractor spec: (dim, kernel, stride) x7 — 320x total stride
CONV_SPEC = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2


def ssl_num_frames(n_samples: int) -> int:
    n = n_samples
    for _, k, s in CONV_SPEC:
        n = (n - k) // s + 1
    return n


class ConvFeatureExtractor(nn.Module):
    """7-layer strided conv stack, GELU. Two norm modes matching the
    released checkpoint families (fairseq `extractor_mode`, mirrored by
    HF `feat_extract_norm`):

    - "group_norm" (base models): bias-less convs, one GroupNorm after
      the first conv only;
    - "layer_norm" (hubert-large / wav2vec2-large / XLSR): biased convs,
      a per-channel LayerNorm after EVERY conv.
    """
    mode: str = "group_norm"

    @nn.compact
    def __call__(self, wav):                       # (B, T)
        assert self.mode in ("group_norm", "layer_norm"), self.mode
        x = wav[..., None]                          # (B, T, 1)
        for i, (dim, k, s) in enumerate(CONV_SPEC):
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=(self.mode == "layer_norm"),
                        name=f"conv_{i}")(x)
            if self.mode == "layer_norm":
                x = nn.LayerNorm(name=f"conv_ln_{i}")(x)
            elif i == 0:
                x = nn.GroupNorm(num_groups=dim, name="group_norm")(x)
            x = nn.gelu(x)
        return x                                    # (B, T', 512)


class PositionalConvEmbedding(nn.Module):
    dim: int = 1024
    kernel: int = 128
    groups: int = 16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (self.kernel,), padding=[(self.kernel // 2,) * 2],
                    feature_group_count=self.groups, name="conv")(x)
        if self.kernel % 2 == 0:
            h = h[:, :-1]
        return nn.gelu(h)


class TransformerLayer(nn.Module):
    dim: int = 1024
    n_heads: int = 16
    ffn_dim: int = 4096
    layer_norm_first: bool = True    # True for *-large (HuBERT-large)

    @nn.compact
    def __call__(self, x, valid=None):
        B, L, D = x.shape
        dh = self.dim // self.n_heads

        def mha(h):
            q = nn.Dense(self.dim, name="q_proj")(h)
            k = nn.Dense(self.dim, name="k_proj")(h)
            v = nn.Dense(self.dim, name="v_proj")(h)
            split = lambda t: t.reshape(B, L, self.n_heads, dh).transpose(0, 2, 1, 3)
            o = attend(split(q), split(k), split(v), key_valid=valid,
                       temperature=dh ** 0.5)
            o = o.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
            return nn.Dense(self.dim, name="out_proj")(o)

        def ffn(h):
            h = nn.Dense(self.ffn_dim, name="fc1")(h)
            h = nn.gelu(h)
            return nn.Dense(self.dim, name="fc2")(h)

        ln1 = nn.LayerNorm(name="self_attn_layer_norm")
        ln2 = nn.LayerNorm(name="final_layer_norm")
        if self.layer_norm_first:
            x = x + mha(ln1(x))
            x = x + ffn(ln2(x))
        else:
            x = ln1(x + mha(x))
            x = ln2(x + ffn(x))
        return x


class SSLUpstream(nn.Module):
    """HuBERT/wav2vec2 encoder returning all hidden states.

    `scan_layers=True` runs the identical transformer layers as ONE
    `lax.scan` over stacked params instead of 24 unrolled copies — the
    traced graph shrinks ~n_layers x, which cuts jit compile time of every
    FSCL episode step (the flagship meta-training program) while computing
    the same function. Param layouts interconvert with
    `stack_layer_params` / `unstack_layer_params`."""
    dim: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    ffn_dim: int = 4096
    layer_norm_first: bool = True
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    scan_layers: bool = False
    # "group_norm" for the base models, "layer_norm" for *-large / XLSR
    # (fairseq extractor_mode / HF feat_extract_norm)
    extractor_mode: str = "group_norm"

    @nn.compact
    def __call__(self, wav, wav_valid=None):
        """wav: (B, T) 16 kHz float. Returns (hidden (B, T', n_layers+1, dim),
        frame_valid (B, T'))."""
        feats = ConvFeatureExtractor(self.extractor_mode,
                                     name="feature_extractor")(wav)
        Tp = feats.shape[1]
        if wav_valid is not None:
            n_valid = jnp.sum(wav_valid.astype(jnp.int32), axis=-1)
            # conservative valid-frame count through the conv stack
            frame_len = jnp.floor(
                (n_valid.astype(jnp.float32) / 320.0)).astype(jnp.int32)
            frame_len = jnp.clip(frame_len, 0, Tp)
            frame_valid = jnp.arange(Tp)[None, :] < frame_len[:, None]
        else:
            frame_valid = jnp.ones(feats.shape[:2], bool)

        x = nn.LayerNorm(name="feat_layer_norm")(feats)
        x = nn.Dense(self.dim, name="post_extract_proj")(x)
        x = jnp.where(frame_valid[..., None], x, 0.0)
        x = x + PositionalConvEmbedding(
            self.dim, self.pos_conv_kernel, self.pos_conv_groups,
            name="pos_conv")(x)
        if not self.layer_norm_first:
            x = nn.LayerNorm(name="encoder_layer_norm")(x)

        if self.scan_layers:
            class _Body(TransformerLayer):
                def __call__(self, carry, valid):  # scan signature
                    out = TransformerLayer.__call__(self, carry, valid)
                    return out, out

            _Body.__name__ = "TransformerLayer"
            layer_outs_carry = nn.scan(
                _Body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=self.n_layers,
            )(self.dim, self.n_heads, self.ffn_dim, self.layer_norm_first,
              name="layers")(x, frame_valid)
            _, ys = layer_outs_carry           # ys: (n_layers, B, T', D)
            hidden = jnp.concatenate(
                [x[:, :, None], jnp.moveaxis(ys, 0, 2)], axis=2)
            return hidden, frame_valid

        hiddens = [x]
        for i in range(self.n_layers):
            x = TransformerLayer(
                self.dim, self.n_heads, self.ffn_dim, self.layer_norm_first,
                name=f"layer_{i}",
            )(x, valid=frame_valid)
            hiddens.append(x)
        if self.layer_norm_first:
            # final LN applies to the last layer's output in fairseq; s3prl
            # collects pre-LN hiddens, so we keep hiddens as-is and expose
            # the normalized final separately if needed.
            pass
        hidden = jnp.stack(hiddens, axis=2)   # (B, T', n_layers+1, dim)
        return hidden, frame_valid


def pre_transformer_features(upstream: "SSLUpstream", params, wav,
                             wav_valid=None):
    """Everything in `SSLUpstream.__call__` BEFORE the transformer stack —
    conv extractor, feature LN/projection, positional conv — as a pure
    function over the SAME param layout, so parallel schedules
    (parallel/pipeline.py) can run the layer stack themselves. Returns
    (x, frame_valid) where x is the stack input == hidden layer 0.
    Equality with the monolithic forward is pinned by
    tests/test_pipeline_parallel.py."""
    import jax.numpy as jnp

    p = params["params"] if "params" in params else params
    feats = ConvFeatureExtractor(upstream.extractor_mode).apply(
        {"params": p["feature_extractor"]}, wav)
    Tp = feats.shape[1]
    if wav_valid is not None:
        n_valid = jnp.sum(wav_valid.astype(jnp.int32), axis=-1)
        frame_len = jnp.floor(
            (n_valid.astype(jnp.float32) / 320.0)).astype(jnp.int32)
        frame_len = jnp.clip(frame_len, 0, Tp)
        frame_valid = jnp.arange(Tp)[None, :] < frame_len[:, None]
    else:
        frame_valid = jnp.ones(feats.shape[:2], bool)

    import flax.linen as nn
    x = nn.LayerNorm().apply({"params": p["feat_layer_norm"]}, feats)
    x = nn.Dense(upstream.dim).apply({"params": p["post_extract_proj"]}, x)
    x = jnp.where(frame_valid[..., None], x, 0.0)
    x = x + PositionalConvEmbedding(
        upstream.dim, upstream.pos_conv_kernel,
        upstream.pos_conv_groups).apply({"params": p["pos_conv"]}, x)
    if not upstream.layer_norm_first:
        x = nn.LayerNorm().apply({"params": p["encoder_layer_norm"]}, x)
    return x, frame_valid


def dequant_and_cast_inputs(params, wavs, compute_dtype: str):
    """Shared input preamble of every frozen-upstream forward (monolithic,
    pipeline-parallel, sequence-parallel — keep all three on one wire/dtype
    policy):

    - int16 wire format: episode wavs may be shipped host->device as
      16-bit PCM (4x less transfer than f32 — the meta-train phase is
      upload-bandwidth-bound on a tunneled chip, BASELINE.md round 3);
      dequantize on device. Quantization error (<=2^-16 full-scale) is an
      order below bf16 input rounding (2^-8 relative).
    - compute_dtype="bfloat16": cast floating params + wavs to bf16
      (measured 1.57x on full-size FSCL episodes); callers cast hidden
      states back to f32 at the stop-gradient boundary."""
    import jax
    import jax.numpy as jnp

    if jnp.issubdtype(wavs.dtype, jnp.integer):
        wavs = wavs.astype(jnp.float32) * (1.0 / 32768.0)
    if compute_dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            params)
        wavs = wavs.astype(jnp.bfloat16)
    return params, wavs


def storage_cast(params, compute_dtype: str):
    """Cast a FROZEN param tree to its compute dtype ONCE, at storage time.

    `dequant_and_cast_inputs` casts f32->bf16 inside every jitted forward;
    at hubert-large size (~317M params) that is ~1.9 GB of HBM traffic per
    call — measured ~1.8 ms/forward as the two `convert_element_type` rows
    in benchmarks/profile_upstream_r4.json. The cast is deterministic, so
    casting once when the frozen weights are installed is numerically
    IDENTICAL to the per-call cast (the in-jit astype becomes an identity
    XLA elides) and also halves the resident HBM footprint of the frozen
    tower. One jitted program so the cast is a single device dispatch, not
    one tiny op per leaf (the same tunnel concern jit_init exists for)."""
    if compute_dtype != "bfloat16":
        return params
    import jax
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        return (x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x)

    return jax.jit(lambda p: jax.tree_util.tree_map(cast, p))(params)


def frozen_upstream_features(upstream, params, wavs, wav_valid,
                             compute_dtype: str = "float32"):
    """Frozen (no-grad) upstream forward shared by every SSL system's
    extract_ssl. With compute_dtype="bfloat16" the forward runs entirely in
    bf16 — measured 1.57x on full-size FSCL episodes — and the hidden
    states are cast back to f32 at the stop-gradient boundary, so the
    codebook/downstream math is unchanged."""
    import jax
    import jax.numpy as jnp

    params, wavs = dequant_and_cast_inputs(params, wavs, compute_dtype)
    hidden, frame_valid = upstream.apply(
        jax.lax.stop_gradient(params), wavs, wav_valid)
    return (jax.lax.stop_gradient(hidden.astype(jnp.float32)),
            frame_valid)


def stack_layer_params(params: dict, n_layers: int) -> dict:
    """Per-layer param pytree ({layer_0..layer_{n-1}}) -> scan layout
    ({layers: leaves with leading n_layers axis}). Other keys unchanged."""
    import jax

    import jax.numpy as jnp

    p = {k: v for k, v in params.items() if not k.startswith("layer_")}
    layers = [params[f"layer_{i}"] for i in range(n_layers)]
    # np.stack for concrete leaves (eager checkpoint loads stay pure host
    # work: ~400 tiny device dispatches otherwise, the per-op tunnel cost
    # jit_init exists to avoid); jnp.stack only under tracing (the
    # pipeline/sequence-parallel paths auto-stack inside their jitted
    # callers, where np.asarray on tracers would fail)
    traced = any(isinstance(x, jax.core.Tracer)
                 for x in jax.tree_util.tree_leaves(layers))
    stack = jnp.stack if traced else (
        lambda xs: np.stack([np.asarray(x) for x in xs]))
    p["layers"] = jax.tree_util.tree_map(lambda *xs: stack(list(xs)), *layers)
    return p


def unstack_layer_params(params: dict) -> dict:
    """Inverse of `stack_layer_params`."""
    import jax

    p = {k: v for k, v in params.items() if k != "layers"}
    stacked = params["layers"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n):
        p[f"layer_{i}"] = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[i], stacked)
    return p


def adapt_layer_layout(upstream: "SSLUpstream", variables: dict) -> dict:
    """Match a param pytree's transformer-layer layout to the module's
    `scan_layers` setting. Converted torch checkpoints
    (convert_torch_checkpoint) arrive in per-layer {layer_0..} form, but a
    scan model expects one stacked {layers} collection — applying the wrong
    layout fails at apply time (ADVICE r2). Handles both directions and
    accepts either a bare param dict or a {"params": ...} variables dict."""
    wrapped = "params" in variables and isinstance(
        variables.get("params"), dict)
    params = variables["params"] if wrapped else variables
    has_per_layer = any(k.startswith("layer_") for k in params)
    has_stacked = "layers" in params
    if upstream.scan_layers and has_per_layer and not has_stacked:
        params = stack_layer_params(params, upstream.n_layers)
    elif not upstream.scan_layers and has_stacked and not has_per_layer:
        params = unstack_layer_params(params)
    else:
        return variables
    return {"params": params} if wrapped else params


def make_upstream(name: str = "hubert_large_ll60k", cfg=None) -> SSLUpstream:
    """`cfg` (core.config.UpstreamConfig) overrides dims for custom/tiny
    upstreams (smoke runs, unit tests); known names keep released shapes."""
    scan = bool(getattr(cfg, "scan_layers", False))
    if name in ("hubert", "wav2vec2"):      # base models: 768d, 12 layers
        return SSLUpstream(dim=768, n_layers=12, n_heads=12, ffn_dim=3072,
                           layer_norm_first=False, scan_layers=scan)
    if cfg is not None and cfg.dim != 1024:
        dim = cfg.dim
        return SSLUpstream(dim=dim, n_layers=max(cfg.n_layers - 1, 1),
                           n_heads=max(dim // 64, 2), ffn_dim=4 * dim,
                           scan_layers=scan)
    # large models (hubert_large_ll60k / wav2vec2_large_ll60k / xlsr_53,
    # Define.py:32-51): 1024d, 24 layers, layer-norm conv extractor
    return SSLUpstream(scan_layers=scan, extractor_mode="layer_norm")


def normalize_checkpoint_layout(state_dict) -> dict:
    """Normalize any released SSL checkpoint layout into the HF key
    naming `convert_torch_checkpoint` consumes. Handles (reference
    consumes all three families interchangeably via s3prl,
    Define.py:32-51):

    - container dicts: fairseq checkpoints ({"model": sd, "cfg": ...}),
      s3prl hub files ({"model_weight": sd}), generic {"state_dict": sd};
    - module-path prefixes: "model.", "w2v_model.",
      "w2v_encoder.w2v_model." (fairseq fine-tuned CTC checkpoints);
    - fairseq key names -> HF names (self_attn -> attention,
      fc1/fc2 -> feed_forward.*, post_extract_proj ->
      feature_projection.projection, numeric conv-block indices ->
      conv/layer_norm, encoder.pos_conv.0 -> pos_conv_embed.conv).

    Keys neither family needs (mask_emb, label_embs_concat, quantizer,
    final_proj, masked_spec_embed, ...) pass through and are ignored by
    the converter."""
    sd = state_dict
    for container in ("model", "model_weight", "state_dict"):
        if container in sd and isinstance(sd[container], dict):
            sd = sd[container]
            break
    for prefix in ("w2v_encoder.w2v_model.", "w2v_model.", "model."):
        if sd and all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    if "feature_projection.projection.weight" in sd:
        return dict(sd)                     # already HF-named
    if "post_extract_proj.weight" not in sd:
        return dict(sd)                     # unknown layout: pass through

    out = {}
    for k, v in sd.items():
        nk = k
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, sub = parts[2], parts[3:]
            if sub[0] == "0":               # Sequential index 0 = conv
                nk = (f"feature_extractor.conv_layers.{i}.conv."
                      f"{sub[-1]}")
            else:                           # ".2.{w,b}" (GN) / ".2.1.{w,b}" (LN)
                nk = (f"feature_extractor.conv_layers.{i}.layer_norm."
                      f"{sub[-1]}")
        elif k.startswith("post_extract_proj."):
            nk = "feature_projection.projection." + k.split(".", 1)[1]
        elif k.startswith("layer_norm."):   # post-extract LN (top level)
            nk = "feature_projection." + k
        elif k.startswith("encoder.pos_conv.0."):
            nk = ("encoder.pos_conv_embed.conv."
                  + k[len("encoder.pos_conv.0."):])
        elif k.startswith("encoder.layers."):
            parts = k.split(".", 3)
            sub = parts[3]
            sub = (sub.replace("self_attn_layer_norm.", "layer_norm.")
                   if sub.startswith("self_attn_layer_norm.") else
                   sub.replace("self_attn.", "attention.")
                   .replace("fc1.", "feed_forward.intermediate_dense.")
                   .replace("fc2.", "feed_forward.output_dense."))
            nk = f"encoder.layers.{parts[2]}.{sub}"
        out[nk] = v
    return out


def convert_torch_checkpoint(state_dict, layer_norm_first: bool = True) -> dict:
    """Convert an SSL upstream checkpoint into this module's param pytree.
    Accepts HuggingFace HubertModel/Wav2Vec2Model state_dicts as well as
    fairseq / s3prl layouts (normalize_checkpoint_layout). Both conv-
    extractor norm modes convert: group_norm (base models) and the
    per-layer layer_norm + conv-bias mode (hubert-large / wav2vec2-large /
    XLSR). `layer_norm_first` must match the target module: post-LN base
    models (False) consume `encoder.layer_norm` as the post-pos-conv
    `encoder_layer_norm`; pre-LN models (True, the large family) apply it
    only after the final layer, which the s3prl hidden-state convention
    omits. Offline environments skip this (random init)."""
    import numpy as np

    state_dict = normalize_checkpoint_layout(state_dict)

    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    # per-layer LNs beyond layer 0 identify the layer_norm extractor mode
    layer_mode = ("feature_extractor.conv_layers.1.layer_norm.weight"
                  in state_dict)
    p = {}
    fe = {}
    for i in range(len(CONV_SPEC)):
        conv_w = t(state_dict[f"feature_extractor.conv_layers.{i}.conv.weight"])
        fe[f"conv_{i}"] = {"kernel": conv_w.transpose(2, 1, 0)}
        bias_key = f"feature_extractor.conv_layers.{i}.conv.bias"
        if bias_key in state_dict:
            fe[f"conv_{i}"]["bias"] = t(state_dict[bias_key])
        if layer_mode:
            fe[f"conv_ln_{i}"] = {
                "scale": t(state_dict[
                    f"feature_extractor.conv_layers.{i}.layer_norm.weight"]),
                "bias": t(state_dict[
                    f"feature_extractor.conv_layers.{i}.layer_norm.bias"]),
            }
    if not layer_mode and (
            "feature_extractor.conv_layers.0.layer_norm.weight" in state_dict):
        fe["group_norm"] = {
            "scale": t(state_dict["feature_extractor.conv_layers.0.layer_norm.weight"]),
            "bias": t(state_dict["feature_extractor.conv_layers.0.layer_norm.bias"]),
        }
    p["feature_extractor"] = fe
    p["feat_layer_norm"] = {
        "scale": t(state_dict["feature_projection.layer_norm.weight"]),
        "bias": t(state_dict["feature_projection.layer_norm.bias"]),
    }
    if not layer_norm_first and "encoder.layer_norm.weight" in state_dict:
        p["encoder_layer_norm"] = {
            "scale": t(state_dict["encoder.layer_norm.weight"]),
            "bias": t(state_dict["encoder.layer_norm.bias"]),
        }
    p["post_extract_proj"] = {
        "kernel": t(state_dict["feature_projection.projection.weight"]).T,
        "bias": t(state_dict["feature_projection.projection.bias"]),
    }
    # pos conv (weight-norm parametrized in torch; two key formats)
    if "encoder.pos_conv_embed.conv.weight_g" in state_dict:
        g = t(state_dict["encoder.pos_conv_embed.conv.weight_g"])
        v = t(state_dict["encoder.pos_conv_embed.conv.weight_v"])
        w = g * v / np.linalg.norm(v, axis=(0, 1), keepdims=True)
    elif ("encoder.pos_conv_embed.conv.parametrizations.weight.original0"
          in state_dict):
        g = t(state_dict[
            "encoder.pos_conv_embed.conv.parametrizations.weight.original0"])
        v = t(state_dict[
            "encoder.pos_conv_embed.conv.parametrizations.weight.original1"])
        norm = np.linalg.norm(
            v, axis=tuple(i for i in range(v.ndim) if g.shape[i] == 1),
            keepdims=True)
        w = g * v / norm
    else:
        w = t(state_dict["encoder.pos_conv_embed.conv.weight"])
    p["pos_conv"] = {"conv": {
        "kernel": w.transpose(2, 1, 0),
        "bias": t(state_dict["encoder.pos_conv_embed.conv.bias"]),
    }}
    i = 0
    while f"encoder.layers.{i}.attention.q_proj.weight" in state_dict:
        lp = {}
        for name_hf, name_fx in (
            ("attention.q_proj", "q_proj"), ("attention.k_proj", "k_proj"),
            ("attention.v_proj", "v_proj"), ("attention.out_proj", "out_proj"),
            ("feed_forward.intermediate_dense", "fc1"),
            ("feed_forward.output_dense", "fc2"),
        ):
            lp[name_fx] = {
                "kernel": t(state_dict[f"encoder.layers.{i}.{name_hf}.weight"]).T,
                "bias": t(state_dict[f"encoder.layers.{i}.{name_hf}.bias"]),
            }
        lp["self_attn_layer_norm"] = {
            "scale": t(state_dict[f"encoder.layers.{i}.layer_norm.weight"]),
            "bias": t(state_dict[f"encoder.layers.{i}.layer_norm.bias"]),
        }
        lp["final_layer_norm"] = {
            "scale": t(state_dict[f"encoder.layers.{i}.final_layer_norm.weight"]),
            "bias": t(state_dict[f"encoder.layers.{i}.final_layer_norm.bias"]),
        }
        p[f"layer_{i}"] = lp
        i += 1
    return {"params": p}
