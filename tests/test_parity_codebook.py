"""Numerical parity of SoftMultiAttCodebook2 vs the reference module
(lightning/systems/language/embeddings.py:77-142) with identical weights —
validates the FSCL embedding-generation core."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference not mounted")


def test_codebook_attention_parity():
    sys.path.insert(0, BENCH)
    import torch
    from reference_harness import install_stubs
    cwd = os.getcwd()
    install_stubs()   # leaves cwd at the MFA-stub tempdir for text imports
    # the reference only materializes weight_raw when LAYER_IDX is pinned
    # (embeddings.py:98-104 — the learned-weights branch is unreachable with
    # LAYER_IDX=None); test the pinned-layer configuration
    import Define
    Define.LAYER_IDX = 10

    # load the module standalone (the package __init__ chain drags in
    # pytorch_lightning callbacks the stub doesn't provide)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_embeddings",
        os.path.join(REF, "lightning/systems/language/embeddings.py"))
    ref_emb = importlib.util.module_from_spec(spec)
    sys.modules["ref_embeddings"] = ref_emb
    spec.loader.exec_module(ref_emb)
    RefCodebook = ref_emb.SoftMultiAttCodebook2
    os.chdir(cwd)

    import jax.numpy as jnp
    from fscl_tpu.nn.embeddings import SoftMultiAttCodebook2

    torch.manual_seed(0)
    ref = RefCodebook(codebook_size=16, embed_dim=32, num_heads=4).eval()
    sd = ref.state_dict()
    params = {
        "emb_banks": sd["emb_banks"].numpy(),
        "att_banks": sd["att_banks"].numpy(),
        "weight_raw": np.zeros((1, 25, 1), np.float32),  # pinned -> unused
        "q_linear": {
            "kernel": sd["q_linear.weight"].numpy().T,
            "bias": sd["q_linear.bias"].numpy(),
        },
    }
    ours = SoftMultiAttCodebook2(
        codebook_size=16, dim=32, num_heads=4, upstream_dim=1024,
        n_layers=25, layer_idx=10)

    rng = np.random.default_rng(0)
    q = rng.normal(size=(1, 11, 25, 1024)).astype(np.float32)
    q[0, 3, 5, :] = np.nan          # NaN-guard parity
    with torch.no_grad():
        ref_out, ref_attn = ref(torch.from_numpy(q.copy()),
                                need_weights=True)
    our_out, our_attn = ours.apply({"params": params}, jnp.asarray(q), True)

    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(our_attn), ref_attn.numpy(),
                               atol=2e-5)
