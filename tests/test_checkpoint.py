"""Checkpoint surgery tests: strip, remap, shape-tolerant merge, orbax io."""
import jax.numpy as jnp
import numpy as np

from fscl_tpu.core.checkpoint import (
    CheckpointManager, merge_shape_tolerant, remap_keys, strip_submodules,
)


def params():
    return {
        "model": {"encoder": {"w": np.ones((2, 2))},
                  "decoder": {"w": np.zeros((3,))}},
        "upstream": {"layer_0": {"k": np.ones(4)}},
        "codebook": {"emb_banks": np.ones((8, 4))},
    }


def test_strip_submodules():
    out = strip_submodules(params(), ["upstream"])
    assert "upstream" not in out
    assert "model" in out and "codebook" in out


def test_remap_keys():
    out = remap_keys({"old_name": {"w": np.ones(2)}}, {r"^old_name": "new_name"})
    assert "new_name" in out and "old_name" not in out


def test_merge_shape_tolerant():
    target = params()
    restored = {
        "model": {"encoder": {"w": np.full((2, 2), 7.0)},
                  "decoder": {"w": np.ones((5,))}},   # mismatched shape
        "extra": {"junk": np.ones(1)},                 # unknown key
    }
    merged = merge_shape_tolerant(target, restored, verbose=False)
    np.testing.assert_array_equal(merged["model"]["encoder"]["w"], 7.0)
    np.testing.assert_array_equal(merged["model"]["decoder"]["w"], 0.0)
    assert "extra" not in merged
    np.testing.assert_array_equal(merged["upstream"]["layer_0"]["k"], 1.0)


def test_manager_roundtrip_with_strip(tmp_path):
    import flax

    @flax.struct.dataclass
    class S:
        step: jnp.ndarray
        params: dict
        batch_stats: dict
        opt_state: dict

    state = S(step=jnp.zeros((), jnp.int32), params=params(),
              batch_stats={}, opt_state={})
    mgr = CheckpointManager(str(tmp_path / "ckpt"), strip_prefixes=["upstream"],
                            max_to_keep=2)
    mgr.save(100, state)
    mgr.save(200, state)
    mgr.save(300, state)
    assert mgr.all_steps() == [200, 300]  # gc keeps 2
    restored = mgr.restore()
    assert "upstream" not in restored["params"]
    # restore_into keeps fresh-init upstream, loads the rest
    target = S(step=jnp.zeros((), jnp.int32), params=params(),
               batch_stats={}, opt_state={})
    merged = mgr.restore_into(target)
    assert "upstream" in merged.params
    np.testing.assert_array_equal(
        np.asarray(merged.params["model"]["encoder"]["w"]), 1.0)
