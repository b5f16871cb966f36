"""Checkpointing with surgery: partial restore, key remap, submodule strip.

The reference treats checkpoint surgery as a first-class feature (SURVEY §5):
- frozen submodules stripped on save (upstream.* — TransEmbOrig.py:156-166;
  u2s/codebook in tune systems — tune/FastSpeech2Tune.py:101-111),
- shape-tolerant load that drops/remaps/reinits mismatched keys
  (system.py:100-129, TransEmbOrig.py:168-213).

Here: orbax for (de)serialization of TrainState pytrees, plus pure-pytree
transforms for strip/remap/merge so the tune flows and the e2e chain (which
loads *another system's* checkpoint) are plain function calls.
"""
from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    root: Dict[str, Any] = {}
    for path, v in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return root


def strip_submodules(params: Dict[str, Any], prefixes: Iterable[str]) -> Dict[str, Any]:
    """Remove entries whose dotted path starts with any prefix (the
    on_save_checkpoint upstream-stripping semantics)."""
    prefixes = tuple(prefixes)
    flat = _flatten(params)
    kept = {
        path: v for path, v in flat.items()
        if not any(".".join(path).startswith(p) for p in prefixes)
    }
    return _unflatten(kept)


def remap_keys(params: Dict[str, Any], rules: Dict[str, str]) -> Dict[str, Any]:
    """Rename dotted paths by regex rules {pattern: replacement}
    (legacy-checkpoint key remap, TransEmbOrig.py:168-213)."""
    flat = _flatten(params)
    out = {}
    for path, v in flat.items():
        dotted = ".".join(path)
        for pat, repl in rules.items():
            dotted = re.sub(pat, repl, dotted)
        out[tuple(dotted.split("."))] = v
    return _unflatten(out)


def merge_shape_tolerant(
    target: Dict[str, Any],
    restored: Dict[str, Any],
    verbose: bool = True,
) -> Dict[str, Any]:
    """Copy restored leaves into target where paths exist AND shapes match;
    keep target's (fresh init) values elsewhere — the reference's
    shape-tolerant on_load_checkpoint (system.py:100-129)."""
    t_flat = _flatten(target)
    r_flat = _flatten(restored)
    merged = dict(t_flat)
    for path, v in r_flat.items():
        if path not in t_flat:
            if verbose:
                print(f"[ckpt] dropped unknown key: {'.'.join(path)}")
            continue
        tv = t_flat[path]
        if hasattr(tv, "shape") and hasattr(v, "shape") and tuple(tv.shape) != tuple(v.shape):
            if verbose:
                print(f"[ckpt] shape mismatch at {'.'.join(path)}: "
                      f"{tuple(v.shape)} -> keeping init {tuple(tv.shape)}")
            continue
        merged[path] = v
    return _unflatten(merged)


class CheckpointManager:
    """orbax-backed save/restore of TrainState-like pytrees with optional
    strip prefixes (equivalent of ModelCheckpoint every_n_train_steps +
    on_save_checkpoint surgery)."""

    def __init__(self, directory: str, strip_prefixes: Iterable[str] = (),
                 max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.strip_prefixes = tuple(strip_prefixes)
        self._ckptr = ocp.PyTreeCheckpointer()
        self.max_to_keep = max_to_keep

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, step: int, state) -> str:
        tree = jax.tree_util.tree_map(np.asarray, _state_to_tree(state))
        if self.strip_prefixes:
            tree["params"] = strip_submodules(tree["params"], self.strip_prefixes)
        path = self._path(step)
        self._ckptr.save(path, tree, force=True)
        self._gc()
        return path

    def restore(self, step: Optional[int] = None) -> Dict[str, Any]:
        if step is None:
            steps = self.all_steps()
            assert steps, f"no checkpoints under {self.directory}"
            step = steps[-1]
        return self._ckptr.restore(self._path(step))

    def restore_into(self, state, step: Optional[int] = None,
                     remap: Optional[Dict[str, str]] = None,
                     full: bool = False):
        """Shape-tolerant restore into an existing TrainState: stripped/
        missing submodules keep their fresh init.

        `full=False` (warm-start semantics, the reference's
        `load_from_checkpoint(pretrain_ckpt)`, main.py:186-192): params
        only — training restarts at step 0 with fresh optimizer moments.
        `full=True` (resume semantics, main.py:104-110): also restore the
        step counter, optimizer moments and batch_stats so the LR
        schedule and Adam trajectory CONTINUE where they stopped (pinned
        by tests/test_trainer_resume.py). Structures that do not match
        the live state (e.g. a different optimizer) keep the fresh init."""
        restored = self.restore(step)
        params = restored.get("params", restored)
        if remap:
            params = remap_keys(params, remap)
        merged = merge_shape_tolerant(_state_to_tree(state)["params"], params)
        state = state.replace(params=merged)
        if not full:
            return state
        if restored.get("step") is not None:
            state = state.replace(
                step=jnp.asarray(restored["step"], jnp.int32))
        for field in ("opt_state", "batch_stats"):
            got = restored.get(field)
            if got is None:
                continue
            target = getattr(state, field)
            rebuilt = _rebuild_like(target, got)
            if rebuilt is not None:
                state = state.replace(**{field: rebuilt})
        return state

    def all_steps(self):
        steps = []
        for name in os.listdir(self.directory):
            m = re.match(r"step_(\d+)$", name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def _gc(self):
        if self.max_to_keep is None:
            return
        steps = self.all_steps()
        import shutil
        for s in steps[: -self.max_to_keep]:
            shutil.rmtree(self._path(s), ignore_errors=True)


def _rebuild_like(target, restored):
    """Rebuild `restored` (a checkpointer's dict-ified pytree) into the
    structure of `target` (e.g. optax namedtuple states): leaves are taken
    from `restored` in tree order and unflattened with target's treedef.
    Returns None when leaf counts or shapes disagree (different optimizer
    / model: resume keeps the fresh init for that field)."""
    t_leaves, t_def = jax.tree_util.tree_flatten(target)
    r_leaves = jax.tree_util.tree_leaves(restored)
    if len(t_leaves) != len(r_leaves):
        return None
    if any(np.shape(a) != np.shape(b)
           for a, b in zip(t_leaves, r_leaves)):
        return None
    return jax.tree_util.tree_unflatten(t_def, r_leaves)


def _state_to_tree(state) -> Dict[str, Any]:
    if isinstance(state, dict):
        return state
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
