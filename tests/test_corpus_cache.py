"""Content-hash corpus cache (data/scripts.py make_synthetic_corpus
cache_dir; VERDICT r4 #6): restore must be byte-identical to generation,
keyed on every generation parameter plus the generating sources' hash.
"""
from __future__ import annotations

import json
import os

import numpy as np

from fscl_tpu.data import scripts
from fscl_tpu.data.scripts import make_synthetic_corpus


def _store_fingerprint(root):
    """(relative path -> bytes-hash) over the corpus tree, excluding the
    absolute-path-bearing data.yaml (regenerated per location)."""
    import hashlib
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f == "data.yaml":
                continue
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            with open(p, "rb") as fh:
                out[rel] = hashlib.sha256(fh.read()).hexdigest()
    return out


def test_cache_restore_is_identical(tmp_path):
    cache = str(tmp_path / "cache")
    kw = dict(n_utts=3, seed=3, f0_base=150.0, cache_dir=cache)
    cfg_a = make_synthetic_corpus(str(tmp_path / "a"), name="x", **kw)
    assert len(os.listdir(cache)) == 1
    cfg_b = make_synthetic_corpus(str(tmp_path / "b"), name="x", **kw)
    assert len(os.listdir(cache)) == 1          # hit, not a second entry
    fa = _store_fingerprint(str(tmp_path / "a"))
    fb = _store_fingerprint(str(tmp_path / "b"))
    assert fa == fb and len(fa) > 5
    # restored marker is removed; data.yaml regenerated at the NEW root
    assert not os.path.exists(tmp_path / "b" / "COMPLETE")
    with open(cfg_b) as f:
        yaml_b = f.read()
    assert str(tmp_path / "b" / "features") in yaml_b
    assert str(tmp_path / "a") not in yaml_b
    # the restored corpus loads through the real config reader
    from fscl_tpu.core.config import read_data_config
    dc = read_data_config(cfg_b)
    assert dc.name == "x"


def test_param_change_misses_cache(tmp_path):
    cache = str(tmp_path / "cache")
    make_synthetic_corpus(str(tmp_path / "a"), n_utts=3, seed=1,
                          cache_dir=cache)
    make_synthetic_corpus(str(tmp_path / "b"), n_utts=3, seed=2,
                          cache_dir=cache)
    assert len(os.listdir(cache)) == 2


def test_source_version_invalidates(tmp_path, monkeypatch):
    cache = str(tmp_path / "cache")
    make_synthetic_corpus(str(tmp_path / "a"), n_utts=3, seed=5,
                          cache_dir=cache)
    monkeypatch.setattr(scripts, "_corpus_cache_version", lambda: "changed")
    make_synthetic_corpus(str(tmp_path / "b"), n_utts=3, seed=5,
                          cache_dir=cache)
    assert len(os.listdir(cache)) == 2


def test_no_cache_dir_unchanged(tmp_path):
    cfg = make_synthetic_corpus(str(tmp_path / "a"), n_utts=3, seed=9)
    assert os.path.exists(cfg)
