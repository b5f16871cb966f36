"""ctypes bindings for the C++ kernels in cpp/ (built by `make -C cpp`).

Auto-builds the shared libraries on first use if a toolchain is present;
callers fall back to the numpy implementations otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_CPP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "cpp")

_libs = {}


def _load(name: str) -> ctypes.CDLL:
    if name in _libs:
        return _libs[name]
    path = os.path.join(_CPP_DIR, name)
    if not os.path.isfile(path):
        subprocess.run(["make", "-C", _CPP_DIR], check=True,
                       capture_output=True)
    _libs[name] = ctypes.CDLL(path)
    return _libs[name]


def cpp_yin_f0(wav, sr: int = 22050, hop_length: int = 256,
               fmin: float = 71.0, fmax: float = 800.0,
               threshold: float = 0.15, frame_length: int = 1024) -> np.ndarray:
    lib = _load("libfsclpitch.so")
    fn = lib.yin_f0
    fn.restype = ctypes.c_int64
    wav = np.ascontiguousarray(np.asarray(wav, dtype=np.float32))
    n_frames = 1 + len(wav) // hop_length
    out = np.zeros(n_frames, dtype=np.float32)
    fn(wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       ctypes.c_int64(len(wav)), ctypes.c_int32(sr), ctypes.c_int32(hop_length),
       ctypes.c_float(fmin), ctypes.c_float(fmax), ctypes.c_float(threshold),
       ctypes.c_int32(frame_length),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def cpp_world_f0(wav, sr: int = 22050, hop_length: int = 256,
                 fmin: float = 71.0, fmax: float = 800.0) -> np.ndarray:
    """DIO-style multi-band F0 + autocorrelation refinement
    (cpp/world_pitch.cc) — the WORLD(pyworld) role in the reference's
    preprocessing (requirements.txt:12)."""
    lib = _load("libfsclworld.so")
    fn = lib.world_f0
    fn.restype = ctypes.c_int64
    wav = np.ascontiguousarray(np.asarray(wav, dtype=np.float32))
    n_frames = 1 + len(wav) // hop_length
    out = np.zeros(n_frames, dtype=np.float32)
    fn(wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       ctypes.c_int64(len(wav)), ctypes.c_int32(sr),
       ctypes.c_int32(hop_length),
       ctypes.c_float(fmin), ctypes.c_float(fmax),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def cpp_ctc_beam_decode(
    logprobs: np.ndarray, blank: int = 0, beam_width: int = 50,
    token_min_logp: float = -25.0,
) -> Tuple[List[int], float]:
    """Lexicon-free CTC beam search (torchaudio/Flashlight ctc_decoder
    equivalent, lightning/build.py:48-59)."""
    lib = _load("libfsclctc.so")
    fn = lib.ctc_beam_decode
    fn.restype = ctypes.c_int64
    lp = np.ascontiguousarray(np.asarray(logprobs, dtype=np.float32))
    T, C = lp.shape
    out = np.zeros(T, dtype=np.int32)
    score = ctypes.c_double(0.0)
    n = fn(lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
           ctypes.c_int64(T), ctypes.c_int64(C), ctypes.c_int32(blank),
           ctypes.c_int32(beam_width), ctypes.c_float(token_min_logp),
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
           ctypes.c_int64(T), ctypes.byref(score))
    return out[:n].tolist(), float(score.value)


def _paths_arg(paths: List[str]):
    return (ctypes.c_char_p * len(paths))(
        *[p.encode("utf-8") for p in paths])


def _check(rc: int, paths: List[str]) -> None:
    if rc != 0:
        raise IOError(f"npy batch read failed at {paths[rc - 1]}")


def cpp_npy_pad_1d_f32(paths: List[str], length: int, shift: float = 0.0,
                       scale: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Read B 1-D npy files, apply (x - shift) * scale, zero-pad to
    (B, length) float32. Returns (out, lens). One native call replaces B
    np.loads + the pad loop (cpp/npy_batch.cc)."""
    lib = _load("libfsclnpy.so")
    fn = lib.npy_pad_1d_f32
    fn.restype = ctypes.c_int64
    B = len(paths)
    out = np.zeros((B, length), np.float32)
    lens = np.zeros(B, np.int32)
    rc = fn(_paths_arg(paths), ctypes.c_int64(B), ctypes.c_int64(length),
            ctypes.c_double(shift), ctypes.c_double(scale),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    _check(rc, paths)
    return out, lens


def cpp_npy_pad_1d_i32(paths: List[str], length: int, offset: int = 0,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load("libfsclnpy.so")
    fn = lib.npy_pad_1d_i32
    fn.restype = ctypes.c_int64
    B = len(paths)
    out = np.zeros((B, length), np.int32)
    lens = np.zeros(B, np.int32)
    rc = fn(_paths_arg(paths), ctypes.c_int64(B), ctypes.c_int64(length),
            ctypes.c_int32(offset),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    _check(rc, paths)
    return out, lens


def cpp_npy_pad_2d_f32(paths: List[str], n_rows: int, n_cols: int,
                       trunc: Optional[np.ndarray] = None,
                       maybe_transposed_dim: int = 0,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Read B 2-D npy files (T_i, D) — or (D, T_i) when stored transposed
    with first dim == maybe_transposed_dim — truncate to trunc[b] rows,
    zero-pad to (B, n_rows, n_cols) float32. Threaded reads."""
    lib = _load("libfsclnpy.so")
    fn = lib.npy_pad_2d_f32
    fn.restype = ctypes.c_int64
    B = len(paths)
    out = np.zeros((B, n_rows, n_cols), np.float32)
    lens = np.zeros(B, np.int32)
    if trunc is None:
        trunc_arr = np.zeros(B, np.int32)
    else:
        trunc_arr = np.ascontiguousarray(np.asarray(trunc, np.int32))
    rc = fn(_paths_arg(paths), ctypes.c_int64(B), ctypes.c_int64(n_rows),
            ctypes.c_int64(n_cols), ctypes.c_int64(maybe_transposed_dim),
            trunc_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    _check(rc, paths)
    return out, lens


def cpp_shard_pad_batch(path: str, data_offset: int, recs, L: int, T: int,
                        var_lens: dict, n_mels: int = 80) -> dict:
    """Assemble a padded batch from a packed shard (data/shards.py format)
    in ONE native call: B x 5 reads from a single file descriptor.
    `recs` are the shard index records of the batch."""
    lib = _load("libfsclshard.so")
    fn = lib.shard_pad_batch
    fn.restype = ctypes.c_int64
    B = len(recs)
    order = ("phonemes", "mel", "pitch", "energy", "duration")
    offs = np.zeros((B, 5), np.int64)
    rows = np.zeros((B, 5), np.int64)
    for b, rec in enumerate(recs):
        for j, name in enumerate(order):
            off, shape, _ = rec["offsets"][name]
            offs[b, j] = off
            rows[b, j] = shape[0] if shape else 1
    pl, el = var_lens["pitch"], var_lens["energy"]
    texts = np.zeros((B, L), np.int32)
    mel = np.zeros((B, T, n_mels), np.float32)
    pitch = np.zeros((B, pl), np.float32)
    energy = np.zeros((B, el), np.float32)
    dur = np.zeros((B, L), np.int32)
    rc = fn(path.encode(), ctypes.c_int64(data_offset), ctypes.c_int64(B),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(L), ctypes.c_int64(T), ctypes.c_int64(pl),
            ctypes.c_int64(el), ctypes.c_int64(n_mels),
            texts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pitch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            energy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dur.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc:
        raise IOError(
            f"packed-shard batch read failed at record {rc - 1} in {path}")
    return {"phonemes": texts, "mel": mel, "pitch": pitch,
            "energy": energy, "duration": dur}


def cpp_shard_pad_rows(path: str, data_offset: int, offs: np.ndarray,
                       rows: np.ndarray, maxlen: int,
                       out: np.ndarray) -> None:
    """B 1-D 4-byte-element arrays from a packed shard into the
    caller-allocated zero-initialised out[B, maxlen]."""
    lib = _load("libfsclshard.so")
    fn = lib.shard_pad_rows
    fn.restype = ctypes.c_int64
    offs = np.ascontiguousarray(offs, np.int64)
    rows = np.ascontiguousarray(rows, np.int64)
    assert out.flags["C_CONTIGUOUS"] and out.itemsize == 4
    rc = fn(path.encode(), ctypes.c_int64(data_offset),
            ctypes.c_int64(len(offs)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(maxlen),
            out.ctypes.data_as(ctypes.c_void_p))
    if rc:
        raise IOError(
            f"packed-shard rows read failed at record {rc - 1} in {path}")
