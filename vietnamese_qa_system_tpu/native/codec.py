"""numpy-facing wrappers over the native codec (see byte_codec.cpp)."""

from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from .build import get_lib

_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _concat_utf8(texts: Sequence[str]):
    blobs = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    data = np.frombuffer(b"".join(blobs) or b"\x00", np.uint8).copy()
    return data, offsets


def native_batch_encode(
    texts: Sequence[str],
    max_len: int,
    *,
    pad_id: int = 0,
    eos_id: int = 2,
    n_special: int = 4,
    add_eos: bool = False,
    pad_side: str = "right",
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Native equivalent of data.tokenizer.batch_encode for ByteTokenizer.
    Returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(texts)
    data, offsets = _concat_utf8(texts)
    ids = np.empty((n, max_len), np.int32)
    mask = np.empty((n, max_len), np.int32)
    lib.byte_batch_encode(
        data.ctypes.data_as(_U8P),
        offsets.ctypes.data_as(_I64P),
        n,
        max_len,
        pad_id,
        eos_id,
        n_special,
        1 if add_eos else 0,
        1 if pad_side == "left" else 0,
        ids.ctypes.data_as(_I32P),
        mask.ctypes.data_as(_I32P),
    )
    return ids, mask


def native_encode_completion_batch(
    prompts: Sequence[str],
    targets: Sequence[str],
    max_len: int,
    *,
    pad_id: int = 0,
    eos_id: int = 2,
    n_special: int = 4,
    ignore_index: int = -100,
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray, int]]:
    """Fused tokenize+collate for causal completion-only training.
    Returns (ids, mask, labels, kept) with too-long rows dropped."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(prompts)
    pdata, poff = _concat_utf8(prompts)
    tdata, toff = _concat_utf8(targets)
    ids = np.empty((n, max_len), np.int32)
    mask = np.empty((n, max_len), np.int32)
    labels = np.empty((n, max_len), np.int32)
    kept = lib.encode_completion_batch(
        pdata.ctypes.data_as(_U8P),
        poff.ctypes.data_as(_I64P),
        tdata.ctypes.data_as(_U8P),
        toff.ctypes.data_as(_I64P),
        n,
        max_len,
        pad_id,
        eos_id,
        n_special,
        ignore_index,
        ids.ctypes.data_as(_I32P),
        mask.ctypes.data_as(_I32P),
        labels.ctypes.data_as(_I32P),
    )
    return ids[:kept], mask[:kept], labels[:kept], int(kept)


def native_pack_blocks(
    ids: np.ndarray, labels: np.ndarray, seq_lens: Sequence[int], block_len: int
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Pack a concatenated token stream into (n_blocks, block_len)."""
    lib = get_lib()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, np.int32)
    labels = np.ascontiguousarray(labels, np.int32)
    offsets = np.zeros(len(seq_lens) + 1, np.int64)
    np.cumsum(np.asarray(seq_lens, np.int64), out=offsets[1:])
    cap = ids.size // block_len
    out_ids = np.empty((cap, block_len), np.int32)
    out_labels = np.empty((cap, block_len), np.int32)
    n = lib.pack_blocks(
        ids.ctypes.data_as(_I32P),
        labels.ctypes.data_as(_I32P),
        offsets.ctypes.data_as(_I64P),
        len(seq_lens),
        block_len,
        cap,
        out_ids.ctypes.data_as(_I32P),
        out_labels.ctypes.data_as(_I32P),
    )
    return out_ids[:n], out_labels[:n]
