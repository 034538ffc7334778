"""Native C++ codec vs pure-Python reference parity + speed sanity."""

import time

import numpy as np
import pytest

from vietnamese_qa_system_tpu.data.tokenizer import ByteTokenizer
from vietnamese_qa_system_tpu.native import (
    native_available,
    native_batch_encode,
    native_encode_completion_batch,
    native_pack_blocks,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native codec unavailable (g++ missing?)"
)

TEXTS = [
    "xin chào thế giới",
    "Hà Nội là thủ đô của Việt Nam",
    "",
    "a" * 300,  # truncation case
    "tiếng Việt có dấu: ă â đ ê ô ơ ư",
]


def _py_batch_encode(tok, texts, max_len, pad_side="right", add_eos=False):
    ids = np.full((len(texts), max_len), tok.pad_id, np.int32)
    mask = np.zeros((len(texts), max_len), np.int32)
    for r, text in enumerate(texts):
        seq = tok.encode(text, add_eos=add_eos)[:max_len]
        if pad_side == "right":
            ids[r, : len(seq)] = seq
            mask[r, : len(seq)] = 1
        else:
            ids[r, max_len - len(seq):] = seq
            mask[r, max_len - len(seq):] = 1
    return ids, mask


@pytest.mark.parametrize("pad_side", ["right", "left"])
@pytest.mark.parametrize("add_eos", [False, True])
def test_batch_encode_parity(pad_side, add_eos):
    tok = ByteTokenizer()
    max_len = 64
    n_ids, n_mask = native_batch_encode(
        TEXTS, max_len, add_eos=add_eos, pad_side=pad_side
    )
    p_ids, p_mask = _py_batch_encode(tok, TEXTS, max_len, pad_side, add_eos)
    # python path truncates eos away at exactly max_len; native reserves a
    # slot — normalize by comparing through decode + mask sums instead for
    # the truncation row, exact arrays for the rest
    np.testing.assert_array_equal(n_mask.sum(1) > 0, p_mask.sum(1) > 0)
    for r, text in enumerate(TEXTS):
        if len(text.encode()) + add_eos <= max_len:
            np.testing.assert_array_equal(n_ids[r], p_ids[r])
            np.testing.assert_array_equal(n_mask[r], p_mask[r])
        else:
            got = tok.decode([t for t in n_ids[r] if t != tok.eos_id])
            assert text.startswith(got[: max_len - 8])


def test_completion_batch_masks_prompt():
    tok = ByteTokenizer()
    prompts = ["hỏi: abc\n", "hỏi dài hơn một chút: xyz\n"]
    targets = ["đáp", "trả lời đây"]
    ids, mask, labels, kept = native_encode_completion_batch(
        prompts, targets, max_len=64
    )
    assert kept == 2
    for r in range(2):
        plen = len(prompts[r].encode())
        tlen = len(targets[r].encode())
        assert (labels[r][:plen] == -100).all()
        assert (labels[r][plen : plen + tlen] == ids[r][plen : plen + tlen]).all()
        assert ids[r][plen + tlen] == tok.eos_id
        assert mask[r].sum() == plen + tlen + 1
        decoded = tok.decode([t for t in labels[r] if t >= 0 and t != tok.eos_id])
        assert decoded == targets[r]


def test_completion_batch_skips_too_long():
    _, _, _, kept = native_encode_completion_batch(
        ["x" * 100], ["y" * 100], max_len=64
    )
    assert kept == 0


def test_pack_blocks():
    ids = np.arange(10, 10 + 100, dtype=np.int32)
    labels = ids + 1000
    out_ids, out_labels = native_pack_blocks(ids, labels, [40, 60], block_len=32)
    assert out_ids.shape == (3, 32)
    np.testing.assert_array_equal(out_ids.ravel(), ids[:96])
    np.testing.assert_array_equal(out_labels.ravel(), labels[:96])


def test_native_speedup():
    tok = ByteTokenizer()
    texts = ["đoạn văn tiếng Việt dài vừa phải " * 8] * 2000

    def best_of(fn, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native = best_of(lambda: native_batch_encode(texts, 256))
    t_py = best_of(lambda: _py_batch_encode(tok, texts, 256))
    # generous bound: machine may be loaded; real speedup is ~9x
    assert t_native < t_py, f"native {t_native:.4f}s vs python {t_py:.4f}s"
