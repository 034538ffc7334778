// Native host data plane: batch byte-level tokenization, padding, packing.
//
// The reference's host data plane is pure Python (tokenize_function /
// dynamic_collate loops, reference src/data/dataloader.py:366-465) riding
// on HF's native tokenizers.  This framework's byte-level codec is simple
// enough to implement directly: encode = UTF-8 bytes shifted by N_SPECIAL,
// so the hot loops (per-example python byte loops) become single C passes.
// Exposed via ctypes (see native/build.py); the Python implementation in
// data/tokenizer.py remains the reference/fallback.
//
// ABI kept trivially C so ctypes binding needs no codegen:
//   ids layout: int32 row-major [n_texts, max_len]

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Encode texts (concatenated UTF-8 bytes + offsets) into fixed-shape
// [n, max_len] int32 ids + masks.  pad_side: 0 = right, 1 = left.
// Each sequence is the raw bytes + N_SPECIAL shift, truncated to max_len
// (optionally reserving one slot for EOS when add_eos != 0).
void byte_batch_encode(
    const uint8_t* data,        // concatenated text bytes
    const int64_t* offsets,     // n+1 offsets into data
    int64_t n,                  // number of texts
    int32_t max_len,
    int32_t pad_id,
    int32_t eos_id,
    int32_t n_special,
    int32_t add_eos,            // 0/1
    int32_t pad_side,           // 0 right, 1 left
    int32_t* ids,               // out [n, max_len]
    int32_t* mask)              // out [n, max_len]
{
    for (int64_t r = 0; r < n; ++r) {
        const uint8_t* src = data + offsets[r];
        int64_t len = offsets[r + 1] - offsets[r];
        int32_t room = add_eos ? max_len - 1 : max_len;
        int32_t keep = (int32_t)std::min<int64_t>(len, room);
        int32_t total = keep + (add_eos ? 1 : 0);
        int32_t* row_ids = ids + r * max_len;
        int32_t* row_mask = mask + r * max_len;
        int32_t start = pad_side ? (max_len - total) : 0;

        std::fill(row_ids, row_ids + max_len, pad_id);
        std::memset(row_mask, 0, sizeof(int32_t) * max_len);
        for (int32_t i = 0; i < keep; ++i) {
            row_ids[start + i] = (int32_t)src[i] + n_special;
        }
        if (add_eos) row_ids[start + keep] = eos_id;
        for (int32_t i = 0; i < total; ++i) row_mask[start + i] = 1;
    }
}

// Pack token streams into fixed blocks (group_texts capability,
// reference dataloader.py:468-481).  Inputs: concatenated ids + labels
// with offsets; outputs: [n_blocks, block_len] arrays.  Returns the
// number of complete blocks written (<= out_capacity_blocks).
int64_t pack_blocks(
    const int32_t* ids,
    const int32_t* labels,
    const int64_t* offsets,
    int64_t n_seqs,
    int32_t block_len,
    int64_t out_capacity_blocks,
    int32_t* out_ids,           // [out_capacity_blocks, block_len]
    int32_t* out_labels)
{
    int64_t total = offsets[n_seqs];
    int64_t n_blocks = std::min<int64_t>(total / block_len, out_capacity_blocks);
    // offsets describe one contiguous stream already; copy block-wise
    std::memcpy(out_ids, ids, sizeof(int32_t) * n_blocks * block_len);
    std::memcpy(out_labels, labels, sizeof(int32_t) * n_blocks * block_len);
    return n_blocks;
}

// Fused "encode prompt+target with completion-only masking" for causal
// training (the per-example hot path of data/loader.py::_tokenize +
// _collate_causal).  Returns number of rows kept (rows whose total
// length exceeds max_len are skipped, matching the reference's
// too-long-example skip, dataloader.py:85-101).
int64_t encode_completion_batch(
    const uint8_t* prompt_data, const int64_t* prompt_offsets,
    const uint8_t* target_data, const int64_t* target_offsets,
    int64_t n,
    int32_t max_len,
    int32_t pad_id,
    int32_t eos_id,
    int32_t n_special,
    int32_t ignore_index,
    int32_t* ids,               // out [n, max_len]
    int32_t* mask,              // out [n, max_len]
    int32_t* labels)            // out [n, max_len]
{
    int64_t kept = 0;
    for (int64_t r = 0; r < n; ++r) {
        const uint8_t* p = prompt_data + prompt_offsets[r];
        int64_t plen = prompt_offsets[r + 1] - prompt_offsets[r];
        const uint8_t* t = target_data + target_offsets[r];
        int64_t tlen = target_offsets[r + 1] - target_offsets[r];
        int64_t total = plen + tlen + 1;  // + eos
        if (total > max_len) continue;    // skip too-long

        int32_t* row_ids = ids + kept * max_len;
        int32_t* row_mask = mask + kept * max_len;
        int32_t* row_lab = labels + kept * max_len;
        std::fill(row_ids, row_ids + max_len, pad_id);
        std::memset(row_mask, 0, sizeof(int32_t) * max_len);
        std::fill(row_lab, row_lab + max_len, ignore_index);

        for (int64_t i = 0; i < plen; ++i)
            row_ids[i] = (int32_t)p[i] + n_special;
        for (int64_t i = 0; i < tlen; ++i) {
            int32_t tok = (int32_t)t[i] + n_special;
            row_ids[plen + i] = tok;
            row_lab[plen + i] = tok;
        }
        row_ids[plen + tlen] = eos_id;
        row_lab[plen + tlen] = eos_id;
        for (int64_t i = 0; i < total; ++i) row_mask[i] = 1;
        ++kept;
    }
    return kept;
}

}  // extern "C"
