"""TPU-native Vietnamese QA & dense-retrieval framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
reference `vTuanpham/Vietnamese_QA_System` (PyTorch + accelerate + DeepSpeed +
sqlite/txtai), re-designed TPU-first:

- ``core``     — mesh construction, dtype policy, deterministic RNG, profiling.
- ``ops``      — Pallas TPU kernels: fused matmul + streaming top-k, int8
                 quantization / dequant-in-matmul, flash attention.
- ``models``   — functional JAX transformers: sentence encoder (capability of
                 sentence-transformers in the reference), causal LM and
                 seq2seq LM (capability of AutoModelFor* loading in
                 reference src/models/trainer.py), LoRA adapters, KV-cache
                 generation.
- ``parallel`` — sharding rules (DP / FSDP / TP) and shard_map collectives
                 (capability of accelerate/DeepSpeed/NCCL in the reference).
- ``engine``   — the dense-retrieval engine replacing the reference's
                 inference_pipeline/ (sqlite + txtai): HBM-resident sharded
                 vector store, batched embed-and-write ingest, fused top-k
                 query with ICI all-gather merge.
- ``data``     — example schemas, prompt template bank, tokenizer, weighted
                 multi-file JSONL mixing, static-shape collation (capability
                 of reference src/data/).
- ``train``    — pjit train step, grad accumulation, 8-bit optimizer states,
                 checkpoint/resume, perplexity + generative eval (capability
                 of reference src/models/trainer.py).
- ``etl``      — offline dataset parser framework with enforced
                 read->convert->save contract, code filter, Vietnamese tone
                 normalization (capability of reference
                 src/data/features/).
"""

__version__ = "0.1.0"
