#!/usr/bin/env bash
# Production-style invocation (capability of reference scripts/train.sh:
# 5-file weighted mix, LoRA, 8-bit optimizer, grad accumulation).
set -euo pipefail
python -m vietnamese_qa_system_tpu.cli train \
  --model-size gpt125m \
  --train-files data/openorca.jsonl data/dolly.jsonl data/alpaca.jsonl \
                data/webglm.jsonl data/eli5.jsonl \
  --train-schemas instruct instruct instruct qa qa \
  --train-fractions 30 30 15 5 20 \
  --eval-files data/eval.jsonl --do-eval --do-generative-eval \
  --use-lora --lora-r 32 --lora-alpha 64 \
  --optimizer adamw8bit --lr 2e-4 --lr-scheduler cosine --warmup-steps 200 \
  --epochs 3 --batch-size 128 --grad-accum 16 --max-len 1024 --remat \
  --strategy fsdp --mesh '{"data": -1}' \
  --checkpoint-dir runs/checkpoints --save-every-steps 500 \
  --log-dir runs/logs --run-name gpt125m_vi_qa
