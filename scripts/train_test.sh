#!/usr/bin/env bash
# Small-scale end-to-end check (capability of reference scripts/train_test.sh).
set -euo pipefail
python -m vietnamese_qa_system_tpu.cli --platform cpu --cpu-devices 8 train \
  --model-size tiny \
  --train-files "$1" \
  --max-examples 64 --epochs 1 --batch-size 8 --max-len 256 \
  --use-lora --strategy fsdp_tp --mesh '{"data": 2, "model": 4}' \
  --log-dir /tmp/vqa_test_logs
