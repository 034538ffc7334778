#!/usr/bin/env bash
# Index-build invocation (capability of reference setup_docs_db.py +
# heavy_ranker.py index block).
set -euo pipefail
python -m vietnamese_qa_system_tpu.cli ingest \
  --inputs "$1" --text-field doc \
  --index runs/index --db runs/docs.db \
  --dtype int8_global --capacity 1048576 --chunk-size 512
