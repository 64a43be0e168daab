#!/bin/bash
# Stage 3: LG-VIS finetune on ViCaS with the SAM2 seg head ([SEG] tokens +
# dice/BCE mask loss). TPU equivalent of
# scripts/train/llama3/stage3_with_seg.sh (2x8 A100, global batch 64).
set -e

OUTPUT_DIR=${OUTPUT_DIR:-output/llama3_stage3}
RESTORE=${RESTORE:-output/llama3_stage2}

python -m video_llava_seg_tpu.train.train \
  --stage stage3 \
  --output_dir "$OUTPUT_DIR" \
  --restore_weights "$RESTORE" \
  --per_device_batch_size 2 \
  --gradient_accumulation_steps 4 \
  --num_train_steps 8000 \
  --save_steps 2000 \
  --fsdp \
  "$@"
