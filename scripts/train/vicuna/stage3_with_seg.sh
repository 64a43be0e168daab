#!/bin/bash
# Stage 3 (vicuna family): LG-VIS finetune on ViCaS with the SAM2 seg head
# ([SEG] tokens + dice/BCE mask loss). TPU equivalent of
# scripts/train/vicuna/stage3_with_seg.sh (v1 template, budget 5824).
set -e

OUTPUT_DIR=${OUTPUT_DIR:-output/vicuna_stage3}
RESTORE=${RESTORE:-output/vicuna_stage2}

python -m video_llava_seg_tpu.train.train \
  --stage stage3 \
  --llm vicuna_7b \
  --output_dir "$OUTPUT_DIR" \
  --restore_weights "$RESTORE" \
  --per_device_batch_size 1 \
  --gradient_accumulation_steps 8 \
  --num_train_steps 8000 \
  --save_steps 2000 \
  --fsdp \
  "$@"
