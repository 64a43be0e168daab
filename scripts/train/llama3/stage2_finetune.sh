#!/bin/bash
# Stage 2: full finetune (LLM 2e-5, ViT 2e-6) on video-caption data,
# restoring the stage-1 projector. TPU equivalent of
# scripts/train/llama3/stage2_finetune.sh (global batch 128).
set -e

OUTPUT_DIR=${OUTPUT_DIR:-output/llama3_stage2}
RESTORE=${RESTORE:-output/llama3_stage1}

python -m video_llava_seg_tpu.train.train \
  --stage stage2 \
  --output_dir "$OUTPUT_DIR" \
  --restore_weights "$RESTORE" \
  --per_device_batch_size 4 \
  --gradient_accumulation_steps 4 \
  --num_train_steps 20000 \
  --save_steps 2000 \
  --fsdp \
  "$@"
