#!/bin/bash
# Stage 2 (vicuna family): full finetune (LLM 2e-5, ViT 2e-6) on
# video-caption data, restoring the stage-1 projector. TPU equivalent of
# scripts/train/vicuna/stage2_finetune.sh.
set -e

OUTPUT_DIR=${OUTPUT_DIR:-output/vicuna_stage2}
RESTORE=${RESTORE:-output/vicuna_stage1}

python -m video_llava_seg_tpu.train.train \
  --stage stage2 \
  --llm vicuna_7b \
  --output_dir "$OUTPUT_DIR" \
  --restore_weights "$RESTORE" \
  --per_device_batch_size 2 \
  --gradient_accumulation_steps 8 \
  --num_train_steps 20000 \
  --save_steps 2000 \
  --fsdp \
  "$@"
