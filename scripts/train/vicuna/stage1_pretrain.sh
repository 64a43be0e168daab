#!/bin/bash
# Stage 1 (vicuna family): mm-projector warmup on video-caption data,
# Vicuna-7B-v1.5 + v1 conversation template, LLM + tower frozen. TPU
# equivalent of scripts/train/vicuna/stage1_pretrain.sh (per-GPU batch 1,
# grad-accum 8, save_steps 1000, model_max_length 5824).
set -e

OUTPUT_DIR=${OUTPUT_DIR:-output/vicuna_stage1}

python -m video_llava_seg_tpu.train.train \
  --stage stage1 \
  --llm vicuna_7b \
  --output_dir "$OUTPUT_DIR" \
  --per_device_batch_size 4 \
  --gradient_accumulation_steps 8 \
  --num_train_steps 10000 \
  --save_steps 1000 \
  --fsdp \
  "$@"
