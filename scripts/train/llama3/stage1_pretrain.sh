#!/bin/bash
# Stage 1: mm-projector warmup on video-caption data (WebVid/Panda70M),
# LLM + vision tower frozen. TPU equivalent of the reference's
# scripts/train/llama3/stage1_pretrain.sh (32x A100, global batch 256):
# global batch = data-parallel mesh size x per-device batch x grad-accum.
#
# Multi-host: launch this same command on every host of the pod slice
# (jax.distributed.initialize is picked up from the TPU environment).
set -e

OUTPUT_DIR=${OUTPUT_DIR:-output/llama3_stage1}

python -m video_llava_seg_tpu.train.train \
  --stage stage1 \
  --output_dir "$OUTPUT_DIR" \
  --per_device_batch_size 8 \
  --gradient_accumulation_steps 4 \
  --num_train_steps 10000 \
  --save_steps 2500 \
  --fsdp \
  "$@"
