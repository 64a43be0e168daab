#!/bin/bash
# Data-parallel inference over the ViCaS val/test split: one process per
# host/chip-group, video list sharded by --num_chunks/--chunk_idx with
# resume-via-output-presence. TPU equivalent of scripts/infer.sh.
#
# Usage: MODEL=<ckpt dir> OUT=<out dir> NUM_CHUNKS=8 ./scripts/infer.sh
set -e

MODEL=${MODEL:?set MODEL=<checkpoint dir>}
OUT=${OUT:?set OUT=<output dir>}
NUM_CHUNKS=${NUM_CHUNKS:-1}
SPLIT=${SPLIT:-val}

for ((i = 0; i < NUM_CHUNKS; i++)); do
  python -m video_llava_seg_tpu.inference.main \
    -i "$MODEL" -o "$OUT" \
    --dataset_split "$SPLIT" \
    --num_chunks "$NUM_CHUNKS" --chunk_idx "$i" "$@" &
done
wait
