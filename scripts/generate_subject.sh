#!/bin/bash
# Full single-subject pipeline (reference parity: scripts/generate_{felix,
# lincoln,tesla,...}.sh): 840-image generation -> 10k-iteration avatar fit.
set -e

SUBJECT=${1:?usage: generate_subject.sh <subject_dir> <output_dir> [gen_config]}
OUT=${2:?usage: generate_subject.sh <subject_dir> <output_dir> [gen_config]}
GEN_CONFIG=${3:-configs/generation/single_ref.yaml}

python -m cap4d_tpu.inference.generate_images \
    --config_path "$GEN_CONFIG" \
    --reference_data_path "$SUBJECT" \
    --output_path "$OUT"

python -m cap4d_tpu.avatar.train \
    --source_paths "$OUT/reference_images" "$OUT/generated_images" \
    --model_path "$OUT/avatar" \
    --config_path configs/avatar/default.yaml \
    --interval 2000
