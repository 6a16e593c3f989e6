#!/bin/bash
# Reference-parity wrapper (scripts/generate_migu.sh): animate an existing
# fitted avatar (the reference script renders only).
set -e
python -m cap4d_tpu.avatar.animate \
    --model_path examples/output/migu/avatar/ \
    --target_animation_path examples/input/animation/sequence_01/fit.npz \
    --target_cam_trajectory_path examples/input/animation/sequence_01/orbit.npz \
    --output_path examples/output/migu/animation_01/ \
    --export_ply 1 \
    --compress_ply 0
