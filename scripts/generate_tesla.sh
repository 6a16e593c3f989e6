#!/bin/bash
# Reference-parity wrapper (scripts/generate_tesla.sh): single-ref generation
# -> avatar fit -> animated render + PLY export for the tesla example.
set -e
mkdir -p examples/output

python -m cap4d_tpu.inference.generate_images \
    --config_path configs/generation/single_ref.yaml \
    --reference_data_path examples/input/tesla/ \
    --output_path examples/output/tesla/

python -m cap4d_tpu.avatar.train \
    --config_path configs/avatar/default.yaml \
    --source_paths examples/output/tesla/reference_images/ examples/output/tesla/generated_images/ \
    --model_path examples/output/tesla/avatar/

python -m cap4d_tpu.avatar.animate \
    --model_path examples/output/tesla/avatar/ \
    --target_animation_path examples/input/animation/sequence_00/fit.npz \
    --target_cam_trajectory_path examples/input/animation/sequence_00/orbit.npz \
    --output_path examples/output/tesla/animation_00/ \
    --export_ply 1 \
    --compress_ply 0
