#!/bin/bash
# Reference-parity wrapper (scripts/generate_liu_fullbody.sh): animate the
# refined SMPL full-body avatar with the combined animation sequence.
set -e
python -m cap4d_tpu.avatar.animate_smpl \
    --model_path examples/output/full_body/avatar_refine/ \
    --output_path examples/output/full_body/animated_render/ \
    --source_paths examples/output/full_body/ \
    --target_animation_path combined_animation.npz \
    --export_ply 1
