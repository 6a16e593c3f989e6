#!/bin/bash
# Reference-parity wrapper (scripts/generate_yidong.sh): SMPL full-body
# avatar refinement fit.
set -e
python -m cap4d_tpu.avatar.train_fullbody \
    --config_path configs/avatar/default.yaml \
    --source_paths examples/output/yidong/ \
    --model_path examples/output/yidong/avatar_refine/
