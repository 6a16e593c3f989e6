#!/bin/bash
# Reference-parity wrapper (scripts/generate_lincoln.sh): single-ref image
# generation for the lincoln example.
set -e
python -m cap4d_tpu.inference.generate_images \
    --config_path configs/generation/single_ref.yaml \
    --reference_data_path examples/input/lincoln/ \
    --output_path examples/output/lincoln/
