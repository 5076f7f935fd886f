#!/bin/bash
# Stereo 3D inference over a movement. [ref: scripts/inference.sh]
python -m fast3dhpe_tpu.apps.inference \
    --config_path configs/mads_3d.yaml \
    --movement "${1:-HipHop}" \
    ${2:+--save_frames "$2"}
