#!/usr/bin/env bash
# ≡ reference scripts/kitti_rgbl.sh: run the RGB-L driver on a KITTI
# odometry sequence. Usage: kitti_rgbl.sh <settings.yaml> <sequence_dir>
set -euo pipefail
exec python -m examples.run_kitti_rgbl "$@"
