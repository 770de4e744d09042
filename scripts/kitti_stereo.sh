#!/usr/bin/env bash
set -euo pipefail
exec python -m examples.run_kitti_stereo "$@"
