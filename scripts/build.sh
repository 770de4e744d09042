#!/usr/bin/env bash
# ≡ reference scripts/build.sh (CMake build): editable install + native
# prefetcher compilation.
set -euo pipefail
cd "$(dirname "$0")/.."
pip install -e .
make -C orb_slam3_rgbl_tpu/native
echo "build complete"
