# Container build — the analog of the reference's Dockerfile
# (/root/reference/Dockerfile: Ubuntu 20.04 + ROS2 + OpenCV + Pangolin
# source builds). The TPU engine needs only Python + JAX; select the
# jax flavor for your accelerator at build time.
FROM python:3.12-slim

ARG JAX_FLAVOR="jax[tpu]"   # or "jax[cuda12]" / "jax" (cpu)

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/orb_slam3_rgbl_tpu
COPY pyproject.toml README.md ./
COPY orb_slam3_rgbl_tpu ./orb_slam3_rgbl_tpu
COPY examples ./examples
COPY tools ./tools
COPY evaluation ./evaluation
COPY bench.py bench_engine.py __graft_entry__.py ./

RUN pip install --no-cache-dir "${JAX_FLAVOR}" && \
    pip install --no-cache-dir -e .[test]

# native KITTI prefetcher builds on first use (io/native_loader.py)
ENTRYPOINT ["rgbl-kitti"]
