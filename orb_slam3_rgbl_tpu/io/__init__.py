"""Dataset loaders + trajectory writers (KITTI / TUM / EuRoC formats)."""
