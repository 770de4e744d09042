"""SLAM engine: frame pipeline, map state, tracking, mapping, loop closing."""
