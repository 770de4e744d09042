"""Inertial subsystem: preintegration + gravity/bias initialization."""
