"""Sanity: the test harness runs on a virtual multi-device CPU platform."""
import jax


def test_cpu_platform_with_8_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", devs
    assert len(devs) == 8, devs
