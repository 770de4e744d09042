"""Harness + package sanity: virtual multi-device CPU platform, every
module imports, the leveled logger filters (``Verbose::PrintMess``
semantics, reference System.h:47-72)."""
import importlib
import io
import pkgutil

import jax


def test_cpu_platform_with_8_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", devs
    assert len(devs) == 8, devs


def test_every_module_imports():
    """Catch import-time breakage anywhere in the package without paying
    a full e2e test (the reference equivalent is 'it links')."""
    import orb_slam3_rgbl_tpu as pkg

    failed = []
    for mod in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failed.append((mod.name, repr(e)))
    assert not failed, failed


def test_logger_levels_filter():
    from orb_slam3_rgbl_tpu.utils import logging as ulog

    buf = io.StringIO()
    ulog.set_level(ulog.NORMAL)
    ulog.log("visible", ulog.NORMAL, file=buf)
    ulog.log("hidden", ulog.DEBUG, file=buf)
    ulog.set_level(ulog.QUIET)
    ulog.log("also hidden", ulog.NORMAL, file=buf)
    out = buf.getvalue()
    assert "visible" in out and "hidden" not in out


def test_geo_camera_dispatch():
    from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
    from orb_slam3_rgbl_tpu.geometry.camera import is_fisheye

    cfg = kitti_rgbl_config()
    assert not is_fisheye(cfg.geo_camera)
    assert cfg.geo_camera is cfg.camera
