"""Hung-device-step watchdog (utils/watchdog.py).

A wedged device RPC blocks forever without raising; the watchdog is the
only recovery (abort -> supervisor restart -> lease redelivery). The
reference has no analog (pure in-process CPU processing cannot hang on
a remote device, image_processor.go:29-182).
"""

import threading
import time

import pytest

from imageprocessor_tpu.config import ConfigError, load
from imageprocessor_tpu.utils.watchdog import Watchdog


def _collector():
    fired = []
    done = threading.Event()

    def action(name, elapsed):
        fired.append((name, elapsed))
        done.set()

    return fired, done, action


def test_fires_on_overrun():
    fired, done, action = _collector()
    wd = Watchdog(timeout_s=0.15, action=action, poll_s=0.02)
    try:
        with wd.armed("stuck_step"):
            assert done.wait(3.0), "watchdog never fired"
    finally:
        wd.close()
    assert fired and fired[0][0] == "stuck_step"
    assert fired[0][1] > 0.15


def test_completed_section_never_fires():
    fired, _done, action = _collector()
    wd = Watchdog(timeout_s=0.2, action=action, poll_s=0.02)
    try:
        for _ in range(3):
            with wd.armed("fast"):
                time.sleep(0.01)
        time.sleep(0.4)  # past the deadline had the sections stayed armed
    finally:
        wd.close()
    assert fired == []


def test_fires_at_most_once():
    fired, done, action = _collector()
    wd = Watchdog(timeout_s=0.05, action=action, poll_s=0.01)
    try:
        with wd.armed("a"), wd.armed("b"):
            assert done.wait(3.0)
            time.sleep(0.2)  # both remain expired; action must not repeat
    finally:
        wd.close()
    assert len(fired) == 1


def test_concurrent_sections_slow_one_fires():
    fired, done, action = _collector()
    wd = Watchdog(timeout_s=0.15, action=action, poll_s=0.02)

    def fast():
        for _ in range(10):
            with wd.armed("fast"):
                time.sleep(0.005)

    t = threading.Thread(target=fast)
    t.start()
    try:
        with wd.armed("slow"):
            assert done.wait(3.0)
    finally:
        t.join()
        wd.close()
    assert fired[0][0] == "slow"


def test_zero_timeout_disables():
    fired, _done, action = _collector()
    wd = Watchdog(timeout_s=0, action=action)
    assert not wd.enabled
    with wd.armed("anything"):
        time.sleep(0.05)
    assert wd._thread is None  # monitor never started
    assert fired == []


def test_config_parses_go_duration():
    cfg = load({"DEVICE_STEP_TIMEOUT": "5m"})
    assert cfg.worker.device_step_timeout_s == 300.0
    cfg = load({"DEVICE_STEP_TIMEOUT": "0"})
    assert cfg.worker.device_step_timeout_s == 0.0
    cfg = load({})
    assert cfg.worker.device_step_timeout_s == 900.0
    with pytest.raises(ConfigError):
        load({"DEVICE_STEP_TIMEOUT": "soon"})


def test_worker_arms_watchdog_around_device_step(tmp_path):
    """The batch worker hands its watchdog to the engine, which arms a
    section around EACH device-group dispatch (per compiled program —
    one deadline for the whole batch would crash-loop on legitimate
    multi-bucket cold compiles): a stuck device group triggers the
    action; the test injects a collector instead of the process abort."""
    import io

    import numpy as np
    from PIL import Image as PILImage

    from imageprocessor_tpu.broker.memory import MemoryBroker
    from imageprocessor_tpu.domain import OperationParams, OperationType
    from imageprocessor_tpu.service.usecase import ImageUsecase
    from imageprocessor_tpu.service.worker import Worker
    from imageprocessor_tpu.storage import (
        LocalFSObjectStore,
        SQLiteMetadataStore,
    )

    meta = SQLiteMetadataStore(":memory:")
    store = LocalFSObjectStore(str(tmp_path / "objects"))
    broker = MemoryBroker()
    cfg = load({})
    cfg.worker.batch_size = 4
    worker = Worker(cfg, meta=meta, store=store, broker=broker)
    uc = ImageUsecase(meta, store, broker)

    fired, done, action = _collector()
    worker._watchdog.close()
    worker._watchdog = Watchdog(timeout_s=0.2, action=action, poll_s=0.02)

    real = worker.engine.device_group

    def stuck(group):
        done.wait(3.0)  # wait until the watchdog sees the overrun
        return real(group)

    worker.engine.device_group = stuck
    try:
        arr = np.zeros((32, 48, 3), dtype=np.uint8)
        bio = io.BytesIO()
        PILImage.fromarray(arr).save(bio, format="PNG")
        uc.upload_image(bio.getvalue(), "w.png", "image/png",
                        [OperationParams(OperationType.THUMBNAIL,
                                         {"size": 16})])
        worker.run_once()
        assert fired and fired[0][0] == "device_group"
    finally:
        worker.engine.device_group = real
        worker.close()


def test_default_action_aborts_with_exit_code(monkeypatch, capsys):
    """The PRODUCTION path: the default action must reach os._exit(70)
    even though it logs at CRITICAL first — a logger without that level
    (or a broken stderr) once made the abort unreachable and left the
    wedged worker a zombie."""
    import os as _os

    from imageprocessor_tpu.utils import watchdog as wdmod

    codes = []
    monkeypatch.setattr(_os, "_exit", lambda code: codes.append(code))
    wdmod._default_action("stuck_step", 12.3)
    assert codes == [wdmod.WATCHDOG_EXIT_CODE]


def test_monitor_aborts_even_when_action_raises(monkeypatch):
    """An action that raises must not leave the once-per-instance latch
    set with no abort: the monitor falls back to os._exit(70)."""
    import os as _os

    codes = []
    done = threading.Event()

    def fake_exit(code):
        codes.append(code)
        done.set()

    monkeypatch.setattr(_os, "_exit", fake_exit)

    def broken_action(name, elapsed):
        raise AttributeError("boom")

    wd = Watchdog(timeout_s=0.1, action=broken_action, poll_s=0.02)
    try:
        with wd.armed("stuck_step"):
            assert done.wait(3.0), "watchdog never reached the abort"
    finally:
        wd.close()
    assert codes == [70]


def test_monitor_restarts_after_close():
    """close() stops the monitor, but sections armed AFTERWARD (the
    pipelined worker still drains device groups during shutdown) must
    be monitored again — a wedge during drain is the same zombie the
    watchdog exists to kill."""
    fired, done, action = _collector()
    wd = Watchdog(timeout_s=0.15, action=action, poll_s=0.02)
    with wd.armed("before-close"):
        pass
    wd.close()
    try:
        with wd.armed("drain-section"):
            assert done.wait(3.0), "watchdog never fired after close()"
    finally:
        wd.close()
    assert fired and fired[0][0] == "drain-section"
