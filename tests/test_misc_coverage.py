"""Coverage for CLI, tracing, backend gates, and remaining batched ops."""

import io
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image as PILImage

from imageprocessor_tpu import client as client_mod
from imageprocessor_tpu.broker.kafka import KafkaBroker
from imageprocessor_tpu.config import load as load_config
from imageprocessor_tpu.errors import MessageQueueError
from imageprocessor_tpu.ops.extra import batched_flip
from imageprocessor_tpu.utils.metrics import Metrics
from imageprocessor_tpu.utils.tracing import span
from tests.test_service_e2e import ServerHarness

RNG = np.random.default_rng(57)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    h = ServerHarness(tmp_path_factory.mktemp("cli"))
    url = h.start()
    yield url
    h.stop()


def test_client_cli_flow(server, tmp_path, capsys):
    png = tmp_path / "c.png"
    PILImage.fromarray(RNG.integers(0, 256, (64, 64, 3), dtype=np.uint8)
                       ).save(png)
    rc = client_mod.main(["--url", server, "upload", str(png),
                          "--thumbnail", "--wait"])
    assert rc == 0
    out = capsys.readouterr().out
    import json
    body = json.loads(out)
    assert body["final_status"] == "completed"
    image_id = body["id"]

    assert client_mod.main(["--url", server, "status", image_id]) == 0
    assert "completed" in capsys.readouterr().out

    dest = tmp_path / "dl.png"
    assert client_mod.main(["--url", server, "download", image_id,
                            str(dest), "--operation", "thumbnail"]) == 0
    capsys.readouterr()
    assert dest.stat().st_size > 0

    assert client_mod.main(["--url", server, "list"]) == 0
    assert image_id in capsys.readouterr().out

    assert client_mod.main(["--url", server, "delete", image_id]) == 0
    assert "deleted" in capsys.readouterr().out


def test_service_main_help():
    r = subprocess.run(
        [sys.executable, "-m", "imageprocessor_tpu.service", "--help"],
        capture_output=True, text=True, timeout=60,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
             "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0
    assert "standalone" in r.stdout


def test_tracing_span_records_metric():
    from imageprocessor_tpu.utils.metrics import METRICS

    METRICS.reset()
    with span("unit_test_stage"):
        pass
    snap = METRICS.snapshot()
    assert "span_unit_test_stage_ms" in snap["timings"]


def test_metrics_reservoir_bounded():
    m = Metrics()
    for i in range(10000):
        m.observe("x", float(i))
    snap = m.snapshot()
    assert snap["timings"]["x"]["count"] == 10000
    assert snap["timings"]["x"]["max"] <= 9999.0


def test_kafka_unreachable_broker_raises_clearly():
    cfg = load_config({"BROKER_BACKEND": "kafka",
                       "KAFKA_BROKERS": "127.0.0.1:1"})
    b = KafkaBroker(cfg.broker)
    with pytest.raises(MessageQueueError, match="no kafka broker reachable"):
        b.produce("t", b"k", b"v")
    b.close()


def test_batched_flip_respects_valid_extent():
    b = 2
    imgs = np.zeros((b, 64, 96, 3), dtype=np.uint8)
    dims = [(48, 80), (64, 96)]
    srcs = []
    for i, (h, w) in enumerate(dims):
        img = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
        srcs.append(img)
        imgs[i, :h, :w] = img
    hw = np.asarray(dims, dtype=np.int32)
    out_h = np.asarray(batched_flip(imgs, hw, direction="horizontal"))
    out_v = np.asarray(batched_flip(imgs, hw, direction="vertical"))
    for i, (h, w) in enumerate(dims):
        np.testing.assert_array_equal(out_h[i, :h, :w], srcs[i][:, ::-1])
        np.testing.assert_array_equal(out_v[i, :h, :w], srcs[i][::-1, :])


def test_log_level_survives_lazy_get_logger():
    """get_logger() at lazy module import must not reset an explicitly
    configured level (init_logging re-ran root.setLevel with its default
    on every call, silently dropping LOG_LEVEL=debug)."""
    import logging as _logging

    from imageprocessor_tpu.utils.logging import get_logger, init_logging

    root = _logging.getLogger("imageprocessor_tpu")
    before = root.level
    try:
        init_logging("debug")                 # operator's explicit choice
        assert root.level == _logging.DEBUG
        get_logger("some.lazy.module")        # implicit re-init
        assert root.level == _logging.DEBUG   # unchanged
    finally:
        root.setLevel(before)
