"""Extra service-surface tests: static UI, GIF format flow, fault injection."""

import io

import httpx
import numpy as np
import pytest
from PIL import Image as PILImage

from imageprocessor_tpu.broker.memory import MemoryBroker
from imageprocessor_tpu.config import load as load_config
from imageprocessor_tpu.domain import ImageStatus, OperationParams, OperationType
from imageprocessor_tpu.service.usecase import ImageUsecase
from imageprocessor_tpu.service.worker import Worker
from imageprocessor_tpu.storage import LocalFSObjectStore, SQLiteMetadataStore
from imageprocessor_tpu.utils import RetryStrategy
from tests.test_service_e2e import ServerHarness

RNG = np.random.default_rng(83)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    h = ServerHarness(tmp_path_factory.mktemp("extras"))
    url = h.start()
    yield url
    h.stop()


def test_static_ui_served(server):
    with httpx.Client(timeout=10) as c:
        r = c.get(f"{server}/")
        assert r.status_code == 200
        assert "ImageProcessor" in r.text
        assert 'src="/static/app.js"' in r.text
        r = c.get(f"{server}/static/app.js")
        assert r.status_code == 200
        assert "POLL_INTERVAL_MS = 5000" in r.text  # 5 s polling parity
        r = c.get(f"{server}/static/style.css")
        assert r.status_code == 200


def test_metrics_endpoint_reports_stages(server):
    with httpx.Client(timeout=10) as c:
        m = c.get(f"{server}/api/metrics").json()
        assert "counters" in m and "timings" in m


def _worker_stack(tmp_path):
    cfg = load_config({})
    cfg.worker.batch_size = 4
    meta = SQLiteMetadataStore(":memory:")
    store = LocalFSObjectStore(str(tmp_path / "objects"))
    broker = MemoryBroker()
    uc = ImageUsecase(meta, store, broker,
                      retries=RetryStrategy(attempts=1, delay_ms=1))
    worker = Worker(cfg, meta=meta, store=store, broker=broker)
    return uc, meta, store, broker, worker


def test_gif_thumbnail_stays_gif(tmp_path):
    """GIF in -> thumbnail/resize stay GIF; watermark becomes JPEG
    (operations/{thumbnail,resize}.go gif branches; watermark.go:73-74)."""
    uc, meta, store, _broker, worker = _worker_stack(tmp_path)
    arr = RNG.integers(0, 256, size=(80, 100, 3), dtype=np.uint8)
    bio = io.BytesIO()
    PILImage.fromarray(arr).convert("P").save(bio, format="GIF")
    img = uc.upload_image(bio.getvalue(), "a.gif", "image/gif", [
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 32, "crop_to_fit": True}),
        OperationParams(OperationType.WATERMARK, {"text": "g"}),
    ])
    worker.run_once()
    assert meta.get_image(img.id).status is ImageStatus.COMPLETED
    rows = {r.operation.value: r for r in meta.list_processed(img.id)}
    assert rows["thumbnail"].path.endswith("32.gif")
    assert store.get_object(rows["thumbnail"].path)[:6] in (b"GIF87a",
                                                            b"GIF89a")
    assert rows["watermark"].path.endswith("watermarked.jpeg")
    worker.engine.close()


def test_storage_fault_injection_keeps_state_consistent(tmp_path):
    """Random save failures must yield failed status + redeliverable
    message — never a completed status without artifacts."""
    uc, meta, _store, broker, worker = _worker_stack(tmp_path)

    class FlakyStore:
        def __init__(self, inner):
            self.inner = inner
            self.fail = True

        def __getattr__(self, name):
            return getattr(self.inner, name)

        def save_processed(self, *a, **kw):
            if self.fail:
                self.fail = False
                raise IOError("injected storage failure")
            return self.inner.save_processed(*a, **kw)

    flaky = FlakyStore(worker.store)
    worker.engine.store = flaky

    bio = io.BytesIO()
    PILImage.fromarray(RNG.integers(0, 256, size=(50, 60, 3),
                                    dtype=np.uint8)).save(bio, format="PNG")
    img = uc.upload_image(bio.getvalue(), "f.png", "image/png", [
        OperationParams(OperationType.THUMBNAIL, {"size": 16})])

    worker.run_once()  # first attempt hits the injected failure
    assert meta.get_image(img.id).status is ImageStatus.FAILED
    # transient -> nacked -> still deliverable; second attempt succeeds
    assert broker.depth("image-processing", worker.cfg.broker.group_id) == 1
    worker.run_once()
    assert meta.get_image(img.id).status is ImageStatus.COMPLETED
    worker.engine.close()


def test_metrics_prometheus_exposition(server):
    import httpx

    with httpx.Client() as c:
        r = c.get(f"{server}/api/metrics", params={"format": "prometheus"})
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("text/plain")
        assert "# TYPE imageprocessor_" in r.text
        # JSON remains the default
        r2 = c.get(f"{server}/api/metrics")
        assert r2.headers["content-type"].startswith("application/json")
        # A real Prometheus scraper's Accept header (openmetrics first)
        # must get the text exposition, not JSON (scrape would fail).
        r3 = c.get(f"{server}/api/metrics", headers={
            "Accept": "application/openmetrics-text;version=1.0.0,"
                      "text/plain;version=0.0.4;q=0.5,*/*;q=0.1"})
        assert r3.headers["content-type"].startswith("text/plain")
        assert "# TYPE imageprocessor_" in r3.text


def test_webhook_completion_push(tmp_path):
    """WEBHOOK_URL posts each ProcessingResult JSON (retry-wrapped,
    failures never fatal)."""
    import http.server
    import io as _io
    import json
    import threading
    import time

    import numpy as np
    from PIL import Image as PILImage

    from imageprocessor_tpu.broker import MemoryBroker
    from imageprocessor_tpu.config import load
    from imageprocessor_tpu.domain import OperationParams, OperationType
    from imageprocessor_tpu.service.usecase import ImageUsecase
    from imageprocessor_tpu.service.worker import Worker, post_webhook
    from imageprocessor_tpu.storage import (
        LocalFSObjectStore,
        SQLiteMetadataStore,
    )
    from imageprocessor_tpu.utils import RetryStrategy

    received = []

    class Hook(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Hook)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_port}/cb"
    try:
        cfg = load({"WEBHOOK_URL": url})
        cfg.worker.batch_size = 2
        meta = SQLiteMetadataStore(":memory:")
        store = LocalFSObjectStore(str(tmp_path / "obj"))
        broker = MemoryBroker()
        uc = ImageUsecase(meta, store, broker,
                          retries=RetryStrategy(attempts=1, delay_ms=1))
        worker = Worker(cfg, meta=meta, store=store, broker=broker)
        arr = np.random.default_rng(0).integers(
            0, 256, (64, 80, 3), dtype=np.uint8)
        bio = _io.BytesIO()
        PILImage.fromarray(arr).save(bio, format="PNG")
        img = uc.upload_image(bio.getvalue(), "a.png", "image/png",
                              [OperationParams(OperationType.THUMBNAIL,
                                               {"size": 32})])
        worker.run_once()
        # delivery is asynchronous (background webhook thread)
        deadline = time.monotonic() + 10
        while not received and time.monotonic() < deadline:
            time.sleep(0.02)
        assert len(received) == 1
        assert received[0]["ImageID"] == img.id
        assert received[0]["Status"] == "completed"
        worker.close()

        # failure path: unreachable webhook is logged, not raised
        assert post_webhook("http://127.0.0.1:1/none", "{}",
                            RetryStrategy(attempts=1, delay_ms=1)) is False
    finally:
        srv.shutdown()
