"""Client SDK tests against the real service harness."""

import io

import numpy as np
import pytest
from PIL import Image as PILImage

from imageprocessor_tpu.client import ClientError, ImageProcessorClient
from tests.test_service_e2e import ServerHarness

RNG = np.random.default_rng(41)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    h = ServerHarness(tmp_path_factory.mktemp("client"))
    url = h.start()
    yield url
    h.stop()


@pytest.fixture()
def png_file(tmp_path):
    arr = RNG.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    PILImage.fromarray(arr).save(p)
    return p


def test_client_full_flow(server, png_file, tmp_path):
    with ImageProcessorClient(server) as c:
        assert c.health()
        up = c.upload(png_file, thumbnail=True, watermark=True,
                      watermark_text="SDK")
        assert up["filename"] == "img.png"
        final = c.wait(up["id"], timeout=300)
        assert final == "completed"

        thumb = c.fetch(up["id"], operation="thumbnail")
        assert PILImage.open(io.BytesIO(thumb)).size == (200, 200)
        dest = c.download(up["id"], tmp_path / "out.png",
                          operation="watermark")
        assert dest.exists() and dest.stat().st_size > 0

        assert any(i["id"] == up["id"] for i in c.list_images())
        metrics = c.metrics()
        assert "counters" in metrics

        c.delete(up["id"])
        with pytest.raises(ClientError) as err:
            c.status(up["id"])
        assert err.value.status == 404


def test_client_error_mapping(server, tmp_path):
    bad = tmp_path / "bad.exe"
    bad.write_bytes(b"MZ")
    with ImageProcessorClient(server) as c:
        with pytest.raises(ClientError) as err:
            c.upload(bad)
        assert err.value.status == 400
        with pytest.raises(ClientError):
            c.fetch("not-an-id")
