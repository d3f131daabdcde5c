"""Fused Pallas 4:2:0 coefficient decode (ops/pallas_jpeg) validation.

Interpret mode on the CPU backend; on real v5e the kernel was measured
at 5.0 ms per 8x12MP batch vs 38.5 ms for the XLA decode program, <=1
LSB apart (PERF.md round 3)."""

import numpy as np
import pytest

from imageprocessor_tpu.ops import pallas_jpeg as pj
from imageprocessor_tpu.ops.jpeg_decode import batched_decode_ycbcr

RNG = np.random.default_rng(23)


def _case(dims, H, W, seed=1, fh=2, fw=2):
    rng = np.random.default_rng(seed)
    B = len(dims)
    Hc, Wc = H // fh, W // fw
    mh, mw = 8 * fh, 8 * fw
    yc = rng.integers(-512, 512, (B, H, W)).astype(np.int16)
    cbc = rng.integers(-256, 256, (B, Hc, Wc)).astype(np.int16)
    crc = rng.integers(-256, 256, (B, Hc, Wc)).astype(np.int16)
    qt = (np.abs(rng.normal(6, 2, (B, 3, 8, 8))) + 1).astype(np.float32)
    cv = np.array([[-(-h // mh) * 8, -(-w // mw) * 8]
                   for h, w in dims], np.int32)
    for i, (h, w) in enumerate(dims):
        gh, gw = -(-h // mh) * mh, -(-w // mw) * mw
        yc[i, gh:, :] = 0
        yc[i, :, gw:] = 0
        cbc[i, gh // fh:, :] = 0
        cbc[i, :, gw // fw:] = 0
        crc[i, gh // fh:, :] = 0
        crc[i, :, gw // fw:] = 0
    return yc, cbc, crc, qt, cv


@pytest.mark.parametrize("fh,fw", [(2, 2), (1, 2), (2, 1), (1, 1)])
@pytest.mark.parametrize("H,W,dims", [
    (64, 256, [(60, 250), (64, 256), (40, 130)]),
    (384, 512, [(380, 500), (384, 512), (200, 260)]),  # multi-band
    (128, 384, [(128, 384), (100, 300)]),   # wc=192 at fw=2: tile-padded
    (128, 640, [(120, 633), (128, 640)]),   # wc=320 at fw=2: tile-padded
])
def test_matches_xla_decode_within_1lsb(H, W, dims, fh, fw):
    """Kernel vs XLA decode on the CPU backend, <=1 LSB.

    COVERAGE GAP (deliberate): on CPU, DEFAULT-precision f32 dots are
    exact, so this suite cannot exercise UPSAMPLE_PRECISION=default's
    bf16 operand rounding — that contract rests on the on-chip
    measurement (tools/jcodecprobe md<=1 gate, which must re-run
    before any change to the upsample math) plus the explicit bf16
    emulation in test_upsample_bf16_rounding_cpu_emulation below."""
    yc, cbc, crc, qt, cv = _case(dims, H, W, fh=fh, fw=fw)
    ref = np.asarray(batched_decode_ycbcr(yc, cbc, crc, qt, cv,
                                          fh=fh, fw=fw))
    plan = pj.make_plan(len(dims), H, W, fh, fw)
    args = pj.make_args(plan, qt, cv)
    out = np.asarray(pj.decode_420(yc, cbc, crc, plan, args,
                                   interpret=True))
    for i, (h, w) in enumerate(dims):
        d = np.abs(ref[i, :, :h, :w].astype(int)
                   - out[i, :, :h, :w].astype(int))
        assert d.max() <= 1, (fh, fw, i, h, w, d.max())


def test_upsample_bf16_rounding_cpu_emulation():
    """Emulate the TPU UPSAMPLE_PRECISION=default bf16 pass on CPU.

    The kernel's chroma-upsample dots run with bf16 operands on TPU
    (one MXU pass); CPU interpret mode runs them in exact f32, so the
    main decode suite never sees the rounding. This test reproduces
    the numeric path by hand — fancy-upsample 0.75/0.25 taps applied
    vertically then horizontally with explicit bf16 casts of every
    operand (including the inter-pass intermediate, which the TPU dot
    also rounds), then the worst-amplifying color weight (B = Y +
    1.772*Cb) — and checks the rounded u8 output stays within 1 LSB of
    the float64 path on pixel-sourced chroma. The theoretical
    adversarial worst case is ~1.3 LSB (three compounded quarter-ulp
    roundings through 1.772); pixel-sourced planes measure <=1 LSB
    here and on silicon (tools/jcodecprobe)."""
    import ml_dtypes

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (96, 160, 3)).astype(np.float64)
    ych = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
           + 0.114 * rgb[..., 2])
    cb = (-0.168735892 * rgb[..., 0] - 0.331264108 * rgb[..., 1]
          + 0.5 * rgb[..., 2])
    # subsampled chroma plane, as the IDCT would produce it (rounded
    # to the range libjpeg's pre-upsample range limit enforces)
    cbs = np.clip(cb[::2, ::2], -128.0, 127.0)

    def up1d(x, axis, cast):
        # fancy upsampling: out[2i] = .75 x[i] + .25 x[i-1] (clamped),
        # out[2i+1] = .75 x[i] + .25 x[i+1]
        x = np.moveaxis(x, axis, 0)
        xm = np.concatenate([x[:1], x[:-1]], axis=0)
        xp = np.concatenate([x[1:], x[-1:]], axis=0)
        x_, xm_, xp_ = (cast(v) for v in (x, xm, xp))
        even = 0.75 * x_ + 0.25 * xm_
        odd = 0.75 * x_ + 0.25 * xp_
        out = np.empty((2 * x.shape[0],) + x.shape[1:], np.float64)
        out[0::2] = even
        out[1::2] = odd
        return np.moveaxis(out, 0, axis)

    def bf16(v):
        return v.astype(ml_dtypes.bfloat16).astype(np.float64)

    exact = up1d(up1d(cbs, 0, lambda v: v), 1, lambda v: v)
    # TPU pass: operands bf16-rounded in BOTH passes (the vertical
    # output re-rounds when it becomes a horizontal-dot operand)
    approx = up1d(bf16(up1d(cbs, 0, bf16)), 1, bf16)

    h, w = exact.shape
    blue_exact = np.clip(np.round(ych[:h, :w] + 1.772 * exact),
                         0, 255).astype(np.int32)
    blue_approx = np.clip(np.round(ych[:h, :w] + 1.772 * approx),
                          0, 255).astype(np.int32)
    assert np.abs(blue_exact - blue_approx).max() <= 1


def test_chroma_tile_padding():
    """w=640/384-class buckets at fw=2 give chroma canvases whose width
    is not a 128-lane multiple — Mosaic rejects the chroma-window DMA
    slice on such memrefs (found by an end-to-end 640x480 upload on real
    TPU). The plan pads them to wcp and pad_chroma widens the arrays."""
    p = pj.make_plan(2, 128, 640)             # 4:2:0 -> wc=320
    assert (p.wc, p.wcp) == (320, 384)
    p2 = pj.make_plan(2, 128, 384, 1, 2)      # 4:2:2 -> wc=192
    assert (p2.wc, p2.wcp) == (192, 256)
    p3 = pj.make_plan(2, 128, 512)            # aligned: no-op
    assert (p3.wc, p3.wcp) == (256, 256)
    cb = np.ones((2, 64, 320), np.int16)
    cr = np.full((2, 64, 320), 2, np.int16)
    cbp, crp = pj.pad_chroma(p, cb, cr)
    assert cbp.shape == crp.shape == (2, 64, 384)
    assert (cbp[:, :, :320] == 1).all() and (cbp[:, :, 320:] == 0).all()
    assert (crp[:, :, :320] == 2).all() and (crp[:, :, 320:] == 0).all()
    same = pj.pad_chroma(p3, cb[:, :, :256], cr[:, :, :256])
    assert same[0].shape[-1] == 256
    # encode plans pad their chroma OUTPUT canvases the same way
    ep = pj.make_encode_plan(2, 128, 640)
    assert ep.wcp == 384
    assert pj.make_encode_plan(2, 128, 512).wcp == 256


def test_engine_falls_back_to_xla_when_pallas_codec_fails(tmp_path,
                                                          monkeypatch):
    """A geometry the eligibility gate admits but the kernel cannot
    compile (or any other Pallas codec failure) must fall back to the
    XLA codec path and blacklist the geometry — never fail the image.

    Splice is disabled here on purpose: with the default splice-on
    config a single-op watermark JPEG task never reaches the device
    encode (runtime/splice.py serves it from the scanned stream), so
    the codec routing/fallback intent this test covers only exists on
    the splice-off path. The splice-default behavior is asserted by
    test_engine_splice_default_skips_device_encode below."""
    import io
    import uuid

    from PIL import Image as PILImage

    from imageprocessor_tpu.domain import (
        ImageStatus,
        OperationParams,
        OperationType,
        ProcessingTask,
    )
    from imageprocessor_tpu.runtime import nativecodec as nc
    from imageprocessor_tpu.runtime.engine import ProcessingEngine
    from imageprocessor_tpu.storage import LocalFSObjectStore

    if not nc.available() or not hasattr(nc._load(), "ip_jpeg_scan_dims"):
        pytest.skip("native scanner unavailable")
    monkeypatch.setenv("IMAGEPROCESSOR_JPEG_SPLICE", "0")
    arr = RNG.integers(0, 256, (300, 400, 3), dtype=np.uint8)
    bio = io.BytesIO()
    PILImage.fromarray(arr).save(bio, format="JPEG", quality=90)
    blob = bio.getvalue()

    def task():
        iid = str(uuid.uuid4())
        return ProcessingTask(
            id=iid, image_id=iid, original_path="o", bucket="b",
            operations=[OperationParams(OperationType.WATERMARK,
                                        {"text": "t"})],
            format="jpeg")

    eng = ProcessingEngine(LocalFSObjectStore(str(tmp_path)),
                           device_jpeg=True, use_pallas=True,
                           pallas_interpret=True)
    calls = {"dec": 0, "enc": 0}

    def boom_dec(*a, **k):
        calls["dec"] += 1
        raise RuntimeError("Mosaic failed to compile TPU kernel")

    def boom_enc(*a, **k):
        calls["enc"] += 1
        raise RuntimeError("Mosaic failed to compile TPU kernel")

    monkeypatch.setattr(eng, "_decode_coefs_pallas", boom_dec)
    monkeypatch.setattr(eng, "_encode_coefs_pallas", boom_enc)
    try:
        r = eng.process_tasks([(task(), blob)])[0]
        assert r.result.status is ImageStatus.COMPLETED, r.result.error
        assert calls["dec"] == 1 and calls["enc"] == 1
        # second batch: geometry blacklisted, no retry of the kernel
        r2 = eng.process_tasks([(task(), blob)])[0]
        assert r2.result.status is ImageStatus.COMPLETED, r2.result.error
        assert calls["dec"] == 1 and calls["enc"] == 1
        assert any(isinstance(k, tuple) and k and k[0] == "pjdec-bad"
                   for k in eng.model._args_cache)
    finally:
        eng.close()


def test_device_group_retries_deferred_codec_failure(tmp_path, monkeypatch):
    """A Pallas codec kernel that compiles but faults at EXECUTION
    surfaces at the np.asarray consumption, outside the dispatchers'
    synchronous barrier. device_group must degrade that batch to the
    XLA codec programs once instead of failing every image."""
    import io
    import uuid

    from PIL import Image as PILImage

    from imageprocessor_tpu.domain import (
        ImageStatus,
        OperationParams,
        OperationType,
        ProcessingTask,
    )
    from imageprocessor_tpu.runtime import nativecodec as nc
    from imageprocessor_tpu.runtime.engine import ProcessingEngine
    from imageprocessor_tpu.storage import LocalFSObjectStore

    if not nc.available() or not hasattr(nc._load(), "ip_jpeg_scan_dims"):
        pytest.skip("native scanner unavailable")
    arr = RNG.integers(0, 256, (300, 400, 3), dtype=np.uint8)
    bio = io.BytesIO()
    PILImage.fromarray(arr).save(bio, format="JPEG", quality=90)
    blob = bio.getvalue()
    iid = str(uuid.uuid4())
    task = ProcessingTask(
        id=iid, image_id=iid, original_path="o", bucket="b",
        operations=[OperationParams(OperationType.THUMBNAIL,
                                    {"size": 100, "crop_to_fit": True})],
        format="jpeg")

    eng = ProcessingEngine(LocalFSObjectStore(str(tmp_path)),
                           device_jpeg=True, use_pallas=True,
                           pallas_interpret=True)
    orig = eng._device_group_impl
    calls = []

    def flaky(group, force_xla_codec=False):
        calls.append(force_xla_codec)
        if not force_xla_codec:
            raise RuntimeError("deferred device execution fault")
        return orig(group, force_xla_codec=True)

    monkeypatch.setattr(eng, "_device_group_impl", flaky)
    try:
        r = eng.process_tasks([(task, blob)])[0]
        assert r.result.status is ImageStatus.COMPLETED, r.result.error
        assert calls == [False, True]
    finally:
        eng.close()


def test_plan_constraints():
    with pytest.raises(ValueError):
        pj.make_plan(1, 100, 256)       # H not multiple of 16
    with pytest.raises(ValueError):
        pj.make_plan(1, 64, 208)        # W not multiple of 128
    with pytest.raises(ValueError):
        pj.make_plan(1, 64, 128)        # W below chroma-chunk minimum
    with pytest.raises(ValueError):
        pj.make_plan(1, 64, 256, 3, 1)  # unsupported factor
    p = pj.make_plan(2, 3072, 4096)
    assert p.band_rows == 128 and p.n_bands == 24
    # all modes run the full band at <=4096 wide since the per-image
    # args became blocked BlockSpecs (measured faster on v5e, PERF.md)
    p444 = pj.make_plan(2, 3072, 4096, 1, 1)
    assert p444.band_rows == 128 and p444.win_rows == 128
    assert p444.hc == 3072 and p444.wc == 4096
    p422 = pj.make_plan(2, 3072, 4096, 1, 2)
    assert p422.band_rows == 128 and p422.win_rows == 128
    assert p422.hc == 3072 and p422.wc == 2048
    p440 = pj.make_plan(2, 3072, 4096, 2, 1)
    assert p440.band_rows == 128 and p440.win_rows == 80  # halo'd window
    assert p440.hc == 1536 and p440.wc == 4096
    # 4:4:4 beyond 4096 wide halves the band (full-size chroma windows)
    p444w = pj.make_plan(2, 1024, 6144, 1, 1)
    assert p444w.band_rows == 32


@pytest.mark.parametrize("H,W,dims", [
    (64, 256, [(60, 250), (64, 256), (40, 130)]),
    (64, 384, [(60, 380), (64, 384), (40, 200)]),   # 64-col chroma tail
    (384, 512, [(380, 500), (384, 512), (200, 260)]),  # multi-band
    # width-tiled plan (W>2048 -> tile_w 1280, 2 tiles): valid widths
    # straddling a mid-tile chunk, the full canvas, and one well short
    # of the second tile (don't-care region)
    (128, 2560, [(120, 2500), (128, 2560), (100, 513)]),
])
def test_encode_matches_xla_bitexact(H, W, dims):
    from imageprocessor_tpu.ops.jpeg_encode import (
        batched_encode_420,
        quality_qtables,
    )
    rng = np.random.default_rng(4)
    B = len(dims)
    rgb = rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8)
    vh = np.array(dims, np.int32)
    qt = np.asarray(quality_qtables(85), np.float32)
    ref = [np.asarray(x) for x in batched_encode_420(rgb, vh, qt)]
    plan = pj.make_encode_plan(B, H, W)
    args = pj.make_encode_args(plan, qt, vh)
    out = [np.asarray(x)
           for x in pj.encode_420(rgb, plan, args, interpret=True)]
    # <=1 quant step: the XLA einsum and the Pallas matmul chain sum in
    # different orders, so a coefficient landing exactly on a rounding
    # boundary can cross by one (measured: <=1 coef per megapixel)
    for (a, b, div) in zip(ref, out, (1, 2, 2)):
        for i, (h, w) in enumerate(dims):
            gh, gw = -(-h // 16) * 16 // div, -(-w // 16) * 16 // div
            d = np.abs(a[i, :gh, :gw].astype(int)
                       - b[i, :gh, :gw].astype(int))
            assert d.max() <= 1, (div, i, h, w, d.max())
            assert (d > 0).sum() <= 2 + gh * gw // 10000, \
                (div, i, (d > 0).sum())


def test_encode_plan_constraints():
    with pytest.raises(ValueError):
        pj.make_encode_plan(1, 100, 256)    # H not multiple of 16
    with pytest.raises(ValueError):
        pj.make_encode_plan(1, 64, 192)     # W not multiple of 128
    with pytest.raises(ValueError):
        pj.make_encode_plan(1, 64, 128)     # W below minimum
    p = pj.make_encode_plan(8, 3072, 4096)
    # wide canvases tile the width so the band stays MXU-sized (the
    # per-step footprint is band_rows x tile_w, not band_rows x w)
    assert p.band_rows == 128 and p.tile_w == 1024
    assert p.n_bands * p.n_wtiles == 96
    # rungs 1280 divides prefer the larger tile (silicon A/B: bigger
    # tiles win; 2560 at tile 512 measured 8.44 vs 8.00 ms at 1280)
    assert pj.make_encode_plan(8, 3072, 2560).tile_w == 1280
    # widths whose divisors can't stay lane-aligned fall back to the
    # VMEM-bounded narrow band
    q = pj.make_encode_plan(8, 3072, 2176)
    assert q.tile_w == 2176 and q.band_rows == 64


@pytest.mark.parametrize("subsampling,fh,fw", [
    (2, 2, 2),   # 4:2:0
    (1, 1, 2),   # 4:2:2
    (0, 1, 1),   # 4:4:4
])
def test_engine_routes_eligible_coefs_through_kernel(tmp_path, subsampling,
                                                     fh, fw):
    """The engine's coefficient decode dispatch: eligible geometry in
    each common subsampling mode takes the Pallas kernel (interpret on
    CPU) and the result feeds the pipeline identically to the XLA
    program."""
    import io
    import uuid

    from PIL import Image as PILImage

    from imageprocessor_tpu.domain import (
        ImageStatus,
        OperationParams,
        OperationType,
        ProcessingTask,
    )
    from imageprocessor_tpu.runtime import nativecodec as nc
    from imageprocessor_tpu.runtime.engine import ProcessingEngine
    from imageprocessor_tpu.storage import LocalFSObjectStore

    if not nc.available() or not hasattr(nc._load(), "ip_jpeg_scan_dims"):
        pytest.skip("native scanner unavailable")
    arr = RNG.integers(0, 256, (300, 400, 3), dtype=np.uint8)
    bio = io.BytesIO()
    PILImage.fromarray(arr).save(bio, format="JPEG", quality=90,
                                 subsampling=subsampling)
    blob = bio.getvalue()

    def task():
        iid = str(uuid.uuid4())
        return ProcessingTask(
            id=iid, image_id=iid, original_path="o", bucket="b",
            operations=[OperationParams(OperationType.THUMBNAIL,
                                        {"size": 100, "crop_to_fit": True})],
            format="jpeg")

    e1 = ProcessingEngine(LocalFSObjectStore(str(tmp_path / "a")),
                          device_jpeg=True, use_pallas=True,
                          pallas_interpret=True)
    e2 = ProcessingEngine(LocalFSObjectStore(str(tmp_path / "b")),
                          device_jpeg=True, use_pallas=False)
    try:
        r1 = e1.process_tasks([(task(), blob)])[0]
        r2 = e2.process_tasks([(task(), blob)])[0]
        assert r1.result.status is ImageStatus.COMPLETED, r1.result.error
        assert r2.result.status is ImageStatus.COMPLETED, r2.result.error
        # kernel args were cached under the engine's dispatch key, with
        # the scanned subsampling factors in it
        keys = [k for k in e1.model._args_cache
                if isinstance(k, tuple) and k and k[0] == "pjdec"]
        assert keys and keys[0][4:6] == (fh, fw), keys
        assert not any(isinstance(k, tuple) and k and k[0] == "pjdec"
                       for k in e2.model._args_cache)
    finally:
        e1.close()
        e2.close()


def test_engine_routes_device_encode_through_kernel(tmp_path, monkeypatch):
    """Full-bucket jpeg outputs (watermark on a 300x400 upload -> bucket
    384x512) take the fused Pallas ENCODE sweep: the engine widens the
    crop to a 128 multiple and caches kernel args under 'pjenc'; the
    emitted JPEG decodes to the XLA path's output within the suite's
    PSNR convention (the Pallas DECODE feeding it is <=1 LSB, not
    bit-exact, so quantized coefficients can differ by one step).

    Runs with splice disabled: on the default splice-on config a
    watermark-only JPEG task is served by the splice transcode and the
    device encode never runs (asserted separately by
    test_engine_splice_default_skips_device_encode)."""
    import io
    import uuid

    from PIL import Image as PILImage

    from imageprocessor_tpu.domain import (
        ImageStatus,
        OperationParams,
        OperationType,
        ProcessingTask,
    )
    from imageprocessor_tpu.runtime import nativecodec as nc
    from imageprocessor_tpu.runtime.engine import ProcessingEngine
    from imageprocessor_tpu.storage import LocalFSObjectStore

    if not nc.available():
        pytest.skip("native codec unavailable")
    monkeypatch.setenv("IMAGEPROCESSOR_JPEG_SPLICE", "0")
    # smooth natural-statistics fixture: pure noise at q85 sits every
    # coefficient on a quantization boundary, where the decode kernel's
    # legitimate <=1 LSB wiggle flips coefs broadly and PSNR measures
    # the fixture, not the code
    yy, xx = np.mgrid[0:300, 0:400].astype(np.float64)
    arr = np.stack([
        128 + 90 * np.sin(xx / 23.0) * np.cos(yy / 17.0),
        128 + 80 * np.cos(xx / 31.0 + 1.0),
        128 + 70 * np.sin((xx + yy) / 41.0),
    ], axis=-1).clip(0, 255).astype(np.uint8)
    bio = io.BytesIO()
    PILImage.fromarray(arr).save(bio, format="JPEG", quality=90)
    blob = bio.getvalue()

    def task():
        iid = str(uuid.uuid4())
        return ProcessingTask(
            id=iid, image_id=iid, original_path="o", bucket="b",
            operations=[OperationParams(OperationType.WATERMARK,
                                        {"text": "t"})],
            format="jpeg")

    outs = {}
    for name, use_pallas in (("a", True), ("b", False)):
        store = LocalFSObjectStore(str(tmp_path / name))
        eng = ProcessingEngine(store, device_jpeg=True,
                               use_pallas=use_pallas,
                               pallas_interpret=True)
        try:
            r = eng.process_tasks([(task(), blob)])[0]
            assert r.result.status is ImageStatus.COMPLETED, r.result.error
            routed = any(isinstance(k, tuple) and k and k[0] == "pjenc"
                         for k in eng.model._args_cache)
            assert routed == use_pallas
            path = r.result.processed_paths["watermark"]
            outs[name] = np.asarray(PILImage.open(
                io.BytesIO(store.get_object(path))))
        finally:
            eng.close()
    assert outs["a"].shape == outs["b"].shape
    err = (outs["a"].astype(np.float64) - outs["b"].astype(np.float64))
    mse = float(np.mean(err * err))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 45.0, psnr


def test_engine_splice_default_skips_device_encode(tmp_path):
    """Default (splice-on) config: a watermark-only JPEG task is served
    by the splice transcode — the device encode front half never runs
    (no 'pjenc' program compiled), the splice metric increments, and the
    untouched top of the image decodes byte-identically to the source
    (the property the splice path exists to provide)."""
    import io
    import uuid

    from PIL import Image as PILImage

    from imageprocessor_tpu.domain import (
        ImageStatus,
        OperationParams,
        OperationType,
        ProcessingTask,
    )
    from imageprocessor_tpu.runtime import nativecodec as nc
    from imageprocessor_tpu.runtime import splice
    from imageprocessor_tpu.runtime.engine import ProcessingEngine
    from imageprocessor_tpu.storage import LocalFSObjectStore
    from imageprocessor_tpu.utils.metrics import METRICS

    if not nc.available() or not hasattr(nc._load(), "ip_jpeg_scan_dims"):
        pytest.skip("native scanner unavailable")
    assert splice.enabled()  # the shipped default
    yy, xx = np.mgrid[0:300, 0:400].astype(np.float64)
    arr = np.stack([
        128 + 90 * np.sin(xx / 23.0) * np.cos(yy / 17.0),
        128 + 80 * np.cos(xx / 31.0 + 1.0),
        128 + 70 * np.sin((xx + yy) / 41.0),
    ], axis=-1).clip(0, 255).astype(np.uint8)
    bio = io.BytesIO()
    PILImage.fromarray(arr).save(bio, format="JPEG", quality=90)
    blob = bio.getvalue()

    iid = str(uuid.uuid4())
    task = ProcessingTask(
        id=iid, image_id=iid, original_path="o", bucket="b",
        operations=[OperationParams(OperationType.WATERMARK,
                                    {"text": "t",
                                     "position": "bottom-right"})],
        format="jpeg")
    store = LocalFSObjectStore(str(tmp_path))
    eng = ProcessingEngine(store, device_jpeg=True, use_pallas=True,
                           pallas_interpret=True)
    before = METRICS.snapshot()["counters"].get("engine_splice_images", 0)
    try:
        r = eng.process_tasks([(task, blob)])[0]
        assert r.result.status is ImageStatus.COMPLETED, r.result.error
        assert not any(isinstance(k, tuple) and k and k[0] == "pjenc"
                       for k in eng.model._args_cache)
        after = METRICS.snapshot()["counters"].get(
            "engine_splice_images", 0)
        assert after == before + 1
        path = r.result.processed_paths["watermark"]
        src = np.asarray(PILImage.open(io.BytesIO(blob)))
        got = np.asarray(PILImage.open(
            io.BytesIO(store.get_object(path))))
        assert got.shape == src.shape
        assert np.array_equal(src[:192], got[:192])
    finally:
        eng.close()
