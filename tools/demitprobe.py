"""Device-side JPEG entropy-emit prototype probe (measured rate).

PERF.md's whole-system model identifies host entropy coding as the
binding constraint on the 20k img/s target and ANALYZES why a TPU
offload loses; this probe MEASURES that claim instead of computing it.

Design under test (the most TPU-friendly formulation found):
  * restart interval 1 → every MCU's bitstream is byte-aligned and
    independent (legal baseline JPEG; ~7% size overhead at 12 MP/q85),
    so the host finisher is a byte-granular concat + stuffing pass;
  * symbolization (magnitude categories, zero runs, Huffman code
    lookup, zigzag) is fully vectorized — cheap on the VPU/MXU;
  * per-MCU bit PACKING is the blocker: Mosaic/XLA-TPU has no
    per-lane dynamic scatter, so each of the ~392 emission slots per
    MCU updates its ≤3 target words via one-hot selection over the
    64-word MCU buffer inside a fori_loop — O(slots × words) work for
    O(slots) useful bits.

The probe builds real slot streams from real quantized coefficients
(Annex K tables, DC diffs chained per MCU, ZRL/EOB rules), validates
the packed words bit-exactly against an independent numpy packer, and
slope-times the jitted symbolize+pack program on the live chip.

Output: one JSON line with ms/image attribution and the img/s/chip the
offload would sustain — compare against the native host emitter
(~37 ms/image/core, i.e. one host core ≈ 27 img/s).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

# Annex K tables as (code, length) arrays indexed by symbol.
DC_LUM_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d]
AC_CHR_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa]


def build_enc_table(bits, vals):
    """(256,) code and length arrays (0 length = unused symbol)."""
    code_arr = np.zeros(256, np.int64)
    len_arr = np.zeros(256, np.int32)
    c = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l]):
            code_arr[vals[k]] = c
            len_arr[vals[k]] = l
            c += 1
            k += 1
        c <<= 1
    return code_arr, len_arr


def numpy_pack_reference(lens, his, los, nwords):
    """Independent bit-packer: MSB-first stream into u32 words."""
    out = np.zeros(nwords, np.uint32)
    pos = 0
    for ln, hi, lo in zip(lens, his, los):
        if ln == 0:
            continue
        v = (int(hi) << 32) | (int(lo) & 0xFFFFFFFF)
        for b in range(ln - 1, -1, -1):  # MSB of the field first
            bit = (v >> b) & 1
            if bit:
                out[pos >> 5] |= np.uint32(1 << (31 - (pos & 31)))
            pos += 1
    return out, pos


def main() -> int:
    from imageprocessor_tpu import config as _config
    _config.apply_device_platform(_config.load())

    import jax
    import jax.numpy as jnp

    B_MCUS = 49152          # 12 MP at 4:2:0 (192 x 256 MCUs)
    NW = 64                 # 256-byte MCU buffer cap
    dev = jax.devices()[0]
    print(f"platform={dev.platform} mcus={B_MCUS} words/MCU={NW}",
          file=sys.stderr)

    # ---- real-ish quantized coefficients: encode the bench image and
    # scan it back so the distribution is the production one.
    from bench import make_inputs
    from imageprocessor_tpu.runtime import nativecodec as nc
    from imageprocessor_tpu.runtime.codecs import encode_image
    imgs, _ = make_inputs(1, 3072, 4096, 3072, 4096)
    jpeg = encode_image(imgs[0], "jpeg", 85)
    (y, cb, cr), _qt, _dims, _samp = nc.scan_jpeg_coefficients(jpeg)

    # blockify to (M, 6, 64) natural order, zigzag later on device
    def blocks(plane, bh, bw):
        return (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
                .reshape(bh * bw, 64))

    yb = blocks(y, 384, 512).reshape(192, 2, 256, 2, 64)
    yb = yb.transpose(0, 2, 1, 3, 4).reshape(B_MCUS, 4, 64)
    cbb = blocks(cb, 192, 256)[:, None]
    crb = blocks(cr, 192, 256)[:, None]
    mcu = np.concatenate([yb, cbb, crb], axis=1).astype(np.int32)

    dc_l = build_enc_table(DC_LUM_BITS, DC_LUM_VALS)
    dc_c = build_enc_table(DC_CHR_BITS, DC_CHR_VALS)
    ac_l = build_enc_table(AC_LUM_BITS, AC_LUM_VALS)
    ac_c = build_enc_table(AC_CHR_BITS, AC_CHR_VALS)
    # per-block-position tables: blocks 0-3 luma, 4-5 chroma
    dc_code = np.stack([dc_l[0]] * 4 + [dc_c[0]] * 2).astype(np.int64)
    dc_len = np.stack([dc_l[1]] * 4 + [dc_c[1]] * 2).astype(np.int32)
    ac_code = np.stack([ac_l[0]] * 4 + [ac_c[0]] * 2).astype(np.int64)
    ac_len = np.stack([ac_l[1]] * 4 + [ac_c[1]] * 2).astype(np.int32)
    zrl_code = np.array([ac_l[0][0xF0]] * 4 + [ac_c[0][0xF0]] * 2,
                        np.int64)
    zrl_len = np.array([ac_l[1][0xF0]] * 4 + [ac_c[1][0xF0]] * 2,
                       np.int32)
    eob_code = np.array([ac_l[0][0x00]] * 4 + [ac_c[0][0x00]] * 2,
                        np.int64)
    eob_len = np.array([ac_l[1][0x00]] * 4 + [ac_c[1][0x00]] * 2,
                       np.int32)

    NSLOT = 6 * 65  # DC + 63 AC + EOB per block

    def symbolize(mcu_i32):
        """(M, 6, 64) natural-order blocks -> per-slot (len, hi, lo)
        streams, (M, NSLOT) each, plus per-MCU total bits."""
        zz = jnp.asarray(ZIGZAG)
        blk = jnp.take(mcu_i32, zz, axis=2)          # zigzag order
        # DC diffs: luma chains 0->1->2->3; chroma pred 0 (DRI=1)
        dc = blk[:, :, 0]
        # pred: [0, dc0, dc1, dc2, 0, 0] — luma chains inside the MCU,
        # chroma predicts 0 (DRI=1 resets every MCU)
        pred = jnp.concatenate(
            [jnp.zeros_like(dc[:, :1]), dc[:, :3],
             jnp.zeros_like(dc[:, :2])], axis=1)
        diff = dc - pred
        mag = jnp.abs(diff)
        s_dc = jnp.ceil(jnp.log2(mag.astype(jnp.float32) + 1.0)
                        ).astype(jnp.int32)
        s_dc = jnp.where(mag > 0, jnp.maximum(s_dc, 1), 0)
        bits_dc = jnp.where(diff < 0, diff - 1, diff).astype(jnp.int32)
        bits_dc = bits_dc & ((1 << s_dc) - 1)
        code_dc = jnp.take_along_axis(
            jnp.asarray(dc_code, jnp.uint32)[None],
            s_dc[..., None].astype(jnp.int32), axis=2)[..., 0]
        clen_dc = jnp.take_along_axis(
            jnp.asarray(dc_len)[None], s_dc[..., None], axis=2)[..., 0]
        dc_total_len = clen_dc + s_dc
        # fused code+value, <= 22 bits -> lo only
        dc_lo = (code_dc << s_dc) | bits_dc.astype(jnp.uint32)

        # AC: k = 1..63 zigzag positions
        ac = blk[:, :, 1:]                            # (M, 6, 63)
        nz = ac != 0
        kidx = jnp.arange(1, 64, dtype=jnp.int32)[None, None]
        # previous nonzero position (or 0) via cummax of k*nz
        prev = jnp.concatenate(
            [jnp.zeros_like(ac[:, :, :1]),
             jax.lax.cummax(jnp.where(nz, kidx, 0), axis=2)[:, :, :-1]],
            axis=2)
        run = jnp.where(nz, kidx - prev - 1, 0)
        zrl_n = run >> 4
        run4 = run & 15
        mag = jnp.abs(ac)
        s_ac = jnp.ceil(jnp.log2(mag.astype(jnp.float32) + 1.0)
                        ).astype(jnp.int32)
        s_ac = jnp.where(nz, jnp.maximum(s_ac, 1), 0)
        rs = (run4 << 4) | s_ac
        vbits = jnp.where(ac < 0, ac - 1, ac).astype(jnp.int32)
        vbits = vbits & ((1 << s_ac) - 1)
        code_ac = jnp.take_along_axis(
            jnp.asarray(ac_code, jnp.uint32)[None], rs, axis=2)
        clen_ac = jnp.take_along_axis(
            jnp.asarray(ac_len)[None], rs, axis=2)
        zl = jnp.asarray(zrl_len)[None, :, None]
        zc = jnp.asarray(zrl_code, jnp.uint32)[None, :, None]
        # slot value: zrl_n ZRL codes, then code+value (total <=59 b),
        # kept as a (hi, lo) u32 pair — TPU has no 64-bit lanes, so
        # this is also the production formulation.
        base = ((code_ac.astype(jnp.uint32) << s_ac)
                | vbits.astype(jnp.uint32))          # <= 26 bits
        blen = clen_ac + s_ac
        v_lo = base
        v_hi = jnp.zeros_like(base)
        ln = jnp.where(nz, blen, 0)
        for i in range(3):  # at most 3 ZRLs (run <= 62)
            add = zrl_n > i
            # prepend zc at bit position ln (zc << ln across the pair)
            shl = jnp.clip(ln, 0, 31).astype(jnp.uint32)
            lo_add = jnp.where(ln < 32, zc << shl, 0)
            hi_spill = jnp.where(
                (ln > 0) & (ln < 32),
                zc >> (32 - shl).astype(jnp.uint32), 0)
            hi_add = jnp.where(
                ln >= 32, zc << jnp.clip(ln - 32, 0, 31
                                         ).astype(jnp.uint32),
                hi_spill)
            v_lo = jnp.where(add, v_lo | lo_add, v_lo)
            v_hi = jnp.where(add, v_hi | hi_add, v_hi)
            ln = jnp.where(add, ln + zl, ln)
        ac_hi = v_hi
        ac_lo = v_lo

        # EOB slot per block: emitted unless k=63 is nonzero
        last_nz = jax.lax.cummax(jnp.where(nz, kidx, 0), axis=2)[:, :, -1]
        has_eob = last_nz < 63                       # (M, 6)
        eob_lo = jnp.where(has_eob,
                           jnp.asarray(eob_code, jnp.uint32)[None],
                           jnp.zeros((), jnp.uint32))
        eob_ln = jnp.where(has_eob, jnp.asarray(eob_len)[None], 0)

        # assemble (M, NSLOT): [DC, AC*63, EOB] x 6 blocks
        lens = jnp.concatenate(
            [dc_total_len[:, :, None], ln, eob_ln[:, :, None]], axis=2)
        his = jnp.concatenate(
            [jnp.zeros_like(dc_lo)[:, :, None], ac_hi,
             jnp.zeros_like(eob_lo)[:, :, None]], axis=2)
        los = jnp.concatenate(
            [dc_lo[:, :, None], ac_lo, eob_lo[:, :, None]], axis=2)
        m = mcu_i32.shape[0]
        return (lens.reshape(m, NSLOT), his.reshape(m, NSLOT),
                los.reshape(m, NSLOT))

    def pack(lens, his, los):
        """(M, NSLOT) slot streams -> (M, NW) u32 words, MSB-first."""
        offs = jnp.cumsum(lens, axis=1) - lens        # start bit
        his = his.astype(jnp.uint32)
        los = los.astype(jnp.uint32)
        m = lens.shape[0]
        buf = jnp.zeros((m, NW), jnp.uint32)
        iota_w = jnp.arange(NW, dtype=jnp.int32)[None]

        zero = jnp.zeros((), jnp.uint32)

        def body(s, buf):
            ln = lens[:, s]                          # (M,) i32
            off = offs[:, s]
            hi = his[:, s]                           # (M,) u32
            lo = los[:, s]
            r = off & 31
            w0 = off >> 5
            # place the (hi:lo) pair's ln bits at bit r of a 96-bit
            # window [0, hi, lo] << kb, then rotate kw words up —
            # all u32 pair arithmetic (TPU has no 64-bit lanes).
            k = 96 - r - ln                          # in [6, 96]
            kw = k >> 5                              # 0..3 words
            kb = (k & 31).astype(jnp.uint32)
            # >> (32-kb) is only meaningful when kb>0; clamp the shift
            # amount to a legal value there and mask the kb==0 lane
            inv = jnp.where(kb > 0, 32 - kb, 1).astype(jnp.uint32)
            b0 = lo << kb
            sp0 = jnp.where(kb > 0, lo >> inv, zero)
            b1 = (hi << kb) | sp0
            b2 = jnp.where(kb > 0, hi >> inv, zero)
            # MSW-order words at w0, w0+1, w0+2 after the kw rotation
            c0 = jnp.where(kw == 0, b2, jnp.where(kw == 1, b1,
                           jnp.where(kw == 2, b0, zero)))
            c1 = jnp.where(kw == 0, b1, jnp.where(kw == 1, b0, zero))
            c2 = jnp.where(kw == 0, b0, zero)
            live = (ln > 0)[:, None]
            upd = (jnp.where(iota_w == w0[:, None], c0[:, None], zero)
                   | jnp.where(iota_w == (w0 + 1)[:, None],
                               c1[:, None], zero)
                   | jnp.where(iota_w == (w0 + 2)[:, None],
                               c2[:, None], zero))
            return (buf | jnp.where(live, upd, zero)
                    ).astype(jnp.uint32)

        return jax.lax.fori_loop(0, NSLOT, body, buf), offs

    sym_j = jax.jit(symbolize)
    pack_j = jax.jit(lambda m: pack(*symbolize(m))[0])

    # ---- correctness: device pack vs independent numpy packer
    mcu_dev = jax.device_put(mcu, dev)
    lens_np, his_np, los_np = (np.asarray(x) for x in sym_j(mcu_dev))
    packed = np.asarray(pack_j(mcu_dev[:4]))
    for i in range(4):
        ref, nbits = numpy_pack_reference(
            lens_np[i], his_np[i], los_np[i], NW)
        assert nbits <= NW * 32, f"MCU {i} overflows the {NW}-word cap"
        assert np.array_equal(ref, packed[i]), f"MCU {i} pack mismatch"
    print("pack matches the independent numpy reference on 4 MCUs",
          file=sys.stderr)

    # ---- rate: chained slope timing of the full symbolize+pack
    def looped(m0, k):
        def body(_i, carry):
            m, dep = carry
            out, _ = pack(*symbolize(m))
            dep = dep ^ out[0, 0]
            return m.at[0, 0, 0].set(
                m[0, 0, 0] ^ dep.astype(jnp.int32) & 1), dep
        return jax.lax.fori_loop(
            0, k, body, (m0, jnp.uint32(0)))[1]

    loop_j = jax.jit(looped)
    t0 = time.monotonic()
    np.asarray(loop_j(mcu_dev, 2))
    warm = time.monotonic() - t0
    print(f"warmup {warm:.1f}s", file=sys.stderr)

    def timed(k):
        t0 = time.monotonic()
        np.asarray(loop_j(mcu_dev, k))
        return time.monotonic() - t0

    k_small, k_big = 2, 8
    tb = timed(k_big)
    while tb < 1.5 and k_big < 256:
        k_big *= 4
        tb = timed(k_big)
    ts = timed(k_small)
    tb = timed(k_big)
    ms = (tb - ts) / (k_big - k_small) * 1000.0
    host_emit_ms = 22.8  # round-4 native emitter, same host
    out = {
        "device_emit_ms_per_12mp_image": round(ms, 2),
        "device_emit_images_per_sec_chip": round(1000.0 / ms, 1),
        "host_emit_ms_per_image_per_core": host_emit_ms,
        "verdict": ("offload LOSES" if ms > host_emit_ms / 8 else
                    "offload could win vs 8 host cores"),
        "note": ("symbolize+pack for ALL MCUs of one 12 MP image, "
                 "DRI=1 byte-aligned MCU design, validated bit-exact "
                 "vs an independent packer; excludes D2H of the "
                 "padded (49152, 256 B) buffers and the host concat+"
                 "stuffing pass. Compare ms/image against the native "
                 "host emitter per core: the chip serves 8 cores' "
                 "worth of batches, so the offload must beat "
                 "host_emit/8 ms/image to win on a v5e-8 host."),
        "platform": dev.platform,
        "k_big": k_big,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
