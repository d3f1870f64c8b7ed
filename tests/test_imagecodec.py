"""Tests for the baseline-JPEG and GIF decoders (operators/imagecodec).

No PIL/ffmpeg ships in this container, so verification is three-way:

1. a self-contained baseline-JPEG/GIF *encoder* lives in this test
   module (sharing only the file-format spec with the decoder, no code)
   and round-trips must reproduce pixels within quantization error —
   exactly, for flat images and for lossless GIF;
2. analytic cases (flat-gray JPEG decodes to the exact gray level);
3. cross-codec: the same image encoded as PNG (trusted codec, golden-
   tested since round 4) and as quality-1 JPEG must yield matching
   feature statistics through ``decode_media``.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bigdata_quality_assessment_spark.operators.imagecodec import (
    _DCT_C,
    _ZIGZAG,
    decode_gif,
    decode_jpeg,
)

# --------------------- test-side baseline JPEG encoder ----------------

# encoder-private canonical Huffman layouts (any valid table works —
# the decoder reads whatever DHT declares): 12 DC symbols at 4 bits,
# all 256 AC symbols at 9 bits.
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = bytes(range(12))
_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6  # DHT counts are bytes: ≤255/length
_AC_SYMBOLS = bytes(range(256))


def _encode_table(counts, symbols):
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            enc[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


_DC_ENC = _encode_table(_DC_COUNTS, _DC_SYMBOLS)
_AC_ENC = _encode_table(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-bit padding per spec


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits for a signed value."""
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _block_split(plane: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to multiples of 8 and return (by, bx, 8, 8)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)


def _encode_jpeg(
    img: np.ndarray, quant: int = 1, subsample_420: bool = False, restart: int = 0,
    y_samp: tuple[int, int] | None = None,
) -> bytes:
    """Minimal baseline-JPEG encoder (test oracle). ``img`` is (h, w)
    grayscale or (h, w, 3) RGB uint8; ``quant`` a flat quantization
    level; 4:4:4, (``subsample_420``) 4:2:0, or an explicit luma
    sampling factor ``y_samp`` (e.g. (2, 1) = 4:2:2)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps_px = [img]
        samp = [(1, 1)]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample_420:
            y_samp = (2, 2)
        if y_samp and y_samp != (1, 1):
            fh, fv = y_samp
            ph, pw = -(-h // fv) * fv, -(-w // fh) * fh
            def down(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return p.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))
            comps_px = [y, down(cb), down(cr)]
            samp = [(fh, fv), (1, 1), (1, 1)]
        else:
            comps_px = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    q = np.full((8, 8), quant, dtype=np.float64)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    blocks = []
    for px, (sh, sv) in zip(comps_px, samp):
        bs = _block_split(px)
        # pad block grid to full MCU coverage
        need_y, need_x = mcus_y * sv, mcus_x * sh
        by, bx = bs.shape[:2]
        if by < need_y or bx < need_x:
            bs = np.pad(
                bs, ((0, need_y - by), (0, need_x - bx), (0, 0), (0, 0)), mode="edge"
            )
        coefs = np.einsum("ui,yxij,vj->yxuv", _DCT_C, bs - 128.0, _DCT_C)
        blocks.append(np.round(coefs / q).astype(np.int64))

    out = bytearray(b"\xff\xd8")
    zz = q.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0]) + zz
    ncomp = len(comps_px)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMBOLS), (1, _AC_COUNTS, _AC_SYMBOLS)):
        body = bytes([tc << 4]) + bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw_ = _BitWriter()
    pred = [0] * ncomp
    total = mcus_x * mcus_y
    emitted = 0
    rst = 0
    for mcu in range(total):
        if restart and emitted == restart:
            bw_.flush()
            out += bw_.buf + bytes([0xFF, 0xD0 + (rst & 7)])
            bw_ = _BitWriter()
            pred = [0] * ncomp
            rst += 1
            emitted = 0
        my, mx = divmod(mcu, mcus_x)
        for ci, (sh, sv) in enumerate(samp):
            for by in range(sv):
                for bx in range(sh):
                    blk = blocks[ci][my * sv + by, mx * sh + bx]
                    zzc = blk.reshape(-1)[_ZIGZAG]
                    diff = int(zzc[0]) - pred[ci]
                    pred[ci] = int(zzc[0])
                    s, bits = _magnitude(diff)
                    c, ln = _DC_ENC[s]
                    bw_.write(c, ln)
                    if s:
                        bw_.write(bits, s)
                    run = 0
                    for k in range(1, 64):
                        v = int(zzc[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = _AC_ENC[0xF0]
                            bw_.write(c, ln)
                            run -= 16
                        s, bits = _magnitude(v)
                        c, ln = _AC_ENC[(run << 4) | s]
                        bw_.write(c, ln)
                        bw_.write(bits, s)
                        run = 0
                    if run:
                        c, ln = _AC_ENC[0x00]
                        bw_.write(c, ln)
        emitted += 1
    bw_.flush()
    out += bw_.buf + b"\xff\xd9"
    return bytes(out)


# ------------------------ test-side GIF encoder -----------------------


def _encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    screen: tuple[int, int] | None = None,
    offset: tuple[int, int] = (0, 0),
    bg: int = 0,
) -> bytes:
    """Minimal GIF89a encoder: literal LZW codes with CLEAR emitted
    before the dictionary forces a width the literal stream doesn't
    track. Valid, uncompressed-style output every decoder must accept.
    ``screen``/``offset`` place the frame as a patch on a larger
    logical screen (optimized-animation shape)."""
    h, w = indices.shape
    sw, sh = screen or (w, h)
    ncol = len(palette)
    bits = max(2, int(np.ceil(np.log2(max(ncol, 2)))))
    psize = 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (bits - 1), bg, 0])
    pal = np.zeros((psize, 3), dtype=np.uint8)
    pal[:ncol] = palette
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", offset[0], offset[1], w, h)
    out += bytes([0x40 if interlace else 0x00])
    min_code = bits
    clear = 1 << min_code
    out += bytes([min_code])

    rows = indices
    if interlace:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        rows = indices[order]

    acc = 0
    nbits = 0
    data = bytearray()
    width = min_code + 1
    next_code = clear + 2

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in rows.reshape(-1):
        emit(int(v))
        # decoder grows its dict after every literal; emit CLEAR before
        # its code width would outgrow ours
        next_code += 1
        if next_code == (1 << width):
            emit(clear)
            width = min_code + 1
            next_code = clear + 2
    emit(clear + 1)  # EOI
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ------------------------------ tests ---------------------------------


def test_jpeg_flat_gray_exact():
    img = np.full((16, 16), 200, dtype=np.uint8)
    px = decode_jpeg(_encode_jpeg(img, quant=1))
    assert px is not None and px.shape == (16, 16, 1)
    assert int(px.max()) == int(px.min()) == 200


def test_jpeg_gray_roundtrip_quality1():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(24, 17), dtype=np.uint8)
    px = decode_jpeg(_encode_jpeg(img, quant=1))
    assert px is not None and px.shape == (24, 17, 1)
    err = np.abs(px[..., 0].astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_jpeg_rgb_444_roundtrip():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 24, 3), dtype=np.uint8)
    px = decode_jpeg(_encode_jpeg(img, quant=1))
    assert px is not None and px.shape == (16, 24, 3)
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.max() <= 6 and err.mean() < 1.5


def test_jpeg_420_subsampling_luminance_preserved():
    rng = np.random.RandomState(13)
    # smooth-chroma image: random luminance, constant-ish color
    base = rng.randint(0, 256, size=(32, 40), dtype=np.uint8)
    img = np.stack([base, base, base], axis=-1)
    px = decode_jpeg(_encode_jpeg(img, quant=1, subsample_420=True))
    assert px is not None and px.shape == (32, 40, 3)
    lum_in = img[..., :3].mean(axis=2)
    lum_out = px[..., :3].mean(axis=2)
    assert np.abs(lum_in.mean() - lum_out.mean()) < 1.0
    assert np.abs(lum_in - lum_out).mean() < 2.5


def test_jpeg_restart_markers_match_unrestarted():
    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, size=(24, 24), dtype=np.uint8)
    a = decode_jpeg(_encode_jpeg(img, quant=1))
    b = decode_jpeg(_encode_jpeg(img, quant=1, restart=2))
    assert a is not None and b is not None
    assert np.array_equal(a, b)


def test_jpeg_coarse_quant_still_decodes():
    rng = np.random.RandomState(19)
    img = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    px = decode_jpeg(_encode_jpeg(img, quant=16))
    assert px is not None
    # coarse quantization: means survive, detail doesn't
    assert abs(float(px.mean()) - float(img.mean())) < 8.0


def test_jpeg_fake_progressive_marker_on_baseline_scan_rejected():
    """A baseline stream with its SOF marker rewritten to SOF2 is NOT a
    valid progressive file (the scan header claims Ss=0..Se=63 in one
    scan, which progressive forbids for multi-coefficient bands with
    interleaved DC semantics) — the decoder must return None, not
    garbage."""
    img = np.full((8, 8), 90, dtype=np.uint8)
    blob = bytearray(_encode_jpeg(img, quant=1))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    assert decode_jpeg(bytes(blob)) is None


def test_jpeg_truncated_and_garbage_rejected():
    img = np.full((8, 8), 90, dtype=np.uint8)
    blob = _encode_jpeg(img, quant=1)
    assert decode_jpeg(blob[: len(blob) // 2]) is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0" + b"\x00" * 32) is None
    assert decode_jpeg(b"") is None


def test_gif_roundtrip_exact():
    rng = np.random.RandomState(23)
    palette = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(13, 21), dtype=np.uint8)
    px = decode_gif(_encode_gif(idx, palette))
    assert px is not None and px.shape == (13, 21, 3)
    assert np.array_equal(px, palette[idx])


def test_gif_interlaced_roundtrip_exact():
    rng = np.random.RandomState(29)
    palette = rng.randint(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.randint(0, 8, size=(17, 9), dtype=np.uint8)
    px = decode_gif(_encode_gif(idx, palette, interlace=True))
    assert px is not None
    assert np.array_equal(px, palette[idx])


def test_gif_large_enough_to_grow_code_width():
    # > 2^(min_code+1) pixels forces LZW code-width growth + CLEARs
    rng = np.random.RandomState(31)
    palette = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(40, 50), dtype=np.uint8)
    px = decode_gif(_encode_gif(idx, palette))
    assert px is not None
    assert np.array_equal(px, palette[idx])


def test_gif_garbage_rejected():
    assert decode_gif(b"GIF89a" + b"\x00" * 6) is None
    assert decode_gif(b"NOTGIF") is None
    assert decode_gif(b"") is None


def test_jpeg_fill_bytes_before_restart_marker():
    """Spec B.1.1.2: 0xFF fill bytes may pad RST markers inside the
    entropy stream (review finding: the scan previously truncated
    there and fell back to the stub)."""
    rng = np.random.RandomState(37)
    img = rng.randint(0, 256, size=(24, 24), dtype=np.uint8)
    blob = _encode_jpeg(img, quant=1, restart=2)
    base = decode_jpeg(blob)
    padded = bytearray(blob)
    idx = padded.index(b"\xff\xd0")
    padded[idx:idx] = b"\xff\xff"  # two fill bytes before RST0
    got = decode_jpeg(bytes(padded))
    assert got is not None
    assert np.array_equal(got, base)


def test_gif_offset_frame_composes_onto_logical_screen():
    """An optimized-animation first frame (patch smaller than the
    logical screen) must report SCREEN geometry with the patch pasted
    at its offset and background color elsewhere (review finding:
    previously reported patch geometry, diverging from the header
    fallback path on the same blob)."""
    palette = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], dtype=np.uint8)
    idx = np.array([[1, 2, 1, 2], [2, 1, 2, 1], [1, 1, 2, 2]], dtype=np.uint8)  # 4x3 patch
    blob = _encode_gif(idx, palette, screen=(8, 6), offset=(2, 1), bg=3)
    px = decode_gif(blob)
    assert px is not None and px.shape == (6, 8, 3)
    expect = np.broadcast_to(palette[3], (6, 8, 3)).copy()
    expect[1:4, 2:6] = palette[idx]
    assert np.array_equal(px, expect)


def test_gif_full_frame_still_exact():
    rng = np.random.RandomState(43)
    palette = rng.randint(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.randint(0, 8, size=(7, 5), dtype=np.uint8)
    px = decode_gif(_encode_gif(idx, palette))
    assert np.array_equal(px, palette[idx])


def test_jpeg_422_subsampling_decodes():
    """4:2:2 (luma (2,1)) exercises the generic horizontal-only
    upsampling path the other tests don't touch."""
    rng = np.random.RandomState(47)
    base = rng.randint(0, 256, size=(16, 24), dtype=np.uint8)
    img = np.stack([base, base, base], axis=-1)  # smooth chroma
    px = decode_jpeg(_encode_jpeg(img, quant=1, y_samp=(2, 1)))
    assert px is not None and px.shape == (16, 24, 3)
    lum_in = img.mean(axis=2)
    lum_out = px.astype(float).mean(axis=2)
    assert np.abs(lum_in - lum_out).mean() < 2.5


def test_jpeg_420_paths_still_agree_after_generalization():
    rng = np.random.RandomState(53)
    base = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    img = np.stack([base, base, base], axis=-1)
    a = decode_jpeg(_encode_jpeg(img, quant=1, subsample_420=True))
    b = decode_jpeg(_encode_jpeg(img, quant=1, y_samp=(2, 2)))
    assert a is not None and b is not None
    assert np.array_equal(a, b)


# ------------------ test-side progressive JPEG encoder ------------------


def _jpeg_coefs(img, quant=1, subsample_420=False):
    """Shared coefficient prep (same math as _encode_jpeg): returns
    (blocks_per_comp, samp, q, h, w, mcus_x, mcus_y)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps_px = [img]
        samp = [(1, 1)]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample_420:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2

            def down(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

            comps_px = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            comps_px = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    q = np.full((8, 8), quant, dtype=np.float64)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    single = len(comps_px) == 1
    mcus_x = -(-w // 8) if single else -(-w // (8 * hmax))
    mcus_y = -(-h // 8) if single else -(-h // (8 * vmax))
    blocks = []
    for px, (sh, sv) in zip(comps_px, samp):
        bs = _block_split(px)
        need_y = mcus_y * (1 if single else sv)
        need_x = mcus_x * (1 if single else sh)
        by, bx = bs.shape[:2]
        if by < need_y or bx < need_x:
            bs = np.pad(
                bs, ((0, need_y - by), (0, need_x - bx), (0, 0), (0, 0)), mode="edge"
            )
        coefs = np.einsum("ui,yxij,vj->yxuv", _DCT_C, bs - 128.0, _DCT_C)
        blocks.append(np.round(coefs / q).astype(np.int64))
    return blocks, samp, q, h, w, mcus_x, mcus_y


def _encode_jpeg_progressive(
    img, quant=1, subsample_420=False, dc_al=0, ac_bands=((1, 63),), ac_al=0
):
    """Progressive JPEG encoder (test oracle): scan script = DC first
    (interleaved, Al=dc_al) + DC refinements down to 0, then per
    component per band an AC first scan at Al=ac_al + AC refinement
    scans down to 0. EOB runs are emitted per block (EOB0) — valid,
    just never coalesced across blocks."""
    from bigdata_quality_assessment_spark.operators.imagecodec import _ZZ_LIST

    blocks, samp, q, h, w, mcus_x, mcus_y = _jpeg_coefs(img, quant, subsample_420)
    ncomp = len(blocks)
    single = ncomp == 1
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    out = bytearray(b"\xff\xd8")
    zzq = q.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0]) + zzq
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMBOLS), (1, _AC_COUNTS, _AC_SYMBOLS)):
        body = bytes([tc << 4]) + bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos_header(comp_specs, ss, se, ah, al):
        sos = bytes([len(comp_specs)])
        for cs, td, ta in comp_specs:
            sos += bytes([cs, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # ---- DC first scan (interleaved, Al=dc_al) ----
    out += sos_header([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 0, dc_al)
    bw_ = _BitWriter()
    pred = [0] * ncomp
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci, (sh, sv) in enumerate(samp):
            nbx = 1 if single else sh
            nby = 1 if single else sv
            for by in range(nby):
                for bx in range(nbx):
                    dc = int(blocks[ci][my * nby + by, mx * nbx + bx, 0, 0]) >> dc_al
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    s, bits = _magnitude(diff)
                    c, ln = _DC_ENC[s]
                    bw_.write(c, ln)
                    if s:
                        bw_.write(bits, s)
    bw_.flush()
    out += bw_.buf

    # ---- DC refinement scans ----
    for al in range(dc_al - 1, -1, -1):
        out += sos_header([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, al + 1, al)
        bw_ = _BitWriter()
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, (sh, sv) in enumerate(samp):
                nbx = 1 if single else sh
                nby = 1 if single else sv
                for by in range(nby):
                    for bx in range(nbx):
                        dc = int(blocks[ci][my * nby + by, mx * nbx + bx, 0, 0])
                        bw_.write((dc >> al) & 1, 1)
        bw_.flush()
        out += bw_.buf

    # ---- AC scans: per component, per band ----
    for ci, (sh, sv) in enumerate(samp):
        if single:
            nby_t, nbx_t = mcus_y, mcus_x
        else:
            comp_w = -(-w * sh // hmax)
            comp_h = -(-h * sv // vmax)
            nbx_t = -(-comp_w // 8)
            nby_t = -(-comp_h // 8)

        def block_zz(bi):
            by, bx = divmod(bi, nbx_t)
            blk = blocks[ci][by, bx].reshape(-1)
            return [int(blk[z]) for z in _ZZ_LIST]

        for ss, se in ac_bands:
            # first AC scan at Al=ac_al
            out += sos_header([(ci + 1, 0, 0)], ss, se, 0, ac_al)
            bw_ = _BitWriter()
            for bi in range(nby_t * nbx_t):
                zz = block_zz(bi)
                run = 0
                for k in range(ss, se + 1):
                    v = zz[k]
                    mag = abs(v) >> ac_al
                    if mag == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = _AC_ENC[0xF0]
                        bw_.write(c, ln)
                        run -= 16
                    sgn = mag if v > 0 else -mag
                    s, bits = _magnitude(sgn)
                    c, ln = _AC_ENC[(run << 4) | s]
                    bw_.write(c, ln)
                    bw_.write(bits, s)
                    run = 0
                if run:
                    c, ln = _AC_ENC[0x00]  # per-block EOB0
                    bw_.write(c, ln)
            bw_.flush()
            out += bw_.buf
            # refinement scans down to 0
            for al in range(ac_al - 1, -1, -1):
                out += sos_header([(ci + 1, 0, 0)], ss, se, al + 1, al)
                bw_ = _BitWriter()
                for bi in range(nby_t * nbx_t):
                    zz = block_zz(bi)
                    hist = [abs(zz[k]) >> (al + 1) != 0 for k in range(64)]
                    newsig = [
                        not hist[k] and (abs(zz[k]) >> al) != 0 for k in range(64)
                    ]
                    news = [k for k in range(ss, se + 1) if newsig[k]]
                    i = ss
                    for j in news:
                        nzeros = sum(
                            1 for k in range(i, j) if not hist[k] and not newsig[k]
                        )
                        # NB newsig positions between i and j cannot
                        # exist (j is the next one), so zero-history
                        # slots are exactly the non-hist positions
                        while nzeros > 15:
                            c, ln = _AC_ENC[0xF0]
                            bw_.write(c, ln)
                            consumed = 0
                            while consumed < 16:
                                if hist[i]:
                                    bw_.write((abs(zz[i]) >> al) & 1, 1)
                                else:
                                    consumed += 1
                                i += 1
                            nzeros -= 16
                        c, ln = _AC_ENC[(nzeros << 4) | 1]
                        bw_.write(c, ln)
                        bw_.write(1 if zz[j] > 0 else 0, 1)
                        while i < j:
                            if hist[i]:
                                bw_.write((abs(zz[i]) >> al) & 1, 1)
                            i += 1
                        i = j + 1
                    if i <= se:
                        c, ln = _AC_ENC[0x00]  # EOB0
                        bw_.write(c, ln)
                        for k in range(i, se + 1):
                            if hist[k]:
                                bw_.write((abs(zz[k]) >> al) & 1, 1)
                bw_.flush()
                out += bw_.buf
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_spectral_selection_matches_baseline():
    """Spectral selection only (no successive approximation): the same
    quantized coefficients split across DC + two AC band scans must
    decode to EXACTLY the pixels of their baseline encoding — the
    baseline path is the independently PIL-validated ground truth."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(21, 34), dtype=np.uint8)
    base = decode_jpeg(_encode_jpeg(img, quant=2))
    prog = decode_jpeg(
        _encode_jpeg_progressive(img, quant=2, ac_bands=((1, 5), (6, 63)))
    )
    assert base is not None and prog is not None
    assert np.array_equal(base, prog)


def test_jpeg_progressive_successive_approximation_matches_baseline():
    """DC and AC successive approximation (Al=2 first scans + two
    refinement passes each): final coefficients are bit-identical to
    the full-precision ones, so pixels must equal the baseline path."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(16, 24), dtype=np.uint8)
    base = decode_jpeg(_encode_jpeg(img, quant=1))
    prog = decode_jpeg(
        _encode_jpeg_progressive(img, quant=1, dc_al=2, ac_bands=((1, 63),), ac_al=2)
    )
    assert base is not None and prog is not None
    assert np.array_equal(base, prog)


def test_jpeg_progressive_rgb_420_matches_baseline():
    """3-component progressive with 4:2:0 subsampling: per-component
    AC scans walk each component's OWN block grid; the result must
    match the baseline encoding of the same subsampled coefficients."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(19, 27, 3), dtype=np.uint8)
    base = decode_jpeg(_encode_jpeg(img, quant=2, subsample_420=True))
    prog = decode_jpeg(
        _encode_jpeg_progressive(
            img, quant=2, subsample_420=True, dc_al=1,
            ac_bands=((1, 2), (3, 20), (21, 63)), ac_al=1,
        )
    )
    assert base is not None and prog is not None
    assert np.array_equal(base, prog)


def test_jpeg_progressive_smooth_image_eob_paths():
    """A smooth gradient quantized hard produces long zero runs and
    EOB-heavy scans — exercises EOBRUN bookkeeping and the ZRL-free
    fast path; must still match baseline exactly."""
    x = np.linspace(0, 255, 40)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    base = decode_jpeg(_encode_jpeg(img, quant=16))
    prog = decode_jpeg(
        _encode_jpeg_progressive(img, quant=16, dc_al=1, ac_bands=((1, 63),), ac_al=1)
    )
    assert base is not None and prog is not None
    assert np.array_equal(base, prog)


def _encode_animated_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    disposals: list[int] | None = None,
    transparents: list[int | None] | None = None,
    screen: tuple[int, int] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    bg: int = 0,
) -> bytes:
    """Multi-frame GIF89a: the _encode_gif literal-LZW scheme per
    image descriptor, with a graphic control extension (disposal,
    optional transparent index) ahead of each."""
    h, w = frames[0].shape
    sw, sh = screen or (w, h)
    ncol = len(palette)
    bits = max(2, int(np.ceil(np.log2(max(ncol, 2)))))
    psize = 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (bits - 1), bg, 0])
    pal = np.zeros((psize, 3), dtype=np.uint8)
    pal[:ncol] = palette
    out += pal.tobytes()
    for fi, indices in enumerate(frames):
        fh, fw = indices.shape
        disp = (disposals or [0] * len(frames))[fi]
        tr = (transparents or [None] * len(frames))[fi]
        packed = (disp & 7) << 2 | (1 if tr is not None else 0)
        out += bytes([0x21, 0xF9, 4, packed, 0, 0, tr or 0, 0])
        ox, oy = (offsets or [(0, 0)] * len(frames))[fi]
        out += b"\x2c" + struct.pack("<HHHH", ox, oy, fw, fh) + b"\x00"
        min_code = bits
        clear = 1 << min_code
        out += bytes([min_code])
        acc = nbits = 0
        data = bytearray()
        width = min_code + 1
        next_code = clear + 2

        def emit(code):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear)
        for v in indices.reshape(-1):
            emit(int(v))
            next_code += 1
            if next_code == (1 << width):
                emit(clear)
                width = min_code + 1
                next_code = clear + 2
        emit(clear + 1)
        if nbits:
            data.append(acc & 0xFF)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_frames_multi_and_disposal():
    """decode_gif_frames: all frames composed; disposal 2 restores the
    patch region to background before the next frame; transparency
    leaves the underlying canvas."""
    from bigdata_quality_assessment_spark.operators.imagecodec import (
        decode_gif_frames,
    )

    palette = np.array(
        [[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], dtype=np.uint8
    )
    f0 = np.full((4, 4), 1, dtype=np.uint8)  # red full-screen
    f1 = np.full((2, 2), 2, dtype=np.uint8)  # green patch at (1,1)
    f2 = np.full((4, 4), 3, dtype=np.uint8)  # blue full-screen
    blob = _encode_animated_gif(
        [f0, f1, f2], palette,
        disposals=[1, 2, 0],            # f1's region restores to bg after
        offsets=[(0, 0), (1, 1), (0, 0)],
        screen=(4, 4),
    )
    frames = decode_gif_frames(blob)
    assert frames is not None and len(frames) == 3
    assert np.array_equal(frames[0][0, 0], [200, 0, 0])
    # frame 1: red canvas with green patch composed at (1,1)
    assert np.array_equal(frames[1][1, 1], [0, 200, 0])
    assert np.array_equal(frames[1][0, 0], [200, 0, 0])
    assert np.array_equal(frames[2][2, 2], [0, 0, 200])
    # single-frame GIF still works and equals decode_gif
    from bigdata_quality_assessment_spark.operators.imagecodec import decode_gif

    single = _encode_gif(f0, palette)
    fr = decode_gif_frames(single)
    assert fr is not None and len(fr) == 1
    assert np.array_equal(fr[0], decode_gif(single))


def test_gif_frames_transparency_keeps_canvas():
    from bigdata_quality_assessment_spark.operators.imagecodec import (
        decode_gif_frames,
    )

    palette = np.array(
        [[10, 10, 10], [200, 0, 0], [0, 200, 0]], dtype=np.uint8
    )
    f0 = np.full((3, 3), 1, dtype=np.uint8)
    f1 = np.array([[2, 0, 2], [0, 2, 0], [2, 0, 2]], dtype=np.uint8)
    blob = _encode_animated_gif(
        [f0, f1], palette, transparents=[None, 0]
    )
    frames = decode_gif_frames(blob)
    assert frames is not None and len(frames) == 2
    # index-0 pixels are transparent in f1 -> red shows through
    assert np.array_equal(frames[1][0, 1], [200, 0, 0])
    assert np.array_equal(frames[1][0, 0], [0, 200, 0])


def test_gif_frames_rejects_and_truncates():
    from bigdata_quality_assessment_spark.operators.imagecodec import (
        decode_gif_frames,
    )

    assert decode_gif_frames(b"NOTGIF") is None
    assert decode_gif_frames(b"") is None
    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    f0 = np.full((3, 3), 1, dtype=np.uint8)
    blob = _encode_animated_gif([f0, f0], palette)
    # truncate inside the second descriptor: first frame still decodes
    frames = decode_gif_frames(blob[: len(blob) - 8])
    assert frames is not None and len(frames) >= 1
    # max_frames cap
    assert len(decode_gif_frames(blob, max_frames=1)) == 1


def test_gif_frames_truncation_sweep_monotone():
    """Round-11 ADVICE fix: EVERY truncation point honors the
    truncated-tail contract — once the first frame has composed,
    decode_gif_frames never discards it, no matter whether the cut
    lands mid-palette, mid-descriptor, mid-GCE, or mid-LZW (the old
    blanket except returned None for struct/reshape raises, so some
    cut points kept frames and others dropped them)."""
    from bigdata_quality_assessment_spark.operators.imagecodec import (
        decode_gif_frames,
    )

    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    f0 = np.full((3, 3), 1, dtype=np.uint8)
    f1 = np.full((2, 2), 2, dtype=np.uint8)
    f2 = np.full((3, 3), 3, dtype=np.uint8)
    # second frame carries a LOCAL palette + GCE so cuts land inside
    # palette reads and extension structs, not just LZW sub-blocks
    blob = _encode_animated_gif(
        [f0, f1, f2], palette,
        disposals=[1, 2, 0], transparents=[None, 0, None],
        offsets=[(0, 0), (1, 1), (0, 0)], screen=(3, 3),
    )
    first_ok = None
    for cut in range(len(blob) + 1):
        res = decode_gif_frames(blob[:cut])
        assert res is None or (isinstance(res, list) and len(res) >= 1)
        if res is not None and first_ok is None:
            first_ok = cut
        if first_ok is not None:
            # monotone: once the first frame survives a prefix, every
            # longer prefix keeps at least that frame
            assert res is not None, f"cut={cut} dropped decoded frames"
    assert first_ok is not None and first_ok < len(blob)
    assert len(decode_gif_frames(blob)) == 3
