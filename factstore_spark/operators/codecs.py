"""Pure-stdlib media codecs: PNG, BMP, WAV — encode AND decode.

The reference carries media as opaque binary fact payloads
(Fact.kt:71-96); the multimodal operators (operators/multimodal.py)
decode them inside Arrow-batched ``mapInPandas``. This container has
no PIL/cv2/soundfile, but three ubiquitous formats are decodable with
nothing beyond ``zlib``/``struct``/``wave``:

- **PNG**: zlib-inflated IDAT, all five scanline filters (None/Sub/
  Up/Average/Paeth) unfiltered per the spec, bit depth 8, color types
  0/2/3/4/6 (gray, RGB, palette, gray+alpha, RGBA), non-interlaced.
  The encoder can emit ANY filter per row (the battery cycles all
  five), so the decoder's unfilter path is exercised for real.
- **BMP**: BITMAPINFOHEADER, uncompressed 24/32-bit BI_RGB,
  bottom-up or top-down, row padding handled. Decoded to RGB
  top-down so PNG and BMP pixels are directly comparable.
- **WAV**: PCM via the stdlib ``wave`` module (16-bit little-endian
  samples returned raw).
- **GIF** (round 11): variable-width LZW (9..12-bit codes,
  early-change, 4096-code CLEAR), multi-frame animation, interlacing.
- **JPEG** (round 11, extended round 12): sequential baseline (SOF0)
  AND progressive (SOF2) DCT per ITU-T T.81 — Annex K huffman tables,
  FDCT/IDCT as 8x8 matrix products (numpy), YCbCr 4:4:4 and 4:2:0,
  grayscale and color, restart intervals (DRI/RSTn), spectral
  selection + successive approximation + EOB-run batching (Annex G),
  encode AND decode for all of it. With the DC quant step of 8, FLAT
  8x8 blocks round-trip EXACTLY (only the losslessly-quantized DC
  survives), which is what lets the battery oracle replay real JPEG
  decodes byte-for-byte; arbitrary content round-trips within the
  usual quality-table tolerance, and progressive/DRI encodes decode
  byte-identically to the baseline encode (same coefficients,
  different entropy framing — the property the tests pin).

- **MP4 / ISO BMFF** (round 12): full container parsing per
  ISO/IEC 14496-12 — box walk (incl. 64-bit largesize), mvhd/tkhd/
  mdhd/hdlr/stsd metadata, and real DEMUX via the stsc/stsz/stco
  sample tables — plus a structurally-valid stub encoder for
  fixtures. Only the sample PAYLOAD decode (H.264) remains a
  native-lib boundary (``mp4_decode_frames``' NotImplementedError is
  format-accurate, not blanket).

Everything is defined inside one factory closure so cloudpickle
serializes the functions BY VALUE into Spark python workers (the
package convention — see multimodal._make_fake_decode): executors
never need ``factstore_spark`` importable on their own sys.path.

Scale note: decode cost is per-row Python, but it runs inside
mapInPandas Arrow batches on executors — the driver never touches
payload bytes, and throughput scales with cores. For 100 MB assets,
lower ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch is
a handful of rows.
"""

from __future__ import annotations


def _build_codecs():
    import io
    import struct
    import wave
    import zlib

    _PNG_SIG = b"\x89PNG\r\n\x1a\n"
    _CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def _filter_row(
        ftype: int, row: bytes, prior: bytes, bpp: int
    ) -> bytes:
        """Apply PNG filter ``ftype`` to a reconstructed row (encode
        direction). ``prior`` is the RECONSTRUCTED previous row (zeros
        for the first)."""
        n = len(row)
        out = bytearray(n)
        for x in range(n):
            a = row[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                v = row[x]
            elif ftype == 1:
                v = row[x] - a
            elif ftype == 2:
                v = row[x] - b
            elif ftype == 3:
                v = row[x] - (a + b) // 2
            elif ftype == 4:
                v = row[x] - _paeth(a, b, c)
            else:
                raise ValueError(f"bad PNG filter {ftype}")
            out[x] = v & 0xFF
        return bytes(out)

    def _unfilter_row(
        ftype: int, raw: bytearray, prior: bytes, bpp: int
    ) -> bytes:
        """Invert PNG filter ``ftype`` in place (decode direction)."""
        n = len(raw)
        for x in range(n):
            a = raw[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                add = 0
            elif ftype == 1:
                add = a
            elif ftype == 2:
                add = b
            elif ftype == 3:
                add = (a + b) // 2
            elif ftype == 4:
                add = _paeth(a, b, c)
            else:
                raise ValueError(f"bad PNG filter {ftype}")
            raw[x] = (raw[x] + add) & 0xFF
        return bytes(raw)

    def png_encode(
        pixels: bytes,
        width: int,
        height: int,
        channels: int = 3,
        filter_mode: str = "cycle",
    ) -> bytes:
        """8-bit PNG from row-major top-down interleaved ``pixels``
        (``channels``: 1 gray, 2 gray+alpha, 3 RGB, 4 RGBA).
        ``filter_mode``: 'none' filters every row with 0; 'cycle'
        uses ``row % 5`` so a decoder must invert every filter type
        to round-trip — the property the battery pins."""
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
        if ctype is None:
            raise ValueError(f"unsupported channel count {channels}")
        stride = width * channels
        if len(pixels) != stride * height:
            raise ValueError(
                f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
            )
        bpp = channels
        raw = bytearray()
        prior = bytes(stride)
        for y in range(height):
            row = pixels[y * stride : (y + 1) * stride]
            ftype = (y % 5) if filter_mode == "cycle" else 0
            raw.append(ftype)
            raw += _filter_row(ftype, row, prior, bpp)
            prior = row
        ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
        return (
            _PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b"")
        )

    def png_decode(data: bytes) -> dict:
        """PNG -> dict(width, height, channels, pixels) with pixels
        row-major top-down interleaved (palette expanded to RGB).
        Raises ValueError on malformed input, NotImplementedError on
        interlaced or sub-byte-depth images."""
        if data[:8] != _PNG_SIG:
            raise ValueError("not a PNG (bad signature)")
        pos = 8
        width = height = bitdepth = ctype = interlace = None
        idat = bytearray()
        plte = None
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            if len(body) != length:
                raise ValueError("truncated PNG chunk")
            if tag == b"IHDR":
                try:
                    width, height, bitdepth, ctype, _comp, _filt, interlace = (
                        struct.unpack(">IIBBBBB", body)
                    )
                except struct.error as e:
                    raise ValueError(f"bad PNG IHDR: {e}") from e
            elif tag == b"PLTE":
                plte = body
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + length  # len + tag + crc
        if width is None:
            raise ValueError("PNG missing IHDR")
        if bitdepth != 8:
            raise NotImplementedError(f"PNG bit depth {bitdepth} (only 8)")
        if interlace:
            raise NotImplementedError("interlaced (Adam7) PNG")
        channels = _CHANNELS.get(ctype)
        if channels is None:
            raise ValueError(f"bad PNG color type {ctype}")
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error as e:
            # contract: malformed media bytes raise ValueError (same
            # wrapping as the gif/jpeg/wav decoders) so a corrupt IDAT
            # fails a decode batch with the expected exception type
            raise ValueError(f"corrupt PNG IDAT: {e}") from e
        stride = width * channels
        if len(raw) != (stride + 1) * height:
            raise ValueError("PNG pixel data length mismatch")
        out = bytearray()
        prior = bytes(stride)
        for y in range(height):
            base = y * (stride + 1)
            ftype = raw[base]
            row = _unfilter_row(
                ftype, bytearray(raw[base + 1 : base + 1 + stride]), prior, channels
            )
            out += row
            prior = row
        if ctype == 3:
            if plte is None:
                raise ValueError("palette PNG missing PLTE")
            rgb = bytearray()
            for idx in out:
                rgb += plte[idx * 3 : idx * 3 + 3]
            out, channels = rgb, 3
        return {
            "width": width,
            "height": height,
            "channels": channels,
            "pixels": bytes(out),
        }

    def bmp_encode(pixels: bytes, width: int, height: int) -> bytes:
        """24-bit uncompressed BMP from row-major TOP-DOWN RGB
        ``pixels`` (stored bottom-up/BGR per the format)."""
        if len(pixels) != width * height * 3:
            raise ValueError("pixel buffer size mismatch")
        pad = (-(width * 3)) % 4
        body = bytearray()
        for y in range(height - 1, -1, -1):
            row = pixels[y * width * 3 : (y + 1) * width * 3]
            for x in range(width):
                r, g, b = row[x * 3 : x * 3 + 3]
                body += bytes((b, g, r))
            body += b"\x00" * pad
        info = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
        )
        head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
        return head + info + bytes(body)

    def bmp_decode(data: bytes) -> dict:
        """Uncompressed 24/32-bit BMP -> RGB top-down pixels dict
        (same shape as png_decode, channels always 3)."""
        if data[:2] != b"BM":
            raise ValueError("not a BMP")
        (offset,) = struct.unpack("<I", data[10:14])
        (hsize,) = struct.unpack("<I", data[14:18])
        if hsize < 40:
            raise NotImplementedError(f"BMP header size {hsize}")
        width, height_raw = struct.unpack("<ii", data[18:26])
        planes, bits = struct.unpack("<HH", data[26:30])
        (comp,) = struct.unpack("<I", data[30:34])
        if comp != 0 or bits not in (24, 32):
            raise NotImplementedError(f"BMP compression={comp} bits={bits}")
        bottom_up = height_raw > 0
        height = abs(height_raw)
        bypp = bits // 8
        stride = (width * bypp + 3) & ~3
        out = bytearray(width * height * 3)
        for row_i in range(height):
            y = (height - 1 - row_i) if bottom_up else row_i
            base = offset + row_i * stride
            for x in range(width):
                b, g, r = data[base + x * bypp : base + x * bypp + 3]
                o = (y * width + x) * 3
                out[o : o + 3] = bytes((r, g, b))
        return {
            "width": width,
            "height": height,
            "channels": 3,
            "pixels": bytes(out),
        }

    def wav_encode(
        samples: bytes, sample_rate: int, n_channels: int = 1
    ) -> bytes:
        """PCM 16-bit WAV from raw little-endian int16 ``samples``."""
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(n_channels)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(samples)
        return buf.getvalue()

    def wav_decode(data: bytes) -> dict:
        """WAV -> dict(n_channels, sample_rate, n_frames, samples)
        with samples as raw little-endian PCM bytes."""
        try:
            with wave.open(io.BytesIO(data), "rb") as w:
                n = w.getnframes()
                return {
                    "n_channels": w.getnchannels(),
                    "sample_rate": w.getframerate(),
                    "sample_width": w.getsampwidth(),
                    "n_frames": n,
                    "samples": w.readframes(n),
                }
        except (wave.Error, EOFError, struct.error) as e:
            # EOFError: RIFF/WAVE header truncated before the fmt
            # chunk — still "malformed bytes", same contract
            raise ValueError(f"not a decodable WAV: {e}") from None

    # ---- GIF (87a/89a): real LZW, real multi-frame animation --------

    def _lzw_encode(indices: bytes, mcs: int = 8) -> bytes:
        """GIF-variant LZW over palette indices: variable code width
        9..12 bits LSB-first, CLEAR resets the table at 4096 codes."""
        clear, end = 1 << mcs, (1 << mcs) + 1
        out = bytearray()
        acc = 0
        nbits = 0

        def emit(code: int, size: int) -> None:
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += size
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        def fresh() -> tuple[dict, int, int]:
            return (
                {bytes([i]): i for i in range(1 << mcs)},
                end + 1,
                mcs + 1,
            )

        table, next_code, code_size = fresh()
        emit(clear, code_size)
        w = b""
        for b in indices:
            wc = w + bytes([b])
            if wc in table:
                w = wc
                continue
            emit(table[w], code_size)
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                # "early change": the width grows as soon as the next
                # assignable code needs it; the decoder compensates
                # one step earlier (its table lags one entry)
                code_size += 1
            if next_code >= 4096:
                emit(clear, code_size)
                table, next_code, code_size = fresh()
            w = bytes([b])
        if w:
            emit(table[w], code_size)
        emit(end, code_size)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> bytes:
        clear, end = 1 << mcs, (1 << mcs) + 1
        pos = 0
        acc = 0
        nbits = 0

        def read(size: int):
            nonlocal pos, acc, nbits
            while nbits < size:
                if pos >= len(data):
                    return None
                acc |= data[pos] << nbits
                pos += 1
                nbits += 8
            code = acc & ((1 << size) - 1)
            acc >>= size
            nbits -= size
            return code

        out = bytearray()
        table: list[bytes] = []
        code_size = mcs + 1
        prev: bytes | None = None
        while True:
            code = read(code_size)
            if code is None or code == end:
                break
            if code == clear:
                table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
                code_size = mcs + 1
                prev = None
                continue
            if not table:
                raise ValueError("GIF LZW stream missing initial clear")
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW code")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) - 1 and code_size < 12:
                    code_size += 1
            prev = entry
            if len(out) >= n_expected:
                break
        return bytes(out)

    def gif_encode(
        frames: list, width: int, height: int, delay_cs: int = 4
    ) -> bytes:
        """Animated GIF89a from palette-index frames (each ``bytes`` of
        length w*h, values 0..255). Grayscale 256-entry global color
        table (r=g=b=index) — decoded RGB sums are then 3x the index
        sums, which keeps the battery oracles integer-replayable."""
        if not frames:
            raise ValueError("need at least one frame")
        for f in frames:
            if len(f) != width * height:
                raise ValueError("frame size mismatch")
        out = bytearray(b"GIF89a")
        out += struct.pack("<HH", width, height)
        out += bytes((0xF7, 0, 0))  # GCT present, 256 entries
        for i in range(256):
            out += bytes((i, i, i))
        if len(frames) > 1:
            # NETSCAPE looping extension (loop forever)
            out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
        for f in frames:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
            out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
            out += bytes((0x00,))  # no LCT, not interlaced
            out += bytes((8,))  # LZW min code size
            lzw = _lzw_encode(f, 8)
            for i in range(0, len(lzw), 255):
                chunk = lzw[i : i + 255]
                out += bytes((len(chunk),)) + chunk
            out += b"\x00"  # block terminator
        out += b"\x3b"
        return bytes(out)

    def gif_decode(data: bytes) -> dict:
        """GIF -> dict(width, height, n_frames, frames=[RGB bytes],
        pixels=first frame RGB). Each frame is decoded standalone over
        its own rect (no inter-frame disposal compositing — frames
        that rely on partial updates decode as their own subregion,
        documented limitation; the fixtures write full frames).
        Interlaced frames are de-interlaced per the 4-pass order.
        Malformed/truncated bytes raise ValueError (the decode_media
        contract) — never a bare IndexError from a short buffer."""
        try:
            return _gif_decode_inner(data)
        except (IndexError, struct.error) as e:
            raise ValueError(f"truncated/malformed GIF: {e}") from None

    def _gif_decode_inner(data: bytes) -> dict:
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF")
        sw, sh = struct.unpack("<HH", data[6:10])
        packed, _bg, _ar = data[10], data[11], data[12]
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = data[pos : pos + 3 * n]
            pos += 3 * n
        frames = []
        fw = fh = None
        while pos < len(data):
            b0 = data[pos]
            pos += 1
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x21:  # extension: label + sub-blocks, skip
                pos += 1
                while data[pos]:
                    pos += 1 + data[pos]
                pos += 1
                continue
            if b0 != 0x2C:
                raise ValueError(f"unexpected GIF block 0x{b0:02x}")
            _lx, _ty, w, h = struct.unpack("<HHHH", data[pos : pos + 8])
            pos += 8
            ip = data[pos]
            pos += 1
            ct = gct
            if ip & 0x80:
                n = 2 << (ip & 0x07)
                ct = data[pos : pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame without a color table")
            interlaced = bool(ip & 0x40)
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(lzw), mcs, w * h)
            if len(idx) < w * h:
                raise ValueError("GIF frame pixel data truncated")
            if interlaced:
                de = bytearray(w * h)
                src = 0
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    for y in range(start, h, step):
                        de[y * w : (y + 1) * w] = idx[src : src + w]
                        src += w
                idx = bytes(de)
            rgb = bytearray(w * h * 3)
            for i, ix in enumerate(idx[: w * h]):
                rgb[i * 3 : i * 3 + 3] = ct[ix * 3 : ix * 3 + 3]
            frames.append(bytes(rgb))
            fw, fh = w, h
        if not frames:
            raise ValueError("GIF contains no image blocks")
        return {
            "width": fw if fw is not None else sw,
            "height": fh if fh is not None else sh,
            "channels": 3,
            "n_frames": len(frames),
            "frames": frames,
            "pixels": frames[0],
        }

    # ---- JPEG (baseline sequential DCT, ITU-T T.81) -----------------
    # Pure python + numpy: huffman entropy coding (Annex K standard
    # tables), FDCT/IDCT as 8x8 matrix products, YCbCr color convert,
    # 4:4:4 and 4:2:0 decode. The encoder emits grayscale or YCbCr
    # 4:4:4 baseline JPEGs. Quant tables are caller-visible: with the
    # default DC step of 8, a FLAT 8x8 block round-trips EXACTLY
    # (only the DC survives; DC = 8*(v-128) quantizes losslessly), so
    # flat-block fixtures give byte-deterministic decodes the battery
    # oracles can replay — while arbitrary images round-trip within a
    # quality-table-dependent tolerance like any real JPEG.

    _ZIGZAG = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    # flat-exact table: DC step 8, gentle ACs (ACs are zero for the
    # fixtures; for natural content this is roughly "quality ~90")
    _QTAB_FLAT = [8] + [16] * 63

    # Annex K standard huffman tables: (bits[1..16], values)
    _DC_LUM = (
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    _DC_CHR = (
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    _AC_LUM = (
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
            0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
            0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
            0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
            0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
            0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
            0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
            0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
            0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
            0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
            0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
            0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
            0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
            0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ],
    )
    _AC_CHR = (
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
            0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
            0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
            0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
            0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
            0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
            0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
            0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
            0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
            0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
            0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
            0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
            0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
            0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
            0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ],
    )

    def _huff_codes(bits, values):
        """Canonical (symbol -> (code, length)) per T.81 Annex C."""
        out = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[values[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return out

    def _dct_matrix():
        import math

        import numpy as np

        c = np.zeros((8, 8))
        for u in range(8):
            cu = math.sqrt(0.5) if u == 0 else 1.0
            for x in range(8):
                c[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
        return c

    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, code: int, length: int) -> None:
            self.acc = (self.acc << length) | (code & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                self.n -= 8
                b = (self.acc >> self.n) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing

        def flush(self) -> bytes:
            if self.n:
                pad = 8 - self.n
                self.put((1 << pad) - 1, pad)  # pad with 1s
            return bytes(self.out)

    def _mag_bits(v: int) -> tuple[int, int]:
        """(size, raw-bits) magnitude coding per T.81 F.1.2.1 — the
        one's-complement trick for negatives shared by DC diffs and
        AC values in every scan kind."""
        size = v.bit_length() if v > 0 else (-v).bit_length()
        bits = v if v >= 0 else v + (1 << size) - 1
        return size, bits

    def _encode_block(bw, coefs, dc_codes, ac_codes, prev_dc: int) -> int:
        dc = int(coefs[0])
        diff = dc - prev_dc
        s, bits = _mag_bits(diff) if diff else (0, 0)
        code, ln = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(bits, s)
        run = 0
        for k in range(1, 64):
            v = int(coefs[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            s, bits = _mag_bits(v)
            code, ln = ac_codes[(run << 4) | s]
            bw.put(code, ln)
            bw.put(bits, s)
            run = 0
        if run:
            code, ln = ac_codes[0x00]  # EOB
            bw.put(code, ln)
        return dc

    def _jpeg_plan(pixels, width, height, channels, subsampling):
        """Shared encoder front half: color transform, chroma
        subsampling, padding, FDCT, quantization. Returns
        (samp, mcus_x, mcus_y, coefs) where coefs[ci] is an int64
        array (blocks_y, blocks_x, 64) of ZIGZAG-ordered quantized
        coefficients over the component's MCU-padded block grid —
        baseline and progressive encodes of the same pixels therefore
        carry IDENTICAL coefficients and must decode identically."""
        import numpy as np

        if channels not in (1, 3):
            raise ValueError("jpeg_encode supports 1 or 3 channels")
        if subsampling not in ("444", "420"):
            raise ValueError("subsampling must be '444' or '420'")
        if len(pixels) != width * height * channels:
            raise ValueError("pixel buffer size mismatch")
        arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
            height, width, channels
        ).astype(np.float64)
        if channels == 3:
            r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
            planes = [
                0.299 * r + 0.587 * g + 0.114 * b,
                -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
            ]
        else:
            planes = [arr[:, :, 0]]
        # per-component sampling factors (h, v)
        if channels == 3 and subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1)] * channels
        hmax = max(sh for sh, _sv in samp)
        vmax = max(sv for _sh, sv in samp)
        if channels == 3 and subsampling == "420":
            # chroma planes: pad to even dims, then 2x2 box average
            for ci in (1, 2):
                p = planes[ci]
                ph = (p.shape[0] + 1) // 2 * 2
                pw = (p.shape[1] + 1) // 2 * 2
                pp = np.empty((ph, pw))
                pp[: p.shape[0], : p.shape[1]] = p
                pp[p.shape[0]:, : p.shape[1]] = p[-1:, :]
                pp[:, p.shape[1]:] = pp[:, p.shape[1] - 1 : p.shape[1]]
                planes[ci] = (
                    pp[0::2, 0::2] + pp[1::2, 0::2]
                    + pp[0::2, 1::2] + pp[1::2, 1::2]
                ) / 4.0
        C = _dct_matrix()
        q = np.array(_QTAB_FLAT, dtype=np.float64)[
            np.argsort(_ZIGZAG)
        ].reshape(8, 8)
        # ^ _QTAB_FLAT is in zigzag order (as written to DQT); invert
        # the permutation for natural-order block math
        mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
        coefs = []
        for (sh, sv), p in zip(samp, planes):
            th, tw = mcus_y * sv * 8, mcus_x * sh * 8
            pp = np.empty((th, tw))
            pp[: p.shape[0], : p.shape[1]] = p
            pp[p.shape[0]:, : p.shape[1]] = p[-1:, :]  # replicate edges
            pp[:, p.shape[1]:] = pp[:, p.shape[1] - 1 : p.shape[1]]
            by, bx = th // 8, tw // 8
            blocks = pp.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
            coef = np.einsum("ab,ijbc,dc->ijad", C, blocks, C)
            qz = np.round(coef / q).astype(np.int64)
            coefs.append(qz.reshape(by, bx, 64)[:, :, _ZIGZAG])
        return samp, mcus_x, mcus_y, coefs

    def _jpeg_headers(samp, width, height, restart_interval, sof_marker):
        """SOI..tables..SOF..DHT common prefix (scan-independent)."""
        def seg(marker: int, body: bytes) -> bytes:
            return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

        def dht(tc: int, th: int, table) -> bytes:
            bits, values = table
            return seg(
                0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(values)
            )

        ncomp = len(samp)
        out = bytearray(b"\xff\xd8")  # SOI
        out += seg(0xDB, bytes([0]) + bytes(_QTAB_FLAT))  # DQT id 0
        sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
        for ci, (sh, sv) in enumerate(samp):
            sof += bytes([ci + 1, sh << 4 | sv, 0])  # qtable 0
        out += seg(sof_marker, sof)
        out += dht(0, 0, _DC_LUM)
        if sof_marker == 0xC0:
            out += dht(1, 0, _AC_LUM)
        if ncomp == 3:
            out += dht(0, 1, _DC_CHR)
            if sof_marker == 0xC0:
                out += dht(1, 1, _AC_CHR)
        if restart_interval:
            out += seg(0xDD, struct.pack(">H", restart_interval))
        return out, seg, dht

    def jpeg_encode(
        pixels: bytes,
        width: int,
        height: int,
        channels: int = 1,
        subsampling: str = "444",
        restart_interval: int = 0,
    ) -> bytes:
        """Baseline JPEG: grayscale (channels=1) or YCbCr from RGB
        (channels=3) with 4:4:4 or 4:2:0 chroma (``subsampling``).
        Dimensions need not be multiples of 8/16 (edge blocks
        replicate). Quant table: DC step 8 (flat blocks round-trip
        exactly), AC step 16. ``restart_interval=N`` emits a DRI
        segment and an RSTn marker every N MCUs (DC predictors reset,
        entropy stream byte-aligned) — T.81 section B.2.4.4."""
        samp, mcus_x, mcus_y, coefs = _jpeg_plan(
            pixels, width, height, channels, subsampling
        )
        ri = int(restart_interval)
        tables = [
            (_huff_codes(*_DC_LUM), _huff_codes(*_AC_LUM)),
            (_huff_codes(*_DC_CHR), _huff_codes(*_AC_CHR)),
            (_huff_codes(*_DC_CHR), _huff_codes(*_AC_CHR)),
        ]
        scan = bytearray()
        bw = _BitWriter()
        prev = [0] * len(coefs)
        mcu_i = 0
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if ri and mcu_i and mcu_i % ri == 0:
                    scan += bw.flush()
                    scan += bytes((0xFF, 0xD0 + (rst & 7)))
                    rst += 1
                    bw = _BitWriter()
                    prev = [0] * len(coefs)
                for ci, (sh, sv) in enumerate(samp):
                    dc_c, ac_c = tables[min(ci, 2)]
                    for vy in range(sv):
                        for vx in range(sh):
                            zz = coefs[ci][my * sv + vy, mx * sh + vx]
                            prev[ci] = _encode_block(
                                bw, zz, dc_c, ac_c, prev[ci]
                            )
                mcu_i += 1
        scan += bw.flush()
        out, seg, _dht = _jpeg_headers(samp, width, height, ri, 0xC0)
        ncomp = len(samp)
        sos = bytes([ncomp])
        for ci in range(ncomp):
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, t << 4 | t])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        out += scan
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # Progressive AC scans need EOBn symbols (run<<4 | 0 for run>0),
    # which the baseline Annex K AC tables do not define. One flat
    # custom table covers every progressive AC symbol — all 176
    # symbols {run 0..15} x {size 0..10} at code length 8 (Kraft sum
    # 176/256 < 1; the all-ones code stays unused as T.81 requires).
    # Compression suffers vs an optimized table; correctness doesn't.
    _PROG_AC_BITS = [0] * 7 + [176] + [0] * 8
    _PROG_AC_VALUES = [(r << 4) | sz for r in range(16) for sz in range(11)]

    def jpeg_encode_progressive(
        pixels: bytes,
        width: int,
        height: int,
        channels: int = 1,
        subsampling: str = "444",
        scans=None,
        restart_interval: int = 0,
    ) -> bytes:
        """Progressive (SOF2) JPEG per T.81 Annex G: the SAME
        quantized coefficients as ``jpeg_encode``, entropy-coded
        across multiple scans with spectral selection and successive
        approximation — so decoding a progressive encode matches the
        baseline decode EXACTLY (the property the tests pin).

        ``scans``: list of ``(comp_indices, Ss, Se, Ah, Al)``; the
        default script exercises every scan kind — interleaved DC
        first + refinement, per-component AC first (split bands) +
        two AC refinement passes, EOB-run batching throughout.
        ``restart_interval=N`` restarts every N MCUs (DC scans) /
        blocks (AC scans)."""
        samp, mcus_x, mcus_y, coefs = _jpeg_plan(
            pixels, width, height, channels, subsampling
        )
        ncomp = len(coefs)
        ri = int(restart_interval)
        if scans is None:
            if ncomp == 1:
                scans = [
                    ([0], 0, 0, 0, 1),
                    ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                    ([0], 1, 63, 2, 1),
                    ([0], 0, 0, 1, 0),
                    ([0], 1, 63, 1, 0),
                ]
            else:
                scans = [
                    ([0, 1, 2], 0, 0, 0, 1),
                    ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1),
                    ([1], 1, 63, 0, 1), ([0], 6, 63, 0, 2),
                    ([0], 1, 63, 2, 1),
                    ([0, 1, 2], 0, 0, 1, 0),
                    ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0),
                    ([0], 1, 63, 1, 0),
                ]
        hmax = max(sh for sh, _sv in samp)
        vmax = max(sv for _sh, sv in samp)
        # per-component REAL block dims (non-interleaved AC scans
        # cover ceil(comp_size/8), not the MCU-padded grid)
        nblocks = []
        for sh, sv in samp:
            cw = -(-(width * sh) // hmax)
            chh = -(-(height * sv) // vmax)
            nblocks.append((-(-chh // 8), -(-cw // 8)))
        # Script validation (T.81 G.1.1.1.1-2): catch illegal ladders
        # HERE with a nameable error — an invalid script otherwise
        # surfaces as a baffling entropy-decode failure far downstream.
        # Rules per component: DC first scan (Ss=0, Ah=0) before any
        # AC scan; Se >= Ss with Se=0 iff Ss=0; every coefficient
        # band's successive-approximation ladder is contiguous
        # (a refinement's Ah must equal the band's previous Al).
        prior_al: dict[tuple, int] = {}  # (ci, k) -> current Al
        dc_seen: set[int] = set()
        for comp_idx, ss, se, ah, al in scans:
            if (ss == 0) != (se == 0):
                raise ValueError(
                    f"scan (Ss={ss}, Se={se}): DC scans are exactly "
                    "Ss=Se=0; AC scans must not include coefficient 0"
                )
            if ss > se or se > 63 or ah > 13 or al > 13:
                raise ValueError(f"scan (Ss={ss}, Se={se}, Ah={ah}, Al={al}) out of range")
            if ss > 0 and len(comp_idx) != 1:
                raise ValueError("progressive AC scans are single-component")
            for ci in comp_idx:
                if ss > 0 and ci not in dc_seen:
                    raise ValueError(
                        f"component {ci}: AC scan before its DC first scan"
                    )
                for k in range(ss, se + 1):
                    prev = prior_al.get((ci, k))
                    if prev is None:
                        if ah != 0:
                            raise ValueError(
                                f"component {ci} band {ss}-{se}: refinement "
                                f"(Ah={ah}) before the band's first scan"
                            )
                    elif ah != prev:
                        raise ValueError(
                            f"component {ci} coefficient {k}: refinement "
                            f"Ah={ah} must equal the band's prior Al={prev} "
                            "(contiguous successive-approximation ladder)"
                        )
                    prior_al[(ci, k)] = al
                if ss == 0 and ah == 0:
                    dc_seen.add(ci)
        dc_codes = [
            _huff_codes(*_DC_LUM),
            _huff_codes(*_DC_CHR),
            _huff_codes(*_DC_CHR),
        ]
        ac_codes = _huff_codes(_PROG_AC_BITS, _PROG_AC_VALUES)

        def pt_ac(v: int, al: int) -> int:
            # AC point transform: divide by 2^Al truncating toward
            # zero (G.1.2.2) — sign-magnitude, unlike the DC shift
            return v >> al if v >= 0 else -((-v) >> al)

        def enc_dc_scan(comp_idx, ah, al):
            bw = _BitWriter()
            parts = bytearray()
            prev = {ci: 0 for ci in comp_idx}
            rst = 0
            unit = 0

            def block_iter():
                # single-component scans are NON-interleaved: raster
                # order over the component's real block grid (T.81
                # A.2.2) — must mirror the decoder exactly
                if len(comp_idx) == 1:
                    bh, bwid = nblocks[comp_idx[0]]
                    for by in range(bh):
                        for bx in range(bwid):
                            yield [(comp_idx[0], by, bx)], True
                else:
                    for my in range(mcus_y):
                        for mx in range(mcus_x):
                            blocks = []
                            for ci in comp_idx:
                                sh, sv = samp[ci]
                                for vy in range(sv):
                                    for vx in range(sh):
                                        blocks.append(
                                            (ci, my * sv + vy, mx * sh + vx)
                                        )
                            yield blocks, True

            for blocks, _ in block_iter():
                if ri and unit and unit % ri == 0:
                    parts += bw.flush()
                    parts += bytes((0xFF, 0xD0 + (rst & 7)))
                    rst += 1
                    bw = _BitWriter()
                    prev = {ci: 0 for ci in comp_idx}
                for ci, by, bx in blocks:
                    v = int(coefs[ci][by, bx, 0]) >> al  # arithmetic (G.1.2.1)
                    if ah == 0:
                        diff = v - prev[ci]
                        prev[ci] = v
                        s, bits = _mag_bits(diff) if diff else (0, 0)
                        code, ln = dc_codes[min(ci, 2)][s]
                        bw.put(code, ln)
                        if s:
                            bw.put(bits, s)
                    else:
                        bw.put(v & 1, 1)
                unit += 1
            parts += bw.flush()
            return bytes(parts)

        def enc_ac_scan(ci, ss, se, ah, al):
            """One AC scan (first when ah==0, refinement when ah>0),
            non-interleaved over the component's real block grid, with
            EOB-run batching and buffered correction bits. The
            refinement emitter mirrors the decoder's coefficient sweep
            position for position, so bit order matches by
            construction (T.81 G.1.2.2-3 / G.2.2.3)."""
            arr = coefs[ci]
            bh, bwid = nblocks[ci]
            bw = _BitWriter()
            parts = bytearray()
            rst = 0
            eobrun = 0
            br_bits: list[int] = []  # corrections pending with the EOB run

            def emit_eobrun():
                nonlocal eobrun
                if eobrun:
                    nbits = eobrun.bit_length() - 1
                    code, ln = ac_codes[nbits << 4]
                    bw.put(code, ln)
                    if nbits:
                        bw.put(eobrun - (1 << nbits), nbits)
                    eobrun = 0
                for bit in br_bits:
                    bw.put(bit, 1)
                br_bits.clear()

            unit = 0
            for by in range(bh):
                for bx in range(bwid):
                    if ri and unit and unit % ri == 0:
                        emit_eobrun()
                        parts += bw.flush()
                        parts += bytes((0xFF, 0xD0 + (rst & 7)))
                        rst += 1
                        bw = _BitWriter()
                    unit += 1
                    zz = arr[by, bx]
                    t = [pt_ac(int(zz[k]), al) for k in range(se + 1)]
                    if ah == 0:
                        r = 0
                        for k in range(ss, se + 1):
                            if t[k] == 0:
                                r += 1
                                continue
                            emit_eobrun()
                            while r > 15:
                                code, ln = ac_codes[0xF0]
                                bw.put(code, ln)
                                r -= 16
                            s, bits = _mag_bits(t[k])
                            code, ln = ac_codes[(r << 4) | s]
                            bw.put(code, ln)
                            bw.put(bits, s)
                            r = 0
                        if r:
                            eobrun += 1
                            if eobrun == 0x7FFF:
                                emit_eobrun()
                        continue
                    # Refinement. At this precision a coefficient is
                    # "old" (history nonzero -> one correction bit),
                    # "new" (exactly +-1 -> a run/size-1 symbol), or
                    # zero (counts toward the symbol's run).
                    hist = [
                        tk >> 1 if tk >= 0 else -((-tk) >> 1) for tk in t
                    ]
                    news = [
                        k for k in range(ss, se + 1)
                        if t[k] != 0 and hist[k] == 0
                    ]
                    cursor = ss
                    for n in news:
                        emit_eobrun()
                        r = sum(1 for k in range(cursor, n) if t[k] == 0)
                        while r > 15:
                            # ZRL: the decoder advances over exactly 16
                            # zero-history coefs, consuming corrections
                            # of olds interleaved among them — emit in
                            # that precise order, then move the cursor
                            # past the 16th zero
                            code, ln = ac_codes[0xF0]
                            bw.put(code, ln)
                            zeros = 0
                            while zeros < 16:
                                if t[cursor] == 0:
                                    zeros += 1
                                elif hist[cursor] != 0:
                                    bw.put(abs(t[cursor]) & 1, 1)
                                cursor += 1
                            r -= 16
                        code, ln = ac_codes[(r << 4) | 1]
                        bw.put(code, ln)
                        bw.put(1 if t[n] > 0 else 0, 1)
                        for k in range(cursor, n):
                            if hist[k] != 0:
                                bw.put(abs(t[k]) & 1, 1)
                        cursor = n + 1
                    if cursor <= se:
                        # tail joins the EOB run; its olds' correction
                        # bits ride the run's buffered bits
                        eobrun += 1
                        br_bits.extend(
                            abs(t[k]) & 1
                            for k in range(cursor, se + 1)
                            if hist[k] != 0
                        )
                        if eobrun == 0x7FFF or len(br_bits) > 900:
                            emit_eobrun()
            emit_eobrun()
            parts += bw.flush()
            return bytes(parts)

        out, seg, dht = _jpeg_headers(samp, width, height, ri, 0xC2)
        # the flat progressive AC table (id: tc=1 th=0), once up front
        out += seg(
            0xC4,
            bytes([1 << 4 | 0])
            + bytes(_PROG_AC_BITS)
            + bytes(_PROG_AC_VALUES),
        )
        for comp_idx, ss, se, ah, al in scans:
            sos = bytes([len(comp_idx)])
            for ci in comp_idx:
                td = min(ci, 1)
                ta = 0  # every AC scan uses the flat progressive table
                sos += bytes([ci + 1, (td << 4 | ta) if ss == 0 else ta])
            sos += bytes([ss, se, (ah << 4) | al])
            out += seg(0xDA, sos)
            if ss == 0:
                out += enc_dc_scan(comp_idx, ah, al)
            else:
                if len(comp_idx) != 1:
                    raise ValueError("progressive AC scans are single-component")
                out += enc_ac_scan(comp_idx[0], ss, se, ah, al)
        out += b"\xff\xd9"
        return bytes(out)

    class _BitReader:
        def __init__(self, data: bytes, pos: int):
            self.data = data
            self.pos = pos
            self.acc = 0
            self.n = 0

        def bit(self) -> int:
            if self.n == 0:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy stream truncated")
                b = self.data[self.pos]
                self.pos += 1
                if b == 0xFF:
                    nxt = self.data[self.pos] if self.pos < len(self.data) else None
                    if nxt == 0x00:
                        self.pos += 1  # stuffed byte
                    else:
                        raise ValueError("unexpected marker in JPEG scan")
                self.acc = b
                self.n = 8
            self.n -= 1
            return (self.acc >> self.n) & 1

        def bits(self, k: int) -> int:
            v = 0
            for _ in range(k):
                v = (v << 1) | self.bit()
            return v

    def _huff_decoder(bits, values):
        """code-string table: {(length, code): symbol}."""
        out = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[(ln, code)] = values[k]
                code += 1
                k += 1
            code <<= 1
        return out

    def _read_symbol(br, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad JPEG huffman code")

    def _extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def jpeg_decode(data: bytes) -> dict:
        """JPEG -> dict(width, height, channels, pixels) — grayscale
        stays 1 channel; color decodes to RGB. Supports 8-bit baseline
        (SOF0) and progressive (SOF2, spectral selection + successive
        approximation + EOB runs per T.81 Annex G), 4:4:4 and 4:2:0
        sampling, and restart intervals (DRI/RSTn) in both modes.
        12-bit, arithmetic coding, and hierarchical modes raise
        NotImplementedError. Malformed/truncated bytes raise
        ValueError."""
        try:
            return _jpeg_decode_inner(data)
        except (IndexError, struct.error) as e:
            raise ValueError(f"truncated/malformed JPEG: {e}") from None

    def _next_marker(data: bytes, p: int) -> int:
        """Index of the next real marker (FF followed by non-stuffing,
        non-fill byte) at/after ``p`` — used to resynchronize after an
        entropy-coded segment's trailing pad bits."""
        while p + 1 < len(data):
            if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF):
                return p
            p += 1
        raise ValueError("JPEG truncated (no trailing marker)")

    def _expect_rst(br, n: int) -> None:
        """Byte-align past pad bits and consume the RSTn marker that
        must sit at a restart boundary (T.81 E.2.4); out-of-sequence
        or missing markers are corruption, reported loudly."""
        br.n = 0
        p = _next_marker(br.data, br.pos)
        m = br.data[p + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError("missing JPEG restart marker")
        if m != 0xD0 + (n & 7):
            raise ValueError("JPEG restart marker out of sequence")
        br.pos = p + 2

    def _jpeg_decode_inner(data: bytes) -> dict:
        import numpy as np

        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (no SOI)")
        pos = 2
        qtabs: dict[int, list[int]] = {}
        htabs: dict[tuple[int, int], dict] = {}
        frame = None           # (w, h, comps, progressive)
        ri = 0                 # restart interval, in MCUs/blocks
        coef: dict[int, "np.ndarray"] = {}   # cid -> (BY, BX, 64) zigzag
        nblocks: dict[int, tuple[int, int]] = {}  # cid -> real (bh, bw)
        mcu_dims = None        # (mcus_x, mcus_y)
        by_id: dict[int, tuple[int, int, int]] = {}
        scans_seen = 0

        def decode_scan(scan_comps, ss, se, ah, al, p):
            """Entropy-decode one scan starting at byte ``p``; fills
            ``coef``; returns the byte offset of the next marker."""
            nonlocal scans_seen
            scans_seen += 1
            w, h, comps, progressive = frame
            mcus_x, mcus_y = mcu_dims
            br = _BitReader(data, p)
            interleaved = len(scan_comps) > 1
            if not progressive and not (
                ss == 0 and se == 63 and ah == 0 and al == 0
            ):
                raise ValueError("baseline JPEG scan with progressive params")

            # --- unit (MCU / block) iteration with restart handling
            def units():
                if interleaved:
                    for my in range(mcus_y):
                        for mx in range(mcus_x):
                            blocks = []
                            for cid, td, ta in scan_comps:
                                ch, cv, _tq = by_id[cid]
                                for vy in range(cv):
                                    for vx in range(ch):
                                        blocks.append(
                                            (cid, my * cv + vy, mx * ch + vx,
                                             td, ta)
                                        )
                            yield blocks
                else:
                    cid, td, ta = scan_comps[0]
                    bh, bwid = nblocks[cid]
                    for by in range(bh):
                        for bx in range(bwid):
                            yield [(cid, by, bx, td, ta)]

            prev = {cid: 0 for cid, _t, _a in scan_comps}
            eobrun = 0
            unit_i = 0
            rst = 0
            for blocks in units():
                if ri and unit_i and unit_i % ri == 0:
                    _expect_rst(br, rst)
                    rst += 1
                    prev = {cid: 0 for cid, _t, _a in scan_comps}
                    eobrun = 0
                unit_i += 1
                for cid, by, bx, td, ta in blocks:
                    arr = coef[cid]
                    if not progressive:
                        dc_t = htabs.get((0, td))
                        ac_t = htabs.get((1, ta))
                        if dc_t is None or ac_t is None:
                            raise ValueError("JPEG scan references missing DHT")
                        s = _read_symbol(br, dc_t)
                        diff = _extend(br.bits(s), s) if s else 0
                        prev[cid] += diff
                        arr[by, bx, 0] = prev[cid]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(br, ac_t)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad JPEG AC symbol")
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC overflow")
                            arr[by, bx, k] = _extend(br.bits(size), size)
                            k += 1
                        continue
                    # ---- progressive scan kinds (T.81 G.2) ----
                    if ss == 0:  # DC scan (Se must be 0)
                        if ah == 0:
                            dc_t = htabs.get((0, td))
                            if dc_t is None:
                                raise ValueError(
                                    "JPEG scan references missing DHT"
                                )
                            s = _read_symbol(br, dc_t)
                            diff = _extend(br.bits(s), s) if s else 0
                            prev[cid] += diff
                            arr[by, bx, 0] = prev[cid] << al
                        else:
                            if br.bit():
                                arr[by, bx, 0] = int(arr[by, bx, 0]) | (1 << al)
                        continue
                    ac_t = htabs.get((1, ta))
                    if ac_t is None:
                        raise ValueError("JPEG scan references missing DHT")
                    if ah == 0:  # AC first (G.2.2.2)
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            sym = _read_symbol(br, ac_t)
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run < 15:  # EOBn
                                    eobrun = (1 << run) - 1
                                    if run:
                                        eobrun += br.bits(run)
                                    break
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > se:
                                raise ValueError("JPEG AC overflow")
                            arr[by, bx, k] = _extend(br.bits(size), size) * (
                                1 << al
                            )
                            k += 1
                        continue
                    # AC refinement (G.2.2.3): the standard sweep —
                    # every nonzero-history coefficient passed consumes
                    # one correction bit; a zero-history coefficient
                    # consumes the run until the new +-1 lands
                    bit = 1 << al
                    if eobrun:
                        eobrun -= 1
                        for k in range(ss, se + 1):
                            v = int(arr[by, bx, k])
                            if v != 0 and br.bit() and (abs(v) & bit) == 0:
                                arr[by, bx, k] = v + bit if v > 0 else v - bit
                        continue
                    k = ss
                    while k <= se:
                        sym = _read_symbol(br, ac_t)
                        run, size = sym >> 4, sym & 0x0F
                        newval = 0
                        if size == 0:
                            if run < 15:  # EOBn: finish block w/ sweep
                                eobrun = (1 << run) - 1
                                if run:
                                    eobrun += br.bits(run)
                                run = 64
                            # run == 15: ZRL -> pass 16 zero histories
                        else:
                            if size != 1:
                                raise ValueError(
                                    "bad JPEG refinement symbol"
                                )
                            newval = bit if br.bit() else -bit
                        while k <= se:
                            v = int(arr[by, bx, k])
                            if v != 0:
                                if br.bit() and (abs(v) & bit) == 0:
                                    arr[by, bx, k] = (
                                        v + bit if v > 0 else v - bit
                                    )
                            else:
                                if run == 0:
                                    if newval:
                                        arr[by, bx, k] = newval
                                    k += 1
                                    break
                                run -= 1
                            k += 1
            return _next_marker(data, br.pos)

        while pos < len(data):
            if data[pos] != 0xFF:
                raise ValueError("bad JPEG marker alignment")
            marker = data[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:  # EOI
                break
            (length,) = struct.unpack(">H", data[pos : pos + 2])
            body = data[pos + 2 : pos + length]
            if len(body) != length - 2:
                raise ValueError("truncated JPEG segment")
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0x0F
                    if pq != 0:
                        raise NotImplementedError("16-bit JPEG quant table")
                    qtabs[tq] = list(body[i + 1 : i + 65])
                    i += 65
            elif marker == 0xC4:  # DHT (may be redefined between scans)
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 0x0F
                    bits = list(body[i + 1 : i + 17])
                    nv = sum(bits)
                    values = list(body[i + 17 : i + 17 + nv])
                    htabs[(tc, th)] = _huff_decoder(bits, values)
                    i += 17 + nv
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
                if frame is not None:
                    raise ValueError("multiple JPEG frames")
                prec = body[0]
                if prec != 8:
                    raise NotImplementedError(f"{prec}-bit JPEG")
                h, w = struct.unpack(">HH", body[1:5])
                ncomp = body[5]
                comps = []
                for ci in range(ncomp):
                    cid, sampb, tq = body[6 + ci * 3 : 9 + ci * 3]
                    comps.append((cid, sampb >> 4, sampb & 0x0F, tq))
                frame = (w, h, comps, marker == 0xC2)
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if not all(
                    (c[1], c[2]) in ((hmax, vmax), (1, 1)) for c in comps
                ):
                    raise NotImplementedError("unsupported JPEG sampling layout")
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                mcu_dims = (mcus_x, mcus_y)
                for cid, ch, cv, tq in comps:
                    by_id[cid] = (ch, cv, tq)
                    coef[cid] = np.zeros(
                        (mcus_y * cv, mcus_x * ch, 64), dtype=np.int64
                    )
                    cw = -(-(w * ch) // hmax)
                    chh = -(-(h * cv) // vmax)
                    nblocks[cid] = (-(-chh // 8), -(-cw // 8))
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                            0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    f"non-baseline JPEG (SOF marker 0x{marker:02x})"
                )
            elif marker == 0xDD:  # DRI
                (ri,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS
                if frame is None:
                    raise ValueError("JPEG SOS before SOF")
                ns = body[0]
                scan_comps = []
                for ci in range(ns):
                    cid, tt = body[1 + ci * 2 : 3 + ci * 2]
                    scan_comps.append((cid, tt >> 4, tt & 0x0F))
                ss, se = body[1 + ns * 2], body[2 + ns * 2]
                ahal = body[3 + ns * 2]
                pos = decode_scan(
                    scan_comps, ss, se, ahal >> 4, ahal & 0x0F, pos + length
                )
                continue
            pos += length
        if frame is None or scans_seen == 0:
            raise ValueError("JPEG missing SOF/SOS")
        w, h, comps, _progressive = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        C = _dct_matrix()
        inv_zz = np.argsort(_ZIGZAG)
        full = []
        for cid, ch, cv, tq in comps:
            if tq not in qtabs:
                raise ValueError("JPEG missing quant table")
            q = np.array(qtabs[tq], dtype=np.float64)
            deq = coef[cid].astype(np.float64) * q
            nat = deq[:, :, inv_zz].reshape(deq.shape[0], deq.shape[1], 8, 8)
            sp = np.einsum("ba,ijbc,cd->ijad", C, nat, C) + 128.0
            plane = sp.transpose(0, 2, 1, 3).reshape(
                deq.shape[0] * 8, deq.shape[1] * 8
            )
            if (ch, cv) != (hmax, vmax):
                plane = plane.repeat(vmax // cv, axis=0).repeat(
                    hmax // ch, axis=1
                )
            full.append(plane[:h, :w])
        if len(comps) == 1:
            out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
            return {
                "width": w, "height": h, "channels": 1,
                "pixels": out.tobytes(),
            }
        if len(comps) != 3:
            raise NotImplementedError(f"{len(comps)}-component JPEG")
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack(
            [np.clip(np.round(x), 0, 255) for x in (r, g, b)], axis=2
        ).astype(np.uint8)
        return {
            "width": w, "height": h, "channels": 3,
            "pixels": rgb.tobytes(),
        }

    # -- MP4 / ISO BMFF (round 12): container parsing + demux ----------
    # The CONTAINER is pure struct arithmetic (ISO/IEC 14496-12 box
    # grammar — public spec); only the H.264/AAC PAYLOAD codecs are a
    # native-lib boundary. mp4_probe walks ftyp/moov/trak/mdia/stbl,
    # returns track metadata, and DEMUXES the samples via
    # stsc/stsz/stco (the real mdat byte ranges) — what a training
    # pipeline needs for video metadata extraction and frame-level
    # dedup keys without decoding pixels. mp4_decode_frames raises the
    # format-accurate NotImplementedError.

    def _box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    def _fullbox(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
        return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)

    def mp4_encode_stub(
        samples: list[bytes],
        width: int,
        height: int,
        frame_delta: int = 40,
        timescale: int = 1000,
        codec: bytes = b"avc1",
        n_chunks: int = 1,
        pad_free: int = 0,
        fragmented: bool = False,
        samples_per_fragment: int = 4,
        trun_per_sample_sizes: bool = True,
        trun_sample_durations: bool = False,
        use_co64: bool = False,
        duration_source: str = "mvhd",
        second_track: bool = False,
        sync_every: int = 1,
        mark_fragment_sync: bool = False,
        ctts_pattern: Optional[list] = None,
        elst_media_time: Optional[int] = None,
        elst_empty: int = 0,
    ) -> bytes:
        """Structurally valid ISO BMFF file: ftyp + moov (mvhd, one
        video trak with full stbl sample tables) + mdat holding
        ``samples``. Sample BYTES are an opaque stub (not valid H.264)
        — the container, the sample tables, and the demux offsets are
        real, which is exactly the surface mp4_probe exercises.

        ``n_chunks`` spreads the samples over multiple mdat chunks
        (run-length-compressed stsc + one stco offset per chunk — the
        expansion logic real muxers emit); ``pad_free`` inserts a
        64-bit-largesize ``free`` box before moov so the probe's
        largesize path is exercised by honest fixtures.

        ``fragmented=True`` emits the DASH/HLS shape instead: moov
        carries EMPTY sample tables plus mvex/trex, and the samples
        arrive in moof+mdat fragment pairs (mfhd sequence numbers,
        tfhd with default-base-is-moof, trun with data-offset +
        per-sample sizes) — the other half of real-world MP4s.

        Round-13 shapes (VERDICT r12 task #2): ``use_co64=True``
        writes 64-bit co64 chunk offsets instead of stco (the >4 GiB
        capture shape); ``duration_source`` picks where the probe must
        find the duration — "mvhd" (authored, the default), "mehd"
        (mvhd says 0, mvex/mehd carries fragment_duration), or
        "fragments" (mvhd 0, no mehd: only the trun/tfhd sample
        durations know — the pure-fMP4 live-stream shape);
        ``second_track=True`` (fragmented only) interleaves a second
        'soun' track whose traf comes FIRST in each moof while the
        video traf's tfhd has NEITHER base-data-offset NOR
        default-base-is-moof, forcing the spec's previous-traf-data-end
        base fallback (ISO 14496-12 8.8.7.1).

        Round-14 timing shapes (VERDICT r13 task #6): ``ctts_pattern``
        authors per-sample composition offsets (media-timescale ticks,
        cycled over the pattern) — a ctts v1 box in the plain layout
        (ISO 14496-12 8.6.1.3), per-sample composition-time offsets in
        a version-1 trun for fragments; ``elst_media_time`` /
        ``elst_empty`` author an edts/elst edit list (8.6.6): an
        optional leading EMPTY edit of ``elst_empty`` movie-timescale
        ticks (media_time -1, the delayed-start shape) followed by the
        presentation edit starting at ``elst_media_time`` media ticks
        (how real muxers cancel the B-frame ctts lead)."""
        n = len(samples)
        if duration_source not in ("mvhd", "mehd", "fragments"):
            raise ValueError(f"unknown duration_source {duration_source!r}")
        if duration_source != "mvhd" and not fragmented:
            raise ValueError("mehd/fragments duration needs fragmented=True")
        if second_track and not fragmented:
            raise ValueError("second_track needs fragmented=True")
        real_duration = n * frame_delta
        duration = real_duration if duration_source == "mvhd" else 0
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
        free = b""
        if pad_free:
            body = b"\x00" * pad_free
            free = (
                struct.pack(">I", 1) + b"free"
                + struct.pack(">Q", len(body) + 16) + body
            )
        n_chunks = max(1, min(n_chunks, n)) if n else 1
        base, rem = divmod(n, n_chunks)
        chunk_counts = [
            base + (1 if i < rem else 0) for i in range(n_chunks)
        ]
        chunk_counts = [c for c in chunk_counts if c > 0] or [0]

        def moov_for(chunk_off: int) -> bytes:
            unity = struct.pack(
                ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
            )
            mvhd = _fullbox(
                b"mvhd", 0, 0,
                struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">iH", 0x00010000, 0x0100)
                + b"\x00" * 10 + unity + b"\x00" * 24
                + struct.pack(">I", 2),
            )
            tkhd = _fullbox(
                b"tkhd", 0, 7,
                struct.pack(">IIIII", 0, 0, 1, 0, duration)
                + b"\x00" * 8
                + struct.pack(">hhhh", 0, 0, 0, 0)
                + unity
                + struct.pack(">II", width << 16, height << 16),
            )
            mdhd = _fullbox(
                b"mdhd", 0, 0,
                struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">HH", 0x55C4, 0),  # 'und'
            )
            hdlr = _fullbox(
                b"hdlr", 0, 0,
                struct.pack(">I", 0) + b"vide" + b"\x00" * 12
                + b"factstore video stub\x00",
            )
            avcc = _box(b"avcC", bytes([1, 66, 0, 30, 0xFF, 0xE0, 0, 0]))
            entry = _box(
                codec,
                b"\x00" * 6 + struct.pack(">H", 1)  # data_ref_index
                + struct.pack(">HH", 0, 0) + b"\x00" * 12
                + struct.pack(">HH", width, height)
                + struct.pack(">II", 0x00480000, 0x00480000)
                + struct.pack(">I", 0) + struct.pack(">H", 1)
                + b"\x00" * 32
                + struct.pack(">Hh", 24, -1)
                + avcc,
            )
            stsd = _fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
            # edit list (ISO 14496-12 8.6.6): optional leading empty
            # edit (media_time -1, duration in MOVIE ticks), then the
            # presentation edit from elst_media_time (MEDIA ticks) for
            # the full duration; media_rate fixed 1.0
            edts = b""
            if elst_media_time is not None or elst_empty:
                entries_e = []
                if elst_empty:
                    entries_e.append((int(elst_empty), -1))
                entries_e.append((real_duration, int(elst_media_time or 0)))
                edts = _box(
                    b"edts",
                    _fullbox(
                        b"elst", 0, 0,
                        struct.pack(">I", len(entries_e))
                        + b"".join(
                            struct.pack(">Ii", d_, m_) + struct.pack(">hh", 1, 0)
                            for d_, m_ in entries_e
                        ),
                    ),
                )
            if fragmented:
                # empty sample tables: every sample lives in fragments
                stts = _fullbox(b"stts", 0, 0, struct.pack(">I", 0))
                stsc = _fullbox(b"stsc", 0, 0, struct.pack(">I", 0))
                stsz = _fullbox(b"stsz", 0, 0, struct.pack(">II", 0, 0))
                stco = _fullbox(b"stco", 0, 0, struct.pack(">I", 0))
                stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
                vmhd = _fullbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
                dref = _fullbox(
                    b"dref", 0, 0,
                    struct.pack(">I", 1) + _fullbox(b"url ", 0, 1, b""),
                )
                dinf = _box(b"dinf", dref)
                minf = _box(b"minf", vmhd + dinf + stbl)
                mdia = _box(b"mdia", mdhd + hdlr + minf)
                trak = _box(b"trak", tkhd + edts + mdia)
                trex = _fullbox(
                    b"trex", 0, 0,
                    struct.pack(">IIIII", 1, 1, frame_delta, 0, 0),
                )
                mvex_body = b""
                if duration_source == "mehd":
                    mvex_body += _fullbox(
                        b"mehd", 0, 0, struct.pack(">I", real_duration)
                    )
                mvex_body += trex
                snd_trak = b""
                if second_track:
                    # minimal second track (track_ID 2, handler 'soun')
                    # with its own empty tables + trex defaults: its
                    # trafs lead each moof so the video traf exercises
                    # the previous-traf-end base fallback
                    tkhd2 = _fullbox(
                        b"tkhd", 0, 7,
                        struct.pack(">IIIII", 0, 0, 2, 0, duration)
                        + b"\x00" * 8
                        + struct.pack(">hhhh", 0, 0, 0, 0)
                        + unity
                        + struct.pack(">II", 0, 0),
                    )
                    hdlr2 = _fullbox(
                        b"hdlr", 0, 0,
                        struct.pack(">I", 0) + b"soun" + b"\x00" * 12
                        + b"factstore audio stub\x00",
                    )
                    smhd = _fullbox(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
                    entry2 = _box(
                        b"mp4a",
                        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 20,
                    )
                    stsd2 = _fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + entry2)
                    stbl2 = _box(
                        b"stbl",
                        stsd2
                        + _fullbox(b"stts", 0, 0, struct.pack(">I", 0))
                        + _fullbox(b"stsc", 0, 0, struct.pack(">I", 0))
                        + _fullbox(b"stsz", 0, 0, struct.pack(">II", 0, 0))
                        + _fullbox(b"stco", 0, 0, struct.pack(">I", 0)),
                    )
                    minf2 = _box(b"minf", smhd + dinf + stbl2)
                    mdia2 = _box(b"mdia", mdhd + hdlr2 + minf2)
                    snd_trak = _box(b"trak", tkhd2 + mdia2)
                    mvex_body += _fullbox(
                        b"trex", 0, 0,
                        struct.pack(">IIIII", 2, 1, frame_delta, 16, 0),
                    )
                mvex = _box(b"mvex", mvex_body)
                return _box(b"moov", mvhd + trak + snd_trak + mvex)
            stts = _fullbox(
                b"stts", 0, 0, struct.pack(">III", 1, n, frame_delta)
            )
            # run-length-compressed stsc: a new run only when the
            # samples-per-chunk value changes (what real muxers emit)
            runs = []
            for i, spc in enumerate(chunk_counts):
                if not runs or runs[-1][1] != spc:
                    runs.append((i + 1, spc))
            stsc = _fullbox(
                b"stsc", 0, 0,
                struct.pack(">I", len(runs))
                + b"".join(
                    struct.pack(">III", first, spc, 1) for first, spc in runs
                ),
            )
            stsz = _fullbox(
                b"stsz", 0, 0,
                struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", len(x)) for x in samples),
            )
            offs, pos, si = [], chunk_off, 0
            for spc in chunk_counts:
                offs.append(pos)
                for _ in range(spc):
                    pos += len(samples[si])
                    si += 1
            if use_co64:
                stco = _fullbox(
                    b"co64", 0, 0,
                    struct.pack(">I", len(offs))
                    + b"".join(struct.pack(">Q", o) for o in offs),
                )
            else:
                stco = _fullbox(
                    b"stco", 0, 0,
                    struct.pack(">I", len(offs))
                    + b"".join(struct.pack(">I", o) for o in offs),
                )
            stss = b""
            if sync_every > 1:
                # sync-sample table: every sync_every-th sample is a
                # keyframe (1-based indices per ISO 14496-12 8.6.2);
                # omitted when every sample is sync (the spec default)
                ks = list(range(1, n + 1, sync_every))
                stss = _fullbox(
                    b"stss", 0, 0,
                    struct.pack(">I", len(ks))
                    + b"".join(struct.pack(">I", k) for k in ks),
                )
            ctts = b""
            if ctts_pattern:
                # run-length-compressed composition offsets, version 1
                # (SIGNED — what B-frame muxers emit, 8.6.1.3)
                offs_ts = [
                    int(ctts_pattern[i % len(ctts_pattern)]) for i in range(n)
                ]
                cruns: list[list[int]] = []
                for o in offs_ts:
                    if cruns and cruns[-1][1] == o:
                        cruns[-1][0] += 1
                    else:
                        cruns.append([1, o])
                ctts = _fullbox(
                    b"ctts", 1, 0,
                    struct.pack(">I", len(cruns))
                    + b"".join(struct.pack(">Ii", c, o) for c, o in cruns),
                )
            stbl = _box(b"stbl", stsd + stts + ctts + stsc + stsz + stco + stss)
            vmhd = _fullbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
            dref = _fullbox(
                b"dref", 0, 0,
                struct.pack(">I", 1) + _fullbox(b"url ", 0, 1, b""),
            )
            dinf = _box(b"dinf", dref)
            minf = _box(b"minf", vmhd + dinf + stbl)
            mdia = _box(b"mdia", mdhd + hdlr + minf)
            trak = _box(b"trak", tkhd + edts + mdia)
            return _box(b"moov", mvhd + trak)

        if fragmented:
            # moov declares the track with EMPTY sample tables; the
            # samples ride moof+mdat fragment pairs
            moov = moov_for(0)
            out = bytearray(ftyp + free + moov)
            spf = max(1, samples_per_fragment)
            seq = 1
            if not trun_per_sample_sizes and len({len(x) for x in samples}) > 1:
                raise ValueError(
                    "trun_per_sample_sizes=False needs uniform sample sizes "
                    "(sizes then come from the tfhd default)"
                )
            for i in range(0, n, spf):
                frag = samples[i : i + spf]
                mfhd = _fullbox(b"mfhd", 0, 0, struct.pack(">I", seq))
                # deterministic audio stub samples for the second
                # track: one 16-byte sample per fragment, bytes
                # (seq*13 + j) % 251 — lands in mdat BEFORE the video
                # bytes, so the video traf's fallback base must skip it
                audio = bytes((seq * 13 + j) % 251 for j in range(16)) if second_track else b""
                seq += 1
                if trun_per_sample_sizes:
                    # tfhd: default-base-is-moof (0x020000) + default
                    # sample duration (0x08). With second_track the
                    # video traf drops BOTH base flags — its base must
                    # come from the previous traf's data end (8.8.7.1).
                    # mark_fragment_sync adds default-sample-flags
                    # (0x20) = non-sync, with trun first-sample-flags
                    # (0x04) marking each fragment's first sample as
                    # the keyframe — the steady DASH/HLS GOP shape.
                    tf_fl = 0x000008 if second_track else 0x020008
                    tfhd_payload = struct.pack(">II", 1, frame_delta)
                    if mark_fragment_sync:
                        tf_fl |= 0x20
                        tfhd_payload += struct.pack(">I", 0x00010000)
                    tfhd = _fullbox(b"tfhd", 0, tf_fl, tfhd_payload)
                    # trun: data-offset (0x01) + size-present (0x200),
                    # optionally + per-sample duration (0x100) and cts
                    # offset (0x800) — the widest real-world row shape
                    tr_flags = 0x000201
                    if trun_sample_durations:
                        tr_flags |= 0x900
                    if ctts_pattern:
                        tr_flags |= 0x800
                    if mark_fragment_sync:
                        tr_flags |= 0x04
                    trun_payload = struct.pack(">I", len(frag))
                    trun_payload += struct.pack(">i", 0)  # patched below
                    if mark_fragment_sync:
                        # I-frame: depends-on=2, non-sync bit CLEAR
                        trun_payload += struct.pack(">I", 0x02000000)
                    for j, x in enumerate(frag):
                        if trun_sample_durations:
                            trun_payload += struct.pack(">I", frame_delta)
                        trun_payload += struct.pack(">I", len(x))
                        if ctts_pattern:
                            # per-sample composition offset, SIGNED
                            # (trun version 1 below)
                            trun_payload += struct.pack(
                                ">i",
                                int(ctts_pattern[(i + j) % len(ctts_pattern)]),
                            )
                        elif trun_sample_durations:
                            trun_payload += struct.pack(">I", 0)  # cts
                    trun = _fullbox(
                        b"trun", 1 if ctts_pattern else 0, tr_flags, trun_payload
                    )
                else:
                    if second_track:
                        raise ValueError(
                            "second_track needs trun_per_sample_sizes=True"
                        )
                    # sizes from the tfhd default (0x10): the other
                    # real-world trun shape (fixed-size audio/video)
                    tfhd = _fullbox(
                        b"tfhd", 0, 0x020018,
                        struct.pack(">III", 1, frame_delta, len(frag[0])),
                    )
                    trun_payload = struct.pack(">I", len(frag))
                    trun_payload += struct.pack(">i", 0)  # patched below
                    trun = _fullbox(b"trun", 0, 0x000001, trun_payload)
                traf = _box(b"traf", tfhd + trun)
                if second_track:
                    # audio traf FIRST: default-base-is-moof + default
                    # size/duration, one 16-byte sample per fragment.
                    # Video data follows it in mdat, so the video
                    # traf's fallback base (= this traf's data end)
                    # resolves correctly only if the probe walks
                    # foreign trafs too.
                    tfhd2 = _fullbox(
                        b"tfhd", 0, 0x020018,
                        struct.pack(">III", 2, frame_delta, len(audio)),
                    )
                    trun2 = _fullbox(
                        b"trun", 0, 0x000001, struct.pack(">Ii", 1, 0)
                    )
                    traf2 = _box(b"traf", tfhd2 + trun2)
                    moof = bytearray(_box(b"moof", mfhd + traf2 + traf))
                    # audio data-offset: mdat payload start (relative
                    # to moof start); the FIRST 'trun' is the audio one
                    doff = len(moof) + 8
                    j = bytes(moof).index(b"trun") + 4 + 4 + 4
                    moof[j : j + 4] = struct.pack(">i", doff)
                    # the video trun's data-offset stays 0: its base is
                    # the audio traf's data end, where video bytes begin
                    out += moof
                    out += _box(b"mdat", audio + b"".join(frag))
                else:
                    moof = bytearray(_box(b"moof", mfhd + traf))
                    # data_offset is relative to the moof start
                    # (default-base-is-moof): moof size + mdat header
                    doff = len(moof) + 8
                    # the i32 sits right after trun's (vf 4 + count 4)
                    j = bytes(moof).index(b"trun") + 4 + 4 + 4
                    moof[j : j + 4] = struct.pack(">i", doff)
                    out += moof
                    out += _box(b"mdat", b"".join(frag))
            return bytes(out)
        # stco holds ABSOLUTE offsets; the moov size is independent
        # of the offset VALUES, so one sizing pass then one real pass
        size_pass = moov_for(0)
        chunk_off = len(ftyp) + len(free) + len(size_pass) + 8  # + mdat hdr
        moov = moov_for(chunk_off)
        mdat = _box(b"mdat", b"".join(samples))
        return ftyp + free + moov + mdat

    def _walk_boxes(data: bytes, start: int, end: int):
        """Yield (type, payload_start, payload_end) for the sibling
        boxes in data[start:end]; raises ValueError on malformed
        sizes (truncation, overlap past the parent)."""
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", data[pos : pos + 4])
            btype = data[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    raise ValueError("truncated MP4 largesize box")
                (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
                hdr = 16
            elif size == 0:  # box extends to end of enclosing scope
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError(f"bad MP4 box size for {btype!r}")
            yield btype, pos + hdr, pos + size
            pos += size
        if pos != end:
            raise ValueError("trailing garbage inside MP4 box")

    def _find_box(data, start, end, btype):
        for t, a, b in _walk_boxes(data, start, end):
            if t == btype:
                return a, b
        return None

    def mp4_probe(data: bytes) -> dict:
        """Parse an ISO BMFF container: track metadata from moov and
        the DEMUXED video samples from stsc/stsz/stco byte ranges.
        Returns dict(width, height, n_frames, duration_ms, timescale,
        codec, handler, samples: bytes). Raises ValueError on
        malformed bytes; only the sample PAYLOAD decode (H.264) is
        native-lib territory (mp4_decode_frames)."""
        if len(data) < 16 or data[4:8] != b"ftyp":
            raise ValueError("not an MP4 (no ftyp)")
        moov = _find_box(data, 0, len(data), b"moov")
        if moov is None:
            raise ValueError("MP4 missing moov")
        mvhd = _find_box(data, moov[0], moov[1], b"mvhd")
        if mvhd is None:
            raise ValueError("MP4 missing mvhd")
        ver = data[mvhd[0]]
        if ver == 1:
            timescale, duration = struct.unpack(
                ">IQ", data[mvhd[0] + 20 : mvhd[0] + 32]
            )
        else:
            timescale, duration = struct.unpack(
                ">II", data[mvhd[0] + 12 : mvhd[0] + 20]
            )
        # Track selection: real files are often multi-track (video +
        # audio); pick the first trak whose hdlr is 'vide', falling
        # back to the first trak — and remember its track_ID so the
        # fragment demux below skips other tracks' trafs.
        traks = [
            (a, b)
            for t, a, b in _walk_boxes(data, moov[0], moov[1])
            if t == b"trak"
        ]
        if not traks:
            raise ValueError("MP4 missing trak")

        def _trak_parts(tk):
            tkhd = _find_box(data, tk[0], tk[1], b"tkhd")
            mdia = _find_box(data, tk[0], tk[1], b"mdia")
            if tkhd is None or mdia is None:
                raise ValueError("MP4 trak missing tkhd/mdia")
            hdlr = _find_box(data, mdia[0], mdia[1], b"hdlr")
            h = (
                data[hdlr[0] + 8 : hdlr[0] + 12].decode("ascii", "replace")
                if hdlr
                else "????"
            )
            return tkhd, mdia, h

        tkhd = mdia = handler = sel_tk = None
        for tk in traks:
            tkhd_c, mdia_c, h_c = _trak_parts(tk)
            if handler is None or (h_c == "vide" and handler != "vide"):
                tkhd, mdia, handler, sel_tk = tkhd_c, mdia_c, h_c, tk
            if handler == "vide":
                break
        # track_ID sits after version/flags + creation + modification:
        # v0 at payload+12 (u32 fields), v1 at payload+20 (u64 times)
        tk_ver = data[tkhd[0]]
        tid_off = tkhd[0] + (20 if tk_ver == 1 else 12)
        (track_id,) = struct.unpack(">I", data[tid_off : tid_off + 4])
        # width/height are the LAST 8 bytes of tkhd in both v0 and v1
        dim_off = tkhd[1] - 8
        w1616, h1616 = struct.unpack(">II", data[dim_off : dim_off + 8])
        width, height = w1616 >> 16, h1616 >> 16
        minf = _find_box(data, mdia[0], mdia[1], b"minf")
        stbl = _find_box(data, minf[0], minf[1], b"stbl") if minf else None
        if stbl is None:
            raise ValueError("MP4 missing stbl")
        stsd = _find_box(data, stbl[0], stbl[1], b"stsd")
        codec = "????"
        if stsd is not None:
            for t, a, b in _walk_boxes(data, stsd[0] + 8, stsd[1]):
                codec = t.decode("ascii", "replace")
                break
        # media timescale (mdhd): fragment sample DURATIONS are in
        # this timescale, not the movie one (ISO 14496-12 8.8.8.1)
        mdhd = _find_box(data, mdia[0], mdia[1], b"mdhd")
        media_timescale = timescale
        if mdhd is not None:
            md_ver = data[mdhd[0]]
            md_off = mdhd[0] + (20 if md_ver == 1 else 12)
            (media_timescale,) = struct.unpack(">I", data[md_off : md_off + 4])
        stsz = _find_box(data, stbl[0], stbl[1], b"stsz")
        stco = _find_box(data, stbl[0], stbl[1], b"stco")
        co64 = _find_box(data, stbl[0], stbl[1], b"co64")
        stsc = _find_box(data, stbl[0], stbl[1], b"stsc")
        if stsz is None or stsc is None:
            raise ValueError("MP4 missing sample tables (stsz/stsc)")
        # sync-sample table (stss, ISO 14496-12 8.6.2): 1-based indices
        # of the keyframes. ABSENT means every sample is sync — the
        # spec default, and what keyframe-sampling pipelines rely on.
        stss = _find_box(data, stbl[0], stbl[1], b"stss")
        sync_set = None
        if stss is not None:
            (n_sync,) = struct.unpack(">I", data[stss[0] + 4 : stss[0] + 8])
            need = stss[0] + 8 + 4 * n_sync
            if need > stss[1]:
                raise ValueError("truncated stss table")
            sync_set = {
                idx - 1
                for idx in struct.unpack(f">{n_sync}I", data[stss[0] + 8 : need])
            }
        # decode timing (stts, 8.6.1.2): per-sample deltas in MEDIA
        # ticks; absent/short tables degrade to the last delta (or 0)
        # so timing never blocks the demux itself
        stts_b = _find_box(data, stbl[0], stbl[1], b"stts")
        deltas: list = []
        if stts_b is not None:
            (n_tt,) = struct.unpack(">I", data[stts_b[0] + 4 : stts_b[0] + 8])
            need = stts_b[0] + 8 + 8 * n_tt
            if need > stts_b[1]:
                raise ValueError("truncated stts table")
            for ti in range(n_tt):
                cnt_t, delta_t = struct.unpack(
                    ">II", data[stts_b[0] + 8 + 8 * ti : stts_b[0] + 16 + 8 * ti]
                )
                deltas.extend([delta_t] * cnt_t)
        # composition offsets (ctts, 8.6.1.3): v0 unsigned, v1 SIGNED
        # (the B-frame shape); absent = zero offsets (cts == dts)
        ctts_b = _find_box(data, stbl[0], stbl[1], b"ctts")
        cto_list: list = []
        if ctts_b is not None:
            ct_ver = data[ctts_b[0]]
            (n_ct,) = struct.unpack(">I", data[ctts_b[0] + 4 : ctts_b[0] + 8])
            need = ctts_b[0] + 8 + 8 * n_ct
            if need > ctts_b[1]:
                raise ValueError("truncated ctts table")
            fmt = ">Ii" if ct_ver == 1 else ">II"
            for ti in range(n_ct):
                cnt_c, off_c = struct.unpack(
                    fmt, data[ctts_b[0] + 8 + 8 * ti : ctts_b[0] + 16 + 8 * ti]
                )
                cto_list.extend([off_c] * cnt_c)
        # edit list (edts/elst, 8.6.6) on the SELECTED trak: leading
        # empty edits (media_time -1, movie ticks) delay the timeline;
        # the first real edit's media_time shifts it earlier — the two
        # knobs a player applies before presenting cts
        elst_media_time = 0
        elst_empty_media = 0
        edts_b = _find_box(data, sel_tk[0], sel_tk[1], b"edts")
        if edts_b is not None:
            elst_b = _find_box(data, edts_b[0], edts_b[1], b"elst")
            if elst_b is not None:
                el_ver = data[elst_b[0]]
                (n_ed,) = struct.unpack(
                    ">I", data[elst_b[0] + 4 : elst_b[0] + 8]
                )
                p_e = elst_b[0] + 8
                entry_sz = (16 if el_ver == 1 else 8) + 4
                if p_e + entry_sz * n_ed > elst_b[1]:
                    raise ValueError("truncated elst table")
                found_edit = False
                for _ in range(n_ed):
                    if el_ver == 1:
                        seg_d, med_t = struct.unpack(
                            ">Qq", data[p_e : p_e + 16]
                        )
                    else:
                        seg_d, med_t = struct.unpack(
                            ">Ii", data[p_e : p_e + 8]
                        )
                    p_e += entry_sz
                    if found_edit:
                        continue
                    if med_t == -1:
                        # empty edit: movie ticks -> media ticks
                        if timescale:
                            elst_empty_media += (
                                seg_d * media_timescale
                            ) // timescale
                    else:
                        elst_media_time = med_t
                        found_edit = True
        fixed, count = struct.unpack(">II", data[stsz[0] + 4 : stsz[0] + 12])
        if fixed:
            sizes = [fixed] * count
        else:
            need = stsz[0] + 12 + 4 * count
            if need > stsz[1]:
                raise ValueError("truncated stsz table")
            sizes = list(
                struct.unpack(f">{count}I", data[stsz[0] + 12 : need])
            )
        # chunk offsets: stco (32-bit) or co64 (64-bit — what muxers
        # emit past 4 GiB, the media-lake case). A fragment-only file
        # may omit both so long as the moov declares zero samples.
        if stco is not None:
            (n_chunks,) = struct.unpack(">I", data[stco[0] + 4 : stco[0] + 8])
            need = stco[0] + 8 + 4 * n_chunks
            if need > stco[1]:
                raise ValueError("truncated stco table")
            offs = list(struct.unpack(f">{n_chunks}I", data[stco[0] + 8 : need]))
        elif co64 is not None:
            (n_chunks,) = struct.unpack(">I", data[co64[0] + 4 : co64[0] + 8])
            need = co64[0] + 8 + 8 * n_chunks
            if need > co64[1]:
                raise ValueError("truncated co64 table")
            offs = list(struct.unpack(f">{n_chunks}Q", data[co64[0] + 8 : need]))
        elif count == 0:
            offs = []
        else:
            raise ValueError("MP4 missing chunk offsets (stco/co64)")
        (n_runs,) = struct.unpack(">I", data[stsc[0] + 4 : stsc[0] + 8])
        runs = [
            struct.unpack(
                ">III", data[stsc[0] + 8 + 12 * i : stsc[0] + 20 + 12 * i]
            )
            for i in range(n_runs)
        ]
        # expand stsc runs -> samples-per-chunk, then walk mdat ranges
        per_chunk = []
        for i, (first, spc, _sdi) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
            per_chunk.extend([spc] * (last - first + 1))
        out = bytearray()
        si = 0
        for ci, off in enumerate(offs):
            pos = off
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= len(sizes):
                    break
                sz = sizes[si]
                if pos + sz > len(data):
                    raise ValueError("MP4 sample range past EOF")
                out += data[pos : pos + sz]
                pos += sz
                si += 1
        if si != len(sizes):
            raise ValueError(
                f"MP4 sample tables inconsistent: demuxed {si} of {len(sizes)}"
            )
        # keyframes over the plain samples: stss membership, or all
        keyframes = [
            i for i in range(count) if sync_set is None or i in sync_set
        ]
        # per-sample decode/composition stamps for the moov samples
        # (media ticks); fragments continue the dts clock below
        if len(deltas) < count:
            deltas.extend([deltas[-1] if deltas else 0] * (count - len(deltas)))
        if len(cto_list) < count:
            cto_list.extend([0] * (count - len(cto_list)))
        sample_dts: list = []
        sample_cts: list = []
        cur_dts = 0
        for si2 in range(count):
            sample_dts.append(cur_dts)
            sample_cts.append(cur_dts + cto_list[si2])
            cur_dts += deltas[si2]
        # Movie-extends defaults (ISO 14496-12 8.8.2-8.8.3): per-track
        # trex fallbacks for fragment sample duration/size, plus mehd's
        # whole-presentation fragment_duration — the duration source
        # for fragment-only files whose mvhd says 0.
        trex_defaults: dict[int, tuple[int, int, int]] = {}
        mehd_duration = None
        mvex = _find_box(data, moov[0], moov[1], b"mvex")
        if mvex is not None:
            for t2, a2, b2 in _walk_boxes(data, mvex[0], mvex[1]):
                if t2 == b"mehd":
                    if data[a2] == 1:
                        (mehd_duration,) = struct.unpack(
                            ">Q", data[a2 + 4 : a2 + 12]
                        )
                    else:
                        (mehd_duration,) = struct.unpack(
                            ">I", data[a2 + 4 : a2 + 8]
                        )
                elif t2 == b"trex":
                    tx_tid, _sdi, tx_dur, tx_sz, tx_fl = struct.unpack(
                        ">IIIII", data[a2 + 4 : a2 + 24]
                    )
                    trex_defaults[tx_tid] = (tx_dur, tx_sz, tx_fl)

        # Fragmented half (fMP4 / DASH / HLS): top-level moof boxes
        # carry samples the moov tables do not — tfhd defaults + trun
        # per-sample walk honoring the optional-field flag bits
        # (ISO/IEC 14496-12 8.8.7-8.8.8). Base-offset resolution per
        # 8.8.7.1: explicit base-data-offset, else default-base-is-moof
        # (0x020000), else moof start for the FIRST traf and the
        # previous traf's data end for later ones — so every traf is
        # walked (not just the selected track's) to track that end.
        frag_duration = 0  # selected track, media timescale
        for t, a, b in _walk_boxes(data, 0, len(data)):
            if t != b"moof":
                continue
            moof_start = a - 8
            trafs = [
                (ta2, tb2)
                for t2, ta2, tb2 in _walk_boxes(data, a, b)
                if t2 == b"traf"
            ]
            if not trafs:
                raise ValueError("MP4 moof missing traf")
            prev_end: Optional[int] = None  # prior traf's data end
            first_traf = True
            for traf in trafs:
                tfhd = _find_box(data, traf[0], traf[1], b"tfhd")
                if tfhd is None:
                    raise ValueError("MP4 traf missing tfhd")
                (tf_tid,) = struct.unpack(">I", data[tfhd[0] + 4 : tfhd[0] + 8])
                selected = tf_tid == track_id
                tf_flags = int.from_bytes(data[tfhd[0] + 1 : tfhd[0] + 4], "big")
                p = tfhd[0] + 8  # version/flags + track_ID
                tx_dur, tx_sz, tx_fl = trex_defaults.get(tf_tid, (None, None, None))
                base_off: Optional[int] = None
                if tf_flags & 0x01:  # explicit base-data-offset
                    (base_off,) = struct.unpack(">Q", data[p : p + 8])
                    p += 8
                if tf_flags & 0x02:  # sample-description-index
                    p += 4
                default_dur = tx_dur
                if tf_flags & 0x08:  # default-sample-duration
                    (default_dur,) = struct.unpack(">I", data[p : p + 4])
                    p += 4
                default_size = tx_sz if tx_sz else None
                if tf_flags & 0x10:  # default-sample-size
                    (default_size,) = struct.unpack(">I", data[p : p + 4])
                    p += 4
                # default-sample-flags (0x20): sync resolution source
                # AND an offset-corrupting field if left unparsed
                default_flags = tx_fl if tx_fl is not None else 0
                if tf_flags & 0x20:
                    (default_flags,) = struct.unpack(">I", data[p : p + 4])
                    p += 4
                if base_off is None:
                    if tf_flags & 0x020000:  # default-base-is-moof
                        base_off = moof_start
                    elif first_traf:
                        base_off = moof_start  # 8.8.7.1 first-traf default
                    elif prev_end is not None:
                        base_off = prev_end  # previous-fragment-end fallback
                    else:
                        raise ValueError(
                            "MP4 tfhd base offset unresolvable (no base-"
                            "data-offset, no default-base-is-moof, and the "
                            "preceding traf's data end is unknown)"
                        )
                first_traf = False
                pos = None  # trun continuity: next run follows the last
                traf_end: Optional[int] = None
                for tt, ta, tb in _walk_boxes(data, traf[0], traf[1]):
                    if tt != b"trun":
                        continue
                    tr_flags = int.from_bytes(data[ta + 1 : ta + 4], "big")
                    (cnt,) = struct.unpack(">I", data[ta + 4 : ta + 8])
                    q = ta + 8
                    if tr_flags & 0x01:  # data-offset
                        (doff,) = struct.unpack(">i", data[q : q + 4])
                        q += 4
                        pos = base_off + doff
                    elif pos is None:
                        # 8.8.8.1: absent offset = straight after the
                        # previous run; the first run starts at base
                        pos = base_off
                    first_flags = None
                    if tr_flags & 0x04:  # first-sample-flags
                        (first_flags,) = struct.unpack(">I", data[q : q + 4])
                        q += 4
                    for s_i in range(cnt):
                        dur = default_dur
                        if tr_flags & 0x100:  # sample-duration
                            (dur,) = struct.unpack(">I", data[q : q + 4])
                            q += 4
                        if tr_flags & 0x200:  # sample-size
                            (sz,) = struct.unpack(">I", data[q : q + 4])
                            q += 4
                        elif default_size is not None:
                            sz = default_size
                        elif selected:
                            raise ValueError(
                                "MP4 trun sample size unresolvable (no "
                                "per-sample size, no tfhd/trex default)"
                            )
                        else:
                            # a foreign track with unknowable sizes: we
                            # cannot place its data end; only fatal if a
                            # LATER traf needs the fallback (checked at
                            # base_off resolution above)
                            pos = None
                            break
                        # sync resolution per 8.8.3.1: per-sample
                        # flags > first-sample-flags (sample 0) >
                        # tfhd default > trex default; bit 0x00010000
                        # = sample_is_non_sync_sample
                        flags = default_flags
                        if s_i == 0 and first_flags is not None:
                            flags = first_flags
                        if tr_flags & 0x400:  # sample-flags
                            (flags,) = struct.unpack(">I", data[q : q + 4])
                            q += 4
                        cto = 0
                        if tr_flags & 0x800:  # composition-time offset
                            # trun v0: unsigned; v1: SIGNED (8.8.8.1 —
                            # the B-frame fMP4 shape)
                            if data[ta] == 0:
                                (cto,) = struct.unpack(">I", data[q : q + 4])
                            else:
                                (cto,) = struct.unpack(">i", data[q : q + 4])
                            q += 4
                        if pos + sz > len(data):
                            raise ValueError("MP4 fragment sample past EOF")
                        if selected:
                            out += data[pos : pos + sz]
                            if not flags & 0x00010000:
                                keyframes.append(count)
                            sizes.append(sz)
                            count += 1
                            frag_duration += dur or 0
                            sample_dts.append(cur_dts)
                            sample_cts.append(cur_dts + cto)
                            cur_dts += dur or 0
                        pos += sz
                        if traf_end is None or pos > traf_end:
                            traf_end = pos
                    if pos is None:
                        traf_end = None
                        break
                prev_end = traf_end
        # Duration resolution: mvhd (movie timescale) when authored;
        # else mvex/mehd (movie timescale); else the fragment sample
        # durations (MEDIA timescale) — so a pure-fMP4 stream reports
        # its real length instead of 0.
        if duration and timescale:
            duration_ms = (duration * 1000) // timescale
        elif mehd_duration and timescale:
            duration_ms = (mehd_duration * 1000) // timescale
        elif frag_duration and media_timescale:
            duration_ms = (frag_duration * 1000) // media_timescale
        else:
            duration_ms = 0
        return {
            "width": width,
            "height": height,
            "n_frames": count,
            "duration_ms": duration_ms,
            "timescale": timescale,
            "codec": codec,
            "handler": handler,
            "samples": bytes(out),
            # per-sample byte lengths, demux order — lets callers
            # split the concatenated samples without re-walking stsz
            "sample_sizes": sizes,
            # demux-order indices of the sync samples (stss for moov
            # samples; tfhd/trun/trex sample-flags for fragments; all
            # samples when neither is authored — the spec default).
            # The keyframe-sampling surface a video pipeline reads.
            "keyframe_indices": keyframes,
            # presentation timing (round 14, ISO 14496-12 8.6.1.2/
            # 8.6.1.3/8.6.6, all in MEDIA ticks, demux order): decode
            # stamps from stts (trun/tfhd durations for fragments),
            # composition stamps cts = dts + ctts/trun offset, and
            # presentation stamps pts = cts - elst media_time + the
            # leading empty-edit delay — what a frame-accurate video
            # pipeline must stamp rows with (B-frames make pts != dts
            # order; edits shift the whole timeline).
            "sample_dts": sample_dts,
            "sample_cts": sample_cts,
            "sample_pts": [
                c - elst_media_time + elst_empty_media for c in sample_cts
            ],
            "elst_media_time": elst_media_time,
            "elst_empty_media": elst_empty_media,
        }

    def mp4_decode_frames(data: bytes):
        """Sample payloads -> pixels needs an H.264 decoder: genuinely
        a native-lib boundary (pyav/ffmpeg, not in this environment).
        The container layer above it (mp4_probe) is fully supported."""
        mp4_probe(data)  # malformed containers still raise ValueError
        raise NotImplementedError(
            "mp4/h264 frame decode needs native codec libs (pyav) not "
            "present in this environment; mp4_probe covers the container"
        )

    def sniff_format(data: bytes) -> str | None:
        """Magic-byte format sniff; None when unknown."""
        if data[:8] == _PNG_SIG:
            return "png"
        if data[:2] == b"BM":
            return "bmp"
        if data[:6] in (b"GIF87a", b"GIF89a"):
            return "gif"
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return "wav"
        if data[:3] == b"\xff\xd8\xff":
            return "jpeg"
        if data[4:8] == b"ftyp":
            return "mp4"
        return None

    def decode_media(data: bytes) -> dict:
        """Sniff + decode. Images -> kind='image' with (width, height,
        channels, pixels, n_frames=1); audio -> kind='audio' with
        (width=n_channels, height=sample_rate, n_frames, samples).
        JPEG/MP4 (native-lib formats) raise NotImplementedError; other
        bytes raise ValueError."""
        fmt = sniff_format(data)
        if fmt == "png":
            d = png_decode(data)
            return {"kind": "image", "format": "png", "n_frames": 1, **d}
        if fmt == "bmp":
            d = bmp_decode(data)
            return {"kind": "image", "format": "bmp", "n_frames": 1, **d}
        if fmt == "gif":
            d = gif_decode(data)
            return {"kind": "image", "format": "gif", **d}
        if fmt == "jpeg":
            d = jpeg_decode(data)
            return {"kind": "image", "format": "jpeg", "n_frames": 1, **d}
        if fmt == "wav":
            d = wav_decode(data)
            return {
                "kind": "audio",
                "format": "wav",
                "width": d["n_channels"],
                "height": d["sample_rate"],
                "n_frames": d["n_frames"],
                "samples": d["samples"],
                "sample_width": d["sample_width"],
            }
        if fmt == "mp4":
            d = mp4_probe(data)
            # container metadata + demuxed sample bytes; PIXEL decode
            # (H.264) remains mp4_decode_frames' NotImplementedError
            return {
                "kind": "video",
                "format": "mp4",
                "width": d["width"],
                "height": d["height"],
                "n_frames": d["n_frames"],
                "duration_ms": d["duration_ms"],
                "codec": d["codec"],
                "samples": d["samples"],
            }
        raise ValueError("unrecognized media payload")

    return {
        "png_encode": png_encode,
        "png_decode": png_decode,
        "bmp_encode": bmp_encode,
        "bmp_decode": bmp_decode,
        "gif_encode": gif_encode,
        "gif_decode": gif_decode,
        "jpeg_encode": jpeg_encode,
        "jpeg_encode_progressive": jpeg_encode_progressive,
        "jpeg_decode": jpeg_decode,
        "wav_encode": wav_encode,
        "wav_decode": wav_decode,
        "mp4_encode_stub": mp4_encode_stub,
        "mp4_probe": mp4_probe,
        "mp4_decode_frames": mp4_decode_frames,
        "sniff_format": sniff_format,
        "decode_media": decode_media,
    }


_C = _build_codecs()
png_encode = _C["png_encode"]
png_decode = _C["png_decode"]
bmp_encode = _C["bmp_encode"]
bmp_decode = _C["bmp_decode"]
wav_encode = _C["wav_encode"]
wav_decode = _C["wav_decode"]
sniff_format = _C["sniff_format"]
decode_media = _C["decode_media"]
gif_encode = _C["gif_encode"]
gif_decode = _C["gif_decode"]
jpeg_encode = _C["jpeg_encode"]
jpeg_encode_progressive = _C["jpeg_encode_progressive"]
jpeg_decode = _C["jpeg_decode"]
mp4_encode_stub = _C["mp4_encode_stub"]
mp4_probe = _C["mp4_probe"]
mp4_decode_frames = _C["mp4_decode_frames"]
