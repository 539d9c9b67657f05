"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

``decode_headers`` is a REAL decoder: container-format header parsing
(PNG / JPEG / GIF / BMP / WAV / FLAC / WebP / ISO-BMFF / MP3) is pure
byte arithmetic — no codec library needed — and it is what a 100 TB
curation pass actually runs corpus-wide (full pixel decode happens after
filtering, on the surviving slice). ``decode_pixels`` and
``decode_samples`` are ALSO real for the codec-free formats: 24-bit BMP
and 8-bit PNG pixels (stdlib zlib + filter inversion) and PCM16 WAV
samples decode to exact integer statistics. Only the codec-bound
formats (JPEG entropy decode, compressed audio, video) remain behind
``decode_stub`` — with a codec lib present they drop into the identical
``mapInPandas`` shape.

Every decode helper is built by :func:`_build_decoders` and therefore a
``<locals>`` function: cloudpickle cannot resolve it by module+qualname,
so the ENTIRE kernel call graph ships BY VALUE inside each mapInPandas
closure. A driver whose executors do not have ``cassandra_diff_spark``
on their Python path (spark-submit without --py-files, a notebook that
sys.path-hacked only the driver) still runs these operators — the same
guarantee operators/similarity.py established in its PQ kernels
(similarity.py:865-880); ``tests/test_pixel_decode.py`` pins it with a
foreign-cwd subprocess run.

At 100 TB: payloads stay in columnar storage; decode runs as Arrow batches
with spark.sql.files.maxPartitionBytes sized so one batch of decoded
frames fits executor memory; feature outputs are small typed columns, so
the expensive bytes never shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the stub decoder — a real image decoder would produce
#: the same shape (dims + a small feature vector), just with real values
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, checksum bigint"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model an opaque binary column: payload = utf-8 bytes of the text
    (stand-in for image/audio bytes), plus typed metadata columns."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


def decode_stub(df: DataFrame) -> DataFrame:
    """STUB decoder over ``mapInPandas``: derives deterministic fake
    image dimensions + checksum from the raw bytes.

    Replace ``_fake_decode_batch`` with a real codec (e.g. PIL.Image.open
    on io.BytesIO) — the Arrow batch plumbing, schema, and partition
    behavior stay identical.
    """

    def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["payload"]
            n_bytes = raw.str.len().astype("int64")
            # deterministic fake "dimensions" — NOT a real decode
            checksum = raw.map(lambda b: sum(b[:64]) if len(b) else 0).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "width": (checksum % 640 + 1).astype("int32"),
                    "height": (n_bytes % 480 + 1).astype("int32"),
                    "checksum": checksum,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        _fake_decode_batch, schema=DECODE_SCHEMA
    )


#: output schema of the REAL header decoder; image formats fill
#: width/height, audio fills sample_rate/n_channels, timed containers
#: (ISO-BMFF) fill duration_ms, unknown fills none
HEADER_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, width int, height int, "
    "sample_rate int, n_channels int, duration_ms bigint, checksum bigint"
)


def _build_decoders():
    """Build the payload-decode kernel family as ``<locals>`` closures.

    cloudpickle serializes a module-level function by REFERENCE (import
    of its module), so a mapInPandas closure calling one only works when
    ``cassandra_diff_spark`` is importable inside the executor's Python
    worker. Functions defined here have qualname
    ``_build_decoders.<locals>.*`` — unresolvable by reference — so
    cloudpickle ships their bytecode, constants, and each other (via
    closure cells) BY VALUE with the task. The module-level aliases
    below this function keep the test-facing API unchanged.
    """

    def _unfilter_png_rows(raw: bytes, w: int, h: int, ch: int):
        """Invert PNG row filters (types 0-4, 8-bit samples): returns an
        (h, w*ch) uint8 matrix. Sequential by specification (each byte may
        reference the reconstructed byte to its left), so rows decode in a
        Python loop — fine for the thumbnail-scale images this pure-stdlib
        path exists for; a production pipeline drops a codec lib into the
        same plumbing."""
        import numpy as np

        stride = w * ch
        out = np.zeros((h, stride), dtype=np.uint8)
        pos = 0
        prev = np.zeros(stride, dtype=np.int32)
        for r in range(h):
            ftype = raw[pos]
            row = np.frombuffer(
                raw[pos + 1 : pos + 1 + stride], dtype=np.uint8
            ).astype(np.int32)
            pos += 1 + stride
            if ftype == 0:
                rec = row
            elif ftype == 2:  # up
                rec = (row + prev) & 0xFF
            else:  # sub / average / paeth reference the left byte: sequential
                rec = np.empty(stride, dtype=np.int32)
                for i in range(stride):
                    a = rec[i - ch] if i >= ch else 0
                    b_ = prev[i]
                    c = prev[i - ch] if i >= ch else 0
                    if ftype == 1:
                        rec[i] = (row[i] + a) & 0xFF
                    elif ftype == 3:
                        rec[i] = (row[i] + ((a + b_) >> 1)) & 0xFF
                    elif ftype == 4:
                        p = a + b_ - c
                        pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                        pr = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                        rec[i] = (row[i] + pr) & 0xFF
                    else:
                        raise ValueError(f"unsupported PNG filter {ftype}")
            out[r] = rec.astype(np.uint8)
            prev = rec
        return out

    def _pixel_matrix(b: bytes):
        """Decode a BMP/PNG payload to its raw pixel-byte matrix: returns
        ``(format, w, h, ch, mat)`` where ``mat`` is ``(h, w*ch)`` uint8 in
        top-down row order, or None for anything codec-bound (JPEG, video)
        or GIF (palette-indexed — summary stats only, via
        ``_decode_gif_pixels``)."""
        import zlib

        import numpy as np

        n = len(b)
        if n >= 34 and b[:2] == b"BM":
            off = int.from_bytes(b[10:14], "little")
            w = int.from_bytes(b[18:22], "little", signed=True)
            h_raw = int.from_bytes(b[22:26], "little", signed=True)
            bpp = int.from_bytes(b[28:30], "little")
            comp = int.from_bytes(b[30:34], "little")
            h = abs(h_raw)
            if bpp != 24 or comp != 0 or w <= 0 or h <= 0:
                return None
            stride = (3 * w + 3) // 4 * 4
            if off + stride * h > n:
                return None
            rows = [
                np.frombuffer(
                    b[off + r * stride : off + r * stride + 3 * w], dtype=np.uint8
                )
                for r in range(h)
            ]
            # positive height = bottom-up storage: the file's LAST row is
            # the image's top row
            mat = np.stack(rows[::-1] if h_raw > 0 else rows)
            return ("bmp", w, h, 3, mat)
        if n >= 33 and b[:8] == b"\x89PNG\r\n\x1a\n":
            w = int.from_bytes(b[16:20], "big")
            h = int.from_bytes(b[20:24], "big")
            depth, ctype, interlace = b[24], b[25], b[28]
            ch = {0: 1, 2: 3, 6: 4}.get(ctype)
            if depth != 8 or ch is None or interlace != 0 or w <= 0 or h <= 0:
                return None
            # concatenate IDAT chunk payloads
            idat = bytearray()
            i = 8
            while i + 8 <= n:
                size = int.from_bytes(b[i : i + 4], "big")
                tag = b[i + 4 : i + 8]
                if tag == b"IDAT":
                    idat += b[i + 8 : i + 8 + size]
                if tag == b"IEND":
                    break
                i += 12 + size  # length + tag + data + crc
            raw = zlib.decompress(bytes(idat))
            if len(raw) != h * (1 + w * ch):
                return None
            mat = _unfilter_png_rows(raw, w, h, ch)
            return ("png", w, h, ch, mat)
        return None

    def _parse_header(b: bytes):
        """(format, width, height, sample_rate, n_channels, duration_ms) from
        container magic + header bytes — pure byte arithmetic, no codec
        involved."""
        n = len(b)
        if n >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
            # IHDR is always the first chunk: big-endian u32 dims at 16/20
            return (
                "png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
                None,
                None,
                None,
            )
        if n >= 4 and b[:2] == b"\xff\xd8":
            # scan segments for a start-of-frame marker (C0-CF minus C4/C8/CC):
            # height/width are big-endian u16 at +5/+7 inside the segment
            i = 2
            while i + 9 <= n:
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return (
                        "jpeg",
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                        None,
                        None,
                        None,
                    )
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                i += 2 + seg_len
            return ("jpeg", None, None, None, None, None)
        if n >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
            # logical screen dims: little-endian u16 at 6/8
            return (
                "gif",
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
                None,
                None,
                None,
            )
        if n >= 26 and b[:2] == b"BM":
            # BITMAPINFOHEADER: signed little-endian i32 at 18/22 (height may
            # be negative = top-down; report magnitude)
            return (
                "bmp",
                int.from_bytes(b[18:22], "little", signed=True),
                abs(int.from_bytes(b[22:26], "little", signed=True)),
                None,
                None,
                None,
            )
        if n >= 28 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            # fmt chunk in canonical position: channels u16 at 22, rate u32 at 24
            return (
                "wav",
                None,
                None,
                int.from_bytes(b[24:28], "little"),
                int.from_bytes(b[22:24], "little"),
                None,
            )
        if n >= 16 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            # VP8X extended header: canvas dims as 24-bit LE minus-one fields
            if n >= 30 and b[12:16] == b"VP8X":
                return (
                    "webp",
                    int.from_bytes(b[24:27], "little") + 1,
                    int.from_bytes(b[27:30], "little") + 1,
                    None,
                    None,
                    None,
                )
            return ("webp", None, None, None, None, None)
        if n >= 21 and b[:4] == b"fLaC":
            # STREAMINFO is the mandatory first metadata block (starts at
            # byte 8: 4 magic + 1 type + 3 length): 20-bit sample rate then
            # 3-bit channels-1 packed at block bytes 10-12
            si = b[8:]
            sr = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            ch = ((si[12] >> 1) & 0x07) + 1
            return ("flac", None, None, sr, ch, None)
        # MPEG audio (mp3): optional ID3v2 tag (10-byte header, syncsafe
        # 28-bit size) then a frame sync 0xFF Ex; version/layer/sample-rate
        # index/channel mode are bit-packed in header bytes 1-3
        mp3_i = 0
        if n >= 10 and b[:3] == b"ID3":
            mp3_i = 10 + (
                ((b[6] & 0x7F) << 21)
                | ((b[7] & 0x7F) << 14)
                | ((b[8] & 0x7F) << 7)
                | (b[9] & 0x7F)
            )
        if (
            mp3_i + 4 <= n
            and b[mp3_i] == 0xFF
            and (b[mp3_i + 1] & 0xE0) == 0xE0
            and b[:2] != b"\xff\xd8"
        ):
            ver = (b[mp3_i + 1] >> 3) & 0x03  # 0=MPEG2.5, 2=MPEG2, 3=MPEG1
            layer = (b[mp3_i + 1] >> 1) & 0x03  # 0 reserved
            sr_idx = (b[mp3_i + 2] >> 2) & 0x03
            if ver != 1 and layer != 0 and sr_idx != 3:
                rates = {
                    3: (44100, 48000, 32000),
                    2: (22050, 24000, 16000),
                    0: (11025, 12000, 8000),
                }[ver]
                mode = (b[mp3_i + 3] >> 6) & 0x03
                return (
                    "mp3",
                    None,
                    None,
                    rates[sr_idx],
                    1 if mode == 3 else 2,
                    None,
                )
        if n >= 12 and b[4:8] == b"ftyp":
            # ISO-BMFF (mp4/mov/m4a): walk top-level boxes to moov, then its
            # children to mvhd (version 0: u32 timescale at box+20, u32
            # duration at box+24); duration_ms = duration * 1000 / timescale
            dur_ms = None
            i = 0
            while i + 8 <= n:
                size = int.from_bytes(b[i : i + 4], "big")
                if size < 8:
                    break
                if b[i + 4 : i + 8] == b"moov":
                    j, end = i + 8, min(i + size, n)
                    while j + 8 <= end:
                        csize = int.from_bytes(b[j : j + 4], "big")
                        if csize < 8:
                            break
                        if (
                            b[j + 4 : j + 8] == b"mvhd"
                            and j + 28 <= n
                            and b[j + 8] == 0
                        ):
                            ts = int.from_bytes(b[j + 20 : j + 24], "big")
                            dur = int.from_bytes(b[j + 24 : j + 28], "big")
                            if ts:
                                dur_ms = dur * 1000 // ts
                            break
                        j += csize
                    break
                i += size
            return ("mp4", None, None, None, None, dur_ms)
        return ("unknown", None, None, None, None, None)

    def _lzw_decode_gif(data: bytes, min_code_size: int, max_pixels: int):
        """GIF-variant LZW decode: variable-width codes LSB-first, CLEAR
        resets the table, width grows when the next entry would not fit
        (cap 12 bits). Returns the palette-index list or raises on a
        malformed stream."""
        clear = 1 << min_code_size
        eoi = clear + 1
        width = min_code_size + 1
        table: list = [bytes([c]) for c in range(clear)] + [b"", b""]
        out = bytearray()
        prev = None
        acc = 0
        nbits = 0
        for byte in data:
            acc |= byte << nbits
            nbits += 8
            while nbits >= width:
                code = acc & ((1 << width) - 1)
                acc >>= width
                nbits -= width
                if code == clear:
                    table = [bytes([c]) for c in range(clear)] + [b"", b""]
                    width = min_code_size + 1
                    prev = None
                    continue
                if code == eoi:
                    return list(out)
                if prev is None:
                    if code >= len(table):
                        raise ValueError("LZW: first code out of range")
                    entry = table[code]
                elif code < len(table):
                    entry = table[code]
                    table.append(prev + entry[:1])
                elif code == len(table):
                    entry = prev + prev[:1]
                    table.append(entry)
                else:
                    raise ValueError("LZW: code beyond table")
                out += entry
                if len(out) > max_pixels:
                    raise ValueError("LZW: more pixels than the frame holds")
                prev = entry
                if len(table) == (1 << width) and width < 12:
                    width += 1
        return list(out)

    def _decode_gif_pixels(b: bytes):
        """REAL GIF pixel decode — pure-Python LZW plus global-color-table
        mapping (the third codec-free image format). Non-interlaced, global
        palette only; returns the same stats tuple as the BMP/PNG decoders
        with pixel bytes being the palette-mapped RGB values."""
        import numpy as np

        n = len(b)
        if not (n >= 13 and b[:6] in (b"GIF87a", b"GIF89a")):
            return None
        flags = b[10]
        if not flags & 0x80:
            return None  # no global color table: nothing to map through
        gct_n = 2 << (flags & 0x07)
        i = 13
        palette = np.frombuffer(b[i : i + 3 * gct_n], dtype=np.uint8).reshape(
            gct_n, 3
        )
        i += 3 * gct_n
        while i < n:
            block = b[i]
            if block == 0x21:  # extension: label + sub-blocks
                i += 2
                while i < n and b[i]:
                    i += 1 + b[i]
                i += 1
            elif block == 0x2C:  # image descriptor
                w = int.from_bytes(b[i + 5 : i + 7], "little")
                h = int.from_bytes(b[i + 7 : i + 9], "little")
                iflags = b[i + 9]
                i += 10
                if iflags & 0x80:  # local color table
                    i += 3 * (2 << (iflags & 0x07))
                if iflags & 0x40:  # interlaced: row reorder not implemented
                    return None
                min_code = b[i]
                i += 1
                data = bytearray()
                while i < n and b[i]:
                    size = b[i]
                    data += b[i + 1 : i + 1 + size]
                    i += 1 + size
                i += 1
                idx = _lzw_decode_gif(bytes(data), min_code, w * h)
                if len(idx) < w * h:
                    return None
                pix = palette[np.array(idx[: w * h], dtype=np.int64)]
                return (
                    "gif", w, h, 3, w * h,
                    int(pix.sum(dtype=np.int64)), int(pix[0, 0]),
                )
            elif block == 0x3B:
                break
            else:
                return None
        return None

    def _decode_pixels(b: bytes):
        """REAL pixel decode for the codec-free formats: 24-bit uncompressed
        BMP (stride padding skipped, bottom-up order honored), 8-bit
        non-interlaced gray/RGB/RGBA PNG (stdlib zlib + filter inversion),
        and palette-indexed GIF (LZW). Returns (format, width, height,
        n_channels, n_pix, pix_sum, first_pixel) with EXACT integer
        pixel-byte sums, or None when the payload needs a codec this
        sandbox does not have (JPEG, video)."""
        import numpy as np

        if len(b) >= 13 and b[:6] in (b"GIF87a", b"GIF89a"):
            return _decode_gif_pixels(b)
        r = _pixel_matrix(b)
        if r is None:
            return None
        fmt, w, h, ch, mat = r
        return (fmt, w, h, ch, w * h, int(mat.sum(dtype=np.int64)), int(mat[0, 0]))

    def _ahash(b: bytes, grid: int = 8):
        """Average-hash image fingerprint from the REAL pixel matrix:
        grayscale (channel sum — exact integers, no float), block-mean
        downsample to a ``min(grid,w) x min(grid,h)`` cell grid, one bit
        per cell set iff the cell mean EXCEEDS the global mean (compared by
        integer cross-multiplication ``cell_sum * n_total > total_sum *
        cell_count`` — no division, no ties-by-epsilon). Invariant under
        uniform brightness shifts and identical across formats carrying the
        same pixels (a PNG and BMP of one image hash equal). Returns
        ``(format, w, h, hex16)`` or None for undecodable payloads."""
        import numpy as np

        r = _pixel_matrix(b)
        if r is None:
            return None
        fmt, w, h, ch, mat = r
        px = mat.reshape(h, w, ch).astype(np.int64)
        if ch == 4:
            px = px[:, :, :3]  # alpha is not luminance
        gray = px.sum(axis=2)  # (h, w) exact integer luminance proxy
        gw, gh = min(grid, w), min(grid, h)
        bx = (np.arange(w) * gw) // w
        by = (np.arange(h) * gh) // h
        cell_sum = np.zeros((gh, gw), dtype=np.int64)
        cell_cnt = np.zeros((gh, gw), dtype=np.int64)
        np.add.at(cell_sum, (by[:, None], bx[None, :]), gray)
        np.add.at(cell_cnt, (by[:, None], bx[None, :]), 1)
        total_sum = int(gray.sum())
        n_total = w * h
        bits = (cell_sum * n_total) > (total_sum * cell_cnt)
        val = 0
        for i, bit in enumerate(bits.ravel()):  # row-major from top-left
            if bit:
                val |= 1 << i
        return (fmt, w, h, f"{val:016x}")

    def _dhash(b: bytes, grid: int = 8):
        """Difference-hash (gradient) image fingerprint from the REAL pixel
        matrix: grayscale (channel sum — exact integers), block-mean
        downsample to ``(min(grid,h) x min(grid+1, w))`` cells, one bit per
        HORIZONTALLY ADJACENT cell pair set iff the right cell's mean
        exceeds the left's (integer cross-multiplication ``sum_r * cnt_l >
        sum_l * cnt_r`` — no division). Gradient bits survive uniform
        brightness AND contrast curves that move the global mean — the
        edits :func:`_ahash` is blind to — so the two hashes band
        complementary near-dup families. Bit (y, x) is ``1 << (y*gw + x)``,
        row-major from top-left; w == 1 images have no horizontal pairs and
        hash to 0. Returns ``(format, w, h, hex16)`` or None."""
        import numpy as np

        r = _pixel_matrix(b)
        if r is None:
            return None
        fmt, w, h, ch, mat = r
        px = mat.reshape(h, w, ch).astype(np.int64)
        if ch == 4:
            px = px[:, :, :3]  # alpha is not luminance
        gray = px.sum(axis=2)  # (h, w) exact integer luminance proxy
        gw = min(grid, w - 1)  # pairs need gw+1 columns
        gh = min(grid, h)
        val = 0
        if gw > 0:
            bx = (np.arange(w) * (gw + 1)) // w
            by = (np.arange(h) * gh) // h
            cell_sum = np.zeros((gh, gw + 1), dtype=np.int64)
            cell_cnt = np.zeros((gh, gw + 1), dtype=np.int64)
            np.add.at(cell_sum, (by[:, None], bx[None, :]), gray)
            np.add.at(cell_cnt, (by[:, None], bx[None, :]), 1)
            bits = (
                cell_sum[:, 1:] * cell_cnt[:, :-1]
                > cell_sum[:, :-1] * cell_cnt[:, 1:]
            )
            for i, bit in enumerate(bits.ravel()):  # row-major from top-left
                if bit:
                    val |= 1 << i
        return (fmt, w, h, f"{val:016x}")

    def _decode_samples(b: bytes):
        """REAL audio sample decode for PCM16 WAV: walk the RIFF chunks to
        ``fmt `` (PCM, 16-bit) and ``data``, read little-endian int16
        samples. Returns (format, sample_rate, n_channels, n_samples,
        sample_sum, peak) with exact integer sums, or None."""
        import numpy as np

        n = len(b)
        if not (n >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
            return None
        i = 12
        rate = chans = bits = fmt_code = None
        data = None
        while i + 8 <= n:
            tag = b[i : i + 4]
            size = int.from_bytes(b[i + 4 : i + 8], "little")
            body = b[i + 8 : i + 8 + size]
            if tag == b"fmt ":
                fmt_code = int.from_bytes(body[0:2], "little")
                chans = int.from_bytes(body[2:4], "little")
                rate = int.from_bytes(body[4:8], "little")
                bits = int.from_bytes(body[14:16], "little")
            elif tag == b"data":
                data = body
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt_code != 1 or bits != 16 or data is None:
            return None
        samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        s64 = samples.astype(np.int64)
        return (
            "wav",
            rate,
            chans,
            len(samples),
            int(samples.sum(dtype=np.int64)),
            int(np.abs(s64).max()) if len(samples) else 0,
            # exact energy: RMS/loudness derive from this without ever
            # summing floats (max square 2^30, safe to ~2^33 samples)
            int((s64 * s64).sum()),
        )

    return {
        "unfilter_png_rows": _unfilter_png_rows,
        "pixel_matrix": _pixel_matrix,
        "parse_header": _parse_header,
        "lzw_decode_gif": _lzw_decode_gif,
        "decode_gif_pixels": _decode_gif_pixels,
        "decode_pixels": _decode_pixels,
        "ahash": _ahash,
        "dhash": _dhash,
        "decode_samples": _decode_samples,
    }


_DECODERS = _build_decoders()
# Module-level aliases for tests and direct callers; still ``<locals>``
# function objects, so referencing one from a task closure keeps
# ship-by-value semantics.
_unfilter_png_rows = _DECODERS["unfilter_png_rows"]
_pixel_matrix = _DECODERS["pixel_matrix"]
_parse_header = _DECODERS["parse_header"]
_lzw_decode_gif = _DECODERS["lzw_decode_gif"]
_decode_gif_pixels = _DECODERS["decode_gif_pixels"]
_decode_pixels = _DECODERS["decode_pixels"]
_ahash = _DECODERS["ahash"]
_dhash = _DECODERS["dhash"]
_decode_samples = _DECODERS["decode_samples"]


def decode_headers(df: DataFrame) -> DataFrame:
    """REAL multimodal decode stage: parse container headers of a binary
    ``payload`` column into typed metadata — format, image dimensions,
    audio sample rate/channels — plus a crc32 payload checksum.

    Arrow-batched ``mapInPandas`` over (doc_id, payload): bytes never
    leave their scan partition, output is a narrow typed frame. This is
    the corpus-wide pass of a multimodal pipeline (cheap, every row); a
    full pixel/sample decode (PIL/ffmpeg) runs after filtering and drops
    into the identical plumbing (see ``decode_stub``)."""
    from typing import Iterator as _It

    header_kernel = _parse_header  # closure capture: ships by value

    def parse(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import zlib

        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(raw) if raw is not None else b""
                fmt, w, h, sr, ch, dur = header_kernel(b)
                rows.append(
                    (
                        int(doc_id),
                        len(b),
                        fmt,
                        w,
                        h,
                        sr,
                        ch,
                        dur,
                        zlib.crc32(b),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "format",
                    "width",
                    "height",
                    "sample_rate",
                    "n_channels",
                    "duration_ms",
                    "checksum",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(parse, schema=HEADER_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """STUB frame sampler: explodes one row per sampled "frame" offset —
    the plumbing shape of video frame-sampling (explode + per-frame
    features) without a codec."""
    return (
        df.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.expr(f"CAST((n_bytes - 1) DIV {every_n_bytes} AS INT)"),
                        F.lit(0),
                    ),
                )
            ).alias("frame_no"),
            "n_bytes",
        )
        .withColumn("frame_offset", (F.col("frame_no") * every_n_bytes).cast("long"))
        .select("doc_id", F.col("frame_no").cast("long").alias("frame_no"), "frame_offset")
    )


AHASH_SCHEMA = (
    "doc_id bigint, format string, width int, height int, ahash string"
)


def image_ahash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual image fingerprints over (doc_id, payload): the
    average-hash of the REAL decoded pixels (:func:`_ahash`), emitted
    as a 16-hex-char string key. Exact-match grouping on ``ahash`` is
    the image-level dedup (uniform brightness shifts and format
    conversions of one image collide by construction); Hamming-banded
    near-dup joins compose via the simhash band machinery
    (operators/dedup.py) with ``ahash`` as the sketch. Same Arrow
    mapInPandas plumbing as ``decode_pixels``; codec-bound payloads
    (JPEG, video) and GIF yield null hashes."""
    kern = _ahash

    return _hash_frame(
        df, lambda b: kern(b, grid=grid), "ahash", AHASH_SCHEMA
    )


DHASH_SCHEMA = (
    "doc_id bigint, format string, width int, height int, dhash string"
)


def _hash_frame(df: DataFrame, kernel, out_col: str, schema: str) -> DataFrame:
    """Shared mapInPandas plumbing for the perceptual-hash family: apply
    a ``bytes -> (format, w, h, hex16) | None`` kernel per payload
    (null payload / undecodable -> null columns). One place to fix
    payload handling for every hash."""

    def parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(raw) if raw is not None else b""
                r = kernel(b)
                rows.append((int(doc_id),) + (r if r else (None,) * 4))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "format", "width", "height", out_col],
            )

    return df.select("doc_id", "payload").mapInPandas(parse, schema=schema)


def image_dhash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Gradient-hash fingerprints over (doc_id, payload): the
    difference-hash of the REAL decoded pixels (:func:`_dhash`) as a
    16-hex-char key — the complementary sketch to :func:`image_ahash`
    (dhash catches brightness-curve edits that preserve each cell's
    relation to the global mean; ahash catches gradient-free washes).
    Same Arrow mapInPandas plumbing; Hamming-banded near-dup joins
    compose via the simhash band machinery with ``dhash`` as the
    sketch. Codec-bound payloads (JPEG, video) yield null hashes."""
    kern = _dhash

    return _hash_frame(
        df, lambda b: kern(b, grid=grid), "dhash", DHASH_SCHEMA
    )


PIXEL_SCHEMA = (
    "doc_id bigint, format string, width int, height int, n_channels int, "
    "n_pix bigint, pix_sum bigint, first_pixel int"
)

SAMPLE_SCHEMA = (
    "doc_id bigint, format string, sample_rate int, n_channels int, "
    "n_samples bigint, sample_sum bigint, peak int, sq_sum bigint"
)


def decode_pixels(df: DataFrame) -> DataFrame:
    """REAL pixel decode over (doc_id, payload) for the formats that
    need no codec — 24-bit BMP and 8-bit PNG (stdlib zlib) — emitting
    EXACT integer pixel statistics; codec-bound payloads (JPEG, video)
    yield nulls, honestly. Same Arrow plumbing as ``decode_headers``;
    the full-codec decode drops into this exact shape."""
    kern = _decode_pixels  # closure capture: ships by value

    def parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(raw) if raw is not None else b""
                r = kern(b)
                rows.append(
                    (int(doc_id),) + (r if r else (None,) * 7)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "width", "height", "n_channels",
                    "n_pix", "pix_sum", "first_pixel",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(parse, schema=PIXEL_SCHEMA)


def decode_samples(df: DataFrame) -> DataFrame:
    """REAL audio sample decode over (doc_id, payload) for PCM16 WAV —
    exact integer sample statistics; compressed audio yields nulls."""
    kern = _decode_samples  # closure capture: ships by value

    def parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(raw) if raw is not None else b""
                r = kern(b)
                rows.append((int(doc_id),) + (r if r else (None,) * 7))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "sample_rate", "n_channels",
                    "n_samples", "sample_sum", "peak", "sq_sum",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(parse, schema=SAMPLE_SCHEMA)
