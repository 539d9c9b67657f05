"""REAL pixel/sample decode (operators/multimodal.py decode_pixels /
decode_samples): genuine BMP/PNG/WAV files with known contents."""

import struct
import zlib

import numpy as np
import pytest

from cassandra_diff_spark.operators.multimodal import (
    _decode_pixels,
    _decode_samples,
    decode_pixels,
    decode_samples,
)


def make_bmp(pix: np.ndarray, bottom_up: bool = True) -> bytes:
    """24-bit uncompressed BMP from an (h, w, 3) uint8 array."""
    h, w, _ = pix.shape
    stride = (3 * w + 3) // 4 * 4
    rows = pix[::-1] if bottom_up else pix
    body = b"".join(
        rows[r].tobytes() + b"\xaa" * (stride - 3 * w) for r in range(h)
    )
    off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, h if bottom_up else -h, 1, 24, 0, len(body), 0, 0, 0, 0,
        )
    )
    return header + body


def make_png(pix: np.ndarray, filters) -> bytes:
    """8-bit PNG from an (h, w, ch) uint8 array, applying the given
    per-row filter types FORWARD (the decoder must invert them)."""
    h, w, ch = pix.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        row = pix[r].reshape(-1).astype(np.int32)
        f = filters[r % len(filters)]
        enc = np.empty(w * ch, dtype=np.int32)
        for i in range(w * ch):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                enc[i] = row[i]
            elif f == 1:
                enc[i] = (row[i] - a) & 0xFF
            elif f == 2:
                enc[i] = (row[i] - b) & 0xFF
            elif f == 3:
                enc[i] = (row[i] - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (row[i] - pr) & 0xFF
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prev = row

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def make_wav(samples: np.ndarray, rate: int = 16000, ch: int = 1) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


class TestKernels:
    def test_bmp_padding_and_bottom_up(self):
        rng = np.random.RandomState(7)
        pix = rng.randint(0, 256, (3, 5, 3), dtype=np.uint8)  # stride pad 1
        for bottom_up in (True, False):
            r = _decode_pixels(make_bmp(pix, bottom_up))
            assert r == (
                "bmp", 5, 3, 3, 15, int(pix.sum()), int(pix[0, 0, 0])
            ), bottom_up

    @pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
    @pytest.mark.parametrize("ch", [1, 3, 4])
    def test_png_all_filters_roundtrip(self, filters, ch):
        rng = np.random.RandomState(ch * 10 + filters[0])
        pix = rng.randint(0, 256, (6, 4, ch), dtype=np.uint8)
        r = _decode_pixels(make_png(pix, filters))
        assert r == (
            "png", 4, 6, ch, 24, int(pix.sum()), int(pix[0, 0, 0])
        ), (filters, ch)

    def test_wav_pcm16(self):
        s = np.array([0, 100, -100, 32767, -32768, 5], dtype=np.int16)
        r = _decode_samples(make_wav(s, rate=22050, ch=2))
        s64 = s.astype(np.int64)
        assert r == (
            "wav", 22050, 2, 6, int(s64.sum()), 32768, int((s64 * s64).sum())
        )

    def test_codec_bound_payloads_yield_none(self):
        assert _decode_pixels(b"\xff\xd8\xff\xe0JFIF") is None  # jpeg
        assert _decode_samples(b"fLaC" + b"\x00" * 40) is None


class TestSparkDecode:
    def test_decode_pixels_frame(self, spark):
        rng = np.random.RandomState(1)
        rows = []
        for i in range(8):
            pix = rng.randint(0, 256, (2 + i % 3, 3 + i % 2, 3), dtype=np.uint8)
            payload = make_bmp(pix) if i % 2 else make_png(pix, [i % 5])
            rows.append((i, bytearray(payload), int(pix.sum()), int(pix[0, 0, 0])))
        df = spark.createDataFrame(
            [(r[0], bytes(r[1])) for r in rows], "doc_id long, payload binary"
        )
        got = {r.doc_id: r for r in decode_pixels(df).collect()}
        for i, _, psum, first in rows:
            assert got[i].pix_sum == psum and got[i].first_pixel == first

    def test_decode_samples_frame(self, spark):
        s = np.arange(-500, 500, dtype=np.int16)
        df = spark.createDataFrame(
            [(1, bytes(make_wav(s)))], "doc_id long, payload binary"
        )
        r = decode_samples(df).first()
        assert r.n_samples == 1000 and r.sample_sum == int(s.astype(np.int64).sum())
        assert r.peak == 500 and r.sample_rate == 16000


# ------------------------------------------------------------- GIF / LZW

def pack_codes(codes_widths) -> bytes:
    """LSB-first variable-width bit packing, the GIF LZW layout."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_widths:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(indexes, palette: np.ndarray, w: int, h: int,
             min_code: int = 8, clear_every=None) -> bytes:
    """GIF89a with a literal-code LZW stream: each pixel emitted as its
    own code, tracking the DECODER's table size so code widths grow at
    exactly the right moments (plus optional mid-stream CLEARs)."""
    gct_bits = max(1, int(np.ceil(np.log2(len(palette)))))
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes = []
    width = min_code + 1
    size = clear + 2
    prev = False
    codes.append((clear, width))
    for j, px in enumerate(indexes):
        if clear_every and j and j % clear_every == 0:
            codes.append((clear, width))
            width, size, prev = min_code + 1, clear + 2, False
        codes.append((int(px), width))
        if prev:
            size += 1
            if size == (1 << width) and width < 12:
                width += 1
        prev = True
    codes.append((eoi, width))
    stream = pack_codes(codes)
    subs = b"".join(
        bytes([len(stream[i : i + 255])]) + stream[i : i + 255]
        for i in range(0, len(stream), 255)
    ) + b"\x00"
    pal = palette.astype(np.uint8).tobytes()
    pal += b"\x00" * (3 * (1 << gct_bits) - len(pal))
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
        + pal
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
        + subs
        + b"\x3b"
    )


class TestGifDecode:
    def test_literal_stream_with_width_growth(self):
        """600 pixels at min_code 8: the decoder's table passes 512, so
        codes widen 9 -> 10 bits mid-stream — the encoder tracks it."""
        rng = np.random.RandomState(3)
        palette = rng.randint(0, 256, (256, 3), dtype=np.uint8)
        w, h = 30, 20
        idx = rng.randint(0, 256, w * h)
        r = _decode_pixels(make_gif(idx, palette, w, h))
        pix = palette[idx]
        assert r == ("gif", w, h, 3, w * h, int(pix.sum()), int(pix[0, 0]))

    def test_mid_stream_clear_resets_table(self):
        rng = np.random.RandomState(4)
        palette = rng.randint(0, 256, (256, 3), dtype=np.uint8)
        w, h = 25, 16
        idx = rng.randint(0, 256, w * h)
        r = _decode_pixels(make_gif(idx, palette, w, h, clear_every=97))
        pix = palette[idx]
        assert r == ("gif", w, h, 3, w * h, int(pix.sum()), int(pix[0, 0]))

    def test_compressed_codes_and_code_equals_next(self):
        """Handcrafted stream exercising dict references and the
        code==next-entry special case: codes [CLEAR,1,6,2,EOI] at
        min_code 2 decode to pixels [1,1,1,2]."""
        palette = np.array(
            [[10, 0, 0], [20, 1, 2], [30, 3, 4], [40, 5, 6]], dtype=np.uint8
        )
        # widths: after CLEAR the decoder reads 3-bit codes; the table
        # reaches 8 entries after code 2, so EOI is read at 4 bits
        stream = pack_codes([(4, 3), (1, 3), (6, 3), (2, 3), (5, 4)])
        gif = (
            b"GIF89a"
            + struct.pack("<HHBBB", 4, 1, 0x80 | 1, 0, 0)
            + palette.tobytes()
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 1, 0)
            + bytes([2])
            + bytes([len(stream)]) + stream + b"\x00"
            + b"\x3b"
        )
        r = _decode_pixels(gif)
        pix = palette[np.array([1, 1, 1, 2])]
        assert r == ("gif", 4, 1, 3, 4, int(pix.sum()), int(pix[0, 0]))

    def test_interlaced_rejected(self):
        palette = np.zeros((4, 3), dtype=np.uint8)
        g = bytearray(make_gif(np.zeros(4, dtype=int), palette, 4, 1, min_code=2))
        # set the interlace flag in the image descriptor
        idesc = g.index(0x2C, 13)
        g[idesc + 9] |= 0x40
        assert _decode_pixels(bytes(g)) is None


# ------------------------------------------------------------- average hash

class TestAhash:
    def test_cross_format_and_brightness_invariance(self):
        from cassandra_diff_spark.operators.multimodal import _ahash

        rng = np.random.RandomState(7)
        pix = rng.randint(30, 200, (16, 16, 3), dtype=np.uint8)
        fmt_b, w, h, hash_bmp = _ahash(make_bmp(pix))
        fmt_p, _, _, hash_png = _ahash(make_png(pix, [0, 2, 4]))
        assert (fmt_b, fmt_p) == ("bmp", "png") and (w, h) == (16, 16)
        # same pixels, different container -> identical fingerprint
        assert hash_bmp == hash_png
        # uniform brightness shift preserves every above-mean bit
        assert _ahash(make_bmp(pix + 20))[3] == hash_bmp
        # a different image does not collide
        other = rng.randint(30, 200, (16, 16, 3), dtype=np.uint8)
        assert _ahash(make_bmp(other))[3] != hash_bmp

    def test_alpha_excluded_and_small_images(self):
        from cassandra_diff_spark.operators.multimodal import _ahash

        rng = np.random.RandomState(9)
        rgb = rng.randint(0, 255, (12, 12, 3), dtype=np.uint8)
        rgba = np.dstack([rgb, rng.randint(0, 255, (12, 12), dtype=np.uint8)])
        # alpha channel noise must not perturb the luminance hash
        assert (
            _ahash(make_png(rgba, [0]))[3] == _ahash(make_png(rgb, [0]))[3]
        )
        # flat image -> no cell exceeds the mean -> all-zero hash
        flat = np.full((4, 4, 3), 77, dtype=np.uint8)
        assert _ahash(make_bmp(flat))[3] == "0" * 16
        # codec-bound payloads stay undecodable
        assert _ahash(b"\xff\xd8\xff\xe0JFIF") is None

    def test_frame_dedup_groups(self, spark):
        from cassandra_diff_spark.operators.multimodal import image_ahash

        rng = np.random.RandomState(3)
        a = rng.randint(20, 220, (8, 8, 3), dtype=np.uint8)
        b = rng.randint(20, 220, (8, 8, 3), dtype=np.uint8)
        rows = [
            (1, bytes(make_bmp(a))),
            (2, bytes(make_png(a, [1]))),     # same image, other format
            (3, bytes(make_bmp((a + 10)))),   # brightness-shifted near-dup
            (4, bytes(make_bmp(b))),          # different image
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: r.ahash for r in image_ahash(df).collect()}
        assert got[1] == got[2] == got[3]
        assert got[4] != got[1]


class TestDhash:
    def test_reference_bits_and_cross_format(self):
        from cassandra_diff_spark.operators.multimodal import _dhash

        rng = np.random.RandomState(11)
        pix = rng.randint(10, 240, (16, 16, 3), dtype=np.uint8)
        fmt_b, w, h, hash_bmp = _dhash(make_bmp(pix))
        assert (fmt_b, w, h) == ("bmp", 16, 16)
        # independent reference: 8x9 block means, right-vs-left compare
        gray = pix.astype(np.int64).sum(axis=2)
        bx = (np.arange(16) * 9) // 16
        by = (np.arange(16) * 8) // 16
        s = np.zeros((8, 9), dtype=np.int64)
        c = np.zeros((8, 9), dtype=np.int64)
        np.add.at(s, (by[:, None], bx[None, :]), gray)
        np.add.at(c, (by[:, None], bx[None, :]), 1)
        want = 0
        for i, bit in enumerate(
            (s[:, 1:] * c[:, :-1] > s[:, :-1] * c[:, 1:]).ravel()
        ):
            if bit:
                want |= 1 << i
        assert hash_bmp == f"{want:016x}"
        # same pixels, other container -> identical fingerprint
        assert _dhash(make_png(pix, [0, 3, 1]))[3] == hash_bmp

    def test_gradient_survives_contrast_curve(self):
        from cassandra_diff_spark.operators.multimodal import _ahash, _dhash

        # a strictly monotone value remap (40->40, 90->90, 200->110)
        # preserves every gradient comparison, so dhash is identical —
        # but it moves the global mean below the middle band, so the
        # above-mean cell set (ahash) changes: the complementarity claim
        def img(top):
            cols = np.array([40] * 5 + [90] * 5 + [top] * 6, dtype=np.uint8)
            return np.tile(cols[None, :, None], (16, 1, 3))

        assert _dhash(make_bmp(img(200)))[3] == _dhash(make_bmp(img(110)))[3]
        assert _ahash(make_bmp(img(200)))[3] != _ahash(make_bmp(img(110)))[3]

    def test_degenerate_widths(self):
        from cassandra_diff_spark.operators.multimodal import _dhash

        # w == 1: no horizontal pairs -> all-zero hash
        col = np.arange(12, dtype=np.uint8).reshape(4, 1, 3)
        assert _dhash(make_bmp(col))[3] == "0" * 16
        # flat image: no strict inequality anywhere -> all-zero hash
        flat = np.full((6, 6, 3), 133, dtype=np.uint8)
        assert _dhash(make_bmp(flat))[3] == "0" * 16
        # codec-bound payloads stay undecodable
        assert _dhash(b"\xff\xd8\xff\xe0JFIF") is None

    def test_image_dhash_frame(self, spark):
        from cassandra_diff_spark.operators.multimodal import image_dhash

        rng = np.random.RandomState(5)
        a = rng.randint(20, 220, (8, 8, 3), dtype=np.uint8)
        rows = [
            (1, bytes(make_bmp(a))),
            (2, bytes(make_png(a, [2]))),  # same image, other format
            (3, None),                     # null payload -> null hash
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: r.dhash for r in image_dhash(df).collect()}
        assert got[1] == got[2] and got[1] is not None
        assert got[3] is None


class TestShipByValue:
    """The r7 verdict's multimodal landmine: mapInPandas kernels that
    reference MODULE-LEVEL helpers ship those helpers by REFERENCE
    (an import of cassandra_diff_spark on the executor), so they break
    the moment the worker's Python path lacks the repo. After the
    _build_decoders() restructuring every kernel is a ``<locals>``
    closure and cloudpickle ships the full call graph by value."""

    def test_kernels_unpickle_without_module(self, tmp_path):
        """Dump every kernel with cloudpickle here, then load AND RUN it
        in a subprocess that cannot import cassandra_diff_spark — the
        exact situation of an executor Python worker without the repo on
        its path. By-reference pickling fails the load; by-value passes."""
        import subprocess
        import sys

        import cloudpickle

        from cassandra_diff_spark.operators import multimodal as mm

        for fn in mm._DECODERS.values():
            assert "<locals>" in fn.__qualname__
        blob = tmp_path / "kernels.pkl"
        blob.write_bytes(cloudpickle.dumps(mm._DECODERS))
        runner = tmp_path / "load.py"
        runner.write_text(
            "import pickle, sys\n"
            "assert not any('cassandra_diff_spark' in m for m in sys.modules)\n"
            f"ks = pickle.load(open({str(blob)!r}, 'rb'))\n"
            "assert 'cassandra_diff_spark' not in sys.modules, 'by-reference'\n"
            "hdr = ks['parse_header'](b'GIF89a\\x08\\x00\\x04\\x00')\n"
            "assert hdr[:3] == ('gif', 8, 4), hdr\n"
            "assert ks['decode_pixels'](b'not an image') is None\n"
            "print('KERNELS_OK')\n"
        )
        proc = subprocess.run(
            [sys.executable, str(runner)],
            cwd=str(tmp_path),
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "KERNELS_OK" in proc.stdout

    def test_kernels_run_in_foreign_cwd_worker(self, tmp_path):
        """End-to-end repro of the failure mode: a driver that
        sys.path-hacks the repo in (so the DRIVER imports fine) but whose
        Python workers have no PYTHONPATH entry for it. Pre-fix this
        died with ModuleNotFoundError in the worker; post-fix the kernels
        arrive by value inside the task closures."""
        import os
        import subprocess
        import sys
        from pathlib import Path

        repo = str(Path(__file__).resolve().parent.parent)
        script = tmp_path / "drive.py"
        script.write_text(
            "import sys\n"
            f"sys.path.insert(0, {repo!r})\n"
            "from pyspark.sql import SparkSession\n"
            "spark = (SparkSession.builder.master('local[2]')\n"
            "         .config('spark.sql.shuffle.partitions', '2')\n"
            "         .appName('shiptest').getOrCreate())\n"
            "from cassandra_diff_spark.operators import multimodal as mm\n"
            "import struct\n"
            "w, h = 2, 1\n"
            "stride = (3 * w + 3) // 4 * 4\n"
            "pix = bytes([10, 20, 30, 40, 50, 60]) + b'\\x00' * (stride - 3 * w)\n"
            "bmp = (b'BM' + struct.pack('<IHHI', 54 + len(pix), 0, 0, 54)\n"
            "       + struct.pack('<IiiHHIIiiII', 40, w, h, 1, 24, 0,\n"
            "                     len(pix), 0, 0, 0, 0) + pix)\n"
            "df = spark.createDataFrame([(1, bytearray(bmp))],\n"
            "                           'doc_id long, payload binary')\n"
            "assert mm.image_ahash(df).collect()[0].format == 'bmp'\n"
            "assert mm.image_dhash(df).collect()[0].format == 'bmp'\n"
            "assert mm.decode_pixels(df).collect()[0].pix_sum == 210\n"
            "assert mm.decode_headers(df).collect()[0].format == 'bmp'\n"
            "spark.stop()\n"
            "print('SHIP_OK')\n"
        )
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        proc = subprocess.run(
            [sys.executable, str(script)],
            cwd=str(tmp_path),  # NOT the repo: cwd must not rescue the import
            env=env,
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "SHIP_OK" in proc.stdout
