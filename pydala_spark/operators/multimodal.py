"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas iteration.

Two decode tiers:

- :func:`decode_media` REALLY decodes the formats stdlib+numpy can
  handle — PNG (zlib inflate + full filter reconstruction; 8-bit
  gray/GA/RGB/RGBA, non-interlaced), GIF (pure-python LZW + palette
  mapping, first frame), BMP (uncompressed 24/32-bit),
  PPM (P6) / PGM (P5, incl. 16-bit) / PBM (P4) images, and PCM or
  G.711 µ-law WAV audio — into per-media stats (dimensions/sample
  rate/duration/mean/RMS). That covers the dominant lossless image
  formats for real; the stub boundary is down to the lossy codecs.
- :func:`extract_features` with ``decode_stub=True`` substitutes a
  deterministic fake decoder for the remaining codec-dependent
  formats (JPEG/MP3/MP4 — no codec libraries in this environment);
  the Spark-side contract — schema, batch shape, partitioning, UDF
  signature — is identical.
- both functions accept ``decoder=``, a user-supplied
  ``Callable[[bytes, str], dict]`` that is shipped INTO the same
  nested-closure ``mapInPandas`` worker — the seam where
  PIL/torchaudio/ffmpeg plug in without editing this module. The
  environment boundary is only the DEFAULT, not a hard limit.

Scale notes: ``mapInPandas`` streams Arrow batches per partition, so
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of corpus size. Keep binary payloads out of shuffles: derive
features first, then drop the blob column before any wide operation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the media manifest a multimodal dataset carries alongside
#: document rows: blob + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha1 string, feature array<float>"
)


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    decode_stub: bool = True,
    feature_dim: int = 8,
    decoder=None,
) -> DataFrame:
    """Decode/feature-extract media blobs with an Arrow-batched iterator.

    ``decoder`` is the pluggable codec seam: a user-supplied
    ``Callable[[bytes, str], dict]`` called per blob as
    ``decoder(payload, kind)`` and expected to return
    ``{"feature": list[float]}`` (native length kept). It travels to the
    workers inside this function's nested closure, so it MUST be
    self-contained — its own imports (PIL, torchaudio, ...), no
    references into this package (workers may not have the repo on
    sys.path). Per-blob decoder failures or empty results degrade that
    ROW to the fallback below instead of failing the job.

    Fallback (also the behavior with no ``decoder``): the deterministic
    stub feature when ``decode_stub=True``; with ``decode_stub=False``
    the workers raise NotImplementedError — the honest boundary for
    codec formats in an environment with no codec libraries.
    """

    # worker closure: self-contained (stdlib-only refs) so cloudpickle
    # ships it by value — workers never import this package; `decoder`
    # rides along by value under the same contract
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def fake_decode(payload: bytes, dim: int) -> list[float]:
            if not payload:
                return [0.0] * dim
            step = max(1, len(payload) // dim)
            return [
                float(sum(payload[i * step : (i + 1) * step]) % 997) / 997.0
                for i in range(dim)
            ]

        def feature_of(payload: bytes, kind: str) -> list[float]:
            if decoder is not None:
                try:
                    got = (decoder(payload, kind) or {}).get("feature")
                    if got is not None:
                        return [float(v) for v in got]
                except Exception:
                    pass  # one bad blob/codec hiccup must not fail the job
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; pass decode_stub=True or supply "
                    "decoder=callable(payload, kind) -> {'feature': [...]}"
                )
            return fake_decode(payload, feature_dim)

        for pdf in batches:
            payloads = pdf[content_col]
            kinds = pdf["kind"] if "kind" in pdf.columns else [""] * len(pdf)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # the fallback list, not pdf['kind']: a frame without
                    # the optional kind column must not KeyError mid-job
                    "kind": list(kinds),
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "sha1": [
                        hashlib.sha1(p or b"").hexdigest() for p in payloads
                    ],
                    "feature": [
                        feature_of(p or b"", k) for p, k in zip(payloads, kinds)
                    ],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


DECODED_SCHEMA = (
    "media_id long, format string, width int, height int, channels int, "
    "sample_rate int, n_samples long, duration_ms long, mean double, rms double"
)


def _image_array_decoder():
    """Build the self-contained image-raster decoder shared by
    :func:`decode_media` and :func:`resize_images`. Called on the
    DRIVER; the returned function is a dynamically-created closure
    (cloudpickle ships it by value into ``mapInPandas`` workers) whose
    only imports are stdlib+numpy — the worker-side no-package-refs
    rule.

    ``decode_array(payload) -> dict | None`` returns, for a
    stdlib-decodable image payload::

        {"format": str,
         "arr": ndarray,            # (h, w, ch), the file's NATURAL
                                    # row/channel order and dtype
         "width": int, "height": int,  # reported dims (GIF: logical
                                       # screen; others: raster dims)
         "channels": int,
         "flip": bool,              # rows stored bottom-up (BMP h>0)
         "bgr": bool,               # channels are BGR(A) (BMP)
         "maxval": int | None,      # PNM full-scale sample value
         "interlaced": bool}        # GIF 8/8/4/2 interlaced row order

    Natural order ON PURPOSE: :func:`decode_media`'s mean/rms must stay
    bit-identical to the pre-factoring layout (``np.mean`` walks the
    same C-order element sequence), so presentation transforms (row
    flip, BGR swap, 16-bit scaling) are left to consumers that care
    about spatial layout (:func:`resize_images`). Returns ``{}`` for an
    image-magic payload that fails to decode (malformed/unsupported
    variant) and ``None`` for a payload that is not an image at all —
    callers route ``None`` onward (e.g. to the WAV paths).
    """
    import numpy as np

    def _pnm_header(payload: bytes, n_ints: int) -> tuple[list[int], int]:
        # ascii header after the magic: n_ints whitespace-separated
        # integers with '#' comment lines; returns (ints, raster offset)
        parts, idx = [], 2
        while len(parts) < n_ints and idx < len(payload):
            while idx < len(payload) and payload[idx : idx + 1].isspace():
                idx += 1
            if payload[idx : idx + 1] == b"#":
                while idx < len(payload) and payload[idx] != 0x0A:
                    idx += 1
                continue
            start = idx
            while idx < len(payload) and not payload[idx : idx + 1].isspace():
                idx += 1
            parts.append(int(payload[start:idx]))
        return parts, idx + 1  # single whitespace byte ends the header

    def _png_unfilter(data, w, h, ch):
        # scanline reconstruction for filters 0-4 (PNG spec 9.2);
        # None/Up vectorize, Sub is a mod-256 cumsum over pixels,
        # Average/Paeth carry a true sequential dependency -> per-byte
        # loop (acceptable: encoders emit them on a minority of rows)
        stride = w * ch
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int64)
        pos = 0
        for y in range(h):
            ftype = data[pos]
            row = np.frombuffer(
                data, dtype=np.uint8, count=stride, offset=pos + 1
            ).astype(np.int64)
            pos += 1 + stride
            if ftype == 0:
                rec = row
            elif ftype == 2:  # Up
                rec = (row + prev) % 256
            elif ftype == 1:  # Sub: cumsum per byte lane, mod 256
                rec = np.cumsum(row.reshape(w, ch), axis=0).reshape(-1) % 256
            elif ftype in (3, 4):  # Average / Paeth
                rec = np.zeros(stride, dtype=np.int64)
                for i in range(stride):
                    a = rec[i - ch] if i >= ch else 0
                    b = prev[i]
                    if ftype == 3:
                        pred = (a + b) >> 1
                    else:
                        c = prev[i - ch] if i >= ch else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = (
                            a if pa <= pb and pa <= pc
                            else (b if pb <= pc else c)
                        )
                    rec[i] = (row[i] + pred) % 256
            else:
                raise ValueError(f"png filter {ftype}")
            out[y] = rec
            prev = rec
        return out

    def _gif_lzw(data: bytes, min_code: int, n_px: int) -> list[int]:
        # GIF-flavor LZW: variable code width starting at min_code+1,
        # clear/EOI codes, dictionary grows to 4095 then waits for a
        # clear. Returns the palette-index stream.
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        out: list[int] = []
        table: list[list[int]] = []

        def reset():
            nonlocal table, width
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code + 1

        width = min_code + 1
        reset()
        acc = nbits = 0
        prev: list[int] | None = None
        for byte in data:
            acc |= byte << nbits
            nbits += 8
            while nbits >= width:
                code = acc & ((1 << width) - 1)
                acc >>= width
                nbits -= width
                if code == clear:
                    reset()
                    prev = None
                    continue
                if code == eoi:
                    return out
                if prev is None:
                    entry = table[code]
                elif code < len(table):
                    entry = table[code]
                    if len(table) < 4096:  # deferred-clear streams:
                        table.append(prev + [entry[0]])  # stop at 4096
                else:  # the KwKwK case
                    entry = prev + [prev[0]]
                    if len(table) < 4096:
                        table.append(entry)
                out.extend(entry)
                prev = entry
                if len(table) == (1 << width) and width < 12:
                    width += 1
                if len(out) >= n_px:
                    return out
        return out

    def _img(fmt, w, h, ch, arr, flip=False, bgr=False, maxval=None,
             interlaced=False):
        return {
            "format": fmt, "width": w, "height": h, "channels": ch,
            "arr": arr, "flip": flip, "bgr": bgr,
            # PNM full-scale value (resize rescales to 0..255 by it)
            "maxval": maxval,
            # GIF interlace flag: rows are stored in 8/8/4/2 pass order
            # (harmless for stats; spatial consumers must deinterlace)
            "interlaced": interlaced,
        }

    def decode_array(payload: bytes):
        magic = payload[:2]
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            # real GIF decode: pure-python LZW + palette mapping,
            # first image only; interlacing needs no handling for
            # stats (row order cannot change mean/rms) and the raster
            # a resize consumer sees is the frame's stored row order.
            # Malformed streams degrade to {}
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
            flags = payload[10]
            idx = 13
            gct = None
            if flags & 0x80:
                n = 2 ** ((flags & 0x07) + 1)
                gct = payload[idx : idx + 3 * n]
                idx += 3 * n
            while idx < len(payload):
                b0 = payload[idx]
                if b0 == 0x21:  # extension: label + sub-blocks
                    idx += 2
                    while payload[idx]:
                        idx += 1 + payload[idx]
                    idx += 1
                elif b0 == 0x2C:  # image descriptor
                    iw = int.from_bytes(payload[idx + 5 : idx + 7], "little")
                    ih = int.from_bytes(payload[idx + 7 : idx + 9], "little")
                    iflags = payload[idx + 9]
                    idx += 10
                    pal = gct
                    if iflags & 0x80:
                        n = 2 ** ((iflags & 0x07) + 1)
                        pal = payload[idx : idx + 3 * n]
                        idx += 3 * n
                    if pal is None or iw <= 0 or ih <= 0:
                        return {}
                    min_code = payload[idx]
                    # spec range: clear code must fit 12 bits; an
                    # out-of-range byte (crafted/corrupt blob) would
                    # otherwise size the table 2**min_code — OOM
                    if not 2 <= min_code <= 11:
                        return {}
                    idx += 1
                    lzw = bytearray()  # O(n) accumulation, not +=
                    while payload[idx]:
                        size = payload[idx]
                        lzw += payload[idx + 1 : idx + 1 + size]
                        idx += 1 + size
                    pix = _gif_lzw(bytes(lzw), min_code, iw * ih)
                    if len(pix) < iw * ih:
                        return {}
                    p = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
                    arr = p[
                        np.clip(np.array(pix[: iw * ih]), 0, len(p) - 1)
                    ].reshape(ih, iw, 3)
                    # metadata reports the LOGICAL SCREEN dims (what
                    # every standard decoder calls the image size);
                    # the raster is the first frame's, whose
                    # descriptor may cover a sub-region
                    return _img("gif", w, h, 3, arr,
                                interlaced=bool(iflags & 0x40))
                else:  # trailer (0x3B) or junk
                    return {}
            return {}
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            # real PNG decode, stdlib-only: zlib IS stdlib, the
            # filters are numpy/loop arithmetic. 8-bit depths, color
            # types gray/gray+alpha/RGB/RGBA, non-interlaced (the
            # overwhelming majority of real PNGs); anything else
            # degrades to {}
            import struct as _st
            import zlib

            idx, ihdr, idat = 8, None, b""
            while idx + 8 <= len(payload):
                (size,) = _st.unpack(">I", payload[idx : idx + 4])
                cid = payload[idx + 4 : idx + 8]
                body = payload[idx + 8 : idx + 8 + size]
                if cid == b"IHDR":
                    ihdr = body
                elif cid == b"IDAT":
                    idat += body
                elif cid == b"IEND":
                    break
                idx += 12 + size  # size + type + crc
            if ihdr is None or len(ihdr) < 13 or not idat:
                return {}
            w, h, depth, ctype, comp, filt, ilace = _st.unpack(
                ">IIBBBBB", ihdr[:13]
            )
            ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
            if ch is None or depth != 8 or comp or filt or ilace:
                return {}
            if w <= 0 or h <= 0:
                return {}
            data = zlib.decompress(idat)
            if len(data) < h * (1 + w * ch):
                return {}
            arr = _png_unfilter(data, w, h, ch).reshape(h, w, ch)
            return _img("png", w, h, ch, arr)
        if magic == b"BM":
            # uncompressed (BI_RGB) 24/32-bit BMP: rows are 4-byte
            # aligned, bottom-up (negative height = top-down) and
            # channels are BGR(A) — reported via flip/bgr so spatial
            # consumers can normalize. Palette/compressed variants
            # degrade to {}
            if len(payload) < 54:
                return {}
            offset = int.from_bytes(payload[10:14], "little")
            w = int.from_bytes(payload[18:22], "little", signed=True)
            h = int.from_bytes(payload[22:26], "little", signed=True)
            bpp = int.from_bytes(payload[28:30], "little")
            compression = int.from_bytes(payload[30:34], "little")
            if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
                return {}
            habs, ch = abs(h), bpp // 8
            stride = ((w * ch + 3) // 4) * 4
            if len(payload) - offset < stride * habs:
                return {}
            raw = np.frombuffer(
                payload, dtype=np.uint8, count=stride * habs, offset=offset
            ).reshape(habs, stride)[:, : w * ch]
            return _img(
                "bmp", w, habs, ch, raw.reshape(habs, w, ch),
                flip=h > 0, bgr=True,
            )
        if magic in (b"P6", b"P5"):
            # PPM P6 raw RGB / PGM P5 raw grayscale; maxval > 255
            # means 2-byte big-endian samples (dtype preserved — the
            # stats path computes over the raw sample values)
            (w, h, maxval), idx = _pnm_header(payload, 3)
            ch = 3 if magic == b"P6" else 1
            if w <= 0 or h <= 0 or maxval <= 0:
                return {}
            dt = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
            n = w * h * ch
            if len(payload) - idx < n * dt.itemsize:
                return {}
            arr = np.frombuffer(
                payload, dtype=dt, count=n, offset=idx
            ).reshape(h, w, ch)
            return _img("ppm" if ch == 3 else "pgm", w, h, ch, arr,
                        maxval=maxval)
        if magic == b"P4":
            # PBM P4: 1 bit/pixel, rows padded to whole bytes
            (w, h), idx = _pnm_header(payload, 2)
            if w <= 0 or h <= 0:
                return {}
            row_bytes = (w + 7) // 8
            if len(payload) - idx < row_bytes * h:
                return {}
            raw = np.frombuffer(
                payload, dtype=np.uint8, count=row_bytes * h, offset=idx
            )
            bits = np.unpackbits(raw.reshape(h, row_bytes), axis=1)[:, :w]
            return _img("pbm", w, h, 1, bits.reshape(h, w, 1))
        return None

    return decode_array


def decode_media(
    df: DataFrame, content_col: str = "content", decoder=None
) -> DataFrame:
    """Real decode of stdlib-decodable media blobs (PNG/GIF/BMP/PPM/PGM/
    PBM images, PCM and µ-law WAV audio) into per-media stats; undecodable payloads
    yield a null-format row instead of failing the job. Same
    Arrow-batched ``mapInPandas`` shape as :func:`extract_features`.

    ``decoder`` plugs codec formats in: ``decoder(payload, kind)`` is
    tried FIRST per blob and its non-empty dict result (keys from
    DECODED_SCHEMA: format/width/height/channels/sample_rate/n_samples/
    duration_ms/mean/rms) is used as-is; an empty result or an exception
    falls through to the stdlib decode path, so PPM/WAV keep working
    next to a user JPEG codec. Same nested-closure contract as
    :func:`extract_features`: the callable must be self-contained.

    The image-raster decode itself lives in the shared
    :func:`_image_array_decoder` closure (also serving
    :func:`resize_images`); this function adds the audio paths and the
    stats projection."""

    decode_image = _image_array_decoder()  # driver-built, value-shipped

    # worker closure: stdlib+numpy only, shipped by value via cloudpickle
    def run(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd

        def one(payload: bytes, kind: str) -> dict:
            # any malformation (garbage header ints, truncated raster,
            # corrupt wave chunks) degrades to {} -> null-format row;
            # a bad blob must never fail the job
            if decoder is not None:
                try:
                    got = decoder(payload, kind)
                    if got:
                        return got
                except Exception:
                    pass  # plugged-codec failure degrades to builtin path
            try:
                return _decode(payload)
            except Exception:
                return {}

        def _ulaw_to_linear(b: np.ndarray) -> np.ndarray:
            # ITU-T G.711 µ-law expansion, vectorized
            u = (~b).astype(np.int64) & 0xFF
            sign = u & 0x80
            exponent = (u >> 4) & 0x07
            mantissa = u & 0x0F
            sample = (((mantissa << 3) + 0x84) << exponent) - 0x84
            return np.where(sign != 0, -sample, sample).astype(np.float64)

        def _decode(payload: bytes) -> dict:
            img = decode_image(payload)
            if img is not None:
                if not img:
                    return {}  # image magic, undecodable variant
                arr = img["arr"].astype(np.float64)
                return {
                    "format": img["format"],
                    "width": img["width"], "height": img["height"],
                    "channels": img["channels"],
                    "mean": float(arr.mean()),
                    "rms": float(np.sqrt((arr * arr).mean())),
                }
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                try:
                    # PCM via the stdlib wave module
                    with wave.open(io.BytesIO(payload)) as wf:
                        sr, ch = wf.getframerate(), wf.getnchannels()
                        sw, n = wf.getsampwidth(), wf.getnframes()
                        raw = wf.readframes(n)
                    dt = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
                    if dt is None or not sr:
                        return {}
                    arr = np.frombuffer(raw, dtype=dt).astype(np.float64)
                    if sw == 1:
                        # 8-bit PCM WAV is offset-binary (silence = 0x80);
                        # remove the DC bias so mean/rms are comparable
                        # with the signed 16/32-bit paths
                        arr -= 128.0
                except wave.Error:
                    # non-PCM: walk the RIFF chunks ourselves; µ-law
                    # (format 7) expands via G.711 — still stdlib+numpy
                    import struct

                    fmt_chunk = data = None
                    idx = 12
                    while idx + 8 <= len(payload):
                        cid, size = payload[idx : idx + 4], int.from_bytes(
                            payload[idx + 4 : idx + 8], "little"
                        )
                        body = payload[idx + 8 : idx + 8 + size]
                        if cid == b"fmt ":
                            fmt_chunk = body
                        elif cid == b"data":
                            data = body
                        idx += 8 + size + (size & 1)  # chunks are word-aligned
                    if fmt_chunk is None or data is None or len(fmt_chunk) < 16:
                        return {}
                    audio_fmt, ch, sr = struct.unpack("<HHI", fmt_chunk[:8])
                    if audio_fmt != 7 or not sr or not ch:
                        return {}  # only µ-law handled beyond PCM
                    arr = _ulaw_to_linear(np.frombuffer(data, dtype=np.uint8))
                    n = len(arr) // ch
                return {
                    "format": "wav", "sample_rate": sr, "channels": ch,
                    "n_samples": n, "duration_ms": n * 1000 // sr,
                    "mean": float(arr.mean()) if arr.size else 0.0,
                    "rms": float(np.sqrt((arr * arr).mean())) if arr.size else 0.0,
                }
            return {}

        cols = ["format", "width", "height", "channels", "sample_rate",
                "n_samples", "duration_ms", "mean", "rms"]
        for pdf in batches:
            recs = []
            kinds = pdf["kind"] if "kind" in pdf.columns else [""] * len(pdf)
            for mid, payload, kind in zip(pdf["media_id"], pdf[content_col], kinds):
                d = one(bytes(payload), kind) if payload is not None else {}
                recs.append({"media_id": int(mid), **{c: d.get(c) for c in cols}})
            yield pd.DataFrame(recs, columns=["media_id"] + cols)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, format string, src_width int, src_height int, "
    "channels int, width int, height int, pixels binary"
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    decoder=None,
) -> DataFrame:
    """Nearest-neighbor resize of stdlib-decodable image blobs to
    ``(width, height)``, emitting the resized raster as row-major
    interleaved uint8 bytes plus its geometry — the canonical
    fixed-size input a downstream feature extractor or thumbnail
    writer consumes. Same Arrow-batched ``mapInPandas`` shape (and the
    same driver-built :func:`_image_array_decoder` closure) as
    :func:`decode_media`.

    Output raster normalization, regardless of source layout: rows
    top-down (bottom-up BMPs are flipped, interlaced GIF rows scatter
    back to display order), channels in RGB(A) order (BMP's BGR(A) is
    swapped), PNM samples rescale to full 8-bit range by ``round(v *
    255 / maxval)`` (16-bit, 10-bit and sub-255 maxvals alike), and
    PBM bits map spec-polarity: 1 = black = 0, 0 = white = 255.
    ``src_width``/``src_height`` are
    the dimensions of the raster actually resized (for GIF that is the
    first frame's sub-rectangle, which may be smaller than the logical
    screen ``decode_media`` reports). Non-image or undecodable
    payloads yield a null-format row instead of failing the job.

    ``decoder`` is the usual pluggable codec seam, tried FIRST per
    blob: ``decoder(payload, kind)`` returning a non-empty dict with
    RESIZED_SCHEMA keys (``format``/``src_width``/``src_height``/
    ``channels``/``pixels``, already resized — e.g. a PIL plug-in) is
    used as-is; exceptions, empty results, and results violating the
    contract (missing keys, or a ``pixels`` buffer whose length is not
    ``width*height*channels`` — the emitted row claims the target
    geometry, so a mis-sized buffer would fail at consumption far from
    its cause) fall through to the stdlib path. Self-contained-callable
    contract as everywhere else.

    Scale notes: pure map-side work, no shuffle; output rows are
    ``width*height*channels`` bytes regardless of source size, so a
    thumbnail target bounds the stage's output volume while the blob
    column itself never enters a shuffle.
    """
    if width <= 0 or height <= 0:
        raise ValueError("resize target must be positive")
    decode_image = _image_array_decoder()  # driver-built, value-shipped
    out_w, out_h = int(width), int(height)

    def run(batches):
        import numpy as np
        import pandas as pd

        def one(payload: bytes, kind: str) -> dict:
            if decoder is not None:
                try:
                    got = decoder(payload, kind)
                except Exception:
                    got = None  # plugged-codec failure degrades to builtin
                if got:
                    # plug-in contract check (ADVICE r11): the emitted
                    # row claims out_w x out_h, so accept the result
                    # only if every key is present and the pixels
                    # buffer matches that geometry; otherwise fall
                    # through to the stdlib path
                    try:
                        pix = got.get("pixels")
                        if isinstance(pix, bytearray):
                            # bytearray is Arrow-safe once frozen
                            pix = bytes(pix)
                            got["pixels"] = pix
                        # ADVICE r12: length alone let a str/list of
                        # the right length through to fail at Arrow
                        # serialization far from the plug-in — the
                        # buffer must actually be bytes
                        if (
                            isinstance(pix, bytes)
                            and got.get("format") is not None
                            and int(got["src_width"]) > 0
                            and int(got["src_height"]) > 0
                            and int(got["channels"]) > 0
                            and len(pix)
                            == out_w * out_h * int(got["channels"])
                        ):
                            return got
                    except Exception:
                        pass
            try:
                img = decode_image(payload)
            except Exception:
                return {}
            if not img:
                return {}
            arr = img["arr"]
            if img["format"] == "pbm":
                # PBM polarity: bit 1 is BLACK (portable-bitmap spec),
                # so full-scale gray output inverts the bits
                arr = (255 * (1 - arr)).astype(np.uint8)
            elif img.get("maxval") not in (None, 255):
                # PNM full-range rescale: round(sample * 255 / maxval)
                # — covers 16-bit (maxval 65535), camera 10-bit
                # (1023), and sub-255 maxvals alike
                mv = int(img["maxval"])
                arr = (
                    (arr.astype(np.uint32) * 255 + mv // 2) // mv
                ).astype(np.uint8)
            if img.get("interlaced"):
                # GIF interlace: rows are stored in 8/8/4/2 pass
                # order; scatter them back to display order
                h0 = arr.shape[0]
                order = np.concatenate([
                    np.arange(0, h0, 8), np.arange(4, h0, 8),
                    np.arange(2, h0, 4), np.arange(1, h0, 2),
                ])
                disp = np.empty_like(arr)
                disp[order] = arr
                arr = disp
            if img["flip"]:
                arr = arr[::-1]
            if img["bgr"]:
                order = [2, 1, 0] + ([3] if arr.shape[2] == 4 else [])
                arr = arr[:, :, order]
            h0, w0, ch = arr.shape
            # nearest-neighbor index map: source index = floor(i*src/dst)
            rows = np.minimum((np.arange(out_h) * h0) // out_h, h0 - 1)
            cols = np.minimum((np.arange(out_w) * w0) // out_w, w0 - 1)
            out = np.ascontiguousarray(arr[rows][:, cols])
            return {
                "format": img["format"],
                "src_width": w0, "src_height": h0, "channels": ch,
                "pixels": out.tobytes(),
            }

        cols = ["format", "src_width", "src_height", "channels", "pixels"]
        for pdf in batches:
            recs = []
            kinds = pdf["kind"] if "kind" in pdf.columns else [""] * len(pdf)
            for mid, payload, kind in zip(pdf["media_id"], pdf[content_col], kinds):
                d = one(bytes(payload), kind) if payload is not None else {}
                recs.append({
                    "media_id": int(mid),
                    **{c: d.get(c) for c in cols[:-1]},
                    "width": out_w if d else None,
                    "height": out_h if d else None,
                    "pixels": d.get("pixels"),
                })
            yield pd.DataFrame(
                recs,
                columns=["media_id", "format", "src_width", "src_height",
                         "channels", "width", "height", "pixels"],
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, content_col: str = "content"
) -> DataFrame:
    """Frame-sampling contract for video blobs: one output row per sampled
    frame offset (stubbed: offsets derived from duration metadata; a real
    implementation decodes frames at those offsets)."""
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.where(F.col("kind") == "video")
        .withColumn("frame_ms", F.explode(offsets))
        .drop(content_col)
    )
