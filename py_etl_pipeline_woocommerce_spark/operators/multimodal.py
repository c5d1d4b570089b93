"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a ``modality`` tag
(schema ``sources/schemas.py:MEDIA_SCHEMA``). IMAGE decode is real:
``decode_media`` prefers Pillow when importable and falls back to a
built-in pure-stdlib PNG codec (PNG spec / RFC 2083 — 8-bit
gray/RGB/RGBA, non-interlaced, all five filters), so
``extract_features``/``resize_images`` run real pixels through the
Arrow path even in a deps-free container. AUDIO decode is real for
PCM WAV via the stdlib ``wave`` module (``wav_decode`` /
``audio_decode`` — duration, rate, per-channel RMS features).
VIDEO decodes through pyav when installed
(``_av_video_decode`` → sampled frames; ``frame_sample_decode`` is
the mapInPandas operator) — in a pyav-less container it remains a
LOUD ``NotImplementedError`` dep seam raised at plan build;
``fake_decode`` stays as the deterministic stand-in for
oracle-hashed driver queries.

Scale notes: payloads are the widest column by far, so every
metadata-only operation selects away ``payload`` first (column
pruning reaches the parquet scan). ``mapInPandas`` streams Arrow
batches — constant memory per task regardless of partition size.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.schemas import MEDIA_FEATURES_SCHEMA

FEATURE_DIM = 8

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _try_pillow():
    try:  # optional public dependency — never required
        from PIL import Image

        return Image
    except ImportError:
        return None


def _try_soundfile():
    try:  # optional public dependency — never required
        import soundfile

        return soundfile
    except ImportError:
        return None


def _try_av():
    try:  # optional public dependency — never required
        import av

        return av
    except ImportError:
        return None


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc = data[pos + 8 + length : pos + 12 + length]
        # a compliant decoder rejects CRC mismatches — without this a
        # bit-flipped IHDR decodes into garbage geometry silently
        # (zlib's adler32 only covers IDAT contents, not framing)
        if len(body) < length or len(crc) < 4:
            raise ValueError("png_decode: truncated chunk")
        if struct.unpack(">I", crc)[0] != zlib.crc32(ctype + body) & 0xFFFFFFFF:
            raise ValueError(
                f"png_decode: CRC mismatch in {ctype!r} chunk"
            )
        yield ctype, body
        pos += 12 + length  # length + type + payload + crc


def png_decode(payload: bytes) -> tuple[int, int, list]:
    """Minimal pure-stdlib PNG decoder (PNG spec / RFC 2083): 8-bit
    grayscale/RGB/RGBA, non-interlaced, all five scanline filters.
    Returns ``(width, height, rows)`` with rows of (r, g, b, a)
    tuples. Raises ``ValueError`` on non-PNG bytes or unsupported
    variants (16-bit, palette, interlaced) — callers fall back to
    Pillow or fail loudly, never silently."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("png_decode: not a PNG signature")
    w = h = None
    ctype = None
    # accumulate IDAT chunks in a list: encoders emit thousands of
    # small chunks for big images, and bytes += copies the whole
    # buffer each time (quadratic); one join is linear
    idat_parts: list[bytes] = []
    for t, c in _png_chunks(payload):
        if t == b"IHDR":
            if len(c) != 13:
                raise ValueError("png_decode: malformed IHDR")
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", c
            )
            if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
                raise ValueError(
                    "png_decode: only 8-bit gray/RGB/RGBA "
                    "non-interlaced PNGs supported"
                )
        elif t == b"IDAT":
            idat_parts.append(c)
        elif t == b"IEND":
            break
    if w is None:
        raise ValueError("png_decode: missing IHDR")
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    try:
        raw = zlib.decompress(b"".join(idat_parts))
    except zlib.error as e:  # keep the documented ValueError contract
        raise ValueError(f"png_decode: corrupt IDAT stream ({e})") from e
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("png_decode: truncated pixel data")
    rows = []
    prev = bytearray(stride)
    pos = 0
    for _ in range(h):
        f = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if f == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c2 = prev[i - nch] if i >= nch else 0
                p = a + b - c2
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c2)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c2)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"png_decode: unknown filter {f}")
        prev = line
        row = []
        for x in range(w):
            px = line[x * nch : (x + 1) * nch]
            if nch == 1:
                row.append((px[0], px[0], px[0], 255))
            elif nch == 3:
                row.append((px[0], px[1], px[2], 255))
            else:
                row.append((px[0], px[1], px[2], px[3]))
        rows.append(row)
    return w, h, rows


def png_encode(rows: list) -> bytes:
    """Encode (r, g, b, a) pixel rows as an RGBA PNG (filter 0 per
    scanline — simple and valid; compression is zlib's default)."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    raw = bytearray()
    for row in rows:
        raw.append(0)
        for (r, g, b, a) in row:
            raw += bytes((r, g, b, a))

    def chunk(t: bytes, c: bytes) -> bytes:
        return (
            struct.pack(">I", len(c))
            + t
            + c
            + struct.pack(">I", zlib.crc32(t + c) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


_WAV_MIMES = ("audio/wav", "audio/x-wav", "audio/wave")


def wav_decode(payload: bytes) -> tuple[int, int, "object"]:
    """Decode a PCM WAV payload via the stdlib ``wave`` module — the
    audio twin of ``png_decode``. Returns ``(n_channels, sample_rate,
    frames)`` where ``frames`` is a float64 numpy array of shape
    (n_frames, n_channels), samples normalized to [-1, 1).

    Handles every integer PCM width: 8-bit unsigned, 16/32-bit signed
    via numpy view, and 24-bit signed by vectorized byte-shifting the
    raw 3-byte little-endian frames (``wave`` hands the bytes through
    untouched; no audio lib needed). Only COMPRESSED codecs (mp3/ogg/
    flac/…) remain the deps-enabled deployment seam — torchaudio/
    soundfile read those."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch = w.getnchannels()
            sampwidth = w.getsampwidth()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        # non-RIFF or truncated bytes: keep the module's documented
        # ValueError-on-corruption contract (png_decode does the same
        # for zlib.error) so callers' error paths catch it
        raise ValueError(f"wav_decode: corrupt or non-WAV bytes ({e})") from e
    if sampwidth == 3:
        # 24-bit: sign-extend each little-endian byte triple into
        # int32 (the high byte viewed int8 carries the sign)
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: (len(b) // 3) * 3].reshape(-1, 3)
        a = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].view(np.int8).astype(np.int32) << 16)
        ).astype(np.float64) / 8388608.0
    else:
        dtypes = {1: np.uint8, 2: np.int16, 4: np.int32}
        if sampwidth not in dtypes:
            raise NotImplementedError(
                f"wav_decode: {8 * sampwidth}-bit PCM needs audio "
                "libs not installed here (soundfile/torchaudio)"
            )
        a = np.frombuffer(raw, dtype=dtypes[sampwidth]).astype(np.float64)
        if sampwidth == 1:
            a = (a - 128.0) / 128.0
        elif sampwidth == 2:
            a = a / 32768.0
        else:
            a = a / 2147483648.0
    n_frames = len(a) // nch if nch else 0
    return nch, rate, a[: n_frames * nch].reshape(n_frames, nch)


def _av_audio_decode(avmod, payload: bytes):
    """Compressed-audio decode through pyav (ffmpeg): concatenate the
    stream's frames into the same ``(n_channels, sample_rate,
    float64 frames)`` contract as ``wav_decode``. Integer sample
    formats normalize by their width; planar/packed layouts both
    reduce to (n_frames, n_channels)."""
    import io

    import numpy as np

    with avmod.open(io.BytesIO(payload)) as container:
        stream = next(
            (st for st in container.streams if st.type == "audio"), None
        )
        if stream is None:
            raise ValueError("no audio stream in payload")
        rate = stream.rate
        if not rate:
            raise ValueError(
                "av audio stream reports no sample rate — refusing to "
                "emit 0 Hz frames"
            )
        nch = stream.channels or 1
        chunks = []
        for frame in container.decode(stream):
            a = frame.to_ndarray()
            if a.ndim == 1:
                a = a.reshape(1, -1)
            if a.shape[0] == nch:  # planar: (channels, samples)
                a = a.T
            else:  # packed: (1, samples*channels) interleaved
                a = a.reshape(-1, nch)
            if np.issubdtype(a.dtype, np.unsignedinteger):
                # unsigned PCM is offset-binary: center before
                # scaling, like wav_decode's 8-bit path — plain
                # division would leave a +0.5 DC offset
                half = float(np.iinfo(a.dtype).max + 1) / 2.0
                a = (a.astype(np.float64) - half) / half
            elif np.issubdtype(a.dtype, np.integer):
                a = a.astype(np.float64) / float(
                    np.iinfo(a.dtype).max + 1
                )
            else:
                a = a.astype(np.float64)
            chunks.append(a)
    frames = (
        np.concatenate(chunks, axis=0)
        if chunks
        else np.zeros((0, nch), dtype=np.float64)
    )
    return nch, rate, frames


def _av_video_decode(avmod, payload: bytes, every_ms: int = 1000):
    """Sampled video-frame decode through pyav (ffmpeg): decode the
    first video stream and keep the first frame at-or-after each
    ``every_ms`` grid point — the decode twin of ``frame_sample_plan``
     's metadata grid. Returns ``[(frame_ts_ms, width, height,
    mean_luma), ...]`` in presentation order; mean_luma is the
    Rec.601 luminance mean in [0, 1] (the same weights as
    ``image_decode``). Frames without a presentation time are
    skipped. Bytes pyav cannot open (or with no video stream) raise
    ValueError — the module's corruption contract — never a leaked
    ffmpeg error type."""
    import io

    import numpy as np

    out = []
    try:
        with avmod.open(io.BytesIO(payload)) as container:
            stream = next(
                (st for st in container.streams if st.type == "video"),
                None,
            )
            if stream is None:
                raise ValueError("no video stream in payload")
            next_ts = 0
            for frame in container.decode(stream):
                if frame.time is None:
                    continue
                ts_ms = int(frame.time * 1000)
                if ts_ms < next_ts:
                    continue
                a = frame.to_ndarray(format="rgb24").astype(np.float64)
                luma = (
                    0.299 * a[..., 0]
                    + 0.587 * a[..., 1]
                    + 0.114 * a[..., 2]
                ) / 255.0
                out.append(
                    (ts_ms, frame.width, frame.height, float(luma.mean()))
                )
                next_ts = (ts_ms // every_ms + 1) * every_ms
    except avmod.error.FFmpegError as e:
        raise ValueError(
            f"decode_media: pyav could not decode video payload ({e})"
        ) from e
    return out


def decode_media(payload: bytes, mime_type: str):
    """Decode a media payload; the return shape is per-modality:
    images → ``(width, height, rgba_rows)``, audio →
    ``(n_channels, sample_rate, frames)`` (see ``wav_decode``).

    Selection order: Pillow when importable (any image format PIL
    reads), else the built-in pure-stdlib PNG codec for ``image/png``;
    PCM WAV via the stdlib ``wave`` module; compressed audio via
    soundfile then pyav; video → sampled frames via pyav
    (``_av_video_decode``). Non-WAV audio / video / non-PNG images in
    a container WITHOUT those optional deps raise
    ``NotImplementedError`` — the documented dep seam; codecs the
    installed libs cannot open raise ValueError (corruption
    contract)."""
    if mime_type is None:
        raise ValueError("decode_media: mime_type is NULL")
    if mime_type.startswith("image/"):
        Image = _try_pillow()
        if Image is not None:
            import io

            img = Image.open(io.BytesIO(payload)).convert("RGBA")
            w, h = img.size
            data = list(img.getdata())
            return w, h, [data[y * w : (y + 1) * w] for y in range(h)]
        if mime_type == "image/png":
            return png_decode(payload)
        raise NotImplementedError(
            f"decoding {mime_type} requires Pillow (not installed); "
            "only image/png decodes via the built-in codec"
        )
    if mime_type.startswith("audio/"):
        if mime_type in _WAV_MIMES:
            return wav_decode(payload)
        sf = _try_soundfile()
        avmod = _try_av()
        if sf is not None:
            import io

            try:
                data, rate = sf.read(
                    io.BytesIO(payload), always_2d=True
                )
                return data.shape[1], rate, data
            except Exception as e:
                # libsndfile doesn't know this codec (or the bytes
                # are corrupt) — fall through to pyav when present,
                # else keep the module's ValueError-on-corruption
                # contract instead of leaking LibsndfileError
                if avmod is None:
                    raise ValueError(
                        f"decode_media: soundfile could not decode "
                        f"{mime_type} payload ({e})"
                    ) from e
        if avmod is not None:
            return _av_audio_decode(avmod, payload)
        raise NotImplementedError(
            f"decoding {mime_type} requires audio libs not installed "
            "here (soundfile or pyav); only PCM WAV decodes via the "
            "stdlib codec"
        )
    if mime_type.startswith("video/"):
        avmod = _try_av()
        if avmod is not None:
            return _av_video_decode(avmod, payload)
        raise NotImplementedError(
            f"decoding {mime_type} requires pyav (not installed); "
            "install av to enable the ffmpeg video path, or use "
            "fake_decode for deterministic tests"
        )
    raise NotImplementedError(
        f"decode_media: no decoder for mime type {mime_type!r}"
    )


def image_decode(payload: bytes, mime_type: str) -> list[float]:
    """REAL image feature extractor with the same shape/dtype contract
    as ``fake_decode`` (FEATURE_DIM floats): normalized dims, per-
    channel means, luminance mean/stddev, aspect ratio. Deterministic
    given the payload. Decodes IMAGES only — pair with
    ``extract_features(..., modalities=("image",))`` on mixed-modality
    frames so audio/video rows get a NULL feature instead of a
    decoder crash."""
    if mime_type is None or not mime_type.startswith("image/"):
        raise NotImplementedError(
            f"image_decode: {mime_type} is not an image; use "
            "audio_decode for WAV or fake_decode for the stand-in"
        )
    w, h, rows = decode_media(payload, mime_type)
    flat = [p for row in rows for p in row]
    n = len(flat) or 1
    mr = sum(p[0] for p in flat) / (255.0 * n)
    mg = sum(p[1] for p in flat) / (255.0 * n)
    mb = sum(p[2] for p in flat) / (255.0 * n)
    lum = [
        (0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2]) / 255.0 for p in flat
    ] or [0.0]
    mean_l = sum(lum) / len(lum)
    var_l = sum((x - mean_l) ** 2 for x in lum) / len(lum)
    return [
        w / 4096.0,
        h / 4096.0,
        mr,
        mg,
        mb,
        mean_l,
        var_l ** 0.5,
        (w / h) if h else 0.0,
    ]


def audio_decode(payload: bytes, mime_type: str) -> list[float]:
    """REAL audio feature extractor with ``fake_decode``'s
    shape/dtype contract (FEATURE_DIM floats): duration, channel
    count, sample rate, per-channel RMS loudness, peak, zero-crossing
    rate, DC offset. Deterministic given the payload. Decodes PCM WAV
    only — pair with ``extract_features(..., decoder=audio_decode,
    modalities=("audio",))`` on mixed-modality frames so image/video
    rows get a NULL feature instead of a decoder crash. The numpy
    math is vectorized per payload; the Arrow batch shape around it
    is ``extract_features``'s."""
    import numpy as np

    nch, rate, frames = decode_media(payload, mime_type)
    n = frames.shape[0]
    if n == 0:
        return [0.0, float(nch), rate / 48000.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rms = np.sqrt(np.mean(frames**2, axis=0))
    ch0 = frames[:, 0]
    zc = float(np.mean(np.signbit(ch0[1:]) != np.signbit(ch0[:-1])))
    return [
        n / rate if rate else 0.0,
        float(nch),
        rate / 48000.0,
        float(rms[0]),
        float(rms[1]) if nch > 1 else 0.0,
        float(np.max(np.abs(frames))),
        zc,
        float(np.mean(ch0)),
    ]


def image_resize(
    payload: bytes, mime_type: str, width: int, height: int
) -> bytes:
    """REAL image resizer with ``fake_resize``'s (bytes in → bytes
    out) contract: Pillow's ``Image.resize`` when importable, else
    nearest-neighbor over the built-in PNG codec. Output is always
    PNG bytes (thumbnail re-encode normalizes the format)."""
    Image = _try_pillow()
    if Image is not None:
        import io

        img = Image.open(io.BytesIO(payload)).convert("RGBA")
        out = io.BytesIO()
        # pin NEAREST so output bytes are identical with or without
        # Pillow installed — the deterministic-bytes contract every
        # oracle-parity surface here relies on; deployments that want
        # quality interpolation pass their own resizer=
        nearest = getattr(
            getattr(Image, "Resampling", Image), "NEAREST"
        )
        img.resize((width, height), resample=nearest).save(
            out, format="PNG"
        )
        return out.getvalue()
    # route the fallback through decode_media's mime gate: a non-PNG
    # image in a Pillow-less container gets the documented
    # NotImplementedError seam, not png_decode's misleading
    # "not a PNG signature" corruption error
    w, h, rows = decode_media(payload, mime_type)
    resized = [
        [
            rows[min(h - 1, (y * h) // height)][min(w - 1, (x * w) // width)]
            for x in range(width)
        ]
        for y in range(height)
    ]
    return png_encode(resized)


def fake_decode(payload: bytes, mime_type: str) -> list[float]:
    """Deterministic stand-in: FEATURE_DIM floats derived from the
    payload hash. Same shape/dtype contract as a real embedding."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


#: (hex magic prefix at offset 0, container format) — longest first so
#: e.g. ID3 wins before the bare mp3 frame-sync prefixes
_MAGIC_PREFIXES = (
    ("89504E47", "png"),
    ("47494638", "gif"),
    ("664C6143", "flac"),
    ("4F676753", "ogg"),
    ("1A45DFA3", "webm"),
    ("FFD8FF", "jpeg"),
    ("494433", "mp3"),
    ("FFFB", "mp3"),
    ("FFF3", "mp3"),
    ("FFF2", "mp3"),
)

#: mime substrings → the sniffed format they should carry
_MIME_FORMATS = (
    ("png", "png"),
    ("jpeg", "jpeg"),
    ("jpg", "jpeg"),
    ("gif", "gif"),
    ("flac", "flac"),
    ("ogg", "ogg"),
    ("mpeg", "mp3"),
    ("mp3", "mp3"),
    ("webm", "webm"),
    ("matroska", "webm"),
    ("wav", "wav"),
    ("mp4", "mp4"),
    ("quicktime", "mp4"),
    ("avi", "avi"),
)


def sniff_format_expr(payload_col) -> "F.Column":
    """Container format from the payload's magic bytes — a chained
    JVM CASE over the hex of the first 12 bytes (no Python, no full
    payload read: parquet still prunes to the column but a format
    census only decodes 12 bytes per row). Unknown bytes report
    'unknown' instead of raising — the census is how a pipeline
    FINDS the rows decode_media would refuse.

    Built as ONE .when chain so evaluation order IS textual order
    (first match wins): the RIFF/ftyp structural checks first, then
    _MAGIC_PREFIXES as listed, longest/most-specific before the bare
    mp3 frame-sync bytes."""
    h = F.hex(F.substring(payload_col, 1, 12))
    riff = h.startswith("52494646")
    expr = F.when(
        riff & (F.substring(h, 17, 8) == F.lit("57415645")), "wav"
    ).when(riff & (F.substring(h, 17, 8) == F.lit("41564920")), "avi")
    # ISO base-media (mp4/mov): 'ftyp' at bytes 5-8
    expr = expr.when(F.substring(h, 9, 8) == F.lit("66747970"), "mp4")
    for prefix, fmt in _MAGIC_PREFIXES:
        expr = expr.when(h.startswith(prefix), fmt)
    expr = expr.otherwise(F.lit("unknown"))
    return F.when(payload_col.isNull(), F.lit(None).cast("string")).otherwise(
        expr
    )


def _mime_format_expr(mime_col) -> "F.Column":
    """Expected container from the declared mime — the same
    first-match-wins .when chain idiom as sniff_format_expr."""
    m = F.lower(mime_col)
    expr = None
    for needle, fmt in _MIME_FORMATS:
        expr = (
            F.when(m.contains(needle), fmt)
            if expr is None
            else expr.when(m.contains(needle), fmt)
        )
    return expr.otherwise(F.lit(None).cast("string"))


def media_metadata(media: DataFrame, sniff: bool = False) -> DataFrame:
    """Metadata-only projection — by default never touches
    ``payload`` bytes except for length, so the scan prunes the heavy
    column when the source stores byte-length as metadata
    (iceberg/delta stats).

    ``sniff=True`` adds a magic-byte format census: ``sniffed_format``
    (container detected from the payload's first 12 bytes — 'unknown'
    for unrecognized bytes, never a raise) and ``mime_agrees``
    (declared mime vs sniffed container; NULL when either side is
    indeterminate). This is the triage surface in front of
    ``decode_media``'s loud per-row errors: find the mislabeled and
    the undecodable WITHOUT decoding."""
    cols = [
        "media_id",
        "modality",
        "mime_type",
        F.length("payload").alias("n_bytes"),
        "width",
        "height",
        "duration_ms",
    ]
    if sniff:
        sniffed = sniff_format_expr(F.col("payload"))
        expected = _mime_format_expr(F.col("mime_type"))
        cols.append(sniffed.alias("sniffed_format"))
        cols.append(
            F.when(
                sniffed.isNull()
                | expected.isNull()
                | (sniffed == F.lit("unknown")),
                F.lit(None).cast("boolean"),
            )
            .otherwise(sniffed == expected)
            .alias("mime_agrees")
        )
    return media.select(*cols)


def extract_features(
    media: DataFrame, decoder=fake_decode, modalities=None
) -> DataFrame:
    """payload → fixed-dim feature vector via Arrow-batched mapInPandas.

    One Python worker per partition, Arrow transfer both ways; the
    decoder runs per-row inside the batch loop (vectorize further in
    a real deployment with batched GPU decode).

    ``modalities``: optional subset (e.g. ``("image",)``) — rows of
    other modalities keep their metadata/content_hash but get a NULL
    feature instead of being fed to a decoder that cannot read them
    (``image_decode`` raises on audio/wav; the default ``fake_decode``
    handles every modality, so ``None`` decodes all rows).

    A NULL payload always yields a NULL feature, decoder regardless:
    a missing payload has no content to featurize (matching the NULL
    content_hash below), and feeding ``b""`` to a real decoder would
    fail the whole job with a misleading corruption error.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # a NULL mime_type also yields a NULL feature: the
            # modality gate alone would pass the row to a real
            # decoder, which raises on an unidentifiable payload and
            # fails the whole job on one malformed row
            feats = [
                decoder(p, m)
                if p is not None
                and m is not None
                and (modalities is None or mod in modalities)
                else None
                for p, m, mod in zip(
                    pdf["payload"], pdf["mime_type"], pdf["modality"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    # NULL payload -> NULL length (NOT 0, the length
                    # of b""), agreeing with media_metadata's
                    # F.length and the NULL content_hash below
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    # NULL payload -> NULL hash (NOT md5 of b"") so
                    # this column agrees with dedup_media_exact's
                    # JVM md5: a missing payload is not "the same
                    # content" as a genuinely empty file
                    "content_hash": pdf["payload"].map(
                        lambda b: (
                            hashlib.md5(b).hexdigest()
                            if b is not None
                            else None
                        )
                    ),
                    "feature": feats,
                }
            )

    cols = media.select("media_id", "modality", "mime_type", "payload")
    return cols.mapInPandas(batches, schema=MEDIA_FEATURES_SCHEMA)


def dedup_media_exact(media: DataFrame) -> DataFrame:
    """Exact media dedup on content hash — JVM-side md5 over binary,
    no Python in the loop; same shape as ``dedup.dedup_exact``.
    NULL payloads are EXCLUDED: they have no content, so grouping
    them under the NULL hash would declare unrelated broken rows
    duplicates of each other (and disagree with
    ``extract_features``'s NULL content_hash)."""
    return (
        media.filter(F.col("payload").isNotNull())
        .withColumn("content_hash", F.md5(F.col("payload")))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("keep_media_id"),
        )
    )


def fake_resize(payload: bytes, mime_type: str, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: output bytes derived from the
    payload hash + target box, length proportional to the target area
    (mimics a real thumbnail's size behavior for partition-sizing
    tests). Same (bytes in → bytes out) contract as a PIL resizer."""
    h = hashlib.sha256((payload or b"") + f"{width}x{height}".encode()).digest()
    n = max(1, (width * height) // 64)
    return (h * (n // len(h) + 1))[:n]


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, resizer=fake_resize
) -> DataFrame:
    """Image resize via Arrow-batched ``mapInPandas``. Pass
    ``resizer=image_resize`` for REAL pixels (Pillow when importable,
    built-in PNG codec otherwise); the default ``fake_resize`` keeps
    driver queries deterministic over the synthetic text-byte
    payloads, which are not valid images. Output keeps the
    MEDIA_SCHEMA shape with the new box and payload, so resized
    corpora flow through every downstream media op unchanged.

    Scale note: resize SHRINKS rows (thumbnail ≪ original), so the
    output partition count should follow the input's byte-based
    splits; no repartition needed. Only image rows pay the Python
    boundary; other modalities pass through untouched via the cheap
    union of two disjoint filters.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            # NULL payload passes through as NULL — no content to
            # resize, and a real resizer would crash on b""; its
            # box metadata stays AS-IS too (stamping the target box
            # on a payload-less row would describe a thumbnail that
            # does not exist)
            resized_flags = [p is not None for p in pdf["payload"]]
            out["payload"] = [
                resizer(p, m, width, height) if done else None
                for p, m, done in zip(
                    pdf["payload"], pdf["mime_type"], resized_flags
                )
            ]
            out["width"] = [
                width if done else w0
                for w0, done in zip(pdf["width"], resized_flags)
            ]
            out["height"] = [
                height if done else h0
                for h0, done in zip(pdf["height"], resized_flags)
            ]
            yield out

    images = media.filter(F.col("modality") == "image")
    # NULL-modality rows belong to NEITHER disjoint filter (NULL
    # comparisons are false on both sides) — route them through the
    # pass-through branch or they silently vanish from the output
    others = media.filter(
        (F.col("modality") != "image") | F.col("modality").isNull()
    )
    resized = images.mapInPandas(batches, schema=media.schema)
    return resized.unionByName(others)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode a frame-timestamp grid
    from duration metadata (decode of each frame is the stubbed
    step). Pure JVM ``sequence``+``explode`` — the expensive decode
    fan-out is expressed as rows so Spark parallelizes it. A video
    with NULL or zero duration samples NO frames (greatest() skips
    NULLs, so the old floor-at-0 emitted a phantom frame_ts 0 for
    exactly the rows that have nothing to decode — and diverged from
    the oracle's empty range())."""
    grid = F.when(
        F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0),
        F.sequence(
            F.lit(0).cast("bigint"),
            (F.col("duration_ms") - 1).cast("bigint"),
            F.lit(every_ms).cast("bigint"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", F.explode(grid).alias("frame_ts_ms"))
    )


def frame_sample_decode(
    media: DataFrame, every_ms: int = 1000, decoder=None
) -> DataFrame:
    """REAL frame sampling: decode each video payload's frames at the
    ``every_ms`` grid via Arrow-batched ``mapInPandas`` — the decode
    half of ``frame_sample_plan`` (which stays the metadata-only grid
    the driver oracle pins). Output one row per sampled frame:
    (media_id, frame_ts_ms, width, height, mean_luma).

    ``decoder(payload) -> [(ts_ms, w, h, luma), ...]`` defaults to
    the pyav path and raises the dep-seam ``NotImplementedError`` AT
    PLAN BUILD when pyav is absent (a loud driver-side failure, not a
    per-task crash storm on the cluster); inject a deterministic
    decoder to test the Spark plumbing without ffmpeg. NULL payloads
    yield no frames (nothing to decode), matching the NULL-duration
    contract of ``frame_sample_plan``.

    Scale shape: one Python worker per partition, Arrow transfer both
    ways, decode fan-out parallelized by partitioning on media_id —
    repartition upstream when a few huge videos skew partitions.
    """
    if decoder is None:
        avmod = _try_av()
        if avmod is None:
            raise NotImplementedError(
                "frame_sample_decode requires pyav (not installed); "
                "install av or inject decoder= for deterministic tests"
            )

        def decoder(payload):
            return _av_video_decode(avmod, payload, every_ms)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, tss, ws, hs, ls = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for ts_ms, w, h, luma in decoder(payload):
                    ids.append(mid)
                    tss.append(ts_ms)
                    ws.append(w)
                    hs.append(h)
                    ls.append(luma)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_luma": pd.Series(ls, dtype="float64"),
                }
            )

    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", "payload")
        .mapInPandas(
            batches,
            schema=(
                "media_id long, frame_ts_ms long, width int, "
                "height int, mean_luma double"
            ),
        )
    )


def docs_as_media(documents: DataFrame) -> DataFrame:
    """Deterministic MEDIA_SCHEMA frame derived from ``documents`` —
    the sandbox has no real media files, so driver queries exercise
    the multimodal plumbing over synthetic-but-stable payloads:
    utf-8 text bytes as the binary column, modality cycling by
    doc_id, box/duration metadata as pure doc_id expressions (every
    value reproducible by the SQL oracle).
    """
    m = F.col("media_id") % 3
    modality = (
        F.when(m == 0, F.lit("image"))
        .when(m == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    mime = (
        F.when(m == 0, F.lit("image/png"))
        .when(m == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    base = documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return base.select(
        "media_id",
        modality.alias("modality"),
        mime.alias("mime_type"),
        "payload",
        F.when(m == 0, ((F.col("media_id") % 8 + 1) * 16).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("width"),
        F.when(m == 0, ((F.col("media_id") % 4 + 1) * 16).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("height"),
        F.when(m != 0, ((F.col("media_id") % 10 + 1) * 2000).cast("bigint"))
        .otherwise(F.lit(None).cast("bigint"))
        .alias("duration_ms"),
    )
