"""Dependency-free reference media decoders for the multimodal seam.

:func:`extract_media_features` (operators/multimodal.py) takes any
``decoder: (bytes, kind) -> np.ndarray``. The container has no image/audio
libraries, so these pure-stdlib codecs (zlib PNG inflate + unfilter,
``wave`` PCM reader) prove the seam end-to-end on REAL bytes: actual
pixels and samples are decoded inside the Arrow-batched ``mapInPandas``
worker, not hash fakes. In production you'd swap in a native decoder
(Pillow/ffmpeg/torchvision) behind the same callable — these stay useful
as slow-path verifiers.

Both decoders are deterministic pure functions of the payload, so features
are stable across partitionings and retries (the same invariant the
default ``_fake_decode`` guarantees).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

__all__ = [
    "decode_png",
    "png_features",
    "decode_wav",
    "wav_features",
    "route_decoder",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (palette unsupported — reference decoder)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to an (H, W, C) uint8 array.

    Full spec unfiltering (None/Sub/Up/Average/Paeth); palette,
    16-bit, and interlaced images are out of scope for the reference
    decoder and raise ``ValueError``.
    """
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG: depth={bit_depth} color={color_type} "
                    f"interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, ch)


def png_features(payload: bytes, kind: str = "image") -> np.ndarray:
    """Real-pixel image features: [width, height, channels, then per-channel
    mean and std over decoded pixels (up to 4 channels, zero-padded)]."""
    px = decode_png(payload).astype(np.float64)
    h, w, c = px.shape
    means = np.zeros(4)
    stds = np.zeros(4)
    means[:c] = px.reshape(-1, c).mean(axis=0) / 255.0
    stds[:c] = px.reshape(-1, c).std(axis=0) / 255.0
    return np.concatenate(([float(w), float(h), float(c)], means, stds))


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode 16-bit PCM WAV bytes to (samples[n, channels] float64 in
    [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("reference decoder supports 16-bit PCM only")
        n = wf.getnframes()
        rate = wf.getframerate()
        ch = wf.getnchannels()
        pcm = np.frombuffer(wf.readframes(n), dtype="<i2")
    return pcm.reshape(-1, ch).astype(np.float64) / 32768.0, rate


def wav_features(payload: bytes, kind: str = "audio") -> np.ndarray:
    """Real-sample audio features: [duration_s, channels, sample_rate_khz,
    rms, peak, zero-crossing rate] over the decoded waveform."""
    samples, rate = decode_wav(payload)
    mono = samples.mean(axis=1)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    return np.array(
        [
            samples.shape[0] / rate,
            float(samples.shape[1]),
            rate / 1000.0,
            float(np.sqrt(np.mean(mono**2))),
            float(np.max(np.abs(mono))) if len(mono) else 0.0,
            zc,
        ]
    )


def route_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Kind-dispatched real decoder for :func:`extract_media_features`:
    PNG images and PCM WAV audio decode for real; other kinds fall back to
    the deterministic fake (codecs beyond stdlib are not in this
    container)."""
    from featurescreening_jl_spark.operators.multimodal import _fake_decode

    if kind.startswith("image") and payload.startswith(_PNG_SIG):
        return png_features(payload, kind)
    if kind.startswith("audio") and payload[:4] == b"RIFF":
        return wav_features(payload, kind)
    return _fake_decode(payload, kind)
