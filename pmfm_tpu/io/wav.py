"""WAV audio file I/O.

Replaces the reference's libsndfile read path (main.cpp:307-335) and the
vendored AudioFile 24-bit write path (main.cpp:337-365, AudioFile.h/.cpp).
Supports PCM 16/24/32-bit and IEEE float32, mono or multichannel
(multichannel is averaged to mono on read, like readAudioFile's
channel-agnostic frame read).

A native C++ codec (pmfm_tpu/native) is used when built; this pure-NumPy
implementation is the always-available fallback and the behavioural spec.
"""
from __future__ import annotations

import os
import struct

import numpy as np

DEFAULT_SAMPLE_RATE = 44100
DEFAULT_BIT_DEPTH = 24  # main.cpp:358 (AudioFile setBitDepth(24))


def _try_native():
    try:
        from ..native import runtime as _rt

        return _rt if _rt.available() else None
    except Exception:
        return None


def read_wav(path: str | os.PathLike) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (mono float32 in [-1, 1], sample_rate)."""
    path = os.fspath(path)
    rt = _try_native()
    if rt is not None:
        out = rt.read_wav(path)
        if out is not None:
            return out
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # the real format is the first two bytes of the SubFormat GUID at
        # fmt-body offset 24 (after cbSize + validBits + channelMask)
        if len(fmt_body) >= 26:
            (audio_format,) = struct.unpack_from("<H", fmt_body, 24)
        else:
            audio_format = 1  # malformed extensible header: assume PCM
    if audio_format == 3:  # IEEE float
        x = np.frombuffer(payload, "<f4").astype(np.float32)
    elif audio_format == 1:
        if bits == 16:
            x = np.frombuffer(payload, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
            vals = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(payload, "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"{path}: unsupported WAV format code {audio_format}")
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(x, np.float32), int(sample_rate)


def write_wav(
    path: str | os.PathLike,
    audio: np.ndarray,
    sample_rate: int = DEFAULT_SAMPLE_RATE,
    bit_depth: int = DEFAULT_BIT_DEPTH,
    normalize: bool = False,
) -> None:
    """Write mono audio to WAV (PCM 16/24/32 or float32 via bit_depth=0).

    The reference writes un-normalised candidate audio whose amplitude is in
    the thousands (output = osc * modFreq*modIdx); pass ``normalize=True`` to
    peak-normalise into [-1, 1] first (recommended for audition).
    """
    path = os.fspath(path)
    audio = np.asarray(audio, np.float32).reshape(-1)
    if normalize:
        peak = float(np.abs(audio).max()) or 1.0
        audio = audio / peak
    rt = _try_native()
    if rt is not None and rt.write_wav(path, audio, sample_rate, bit_depth):
        return
    if bit_depth == 0:  # IEEE float32
        fmt_code, bits, payload = 3, 32, audio.astype("<f4").tobytes()
    elif bit_depth == 16:
        q = np.clip(np.rint(audio * 32767.0), -32768, 32767).astype("<i2")
        fmt_code, bits, payload = 1, 16, q.tobytes()
    elif bit_depth == 24:
        q = np.clip(np.rint(audio * float((1 << 23) - 1)), -(1 << 23), (1 << 23) - 1).astype(
            np.int32
        )
        b = np.empty((len(q), 3), np.uint8)
        b[:, 0] = q & 0xFF
        b[:, 1] = (q >> 8) & 0xFF
        b[:, 2] = (q >> 16) & 0xFF
        fmt_code, bits, payload = 1, 24, b.tobytes()
    elif bit_depth == 32:
        q = np.clip(np.rint(audio * float((1 << 31) - 1)), -(1 << 31), (1 << 31) - 1).astype(
            "<i4"
        )
        fmt_code, bits, payload = 1, 32, q.tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    block_align = bits // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt_code, 1, sample_rate, sample_rate * block_align, block_align, bits
    )
    hdr += b"data" + struct.pack("<I", len(payload))
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "wb") as f:
        f.write(hdr + payload)
