"""Pure-numpy WAV/PCM audio codec + spectral features — real in-engine.

The audio analog of ``png.py``/``jpeg.py``: RIFF/WAVE is a chunked
container around raw PCM, so decode needs no codec library — and the
standard training-pipeline feature (log-mel spectrogram) is windowed
FFT + a triangular filterbank, all numpy.  Covers:

- RIFF chunk walk (fmt / data, unknown chunks skipped), PCM 8/16/32-bit
  integer and IEEE float32, any channel count / sample rate
- samples normalized to float32 in [-1, 1], channel-interleaved
- ``logmel`` — Hann-windowed rFFT power frames through an HTK-formula
  mel filterbank, log-compressed: the front-end of every speech model
- a fixture encoder (``encode_wav``)

Compressed codecs (MP3/AAC/Opus/ADPCM) raise ``WavError`` — those are
genuinely codec-library territory.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def decode_wav(blob: bytes) -> tuple[int, int, np.ndarray]:
    """-> (sample_rate, channels, float32 samples shaped (n, channels),
    values in [-1, 1])."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE signature")
    pos = 12
    fmt = None
    data = None
    n = len(blob)
    while pos + 8 <= n:
        tag = blob[pos:pos + 4]
        size = int.from_bytes(blob[pos + 4:pos + 8], "little")
        body = blob[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise WavError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            (audio_fmt, channels, rate, _byte_rate, _align,
             bits) = struct.unpack("<HHIIHH", body[:16])
            fmt = (audio_fmt, channels, rate, bits)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavError("missing fmt chunk")
    if data is None:
        raise WavError("missing data chunk")
    audio_fmt, channels, rate, bits = fmt
    if channels == 0 or rate == 0:
        raise WavError("zero channels or sample rate")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:  # unsigned
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32)
            x = x / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32)
            x = x / 2147483648.0
        else:
            raise WavError(f"{bits}-bit integer PCM not supported")
    elif audio_fmt == 3:  # IEEE float
        if bits != 32:
            raise WavError("only 32-bit float PCM supported")
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise WavError(
            f"compressed audio format {audio_fmt} needs a codec library"
        )
    frames = len(x) // channels
    return rate, channels, x[: frames * channels].reshape(
        frames, channels
    )


def encode_wav(
    samples: np.ndarray, rate: int, bits: int = 16,
) -> bytes:
    """Fixture encoder: float samples in [-1, 1] shaped (n,) or
    (n, channels) -> RIFF/WAVE bytes."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    flat = arr.reshape(-1)
    if bits == 16:
        pcm = np.clip(np.rint(flat * 32767), -32768, 32767).astype(
            "<i2"
        ).tobytes()
        audio_fmt = 1
    elif bits == 8:
        pcm = np.clip(
            np.rint(flat * 127 + 128), 0, 255
        ).astype(np.uint8).tobytes()
        audio_fmt = 1
    elif bits == 32:
        pcm = flat.astype("<f4").tobytes()
        audio_fmt = 3
    else:
        raise WavError("encoder supports 8/16-bit int and 32-bit float")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", audio_fmt, channels, rate, rate * block_align,
        block_align, bits,
    )
    body = (b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(pcm).to_bytes(4, "little") + pcm
            + (b"\x00" if len(pcm) & 1 else b""))
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz) / 700.0)


def _mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, rate: int,
    fmin: float = 0.0, fmax: float | None = None,
) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular filters, HTK mel scale."""
    fmax = fmax if fmax is not None else rate / 2.0
    mels = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz = _mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * hz / rate).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        left, center, right = bins[m - 1], bins[m], bins[m + 1]
        for k in range(left, center):
            if center > left:
                fb[m - 1, k] = (k - left) / (center - left)
        for k in range(center, right):
            if right > center:
                fb[m - 1, k] = (right - k) / (right - center)
    return fb


def logmel(
    samples: np.ndarray, rate: int,
    n_fft: int = 256, hop: int = 128, n_mels: int = 20,
) -> np.ndarray:
    """(n_frames, n_mels) log-mel spectrogram: Hann window, rFFT power,
    mel filterbank, log10 with a -80 dB floor.  Multi-channel input is
    mixed down to mono first (mean), the standard front-end move."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    window = np.hanning(n_fft)
    frames = np.lib.stride_tricks.sliding_window_view(
        x, n_fft
    )[::hop][:n_frames]
    spec = np.abs(np.fft.rfft(frames * window, axis=1)) ** 2
    mel = spec @ mel_filterbank(n_mels, n_fft, rate).T
    return np.log10(np.maximum(mel, 1e-8))
