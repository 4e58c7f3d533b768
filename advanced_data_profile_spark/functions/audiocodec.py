"""Pure-numpy WAV (RIFF PCM) codec — the audio analogue of
functions.imagecodec. WAV is a public spec (RIFF container, fmt/data
chunks) and PCM payloads are numpy-decodable without soundfile/librosa,
so the audio featurize path is REAL in this container; compressed
codecs (mp3/ogg/flac) are a production swap-in inside the same kernel.
"""

from __future__ import annotations

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM -> (sample_rate, mono float64 samples in [-1, 1]).
    Multi-channel input is mixed down by mean. Raises ValueError on
    anything that is not uncompressed integer PCM."""
    if payload is None or len(payload) < 44:
        raise ValueError("payload too short for RIFF/WAVE")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise ValueError(f"unsupported (non-PCM) audio format {audio_format}")
    if bits not in _PCM_DTYPES or channels < 1 or rate <= 0:
        raise ValueError(f"unsupported PCM layout bits={bits} ch={channels}")
    frame = (bits // 8) * channels
    usable = len(data) // frame * frame
    x = np.frombuffer(data[:usable], dtype=_PCM_DTYPES[bits]).reshape(-1, channels)
    x = x.astype(np.float64)
    if bits == 8:  # 8-bit WAV is unsigned
        x = (x - 128.0) / 128.0
    else:
        x = x / float(1 << (bits - 1))
    return rate, x.mean(axis=1)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """mono float samples in [-1, 1] -> RIFF/WAVE PCM bytes (the test
    fixture writer; also handy for the resample/re-encode path)."""
    if bits not in _PCM_DTYPES:
        raise ValueError(f"unsupported bits {bits}")
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if bits == 8:
        # same 128 scale as decode (unsigned, 128-centered)
        pcm = np.clip(np.round(x * 128.0 + 128.0), 0, 255).astype(np.uint8)
    else:
        # same 2^(bits-1) scale as decode; +1.0 clips to int max
        scale = 1 << (bits - 1)
        pcm = np.clip(np.round(x * scale), -scale, scale - 1).astype(
            _PCM_DTYPES[bits]
        )
    data = pcm.tobytes()
    block = bits // 8
    fmt = (
        (1).to_bytes(2, "little")           # PCM
        + (1).to_bytes(2, "little")         # mono
        + int(rate).to_bytes(4, "little")
        + int(rate * block).to_bytes(4, "little")   # byte rate
        + block.to_bytes(2, "little")       # block align
        + bits.to_bytes(2, "little")
    )
    # RIFF chunks are 2-byte aligned: an odd data payload (8-bit PCM,
    # odd sample count) gets a pad byte AFTER the chunk; the chunk size
    # field stays the unpadded length, and the RIFF size includes the
    # pad (spec-strict third-party parsers reject unpadded files)
    pad = b"\x00" if len(data) % 2 else b""
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + b"data" + len(data).to_bytes(4, "little") + data + pad
    return b"RIFF" + len(body).to_bytes(4, "little") + body
