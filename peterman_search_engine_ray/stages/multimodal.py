"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as actor-pool stages.

Codec layer: RIFF/WAVE PCM16 audio decodes for real through the stdlib
``wave`` module; images decode through PIL when it is installed
(import-try — this container ships no image libraries); video needs
ffmpeg and stays stubbed.  The deterministic fake formats
(``FAKI``/``FAKA``/``FAKV`` headers) exist so tests and the SQL oracle can
regenerate every byte; every Ray-side concern is real and tested either
way: binary-column schema, small ``batch_size`` for fat rows, actor-pool
signatures with per-actor init, Arrow-native outputs.  Undecodable
payloads raise ``NotImplementedError`` loudly rather than guessing.

Fake formats (big-endian):
  image: b"FAKI" + u16 height + u16 width + u8 channels + h*w*c payload bytes
  audio: b"FAKA" + u32 sample_rate + u32 n_samples + n int16 samples
  video: b"FAKV" + u16 n_frames + per-frame image records
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa


# --- deterministic synthesis (tests/benches) -------------------------------
# Payloads are integer LCG-style sequences (NOT RNG draws) so a SQL oracle
# can regenerate every byte with generate_series arithmetic and verify the
# extracted features end-to-end.

_IMG_MULT, _IMG_STEP = 2654435761, 40503
_AUD_MULT, _AUD_STEP = 2654435761, 48271


def make_fake_image(seed: int, h: int = 8, w: int = 8, c: int = 3) -> bytes:
    k = np.arange(h * w * c, dtype=np.int64)
    payload = ((seed * _IMG_MULT + k * _IMG_STEP) % 256).astype(np.uint8)
    return b"FAKI" + struct.pack(">HHB", h, w, c) + payload.tobytes()


def make_fake_audio(seed: int, rate: int = 16000, n: int = 1024) -> bytes:
    k = np.arange(n, dtype=np.int64)
    samples = (((seed * _AUD_MULT + k * _AUD_STEP) % 65536) - 32768
               ).astype(">i2")           # the FAKA format is big-endian
    return b"FAKA" + struct.pack(">II", rate, n) + samples.tobytes()


def make_fake_video(seed: int, frames: int = 6, h: int = 4, w: int = 4) -> bytes:
    recs = b"".join(make_fake_image(seed * 1000 + f, h, w, 3)
                    for f in range(frames))
    return b"FAKV" + struct.pack(">H", frames) + recs


def synth_media_table(n: int, seed: int = 5) -> pa.Table:
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "image": pa.array([make_fake_image(seed + i) for i in range(n)],
                          pa.binary()),
        "audio": pa.array([make_fake_audio(seed + i) for i in range(n)],
                          pa.binary()),
        "video": pa.array([make_fake_video(seed + i) for i in range(n)],
                          pa.binary()),
    })


# --- decode kernels ---------------------------------------------------------

def _decode_fake_image(b: bytes) -> np.ndarray:
    """FAKI → (h, w, c) uint8; real formats (PNG/JPEG/…) decode through
    PIL when it is installed (import-try — this container ships none)."""
    if b[:4] == b"FAKI":
        h, w, c = struct.unpack(">HHB", b[4:9])
        return np.frombuffer(b, np.uint8, count=h * w * c,
                             offset=9).reshape(h, w, c)
    try:
        import io

        from PIL import Image  # optional dependency; absent here
    except ImportError:
        raise NotImplementedError(
            "real image codecs unavailable in this container (PIL not "
            "installed); only the FAKI fake format decodes") from None
    img = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
    return img


def _decode_fake_audio(b: bytes) -> tuple[int, np.ndarray]:
    """FAKA → (rate, int16 samples); real RIFF/WAVE PCM decodes through
    the stdlib ``wave`` module (no external dependency)."""
    if b[:4] == b"FAKA":
        rate, n = struct.unpack(">II", b[4:12])
        return rate, np.frombuffer(b, ">i2", count=n,
                                   offset=12).astype(np.int16)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        import io
        import wave
        with wave.open(io.BytesIO(b)) as w:
            if w.getsampwidth() != 2:
                raise NotImplementedError("only PCM16 WAV is supported")
            frames = np.frombuffer(w.readframes(w.getnframes()), "<i2")
            if w.getnchannels() > 1:     # downmix by first channel
                frames = frames[::w.getnchannels()]
            return w.getframerate(), frames.astype(np.int16)
    raise NotImplementedError(
        "undecodable audio payload; FAKA and PCM16 WAV are supported")


# --- actor-pool stages ------------------------------------------------------

class ImageFeatures:
    """image binary → (height, width, channels, mean, std) features.
    Use with ``map_batches(ImageFeatures, batch_size=small, concurrency=N)``
    — binary rows are fat; batches must stay object-store-friendly."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math
        hs, ws, cs, means, stds = [], [], [], [], []
        for b in batch["image"].to_pylist():
            img = _decode_fake_image(b)
            hs.append(img.shape[0]); ws.append(img.shape[1]); cs.append(img.shape[2])
            # integer moment sums -> exact doubles a SQL oracle reproduces
            n = img.size
            s1 = int(img.sum(dtype=np.int64))
            s2 = int((img.astype(np.int64) ** 2).sum())
            means.append(s1 / n)
            stds.append(math.sqrt(s2 / n - (s1 / n) * (s1 / n)))
        return pa.table({
            "media_id": batch["media_id"],
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "channels": pa.array(cs, pa.int32()),
            "mean_px": pa.array(means, pa.float64()),
            "std_px": pa.array(stds, pa.float64()),
        })


class ImageResize:
    """Nearest-neighbor resize to (out_h, out_w); emits re-encoded FAKI
    binaries (stand-in for a real resize kernel)."""

    def __init__(self, out_h: int = 4, out_w: int = 4):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for b in batch["image"].to_pylist():
            img = _decode_fake_image(b)
            h, w, c = img.shape
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            small = img[yi][:, xi]
            out.append(b"FAKI" + struct.pack(">HHB", self.out_h, self.out_w, c)
                       + small.tobytes())
        return pa.table({"media_id": batch["media_id"],
                         "image": pa.array(out, pa.binary())})


class AudioFeatures:
    """audio binary → (sample_rate, n_samples, rms, zero_crossings)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, ns, rms, zc = [], [], [], []
        for b in batch["audio"].to_pylist():
            rate, x = _decode_fake_audio(b)
            rates.append(rate); ns.append(len(x))
            # integer sum of squares -> bit-identical rms in the SQL oracle
            sq = int((x.astype(np.int64) ** 2).sum())
            import math
            rms.append(math.sqrt(sq / len(x)) if len(x) else 0.0)
            zc.append(int(((x[:-1].astype(np.int32) * x[1:]) < 0).sum()))
        return pa.table({
            "media_id": batch["media_id"],
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(ns, pa.int64()),
            "rms": pa.array(rms, pa.float64()),
            "zero_crossings": pa.array(zc, pa.int64()),
        })


class VideoFrameSample:
    """video binary → every stride-th frame as image rows (flat_map shape:
    one input row → many output rows)."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, frames = [], [], []
        for mid, b in zip(batch["media_id"].to_pylist(),
                          batch["video"].to_pylist()):
            if b[:4] != b"FAKV":
                raise NotImplementedError("only the FAKV fake format decodes")
            (n_frames,) = struct.unpack(">H", b[4:6])
            off = 6
            for f in range(n_frames):
                h, w, c = struct.unpack(">HHB", b[off + 4:off + 9])
                rec_len = 9 + h * w * c
                if f % self.stride == 0:
                    mids.append(mid); fidx.append(f)
                    frames.append(b[off:off + rec_len])
                off += rec_len
        return pa.table({"media_id": pa.array(mids, pa.int64()),
                         "frame_idx": pa.array(fidx, pa.int32()),
                         "image": pa.array(frames, pa.binary())})
