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


def make_pnm_image(seed: int, h: int = 8, w: int = 8, c: int = 3) -> bytes:
    """Same pixel sequence as :func:`make_fake_image`, encoded as a REAL
    netpbm binary image (P6 for RGB, P5 for grayscale) — decodable by any
    image tool, no library needed."""
    k = np.arange(h * w * c, dtype=np.int64)
    payload = ((seed * _IMG_MULT + k * _IMG_STEP) % 256).astype(np.uint8)
    magic = b"P6" if c == 3 else b"P5"
    if c not in (1, 3):
        raise ValueError("netpbm encodes 1 (P5) or 3 (P6) channels")
    return magic + b"\n" + f"{w} {h}\n255\n".encode() + payload.tobytes()


def make_y4m_video(seed: int, frames: int = 6, h: int = 4, w: int = 4) -> bytes:
    """Same per-frame pixel sequences as :func:`make_fake_video`, encoded as
    a REAL YUV4MPEG2 (.y4m) stream, C444 colorspace — the uncompressed video
    container ffmpeg/mjpegtools read and write."""
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()
    out = [head]
    for f in range(frames):
        k = np.arange(h * w * 3, dtype=np.int64)
        payload = (((seed * 1000 + f) * _IMG_MULT + k * _IMG_STEP) % 256
                   ).astype(np.uint8)
        # C444: three full-resolution planes (Y, Cb, Cr)
        planes = payload.reshape(h, w, 3).transpose(2, 0, 1)
        out.append(b"FRAME\n" + planes.tobytes())
    return b"".join(out)


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

def _decode_pnm(b: bytes) -> np.ndarray:
    """Real netpbm decode (P5 grayscale / P6 RGB, maxval <= 255) with no
    library: whitespace/comment-tolerant header scan + one frombuffer."""
    c = 3 if b[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while b[pos] in b" \t\r\n":
            pos += 1
        if b[pos] == ord("#"):                       # comment to end-of-line
            pos = b.index(b"\n", pos) + 1
            continue
        end = pos
        while b[end] not in b" \t\r\n":
            end += 1
        fields.append(int(b[pos:end]))
        pos = end
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("only 8-bit netpbm payloads decode")
    return np.frombuffer(b, np.uint8, count=h * w * c,
                         offset=pos + 1).reshape(h, w, c)


def _decode_fake_image(b: bytes) -> np.ndarray:
    """FAKI → (h, w, c) uint8.  REAL formats: netpbm P5/P6 decodes natively
    (no dependency); PNG/JPEG/… decode through PIL when it is installed
    (import-try — this container ships none)."""
    if b[:4] == b"FAKI":
        h, w, c = struct.unpack(">HHB", b[4:9])
        return np.frombuffer(b, np.uint8, count=h * w * c,
                             offset=9).reshape(h, w, c)
    if b[:2] in (b"P5", b"P6"):
        return _decode_pnm(b)
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

    @staticmethod
    def _y4m_frames(b: bytes):
        """Real YUV4MPEG2 parse (C444/mono, 8-bit): yields (h, w, c) frame
        arrays with planes restored to interleaved channel order."""
        eol = b.index(b"\n")
        params = dict((tok[:1], tok[1:].decode())
                      for tok in b[10:eol].split(b" ") if tok)
        w, h = int(params[b"W"]), int(params[b"H"])
        cs = params.get(b"C", "420")
        if cs.startswith("444"):
            nc = 3
        elif cs.startswith("mono"):
            nc = 1
        else:
            raise NotImplementedError(
                f"y4m colorspace C{cs} needs chroma upsampling; C444 and "
                "Cmono decode natively")
        off, flen = eol + 1, h * w * nc
        while off < len(b):
            fe = b.index(b"\n", off)          # FRAME line (may carry params)
            if b[off:off + 5] != b"FRAME":
                raise ValueError("corrupt y4m: missing FRAME marker")
            planes = np.frombuffer(b, np.uint8, count=flen, offset=fe + 1)
            yield planes.reshape(nc, h, w).transpose(1, 2, 0)
            off = fe + 1 + flen

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, frames = [], [], []
        for mid, b in zip(batch["media_id"].to_pylist(),
                          batch["video"].to_pylist()):
            if b[:9] == b"YUV4MPEG2":          # real .y4m container
                for f, img in enumerate(self._y4m_frames(b)):
                    if f % self.stride == 0:
                        h, w, c = img.shape
                        mids.append(mid); fidx.append(f)
                        frames.append(
                            b"FAKI" + struct.pack(">HHB", h, w, c)
                            + np.ascontiguousarray(img).tobytes())
                continue
            if b[:4] != b"FAKV":
                raise NotImplementedError(
                    "only FAKV and YUV4MPEG2 (.y4m) video payloads decode")
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
