"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns; decode / resize /
feature-extract / frame-sample run as actor-pool ``map_batches`` stages
so codecs load once per actor. The decode libraries (PIL, ffmpeg, …) are
NOT in this container, so each decoder tries the real import in
``__init__`` and otherwise falls back to a DETERMINISTIC fake (features
derived from payload bytes) — the Ray-side plumbing (schema, batch size,
actor signature, output layout) is real and tested either way. All
three modalities now have real decode paths behind the try-import:
image (:class:`DecodeImage`, PIL), audio (:class:`AudioFeatures`,
stdlib ``wave``), video/animation (:class:`FrameSample`, PIL
``ImageSequence``).

Keep batches SMALL for wide binary rows (see batch_size defaults): a
batch × pool-size must fit the worker heap; blocks of big binaries
should stay near ``DataContext.target_max_block_size``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class DecodeImage:
    """payload binary -> (width, height, mean_byte) metadata.

    ``mode``:

    * ``"auto"`` (default): real PIL decode when PIL imports, else the
      deterministic stub — a container WITH PIL gets real decoding, one
      without keeps working.
    * ``"real"``: require PIL (ImportError in ``__init__`` otherwise —
      fails at actor construction, not mid-stream).
    * ``"stub"``: always the deterministic fake — the oracle-facing
      choice (dims derive from octet_length alone, so the driver's
      DuckDB SQL mirrors the stage exactly in any environment).

    Real path: PIL header read for dims + grayscale mean; payloads PIL
    cannot decode yield NULL width/height/mean_byte (flag-and-keep, so
    a corrupt blob never kills the batch). PIL import is resolved ONCE
    per actor in ``__init__`` (actor-pool contract), never per batch.
    """

    def __init__(self, payload_col: str = "html", mode: str = "auto"):
        self.payload_col = payload_col
        self._pil = None
        if mode in ("auto", "real"):
            try:
                from PIL import Image

                self._pil = Image
            except ImportError:
                if mode == "real":
                    raise
        self.real = self._pil is not None

    def _fake_decode(self, payload: bytes) -> tuple[int, int, int]:
        # deterministic AND SQL-expressible (from octet_length alone) so
        # the driver's DuckDB oracle can mirror the stub exactly; a real
        # decoder would read the payload header instead
        n = len(payload)
        width = 16 + (n * 7919) % 240
        height = 16 + (n * 104729) % 240
        mean_byte = int(np.frombuffer(payload[:256] or b"\0", dtype=np.uint8).mean())
        return width, height, mean_byte

    def _real_decode(self, payload: bytes):
        import io

        try:
            with self._pil.open(io.BytesIO(payload)) as im:
                w, h = im.size
                mean = int(np.asarray(im.convert("L")).mean()) if w and h else 0
            return w, h, mean
        except Exception:
            return None, None, None

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in t[self.payload_col].to_pylist()]
        dec = self._real_decode if self.real else self._fake_decode
        dims = [dec(p) for p in payloads]
        w, h, m = zip(*dims) if dims else ((), (), ())
        return pa.table(
            {
                "url": t["url"],
                "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
                "width": pa.array(list(w), type=pa.int32()),
                "height": pa.array(list(h), type=pa.int32()),
                "mean_byte": pa.array(list(m), type=pa.int32()),
            }
        )


# backwards-compatible name (pre-round-3 the stub was the only path)
DecodeImageStub = DecodeImage


class FrameSampleStub:
    """video payload -> every Nth frame's fake feature vector (list<float>).

    Demonstrates the 1-row -> N-rows explode layout for frame sampling.
    The REAL decode path lives in :class:`FrameSample` (PIL
    ImageSequence); this stub is its no-PIL fallback and the
    oracle-facing deterministic choice."""

    def __init__(self, every_n: int = 10, payload_col: str = "html"):
        self.every_n = every_n
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        urls, frame_ids, feats = [], [], []
        for url, p in zip(t["url"].to_pylist(), t[self.payload_col].to_pylist()):
            p = p or b""
            n_frames = max(1, len(p) // 100)  # fake: 1 frame per 100 bytes
            for f in range(0, n_frames, self.every_n):
                h = hashlib.blake2b(p + f.to_bytes(4, "little"), digest_size=16).digest()
                urls.append(url)
                frame_ids.append(f)
                feats.append((np.frombuffer(h, dtype=np.uint8) / 255.0).tolist())
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "frame_id": pa.array(frame_ids, type=pa.int32()),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
            }
        )


class FrameSample:
    """video/animation payload -> every Nth frame's feature vector —
    the REAL frame-sampling path.

    ``mode`` works exactly like :class:`DecodeImage`:

    * ``"auto"`` (default): PIL ``ImageSequence`` when PIL imports
      (animated GIF / multi-page TIFF / APNG — the formats PIL's
      sequence iterator handles without ffmpeg), else the
      :class:`FrameSampleStub` fake.
    * ``"real"``: require PIL (ImportError at actor construction).
    * ``"stub"``: always the deterministic fake (SQL-mirrorable).

    Real path per payload: iterate frames, keep every ``every_n``-th
    (0, N, 2N, … — the stub's sampling grid), emit one row per kept
    frame with a 16-bin normalized grayscale histogram as the feature
    vector (the fixed-width per-frame layout a real video frontend
    would emit). Payloads PIL cannot open — or with zero decodable
    frames — yield ONE row with NULL frame_id/feature (flag-and-keep:
    a corrupt blob never kills the batch, and the row count preserves
    lineage). PIL resolves ONCE per actor in ``__init__``."""

    def __init__(self, every_n: int = 10, payload_col: str = "html",
                 mode: str = "auto", n_bins: int = 16):
        self.every_n = every_n
        self.payload_col = payload_col
        self.n_bins = n_bins
        self._pil = None
        self._seq = None
        if mode in ("auto", "real"):
            try:
                from PIL import Image, ImageSequence

                self._pil = Image
                self._seq = ImageSequence
            except ImportError:
                if mode == "real":
                    raise
        self.real = self._pil is not None
        self._stub = FrameSampleStub(every_n, payload_col)

    def _frame_feature(self, frame) -> list[float]:
        g = np.asarray(frame.convert("L"), dtype=np.uint8)
        if g.size == 0:
            return [0.0] * self.n_bins
        # n_bins-bin grayscale histogram, normalized to sum 1
        bins = (g.reshape(-1).astype(np.int64) * self.n_bins) >> 8
        hist = np.bincount(bins, minlength=self.n_bins).astype(np.float64)
        return (hist / g.size).astype(np.float32).tolist()

    def _real_rows(self, url: str, payload: bytes) -> list[tuple]:
        import io

        try:
            rows = []
            with self._pil.open(io.BytesIO(payload)) as im:
                for f, frame in enumerate(self._seq.Iterator(im)):
                    if f % self.every_n:
                        continue
                    rows.append((url, f, self._frame_feature(frame)))
            return rows or [(url, None, None)]
        except Exception:
            return [(url, None, None)]

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.real:
            return self._stub(t)
        rows: list[tuple] = []
        for url, p in zip(t["url"].to_pylist(),
                          t[self.payload_col].to_pylist()):
            rows.extend(self._real_rows(url, p or b""))
        urls, frame_ids, feats = zip(*rows) if rows else ((), (), ())
        return pa.table({
            "url": pa.array(list(urls), type=pa.string()),
            "frame_id": pa.array(list(frame_ids), type=pa.int32()),
            "feature": pa.array(list(feats),
                                type=pa.list_(pa.float32())),
        })


def decode_stage(ds, cls=DecodeImageStub, batch_size: int = 256,
                 concurrency: int = 4, **kwargs):
    """Attach a multimodal actor-pool stage (small batches for binaries)."""
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class AudioFeatures:
    """audio payload binary -> (sample_rate, n_channels, duration_s,
    energy vector) — a REAL WAV path with zero external deps.

    Unlike the image/video stages (whose real decoders need wheels this
    container may lack), WAV parsing is stdlib (``wave``): header gives
    rate/channels/frames, and the PCM body yields an ``n_bins`` RMS
    energy profile (the MFCC-shaped fixed-width feature layout a real
    audio frontend would emit) via one numpy pass. Non-WAV / corrupt
    payloads flag-and-keep as NULLs, same as :class:`DecodeImage` —
    a bad blob never kills the batch. Only 16-bit PCM bodies get the
    energy profile (the overwhelmingly common case); other widths keep
    header metadata with a NULL profile.

    Actor-pool stage (``decode_stage(ds, cls=AudioFeatures)``): small
    batches for binary payloads, setup once per actor.
    """

    def __init__(self, payload_col: str = "html", n_bins: int = 16):
        self.payload_col = payload_col
        self.n_bins = n_bins

    def _one(self, payload: bytes):
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload)) as w:
                sr = w.getframerate()
                ch = w.getnchannels()
                nf = w.getnframes()
                width = w.getsampwidth()
                dur = nf / sr if sr else 0.0
                prof = None
                if width == 2 and nf:
                    # body decode has its OWN fallback: a valid header
                    # over a truncated/odd PCM chunk keeps the header
                    # metadata with a NULL profile (the documented
                    # contract), instead of nulling the whole row
                    try:
                        raw = w.readframes(nf)
                        pcm = np.frombuffer(
                            raw[: (len(raw) // 2) * 2], dtype=np.int16)
                        if ch > 1:
                            pcm = pcm[: (len(pcm) // ch) * ch].reshape(
                                -1, ch)
                            pcm = pcm.mean(axis=1)
                        pcm = pcm.astype(np.float64) / 32768.0
                        # n_bins RMS windows over the whole clip
                        edges = np.linspace(0, len(pcm),
                                            self.n_bins + 1,
                                            dtype=np.int64)
                        prof = [
                            float(np.sqrt(np.mean(pcm[a:b] ** 2)))
                            if b > a else 0.0
                            for a, b in zip(edges[:-1], edges[1:])
                        ]
                    except Exception:
                        prof = None
            return sr, ch, dur, prof
        except Exception:
            return None, None, None, None

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in t[self.payload_col].to_pylist()]
        rows = [self._one(p) for p in payloads]
        sr, ch, dur, prof = zip(*rows) if rows else ((), (), (), ())
        return pa.table({
            "url": t["url"],
            "n_bytes": pa.array([len(p) for p in payloads],
                                type=pa.int64()),
            "sample_rate": pa.array(list(sr), type=pa.int32()),
            "n_channels": pa.array(list(ch), type=pa.int32()),
            "duration_s": pa.array(list(dur), type=pa.float64()),
            "energy": pa.array(list(prof), type=pa.list_(pa.float32())),
        })
