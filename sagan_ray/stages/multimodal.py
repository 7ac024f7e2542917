"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns; decode / resize /
feature-extract / frame-sample run as actor-pool ``map_batches`` stages
so codecs load once per actor. The decode libraries (PIL, ffmpeg, …) are
NOT in this container, so each decoder tries the real import in
``__init__`` and otherwise falls back to a DETERMINISTIC fake (features
derived from payload bytes) — the Ray-side plumbing (schema, batch size,
actor signature, output layout) is real and tested either way.

Keep batches SMALL for wide binary rows (see batch_size defaults): a
batch × pool-size must fit the worker heap; blocks of big binaries
should stay near ``DataContext.target_max_block_size``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class DecodeImageStub:
    """payload binary -> (width, height, mean_byte) metadata.

    Real path would be PIL.Image.open; fake path derives deterministic
    dimensions from a blake2b of the payload so tests are stable.
    """

    def __init__(self, payload_col: str = "html"):
        self.payload_col = payload_col
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401

            self.real = True
        except ImportError:
            self.real = False

    def _fake_decode(self, payload: bytes) -> tuple[int, int, int]:
        # deterministic AND SQL-expressible (from octet_length alone) so
        # the driver's DuckDB oracle can mirror the stub exactly; a real
        # decoder would read the payload header instead
        n = len(payload)
        width = 16 + (n * 7919) % 240
        height = 16 + (n * 104729) % 240
        mean_byte = int(np.frombuffer(payload[:256] or b"\0", dtype=np.uint8).mean())
        return width, height, mean_byte

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.real:  # pragma: no cover
            raise NotImplementedError("real image decode not wired in this container")
        dims = [self._fake_decode(p or b"") for p in t[self.payload_col].to_pylist()]
        w, h, m = zip(*dims) if dims else ((), (), ())
        return pa.table(
            {
                "url": t["url"],
                "n_bytes": pa.array(
                    [len(p or b"") for p in t[self.payload_col].to_pylist()],
                    type=pa.int64(),
                ),
                "width": pa.array(list(w), type=pa.int32()),
                "height": pa.array(list(h), type=pa.int32()),
                "mean_byte": pa.array(list(m), type=pa.int32()),
            }
        )


class FrameSampleStub:
    """video payload -> every Nth frame's fake feature vector (list<float>).

    Demonstrates the 1-row -> N-rows explode layout for frame sampling."""

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
