"""AudioFeatures (multimodal.py): REAL WAV decode via stdlib wave —
header metadata + RMS energy profile; corrupt blobs flag-and-keep."""
import io
import wave

import numpy as np
import pyarrow as pa


def _wav_bytes(freq=440.0, sr=8000, seconds=0.5, channels=1):
    n = int(sr * seconds)
    ts = np.arange(n) / sr
    pcm = (np.sin(2 * np.pi * freq * ts) * 0.5 * 32767).astype(np.int16)
    if channels == 2:
        pcm = np.column_stack([pcm, pcm]).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_audio_features_real_wav(ray_session):
    import ray.data as rd

    from sagan_ray.stages.multimodal import AudioFeatures, decode_stage

    # half of the clip is silence: the energy profile must see it
    loud = _wav_bytes(seconds=0.25)
    n = int(8000 * 0.25)
    pcm = np.frombuffer(loud[-n * 2:], dtype=np.int16)
    combined = np.concatenate([pcm, np.zeros(n, dtype=np.int16)])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(combined.tobytes())
    half_silent = buf.getvalue()

    t = pa.table({
        "url": ["a", "b", "c", "d"],
        "html": pa.array([_wav_bytes(), _wav_bytes(channels=2),
                          half_silent, b"definitely not a wav"],
                         type=pa.binary()),
    })
    # take_all, not to_pandas: Ray's pandas tensor extension rejects a
    # list column mixing real rows and NULLs (the corrupt-blob row)
    rows = decode_stage(rd.from_arrow(t), cls=AudioFeatures,
                        concurrency=1).take_all()
    out = {r["url"]: r for r in rows}
    assert out["a"]["sample_rate"] == 8000
    assert out["a"]["n_channels"] == 1
    np.testing.assert_allclose(out["a"]["duration_s"], 0.5)
    assert out["b"]["n_channels"] == 2
    ea = np.asarray(out["a"]["energy"])
    assert len(ea) == 16 and (ea > 0.2).all()  # steady tone everywhere
    ec = np.asarray(out["c"]["energy"])
    assert (ec[:7] > 0.2).all() and (ec[-7:] < 1e-6).all()  # silent tail
    # corrupt blob: NULLs, row kept
    assert out["d"]["duration_s"] is None
    assert out["d"]["energy"] is None


def test_audio_truncated_pcm_keeps_header():
    """A valid header over a malformed PCM body keeps the header
    metadata with a NULL profile (the documented flag-and-keep split),
    instead of nulling the whole row."""
    from sagan_ray.stages.multimodal import AudioFeatures

    good = _wav_bytes(seconds=0.1)
    # declare MANY more frames than the body holds, then truncate the
    # data chunk to an odd byte count: wave yields a short/odd body
    broken = bytearray(good[:60])  # header + a sliver of data
    # patch the RIFF size so wave still opens it
    import struct
    struct.pack_into("<I", broken, 4, len(broken) - 8)
    af = AudioFeatures()
    sr, ch, dur, prof = af._one(bytes(broken))
    assert sr == 8000 and ch == 1 and dur > 0
    # body decode may or may not salvage a sliver — but a hard body
    # failure must never null the header; force one via a monkeypatched
    # reader to pin the contract exactly
    class _W:
        def __enter__(self): return self
        def __exit__(self, *a): return False
        def getframerate(self): return 44100
        def getnchannels(self): return 2
        def getnframes(self): return 441
        def getsampwidth(self): return 2
        def readframes(self, n): raise EOFError("truncated data chunk")
    import wave as _wave
    orig = _wave.open
    _wave.open = lambda *_a, **_k: _W()
    try:
        sr2, ch2, dur2, prof2 = af._one(b"xx")
    finally:
        _wave.open = orig
    assert (sr2, ch2) == (44100, 2)
    assert abs(dur2 - 0.01) < 1e-9
    assert prof2 is None
