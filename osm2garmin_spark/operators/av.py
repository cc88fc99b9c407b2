"""Audio/video multimodal operators: opaque binary columns with typed
metadata, processed in Arrow batches (mapInPandas) — the same shape as the
image path in operators/raster.py.

Containers are deliberately trivial and fully specified so everything is
decodable without media libraries (none exist in this container):

- video: ``bytes`` = n_frames raw uint8 grayscale frames of (h, w),
  concatenated row-major; metadata columns n_frames, w, h, fps.
  ``sample_frames`` emits every k-th frame as its own row (binary column)
  — the training-pipeline "frame sample" stage; the per-frame payload can
  then flow through the image kernels (decode_stats, resize, contours).
  A real codec (h264 etc.) would slot into _split_frames behind the same
  schema; that decode step is the only thing this module fakes, and the
  fake is a byte-exact deterministic container, not a placeholder.
- audio: ``bytes`` = int16 little-endian PCM mono; metadata sample_rate.
  ``audio_features`` computes per-window RMS, zero-crossing rate and peak
  — real vectorized numpy DSP, no stub at all.

Everything keeps the binary payload on executors; only small numeric/
binary-per-frame columns ever move.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

VIDEO_SCHEMA = ("video_id string, bytes binary, n_frames int, w int, h int, "
                "fps double")
AUDIO_SCHEMA = "audio_id string, bytes binary, sample_rate int"

FRAME_SCHEMA = "video_id string, frame_idx int, w int, h int, frame binary"
AUDIO_FEAT_SCHEMA = ("audio_id string, win_idx int, rms double, "
                     "zcr double, peak int")


def synth_videos(spark: SparkSession, n: int, n_frames: int = 12,
                 w: int = 16, h: int = 16, partitions: int = 4) -> DataFrame:
    """Deterministic fake-video corpus: frame f of video i is the raster
    pattern ((x*(i%7+1) + y*(i%11+3) + i + f) % 256)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            rows = {"video_id": [], "bytes": [], "n_frames": [],
                    "w": [], "h": [], "fps": []}
            for i in ids.tolist():
                frames = np.stack([
                    ((x[None, :] * (i % 7 + 1) + y[:, None] * (i % 11 + 3)
                      + i + f) % 256).astype(np.uint8)
                    for f in range(n_frames)])
                rows["video_id"].append(f"vid{i}")
                rows["bytes"].append(frames.tobytes())
                rows["n_frames"].append(n_frames)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["fps"].append(24.0)
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, VIDEO_SCHEMA)


def synth_audio(spark: SparkSession, n: int, n_samples: int = 4096,
                sample_rate: int = 16000, partitions: int = 4) -> DataFrame:
    """Deterministic fake-audio corpus: int16 PCM triangle wave +
    integer-LCG noise. Integer phase math + IEEE basic ops ONLY (+ - * /
    abs — each correctly rounded per IEEE 754), deliberately no libm
    transcendentals: the waveform is bit-reproducible in ANY engine, so
    the DuckDB oracle for audio_window_features can recompute the exact
    PCM (a sin()-based tone differs between numpy's vectorized sin and
    another engine's libm in the last ulp, which flips the int16
    truncation on boundary samples)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ti = np.arange(n_samples, dtype=np.int64)
        t = ti.astype(np.float64)
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            rows = {"audio_id": [], "bytes": [], "sample_rate": []}
            for i in ids.tolist():
                freq = 110 * (i % 8 + 1)
                phase = ((freq * ti) % sample_rate).astype(np.float64)
                tone = np.abs(phase * 2.0 / sample_rate - 1.0) * 2.0 - 1.0
                noise = (((i * 1103515245 + ti * 12345 + 7)
                          % 2048) - 1024) / 8192.0
                pcm = np.clip((tone * 0.5 + noise * 0.1) * 32767,
                              -32768, 32767).astype("<i2")
                rows["audio_id"].append(f"aud{i}")
                rows["bytes"].append(pcm.tobytes())
                rows["sample_rate"].append(sample_rate)
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, AUDIO_SCHEMA)


def _split_frames(b: bytes, n_frames: int, w: int, h: int) -> np.ndarray:
    """Container decode: (n_frames, h, w) uint8 view. A real video codec
    slots in here behind the same signature."""
    arr = np.frombuffer(b, dtype=np.uint8)
    if len(arr) != n_frames * h * w:
        raise ValueError("video payload length mismatch")
    return arr.reshape(n_frames, h, w)


def sample_frames(videos: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling: one output row per kept frame (indices 0, every,
    2·every, …) with the frame's raw bytes — the fan-out stage before
    per-frame image featurization."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"video_id": [], "frame_idx": [], "w": [], "h": [],
                   "frame": []}
            for vid, b, nf, w, h in zip(pdf["video_id"], pdf["bytes"],
                                        pdf["n_frames"], pdf["w"], pdf["h"]):
                frames = _split_frames(b, int(nf), int(w), int(h))
                for idx in range(0, int(nf), every):
                    out["video_id"].append(vid)
                    out["frame_idx"].append(idx)
                    out["w"].append(int(w))
                    out["h"].append(int(h))
                    out["frame"].append(frames[idx].tobytes())
            if out["video_id"]:
                yield pd.DataFrame(out)

    cols = videos.select("video_id", "bytes", "n_frames", "w", "h")
    return cols.mapInPandas(kernel, schema=FRAME_SCHEMA)


def audio_features(audio: DataFrame, window: int = 1024) -> DataFrame:
    """Per-window audio features over int16 PCM: RMS, zero-crossing rate,
    absolute peak. Vectorized numpy over each Arrow batch (reshape to
    (n_windows, window) — no per-sample Python)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"audio_id": [], "win_idx": [], "rms": [], "zcr": [],
                   "peak": []}
            for aid, b in zip(pdf["audio_id"], pdf["bytes"]):
                pcm = np.frombuffer(b, dtype="<i2")
                n_win = len(pcm) // window
                if n_win == 0:
                    continue
                wv = pcm[:n_win * window].reshape(n_win, window)
                f = wv.astype(np.float64)
                rms = np.sqrt((f * f).mean(axis=1))
                signs = np.signbit(wv)
                zcr = (signs[:, 1:] != signs[:, :-1]).mean(axis=1)
                peak = np.abs(wv.astype(np.int32)).max(axis=1)
                out["audio_id"].extend([aid] * n_win)
                out["win_idx"].extend(range(n_win))
                out["rms"].extend(rms.tolist())
                out["zcr"].extend(zcr.tolist())
                out["peak"].extend(peak.tolist())
            if out["audio_id"]:
                yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes").mapInPandas(
        kernel, schema=AUDIO_FEAT_SCHEMA)
