"""Multimodal video columns — decode / frame-sample / per-frame features.

A video rides as an opaque ``binary`` payload + typed metadata (fps,
duration); decoded form is one ROW PER SAMPLED FRAME, not one row per video
— at 100 TB a single video's frames must not be forced through one task,
and frame rows partition/shuffle like any other data.

Codec (ffmpeg/pyav) is absent here: the fake decode derives each frame
deterministically from (payload, frame index); frame *sampling* and frame
*features* are real logic over the decoded arrays.  ``real_decode_video``
raises until a codec is installed."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from tts_data_pipeline_spark.multimodal.image import fake_decode_image

FRAME_SCHEMA = (
    "path string, frame_idx int, t_sec double, height int, width int, "
    "channels int, pixels array<int>"
)


def real_decode_video(payload: bytes):  # pragma: no cover - needs pyav/ffmpeg
    """Real codec hook — requires pyav/ffmpeg (not in this image).

    Same per-frame contract as the fake frame source: a list of
    (frame_idx, (H, W, 3) uint8 RGB ndarray).  tests/
    test_real_library_seams.py smoke-checks the contract when pyav is
    installed."""
    try:
        import io

        import av
    except ImportError as exc:
        raise NotImplementedError(
            "video decode requires pyav/ffmpeg (not in this environment); "
            "swap the fake frame source for av.open(BytesIO(payload))"
        ) from exc
    frames = []
    with av.open(io.BytesIO(payload)) as container:
        for i, frame in enumerate(container.decode(video=0)):
            frames.append((i, frame.to_ndarray(format="rgb24")))
    return frames


def sample_frame_indices(n_frames: int, every_k: int) -> list[int]:
    """Frame-sampling policy: every k-th frame, always including frame 0."""
    return list(range(0, max(n_frames, 1), max(every_k, 1)))


def decode_sampled_frames(
    df: DataFrame,
    payload_col: str = "content",
    path_col: str = "path",
    fps_col: str = "fps",
    n_frames_col: str = "n_frames",
    every_k: int = 10,
    height: int = 16,
    width: int = 16,
) -> DataFrame:
    """Decode + frame-sample in one pass: one output row per sampled frame.

    Sampling happens BEFORE materializing pixels, the way a real codec seeks
    keyframes — never decode-everything-then-filter."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                fps = float(r[fps_col]) or 1.0
                for idx in sample_frame_indices(int(r[n_frames_col]), every_k):
                    # deterministic per-frame payload: frame index salts bytes
                    salted = bytes((b + idx) % 256 for b in (r[payload_col] or b"\0"))
                    img = fake_decode_image(salted, height, width)
                    rows.append(
                        {
                            "path": r[path_col],
                            "frame_idx": idx,
                            "t_sec": round(idx / fps, 4),
                            "height": height,
                            "width": width,
                            "channels": 3,
                            "pixels": img.reshape(-1).astype(np.int32),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, FRAME_SCHEMA)


def frame_motion_features(frames: DataFrame) -> DataFrame:
    """Per-video motion proxy (real math): mean absolute pixel delta between
    consecutive sampled frames — the cheap scene-change / static-video signal
    curation filters on.  Keyed aggregation per video; frame order restored
    inside the group."""
    import pyspark.sql.functions as F

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # integer-exact accumulation: per-pair |delta| sums stay BIGINT and
        # divide once at the end, so the reported motion is a pure function
        # of the pixel ints — reproducible in SQL (the mm_video_motion
        # oracle) where a float mean-of-means would drift by ulps
        pdf = pdf.sort_values("frame_idx")
        imgs = [np.asarray(p, dtype=np.int64) for p in pdf["pixels"]]
        sums = [int(np.abs(a - b).sum()) for a, b in zip(imgs[1:], imgs[:-1])]
        npx = len(imgs[0]) if imgs else 1
        n = len(sums)
        return pd.DataFrame(
            {
                "path": [pdf["path"].iloc[0]],
                "n_frames_sampled": [len(imgs)],
                "mean_motion": [
                    round(sum(sums) / (npx * n), 4) if n else 0.0
                ],
                "max_motion": [round(max(sums) / npx, 4) if n else 0.0],
            }
        )

    return frames.groupBy(F.col("path")).applyInPandas(
        fold,
        "path string, n_frames_sampled long, mean_motion double, "
        "max_motion double",
    )
