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
        # r14 optimization (guide §4.2): the salt is elementwise, so
        # salt-then-tile == tile-then-salt — tile the payload ONCE per
        # video and salt ALL sampled frames in one broadcasted numpy op,
        # replacing the per-frame per-byte Python loop (the old
        # ``bytes((b + idx) % 256 for b in payload)`` dominated the
        # decode task).  Values are bit-identical; pinned by
        # tests/test_multimodal_image_video.py and the entry's oracle.
        # The tile itself routes through image.tile_payload — the shared
        # codec seam (r14 ADVICE #3): a real-codec swap replaces the
        # tile at that one hook for BOTH image and video decode.
        from tts_data_pipeline_spark.multimodal.image import tile_payload

        need = height * width * 3
        for pdf in batches:
            paths: list = []
            idxs: list[int] = []
            tsecs: list[float] = []
            pixels: list[np.ndarray] = []
            for path, payload, fps, n_frames in zip(
                pdf[path_col], pdf[payload_col], pdf[fps_col], pdf[n_frames_col]
            ):
                fps = float(fps) or 1.0
                sample = sample_frame_indices(int(n_frames), every_k)
                base = tile_payload(payload, need).astype(np.int32)
                salted = (
                    base[None, :]
                    + np.asarray(sample, dtype=np.int32)[:, None]
                ) % 256
                paths.extend([path] * len(sample))
                idxs.extend(sample)
                tsecs.extend(round(i / fps, 4) for i in sample)
                pixels.extend(list(salted))
            n = len(paths)
            yield pd.DataFrame(
                {
                    "path": paths,
                    "frame_idx": idxs,
                    "t_sec": tsecs,
                    "height": [height] * n,
                    "width": [width] * n,
                    "channels": [3] * n,
                    "pixels": pixels,
                }
            )

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
