"""Multimodal image columns — decode / resize / feature-extract.

Convention (same as audio): an image rides as an opaque ``binary`` payload
plus typed metadata; pixel work happens in Arrow-batched ``mapInPandas``
stages over ``array<int>`` (flattened HWC uint8) columns.

The codec is pluggable: PIL/cv2 aren't in this container, so the default
decode is a deterministic fake (payload bytes → tiled pixel grid) that
produces real shapes/dtypes; ``real_decode_image`` raises until a codec
library is present.  Everything downstream of decode — nearest-neighbor
resize, channel statistics — is REAL numpy math on the decoded array and is
tested as such.

Scale: one image per row, flat arrays bounded by h×w×3; Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds executor memory.
No reference citation: the reference is audio-only; images are the
driver-mandated multimodal extension."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

DECODED_IMAGE_SCHEMA = (
    "path string, height int, width int, channels int, pixels array<int>"
)


def fake_decode_image(payload: bytes, height: int = 32, width: int = 32):
    """Deterministic fake codec: payload bytes tile a h×w×3 uint8 grid."""
    if payload is None or len(payload) == 0:
        return np.zeros((height, width, 3), dtype=np.uint8)
    b = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-(height * width * 3) // len(b))  # ceil
    return np.tile(b, reps)[: height * width * 3].reshape(height, width, 3)


def real_decode_image(payload: bytes):  # pragma: no cover - needs PIL/cv2
    """Real codec hook — requires Pillow (not in this image).

    Same contract as :func:`fake_decode_image`: (H, W, 3) uint8 RGB.
    tests/test_real_library_seams.py smoke-checks the contract the day
    the image gains Pillow."""
    try:
        import io

        import PIL.Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow/opencv (not in this environment); "
            "swap fake_decode_image for PIL.Image.open(BytesIO(payload))"
        ) from exc
    img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — real array math, codec-independent."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows][:, cols]


def decode_images(
    df: DataFrame,
    payload_col: str = "content",
    path_col: str = "path",
    height: int = 32,
    width: int = 32,
    decode_fn=fake_decode_image,
) -> DataFrame:
    """Decode binary payloads to flattened pixel rows (mapInPandas)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = [decode_fn(p, height, width) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "path": pdf[path_col].values,
                    "height": [i.shape[0] for i in imgs],
                    "width": [i.shape[1] for i in imgs],
                    "channels": [i.shape[2] for i in imgs],
                    "pixels": [i.reshape(-1).astype(np.int32) for i in imgs],
                }
            )

    return df.mapInPandas(gen, DECODED_IMAGE_SCHEMA)


def resize_images(
    decoded: DataFrame, out_h: int, out_w: int
) -> DataFrame:
    """Resize decoded images (real nearest-neighbor, mapInPandas)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                img = np.asarray(r["pixels"], dtype=np.uint8).reshape(
                    r["height"], r["width"], r["channels"]
                )
                out.append(resize_nearest(img, out_h, out_w).reshape(-1).astype(np.int32))
            yield pd.DataFrame(
                {
                    "path": pdf["path"].values,
                    "height": out_h,
                    "width": out_w,
                    "channels": pdf["channels"].values,
                    "pixels": out,
                }
            )

    return decoded.mapInPandas(gen, DECODED_IMAGE_SCHEMA)


def image_features(decoded: DataFrame) -> DataFrame:
    """Per-image channel statistics (real math): mean/std per RGB channel.
    The cheap-feature stage a curation pipeline filters on before any model
    sees the pixels."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = np.asarray(r["pixels"], dtype=np.float64).reshape(
                    r["height"], r["width"], r["channels"]
                )
                rows.append(
                    {
                        "path": r["path"],
                        "mean_rgb": [round(float(x), 4) for x in img.mean(axis=(0, 1))],
                        "std_rgb": [round(float(x), 4) for x in img.std(axis=(0, 1))],
                        "brightness": round(float(img.mean()), 4),
                    }
                )
            yield pd.DataFrame(rows)

    return decoded.mapInPandas(
        gen,
        "path string, mean_rgb array<double>, std_rgb array<double>, "
        "brightness double",
    )
