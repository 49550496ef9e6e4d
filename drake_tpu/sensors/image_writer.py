"""ImageWriter: dump camera images to disk (PNG, stdlib-only encoder).

Reference systems/sensors/image_writer.h — a System that writes an image
input port to numbered files on a periodic publish event.  Here: a plain
host-side writer (`write_png`, `ImageWriter.save`) fed by the SDF camera's
device-rendered arrays; wire it into a rollout with
drake_tpu.systems.comms-style host callbacks or just call it on logged
frames after the scan.

PNG encoding is pure stdlib (zlib + struct): 8-bit grayscale or RGB, no
image library dependency (the environment has none baked in).
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Optional

import numpy as np


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def write_png(path: str, image: np.ndarray) -> None:
    """Write (H, W) grayscale or (H, W, 3) RGB uint8/float array as PNG.

    Float images are scaled from their [min, max] to [0, 255] (the depth
    image convention the reference's ImageWriter applies to 32F depth).
    """
    img = np.asarray(image)
    if img.dtype != np.uint8:
        lo, hi = float(np.nanmin(img)), float(np.nanmax(img))
        scale = 255.0 / (hi - lo) if hi > lo else 0.0
        img = np.nan_to_num((img - lo) * scale).astype(np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # each scanline prefixed with filter byte 0
    raw = b"".join(
        b"\x00" + img[row].tobytes() for row in range(h)
    )
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(data)


def read_png_size(path: str):
    """(width, height) from a PNG header — enough for round-trip tests."""
    with open(path, "rb") as f:
        head = f.read(24)
    w, h = struct.unpack(">II", head[16:24])
    return w, h


class ImageWriter:
    """Numbered-file image sink (image_writer.h DeclareImageInputPort role).

    save() names files `{label}_{count:06d}.png` under `directory`.
    """

    def __init__(self, directory: str, label: str = "camera"):
        self.directory = directory
        self.label = label
        self.count = 0
        os.makedirs(directory, exist_ok=True)

    def save(self, image, label: Optional[str] = None) -> str:
        name = f"{label or self.label}_{self.count:06d}.png"
        path = os.path.join(self.directory, name)
        write_png(path, np.asarray(image))
        self.count += 1
        return path
