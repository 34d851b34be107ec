"""PNG/mask IO and the pipeline's mask conventions.

Conventions (reference para_gen.py):
- Annotation masks (DAVIS-style): 0 = background, nonzero = object segment id.
- ARAP solver masks: 0 = solve region (object), ARAP_BG = 255 = excluded
  (para_gen.py:30, 514-517, 526-528; the solver excludes pixels with mask != 0,
  arap_plan.t:11).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

ARAP_BG = 255  # para_gen.py:30


def load_rgb(path) -> np.ndarray:
    """Load an RGB image as (H, W, 3) uint8 (alpha dropped, gray replicated)."""
    im = Image.open(path)
    if im.mode != "RGB":
        im = im.convert("RGB")
    return np.array(im)


def load_mask(path) -> np.ndarray:
    """Load a mask as (H, W); keeps palette/gray ids, takes channel 0 of RGB.

    Matches the reference's use of np.array(Image.open(...)) on annotation masks
    (para_gen.py:457, 468-479) and mLib's .x channel read in the solver app
    (CombinedSolver.h:213).
    """
    im = Image.open(path)
    arr = np.array(im)
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    return arr


def save_image(path, arr: np.ndarray) -> None:
    """Save an (H, W[, 3]) uint8 array as PNG.

    compress_level=1: ~4× faster encode than PIL's default 6 at ~20% larger
    files — PNG encoding of full frames was a measured pipeline-prep
    bottleneck (~100 ms/frame at 854×480); pixels are identical."""
    im = Image.fromarray(np.asarray(arr, dtype=np.uint8))
    if str(path).lower().endswith(".png"):
        im.save(path, compress_level=1)
    else:
        im.save(path)


def mask_to_arap(annot_mask: np.ndarray) -> np.ndarray:
    """Single-segment conversion: background (annot==0) -> ARAP_BG, object -> 0.

    Parity with para_gen.py:514-517.
    """
    out = np.zeros_like(annot_mask, dtype=np.uint8)
    out[annot_mask == 0] = ARAP_BG
    return out


def segment_mask_to_arap(annot_mask: np.ndarray, segment_id: int) -> np.ndarray:
    """Per-segment conversion for --multseg: segment s -> 0, all else -> ARAP_BG.

    Parity with para_gen.py:526-528.
    """
    out = np.full_like(annot_mask, ARAP_BG, dtype=np.uint8)
    out[annot_mask == segment_id] = 0
    return out
