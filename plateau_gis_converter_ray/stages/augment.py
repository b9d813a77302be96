"""Image augmentation stage — the training-data multimodal transform.

Deterministic, library-free augmentations over the opaque ``bytes``
column (decode once per image, augment as pure array ops on the
(g, h, w, 3) group stack — flips are VIEWS, crop is a slice, brightness
is one saturating add):

- ``hflip`` / ``vflip``: mirror along an axis;
- ``crop75``: centered crop to 75% per side (floor'd to multiples of 8
  so the phash grid stays valid);
- ``bright16``: +16 per channel, saturating at 255.

Emits one row per (image, augmentation) with the augmented channel means
and perceptual hash — the features a downstream dedup/quality stage
would consume (augmented near-dups are exactly what phash-family dedup
must tolerate). Runs as a stateless vectorized ``map_batches``; bytes
never leave the stage. Pinned in pytest against a local per-image
recompute plus the analytic invariants (flip preserves channel means;
brightness shifts means by exactly the saturating-add expectation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.imagecodec import block_means_u8, phash64_batch
from .decode import binary_views, decode_group_stack

AUGS = ("hflip", "vflip", "crop75", "bright16")


def _augment_stack(stack: np.ndarray, aug: str) -> np.ndarray:
    if aug == "hflip":
        return stack[:, :, ::-1]
    if aug == "vflip":
        return stack[:, ::-1]
    if aug == "crop75":
        n, h, w, _ = stack.shape
        ch = max(8, (h * 3 // 4) // 8 * 8)
        cw = max(8, (w * 3 // 4) // 8 * 8)
        y0 = (h - ch) // 2
        x0 = (w - cw) // 2
        return stack[:, y0 : y0 + ch, x0 : x0 + cw]
    if aug == "bright16":
        # saturating add without leaving uint8 (no float plane)
        out = stack.copy()
        mask = out > 239
        out += np.uint8(16)
        out[mask] = 255
        return out
    raise ValueError(f"unknown augmentation {aug!r}")


class ImageAugmentStats:
    """(image_id, aug, out_w, out_h, mean_r/g/b, phash_aug) per pair."""

    def __init__(self, augs: tuple = AUGS):
        self.augs = augs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = len(ids)
        k = len(self.augs)

        out_ids: list = []
        out_aug: list = []
        out_w = np.empty(n * k, dtype=np.int64)
        out_h = np.empty(n * k, dtype=np.int64)
        means = np.empty((n * k, 3), dtype=np.float64)
        hashes = np.empty(n * k, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        row = 0
        for (fmt, w, h), rows in groups.items():
            stack = decode_group_stack(blobs, rows, fmt, w, h)
            for aug in self.augs:
                a = _augment_stack(stack, aug)
                ah, aw = a.shape[1], a.shape[2]
                # contiguity only where the kernels need it (flip views
                # reduce fine; phash reshape requires C order)
                a_c = np.ascontiguousarray(a)
                m = a_c.reshape(len(rows), -1, 3).mean(axis=1)
                ph = phash64_batch(block_means_u8(a_c))
                sl = slice(row, row + len(rows))
                out_ids.extend(ids[i] for i in rows)
                out_aug.extend([aug] * len(rows))
                out_w[sl] = aw
                out_h[sl] = ah
                means[sl] = m
                hashes[sl] = ph
                row += len(rows)
        return pa.table(
            {
                "image_id": pa.array(out_ids, pa.string()),
                "aug": pa.array(out_aug, pa.string()),
                "out_w": pa.array(out_w[:row]),
                "out_h": pa.array(out_h[:row]),
                "mean_r": pa.array(means[:row, 0]),
                "mean_g": pa.array(means[:row, 1]),
                "mean_b": pa.array(means[:row, 2]),
                "phash_aug": pa.array(hashes[:row]),
            }
        )
