"""Reconstruction/segmentation visualization dumps.

Role: Models/auto_trainer.py:112-265 — during eval the reference writes
recon_epoch{N}/ image grids (input | seg prediction | seg target | route)
for eyeballing. Pure numpy + PNG via matplotlib (lazily imported).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# CARLA 0.9.10 reduced 8-class palette (order per Config/auto_danet.py
# comment: unlabeled, road, car, person, building, fence/pole, vegetation,
# road line)
SEG_PALETTE = np.array([
    [0, 0, 0],        # 0 unlabeled
    [128, 64, 128],   # 1 road
    [0, 0, 142],      # 2 car
    [220, 20, 60],    # 3 person
    [70, 70, 70],     # 4 building/wall
    [153, 153, 153],  # 5 fence/pole/sign
    [107, 142, 35],   # 6 vegetation/terrain
    [157, 234, 50],   # 7 road line
], dtype=np.uint8)


def colorize_seg(seg: np.ndarray) -> np.ndarray:
    """[H,W] int class map -> [H,W,3] uint8."""
    return SEG_PALETTE[np.clip(seg, 0, len(SEG_PALETTE) - 1)]


def visualization_grid(batch: Dict[str, np.ndarray],
                       outputs: Dict[str, np.ndarray],
                       index: int = 0) -> np.ndarray:
    """One sample's [input | seg pred | seg target | route pred] strip."""
    rgb = (np.asarray(batch["x"])[index, :, :, :3] * 255).astype(np.uint8)
    panels = [rgb]
    if "camera" in outputs:
        pred = np.argmax(np.asarray(outputs["camera"])[index], axis=-1)
        panels.append(colorize_seg(pred))
    if "camera_seg" in batch:
        panels.append(colorize_seg(np.asarray(batch["camera_seg"])[index]))
    if "route" in outputs:
        route = (np.asarray(outputs["route"])[index, :, :, 0] * 255)
        panels.append(np.repeat(route.astype(np.uint8)[..., None], 3, -1))
    return np.concatenate(panels, axis=1)


def dump_visualizations(batch, outputs, out_dir: str, epoch: int,
                        max_samples: int = 4,
                        prefix: str = "recon") -> Optional[str]:
    """Write recon_epoch{N}/ grids; returns the directory (or None if
    matplotlib is unavailable)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return None
    d = os.path.join(out_dir, f"{prefix}_epoch{epoch}")
    os.makedirs(d, exist_ok=True)
    n = min(max_samples, np.asarray(batch["x"]).shape[0])
    for i in range(n):
        grid = visualization_grid(batch, outputs, i)
        fig = plt.figure(figsize=(grid.shape[1] / 72, grid.shape[0] / 72),
                         dpi=72)
        ax = fig.add_axes([0, 0, 1, 1])
        ax.imshow(grid)
        ax.axis("off")
        fig.savefig(os.path.join(d, f"sample_{i}.png"))
        plt.close(fig)
    return d
