"""Segmentation mask generation backends.

The reference wraps SAM ViT-H / SAM2 automatic mask generation
(identification/sam.py: points_per_side 32, iou .86, stability .92, 1024px
cap, GPU-OOM -> CPU fallback) and stores masks as
`segments_{i:03d}.npz{masks, boxes, areas}`. This module keeps that
artifact contract with three backends, picked by availability:

  1. `sam` / `sam2` — the real models, when the packages + checkpoints
     exist locally (not in this no-egress image; gated).
  2. `precomputed` — load reference-format npz masks from a directory,
     so masks generated elsewhere interoperate.
  3. `classical` — built-in color-quantization + connected-components
     segmenter (cv2), so the full pipeline runs end-to-end anywhere.
     It produces the same mask-dict schema SAM does.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

MAX_IMAGE_SIZE = 1024


def _load_image_rgb(image_path: str, max_size: int = MAX_IMAGE_SIZE):
    import cv2

    bgr = cv2.imread(image_path)
    if bgr is None:
        raise ValueError(f"Failed to load image: {image_path}")
    h, w = bgr.shape[:2]
    if max(h, w) > max_size:
        s = max_size / max(h, w)
        bgr = cv2.resize(bgr, (int(w * s), int(h * s)))
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


def sam_available() -> bool:
    try:
        import segment_anything  # noqa: F401
        return True
    except ImportError:
        return False


class ClassicalSegmenter:
    """Color-quantized connected-component segmentation (cv2 only).

    Not a SAM replacement in quality, but a deterministic, dependency-free
    stand-in producing the same mask schema, so the densification pipeline
    stays exercisable in this environment.
    """

    def __init__(self, n_colors: int = 8, min_area_frac: float = 0.001,
                 max_masks: int = 64):
        self.n_colors = n_colors
        self.min_area_frac = min_area_frac
        self.max_masks = max_masks

    def process_image(self, image_path: str) -> List[Dict]:
        import cv2

        rgb = _load_image_rgb(image_path)
        h, w = rgb.shape[:2]
        pixels = rgb.reshape(-1, 3).astype(np.float32)
        criteria = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 10, 1.0)
        _, labels, _ = cv2.kmeans(pixels, self.n_colors, None, criteria, 3,
                                  cv2.KMEANS_PP_CENTERS)
        label_img = labels.reshape(h, w).astype(np.int32)

        masks = []
        min_area = self.min_area_frac * h * w
        for c in range(self.n_colors):
            binary = (label_img == c).astype(np.uint8)
            n, comp = cv2.connectedComponents(binary)
            for k in range(1, n):
                seg = comp == k
                area = int(seg.sum())
                if area < min_area:
                    continue
                ys, xs = np.where(seg)
                bbox = [int(xs.min()), int(ys.min()),
                        int(xs.max() - xs.min() + 1),
                        int(ys.max() - ys.min() + 1)]
                masks.append({"segmentation": seg, "bbox": bbox,
                              "area": area,
                              "predicted_iou": 1.0,
                              "stability_score": 1.0})
        masks.sort(key=lambda m: -m["area"])
        return masks[:self.max_masks]


class SamSegmenter:
    """Real SAM/SAM2 wrapper (gated on local availability)."""

    def __init__(self, checkpoint_path: str, sam2: bool = False,
                 device: Optional[str] = None):
        import torch
        from segment_anything import SamAutomaticMaskGenerator, sam_model_registry

        device = device or ("cuda" if torch.cuda.is_available() else "cpu")
        if sam2:
            from sam2.automatic_mask_generator import SAM2AutomaticMaskGenerator
            from sam2.sam2_image_predictor import SAM2ImagePredictor
            predictor = SAM2ImagePredictor.from_pretrained(
                "facebook/sam2-hiera-large")
            self.generator = SAM2AutomaticMaskGenerator(
                predictor.model, points_per_side=32, pred_iou_thresh=0.86,
                stability_score_thresh=0.92)
        else:
            sam = sam_model_registry["vit_h"](checkpoint=checkpoint_path)
            sam.to(device=device)
            self.generator = SamAutomaticMaskGenerator(
                sam, points_per_side=32, pred_iou_thresh=0.86,
                stability_score_thresh=0.92)

    def process_image(self, image_path: str) -> List[Dict]:
        return self.generator.generate(_load_image_rgb(image_path))


class PrecomputedMasks:
    """Load reference-format masks npz from a directory."""

    def __init__(self, mask_dir: str):
        self.mask_dir = mask_dir
        self._i = 0

    def process_image(self, image_path: str) -> List[Dict]:
        masks = load_masks_npz(os.path.join(
            self.mask_dir, f"segments_{self._i:03d}.npz"))
        self._i += 1
        return masks


def make_segmenter(backend: str = "auto", checkpoint_path: str = "",
                   sam2: bool = False, mask_dir: str = ""):
    if backend == "auto":
        if mask_dir and os.path.isdir(mask_dir):
            backend = "precomputed"
        elif sam_available() and os.path.exists(checkpoint_path):
            backend = "sam"
        else:
            backend = "classical"
            print("[sam] segment_anything / checkpoint unavailable; using "
                  "built-in classical segmenter")
    if backend == "sam":
        return SamSegmenter(checkpoint_path, sam2=sam2)
    if backend == "precomputed":
        return PrecomputedMasks(mask_dir)
    return ClassicalSegmenter()


def save_masks_npz(masks: List[Dict], output_path: str):
    """Artifact parity with identification/sam.py:118-133."""
    binary, boxes, areas = [], [], []
    for m in masks:
        binary.append(m["segmentation"])
        x, y, w, h = m["bbox"]
        boxes.append([x, y, x + w, y + h])
        areas.append(m["area"])
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    np.savez(output_path, masks=np.array(binary), boxes=np.array(boxes),
             areas=np.array(areas))


def load_masks_npz(path: str) -> List[Dict]:
    with np.load(path) as z:
        masks = z["masks"]
        boxes = z["boxes"]
        areas = z["areas"]
    out = []
    for i in range(len(masks)):
        x0, y0, x1, y1 = boxes[i]
        out.append({"segmentation": masks[i].astype(bool),
                    "bbox": [int(x0), int(y0), int(x1 - x0), int(y1 - y0)],
                    "area": int(areas[i])})
    return out
