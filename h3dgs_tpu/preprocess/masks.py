"""Mask utilities.

Equivalents of /root/reference/preprocess/make_mask_uint8.py (undistorted
RGBA masks -> eroded uint8 binary masks) and black_mask.py (zero out masked
pixels directly in the images).
"""
from __future__ import annotations

import os

import numpy as np


def make_masks_uint8(in_dir: str, out_dir: str, erode: int = 5) -> int:
    import cv2
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for root, _dirs, files in os.walk(in_dir):
        for f in sorted(files):
            if not f.lower().endswith((".png", ".jpg")):
                continue
            img = cv2.imread(os.path.join(root, f), cv2.IMREAD_UNCHANGED)
            if img is None:
                continue
            alpha = img[..., 3] if img.ndim == 3 and img.shape[2] == 4 \
                else (img if img.ndim == 2 else img[..., 0])
            binary = (alpha > 127).astype(np.uint8) * 255
            if erode > 0:
                kernel = np.ones((erode, erode), np.uint8)
                binary = cv2.erode(binary, kernel)
            rel = os.path.relpath(root, in_dir)
            dst_dir = os.path.join(out_dir, rel) if rel != "." else out_dir
            os.makedirs(dst_dir, exist_ok=True)
            stem = os.path.splitext(f)[0]
            cv2.imwrite(os.path.join(dst_dir, stem + ".png"), binary)
            n += 1
    print(f"{n} masks -> {out_dir}")
    return n


def black_mask_images(images_dir: str, masks_dir: str) -> int:
    """Zero out masked pixels in place (black_mask.py)."""
    import cv2
    n = 0
    for root, _dirs, files in os.walk(images_dir):
        for f in sorted(files):
            if not f.lower().endswith((".png", ".jpg", ".jpeg")):
                continue
            rel = os.path.relpath(root, images_dir)
            stem = os.path.splitext(f)[0]
            mask_path = os.path.join(masks_dir, rel if rel != "." else "",
                                     stem + ".png")
            if not os.path.exists(mask_path):
                continue
            img_path = os.path.join(root, f)
            img = cv2.imread(img_path)
            mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
            if img is None or mask is None:
                continue
            if mask.shape[:2] != img.shape[:2]:
                mask = cv2.resize(mask, (img.shape[1], img.shape[0]),
                                  interpolation=cv2.INTER_NEAREST)
            img[mask < 128] = 0
            cv2.imwrite(img_path, img)
            n += 1
    return n


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("uint8")
    a.add_argument("--in_dir", required=True)
    a.add_argument("--out_dir", required=True)
    a.add_argument("--erode", type=int, default=5)
    b = sub.add_parser("black")
    b.add_argument("--images_dir", required=True)
    b.add_argument("--masks_dir", required=True)
    args = p.parse_args(argv)
    if args.cmd == "uint8":
        make_masks_uint8(args.in_dir, args.out_dir, args.erode)
    else:
        black_mask_images(args.images_dir, args.masks_dir)


if __name__ == "__main__":
    main()
