#!/usr/bin/env python3
"""Offline video -> JPEG frame extraction (reference tools/extract_rgb.py).

Shells out to ffmpeg per video: short side scaled to 256, JPEG quality 2,
frames named 00001.jpg..., 8-way process pool. Not on the training path.

Usage: python tools/extract_rgb.py <video_list.txt> <video_root> <out_root>
  video_list.txt: one relative video path per line
"""

from __future__ import annotations

import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor


def probe_size(video_path: str):
    """Return (width, height) via ffprobe, or None."""
    try:
        out = subprocess.run(
            ["ffprobe", "-v", "error", "-select_streams", "v:0",
             "-show_entries", "stream=width,height", "-of", "csv=p=0",
             video_path], capture_output=True, text=True, check=True).stdout
        w, h = out.strip().split(",")[:2]
        return int(w), int(h)
    except Exception:
        return None


def video_to_images(video: str, video_root: str, out_root: str,
                    short_side: int = 256) -> str:
    src = os.path.join(video_root, video)
    name = os.path.splitext(os.path.basename(video))[0]
    dst = os.path.join(out_root, name)
    os.makedirs(dst, exist_ok=True)
    size = probe_size(src)
    if size is None:
        return f"SKIP (probe failed): {video}"
    w, h = size
    scale = (f"scale=-2:{short_side}" if w >= h
             else f"scale={short_side}:-2")
    cmd = ["ffmpeg", "-y", "-i", src, "-vf", scale, "-q:v", "2",
           os.path.join(dst, "%05d.jpg")]
    r = subprocess.run(cmd, capture_output=True)
    return f"{'OK' if r.returncode == 0 else 'FAIL'}: {video}"


def main() -> int:
    if len(sys.argv) != 4:
        print(__doc__)
        return 1
    list_file, video_root, out_root = sys.argv[1:4]
    videos = [x.strip() for x in open(list_file) if x.strip()]
    os.makedirs(out_root, exist_ok=True)
    with ProcessPoolExecutor(max_workers=8) as pool:
        for msg in pool.map(video_to_images, videos,
                            [video_root] * len(videos),
                            [out_root] * len(videos)):
            print(msg, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
