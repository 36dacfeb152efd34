#!/usr/bin/env python3
"""Offline video -> mono 24 kHz PCM16 WAV extraction (reference
tools/extract_audio.py). Not on the training path.

Usage: python tools/extract_audio.py <video_list.txt> <video_root> <out_root>
"""

from __future__ import annotations

import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor


def extract_one(video: str, video_root: str, out_root: str,
                rate: int = 24000) -> str:
    src = os.path.join(video_root, video)
    name = os.path.splitext(os.path.basename(video))[0]
    dst = os.path.join(out_root, name + ".wav")
    cmd = ["ffmpeg", "-y", "-i", src, "-vn", "-acodec", "pcm_s16le",
           "-ac", "1", "-ar", str(rate), dst]
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
        for msg in pool.map(extract_one, videos, [video_root] * len(videos),
                            [out_root] * len(videos)):
            print(msg, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
