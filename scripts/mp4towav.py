"""mp4 -> mono 16 kHz wav extraction for all MELD clips.

Host-side prep step (reference scripts/mp4towav.py equivalent): invokes the
external ffmpeg binary per clip with ``-ac 1 -ar 16000 -vn -f wav``, skips
files already converted, and logs per-file failures to mp4towav_log.txt so
one corrupt clip never stops the pipeline.  Parallelized over a process pool
(the reference converts serially).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

SPLIT_DIRS = [
    "data/MELD.Raw/train_splits",
    "data/MELD.Raw/dev_splits_complete",
    "data/MELD.Raw/output_repeated_splits_test",
]
LOG_FILE = "mp4towav_log.txt"


def convert_one(mp4_path: str, wav_dir: str, sample_rate: int = 16000) -> str | None:
    """Returns an error string on failure, None on success/skip."""
    base = os.path.splitext(os.path.basename(mp4_path))[0]
    wav_path = os.path.join(wav_dir, f"{base}.wav")
    if os.path.exists(wav_path):
        return None
    cmd = [
        "ffmpeg", "-y", "-i", mp4_path,
        "-ac", "1", "-ar", str(sample_rate), "-vn", "-f", "wav", wav_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return None
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError) as e:
        return f"{mp4_path}: {e}"


def convert_videos(mp4_dir: str, jobs: int = 4, sample_rate: int = 16000) -> int:
    wav_dir = os.path.join(mp4_dir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    mp4s = sorted(
        os.path.join(mp4_dir, f) for f in os.listdir(mp4_dir) if f.endswith(".mp4")
    )
    errors = []
    with ThreadPoolExecutor(max_workers=jobs) as pool:
        for err in pool.map(lambda p: convert_one(p, wav_dir, sample_rate), mp4s):
            if err:
                errors.append(err)
    if errors:
        with open(LOG_FILE, "a") as f:
            f.write("\n".join(errors) + "\n")
        print(f"{len(errors)} failures logged to {LOG_FILE}", file=sys.stderr)
    return len(mp4s) - len(errors)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dirs", nargs="*", default=None)
    p.add_argument("--jobs", type=int, default=os.cpu_count() or 4)
    p.add_argument("--sample-rate", type=int, default=16000)
    args = p.parse_args()
    for d in args.dirs or SPLIT_DIRS:
        if os.path.isdir(d):
            n = convert_videos(d, jobs=args.jobs, sample_rate=args.sample_rate)
            print(f"{d}: {n} clips converted")
        else:
            print(f"skipping missing {d}", file=sys.stderr)


if __name__ == "__main__":
    main()
