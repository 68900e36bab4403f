#!/usr/bin/env python
"""Launcher: pick a packaged config by name and start training
(reference scripts/train.py:33-85 equivalent, minus the CUDA env plumbing —
device selection on TPU is the mesh config's job)."""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = os.path.join(REPO, "blind_image_denoising_tpu", "configs")


def main() -> int:
    names = sorted(os.path.splitext(f)[0]
                   for f in os.listdir(CONFIGS) if f.endswith(".json"))
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, choices=names)
    parser.add_argument("--checkpoint-directory", default=None)
    parser.add_argument("--weights-directory", default=None)
    args = parser.parse_args()

    ckpt = args.checkpoint_directory or os.path.join(REPO, "runs", args.model)
    cmd = [sys.executable, "-m", "blind_image_denoising_tpu.train",
           "--pipeline-config", os.path.join(CONFIGS, args.model + ".json"),
           "--checkpoint-directory", ckpt]
    if args.weights_directory:
        cmd += ["--weights-directory", args.weights_directory]
    print(" ".join(cmd))
    return subprocess.call(cmd, cwd=REPO)


if __name__ == "__main__":
    sys.exit(main())
