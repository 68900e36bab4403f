#!/usr/bin/env python
"""Launcher: export a trained run to a standalone artifact directory
(reference scripts/export.py equivalent)."""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-directory", required=True)
    parser.add_argument("--output-directory", required=True)
    parser.add_argument("--test-model", action="store_true")
    args = parser.parse_args()

    cfg = os.path.join(args.checkpoint_directory, "config.json")
    cmd = [sys.executable, "-m", "blind_image_denoising_tpu.export",
           "--pipeline-config", cfg,
           "--checkpoint-directory", args.checkpoint_directory,
           "--output-directory", args.output_directory]
    if args.test_model:
        cmd.append("--test-model")
    print(" ".join(cmd))
    return subprocess.call(cmd, cwd=REPO)


if __name__ == "__main__":
    sys.exit(main())
