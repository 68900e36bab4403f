"""Training CLI: ``python -m blind_image_denoising_tpu.train``
(reference bfcnn/train.py:20-67)."""

import argparse
import os
import sys

from .logger import logger
from .training.train_loop import train_loop


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="train a blind image denoiser")
    parser.add_argument(
        "--pipeline-config", required=True, type=str,
        help="pipeline configuration path (JSON)")
    parser.add_argument(
        "--checkpoint-directory", required=True, type=str,
        help="directory to save checkpoints / metrics into")
    parser.add_argument(
        "--weights-directory", default=None, type=str,
        help="checkpoint directory to load fine-tune weights from")
    parser.add_argument(
        "--total-steps", default=None, type=int,
        help="override train.total_steps (stop after N applied steps)")
    parser.add_argument(
        "--platform", default=None, type=str,
        help="force a jax platform (e.g. cpu)")
    # multi-host launch (one process per host; see parallel/multihost.py):
    #   python -m …train --coordinator-address host0:1234 \
    #       --num-processes 4 --process-id $RANK …
    parser.add_argument(
        "--coordinator-address", default=None, type=str,
        help="host:port of process 0 — enables multi-host training")
    parser.add_argument(
        "--num-processes", default=None, type=int,
        help="total number of processes in the multi-host job")
    parser.add_argument(
        "--process-id", default=None, type=int,
        help="this process's rank in [0, num_processes)")
    parser.add_argument(
        "--local-device-count", default=None, type=int,
        help="simulate N host devices per process (testing only)")
    args = parser.parse_args(argv)

    if args.coordinator_address is not None:
        if args.num_processes is None or args.process_id is None:
            logger.error("--coordinator-address requires --num-processes "
                         "and --process-id")
            return 1
        from .parallel.multihost import initialize
        initialize(args.coordinator_address, args.num_processes,
                   args.process_id, platform=args.platform,
                   local_device_count=args.local_device_count)
    elif getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)

    if not os.path.isfile(args.pipeline_config):
        logger.error(f"pipeline config [{args.pipeline_config}] not found")
        return 1

    train_loop(
        pipeline_config=args.pipeline_config,
        checkpoint_directory=args.checkpoint_directory,
        weights_directory=args.weights_directory,
        total_steps_override=args.total_steps)

    if args.coordinator_address is not None:
        # align ranks BEFORE the runtime's shutdown barrier: the primary's
        # teardown (TensorBoard flush, orbax finalize) is slower than the
        # other ranks', and the runtime's own barrier timeout is short —
        # without this sync loaded machines hit DEADLINE_EXCEEDED at exit
        # even though training completed on every rank
        try:
            from .parallel.multihost import sync
            sync("train_done")
            import jax
            jax.distributed.shutdown()
        except Exception as e:
            # a peer rank that failed never reaches this barrier; this
            # rank's training DID complete and its checkpoints are on
            # disk, so report the peer failure and exit cleanly instead
            # of dying on a confusing collective timeout
            logger.warning(
                f"multi-host exit sync failed ({e}) — a peer rank likely "
                f"terminated early; local training completed and "
                f"checkpoints are saved")
    return 0


if __name__ == "__main__":
    sys.exit(main())
