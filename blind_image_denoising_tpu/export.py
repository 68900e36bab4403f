"""Export CLI: ``python -m blind_image_denoising_tpu.export``
(reference bfcnn/export.py:18-76)."""

import argparse
import sys

from .inference.export import export_model


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="export a trained denoiser to a standalone artifact dir")
    parser.add_argument("--pipeline-config", required=True, type=str)
    parser.add_argument("--checkpoint-directory", required=True, type=str)
    parser.add_argument("--output-directory", required=True, type=str)
    parser.add_argument("--to-stablehlo", action="store_true", default=True,
                        help="also serialize a StableHLO compiled artifact")
    parser.add_argument("--no-stablehlo", dest="to_stablehlo",
                        action="store_false")
    parser.add_argument("--to-tflite", action="store_true",
                        help="also emit denoiser_model.tflite "
                             "(dynamic-range quantized, any-size input — "
                             "the reference ecosystem's deployment "
                             "artifact; needs TensorFlow at export time)")
    parser.add_argument("--test-model", action="store_true",
                        help="run an inference self-test after export")
    parser.add_argument("--quantize", action="store_true",
                        help="calibrate + ship int8 activation scales "
                             "(quant.msgpack) — the native analog of the "
                             "reference's int8 TFLite export; see "
                             "docs/QUANTIZATION.md")
    parser.add_argument("--no-ema", dest="use_ema", action="store_false",
                        default=True,
                        help="export the raw last iterate even when the "
                             "checkpoint tracked a weight EMA (train.ema)")
    parser.add_argument("--platform", default=None, type=str,
                        help="force a jax platform (e.g. cpu)")
    args = parser.parse_args(argv)

    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)

    export_model(
        pipeline_config=args.pipeline_config,
        checkpoint_directory=args.checkpoint_directory,
        output_directory=args.output_directory,
        to_stablehlo=args.to_stablehlo,
        to_tflite=args.to_tflite,
        test_model=args.test_model,
        quantize=args.quantize,
        use_ema=args.use_ema)
    return 0


if __name__ == "__main__":
    sys.exit(main())
