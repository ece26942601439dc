"""Programmatic launcher (reference UNet/launch_inference.py role)."""

from tpuseg.utils.compile_cache import enable as _enable_cache
_enable_cache()  # persistent XLA cache + JAX_PLATFORMS honoring, like the CLIs


from tpuseg.infer.runner import InferenceConfig, inference

checkpoint_filepath = "../output/checkpoint/ckpt"
image_folder = "../data/images"
output_folder = "../inference_output"
number_classes = 2
number_channels = 1
image_format = "tif"

if __name__ == "__main__":
    inference(InferenceConfig(
        checkpoint_filepath=checkpoint_filepath,
        image_folder=image_folder,
        output_folder=output_folder,
        number_classes=number_classes,
        number_channels=number_channels,
        image_format=image_format,
    ))
