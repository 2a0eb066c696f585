from stereo_to_multiview_tpu.utils.bmp import read_bmp, write_bmp
from stereo_to_multiview_tpu.utils.imageio import write_png, read_image, write_image
from stereo_to_multiview_tpu.utils.timing import Timer, FrameMeter, get_cpu_time
from stereo_to_multiview_tpu.utils.device import (
    print_device_info, enable_compilation_cache)

__all__ = [
    "read_bmp", "write_bmp", "write_png", "read_image", "write_image",
    "Timer", "FrameMeter", "get_cpu_time",
    "print_device_info", "enable_compilation_cache",
]
