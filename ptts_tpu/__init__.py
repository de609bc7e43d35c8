"""ptts-tpu: TPU-native Pocket-TTS engine (JAX/XLA/Pallas).

Public API (mirror of /root/reference/ptts.h):

    from ptts_tpu import api
    ctx = api.load_dir("pocket-tts-model")
    audio = ctx.generate("Hello world!", voice="alba")
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .text import estimate_frames, prepare_text  # noqa: F401

__all__ = ["api", "config", "prepare_text", "estimate_frames", "__version__"]
