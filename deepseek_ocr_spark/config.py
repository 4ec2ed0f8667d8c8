"""Engine configuration — the reference's mode table and constants.

Mirrors the *semantics* of ``vllm/config.py`` (reference
DeepSeek-OCR-master/DeepSeek-OCR-vllm/config.py:1-16): resolution modes,
crop budget, and post-processing flags. No model weights or tokenizer here —
the sandbox kernel is deterministic and model-free.
"""

from __future__ import annotations

from dataclasses import dataclass

# Resolution modes (reference config.py:2-6, README "modes" table R:190-197).
#   name    -> (base_size, image_size, crop_mode)
MODES: dict[str, tuple[int, int, bool]] = {
    "tiny": (512, 512, False),
    "small": (640, 640, False),
    "base": (1024, 1024, False),
    "large": (1280, 1280, False),
    "gundam": (1024, 640, True),
}

# Active mode — Gundam, as in the reference default (config.py:8-10).
BASE_SIZE = 1024
IMAGE_SIZE = 640
CROP_MODE = True

# Tile budget (reference config.py:11-12).
MIN_CROPS = 2
MAX_CROPS = 6

# Patch geometry (reference deepseek_ocr.py:72-76).
PATCH_SIZE = 16
DOWNSAMPLE_RATIO = 4

# Post-processing flags (reference config.py:15-16).
SKIP_REPEAT = True

# The decoder's end-of-sentence literal (reference run_dpsk_ocr_pdf.py:289).
EOS_TOKEN = "<｜end▁of▁sentence｜>"

# Page separator used in multi-page assembly (reference run_dpsk_ocr_pdf.py:296-298):
# page_num = '\n<--- Page Split --->'; contents += content + f'\n{page_num}\n'
# → the literal bytes appended after EVERY page are '\n\n<--- Page Split --->\n'.
PAGE_SEP = "\n\n<--- Page Split --->\n"

# Generation cap analog (reference run_dpsk_ocr_eval_batch.py:30,41).
MAX_OUTPUT_TOKENS = 8192


@dataclass(frozen=True)
class EngineConfig:
    base_size: int = BASE_SIZE
    image_size: int = IMAGE_SIZE
    crop_mode: bool = CROP_MODE
    min_crops: int = MIN_CROPS
    max_crops: int = MAX_CROPS
    skip_repeat: bool = SKIP_REPEAT
    # post-process cascade variant: 'eval' | 'pdf' | 'image' (SURVEY.md O-36)
    mode: str = "pdf"


DEFAULT_CONFIG = EngineConfig()
