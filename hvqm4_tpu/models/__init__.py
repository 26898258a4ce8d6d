"""On-device downstream consumers of decoded video (BASELINE config 5)."""

from .vit import ViTConfig, init_vit, vit_encode  # noqa: F401
