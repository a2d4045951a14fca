"""The network zoo + registry (the reference's ``net_factory`` equivalent)."""

from mamba_unet_tpu.models.vssm import VSSM, MambaUnet
from mamba_unet_tpu.models.registry import net_factory, register_model, list_models

__all__ = ["VSSM", "MambaUnet", "net_factory", "register_model", "list_models"]
