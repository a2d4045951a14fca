"""The network zoo + registry (the reference's ``net_factory`` equivalent)."""

from mamba_unet_tpu.models.registry import net_factory, register_model, list_models
from mamba_unet_tpu.models.vssm import VSSM, MambaUnet
from mamba_unet_tpu.models.unet import UNet, UNetDS, UNetURPC, UNetCCT, TLUNet
from mamba_unet_tpu.models.swin_unet import SwinUnet, SwinUnetSys
from mamba_unet_tpu.models.vnet import VNet, VNetMagic
from mamba_unet_tpu.models.small_nets import PNet2D, Projectors, Classifier, JigsawClassifier
from mamba_unet_tpu.models.unet_3d import UNet3D, UNet3DDVSemi, VoxResNet
from mamba_unet_tpu.models.enet import ENet
from mamba_unet_tpu.models.segmamba import SegMamba
from mamba_unet_tpu.models.mamba_lm import MambaLMHeadModel
from mamba_unet_tpu.models.attention_unet import AttentionUNet3D
from mamba_unet_tpu.models.unetr import UNETR
from mamba_unet_tpu.models.nnunet import GenericUNet
from mamba_unet_tpu.models.magicnet_mask import VNetMagicMask
from mamba_unet_tpu.models.misc_nets import FCDiscriminator, PreUNet, EffiUNet

__all__ = [
    "VSSM",
    "MambaUnet",
    "UNet",
    "UNetDS",
    "UNetURPC",
    "UNetCCT",
    "TLUNet",
    "net_factory",
    "register_model",
    "list_models",
]
