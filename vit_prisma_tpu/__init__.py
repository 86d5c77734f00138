"""vit_prisma_tpu — TPU-native mechanistic-interpretability framework for
vision transformers and CLIP (JAX/XLA/Pallas/pjit).

Capability counterpart of Prisma-Multimodal/ViT-Prisma, re-designed TPU-first:
pure-functional hooked forwards compiled to single XLA programs, HBM-resident
activation caching, fused SAE training kernels, and GSPMD sharding.
"""

__version__ = "0.1.0"

from vit_prisma_tpu.configs.vit_config import ViTConfig, TextTransformerConfig
from vit_prisma_tpu.models.vit import HookedViT, vit_forward, hook_names, init_vit_params
from vit_prisma_tpu.models.text import HookedTextTransformer
from vit_prisma_tpu.models.sae_vit import HookedSAEViT
from vit_prisma_tpu.models.loading.loader import load_hooked_model
from vit_prisma_tpu.prisma.cache import ActivationCache
from vit_prisma_tpu.prisma.factored_matrix import FactoredMatrix
from vit_prisma_tpu.prisma.hooks import HookRuntime, HookInfo
from vit_prisma_tpu.utils.prisma_utils import get_act_name, test_prompt
from vit_prisma_tpu.serving import CompiledForward, export_forward, load_forward
