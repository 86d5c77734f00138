from vit_prisma_tpu.models.vit import HookedViT, vit_forward, hook_names, init_vit_params
from vit_prisma_tpu.models.text import HookedTextTransformer, text_forward, init_text_params
from vit_prisma_tpu.models.loading.loader import load_hooked_model
