from vit_prisma_tpu.models.vit import HookedViT, vit_forward, hook_names, init_vit_params
