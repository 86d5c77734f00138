from vit_prisma_tpu.prisma.hooks import HookRuntime, HookInfo, NULL_HOOKS
from vit_prisma_tpu.prisma.cache import ActivationCache
from vit_prisma_tpu.prisma.factored_matrix import FactoredMatrix
