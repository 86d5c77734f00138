"""Model configuration dataclasses.

TPU-native re-design of the reference config surface
(``/root/reference/src/vit_prisma/configs/HookedViTConfig.py:8``).  Unlike the
reference, the config is a *frozen, hashable* dataclass so that it can be used
as a static argument to ``jax.jit`` — every jitted forward specializes on the
config, letting XLA constant-fold all architecture branches.

Only fields that affect computation are kept here; training/wandb/saving knobs
live on the trainer configs (``vit_prisma_tpu.sae.config``,
``vit_prisma_tpu.training``) where they belong.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax.numpy as jnp

# String names for dtypes keep the dataclass hashable and JSON-serializable.
DTYPE_MAP = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float16": jnp.float16,
    "fp16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float64": jnp.float64,
}


def resolve_dtype(dtype) -> Any:
    if isinstance(dtype, str):
        return DTYPE_MAP[dtype]
    return dtype


@dataclass(frozen=True)
class ViTConfig:
    """Architecture config for ``HookedViT`` (reference: HookedViTConfig.py:8-123).

    Field names match the reference where the field has the same meaning, so
    that configs can round-trip through the model registry and checkpoints.
    """

    n_layers: int = 2
    d_model: int = 128
    d_head: int = 32
    d_mlp: int = 512
    n_heads: int = 4
    model_name: str = "custom"
    activation_name: str = "gelu"
    eps: float = 1e-6

    # Hook gating flags (reference HookedViTConfig.py:21-25)
    use_attn_result: bool = False
    use_split_qkv_input: bool = False
    use_hook_mlp_in: bool = False
    use_attn_in: bool = False

    use_attn_scale: bool = True
    use_cls_token: bool = True
    attn_only: bool = False
    # Compute q/k/v with one stacked GEMM when the inputs are shared
    # (numerically identical).  Measured SLOWER on v5e for ViT-B shapes
    # (24.6 vs 22.6 ms at batch 256 — XLA already schedules the three GEMMs
    # well and the stacked output layout costs a copy); off by default,
    # kept for larger-d_model experimentation.
    fused_qkv: bool = False

    # "LN" | "LNPre" | None  (reference HookedViTConfig.py:36)
    normalization_type: Optional[str] = "LN"
    # CLIP-style LayerNorm before the first block (reference :65)
    layer_norm_pre: bool = False
    # Post-LN (CLIP "BertBlock") variant (reference :68)
    use_bert_block: bool = False

    attention_dir: str = "bidirectional"

    # Image params (reference :76-78)
    n_channels: int = 3
    patch_size: int = 32
    image_size: int = 224

    # Classification (reference :80-82,37)
    classification_type: str = "cls"  # 'cls' | 'gaap'
    n_classes: int = 10
    return_type: str = "pre_logits"  # 'pre_logits' | 'class_logits' | 'logits'
    normalize_output: bool = False

    # Video (reference :117-119)
    is_video_transformer: bool = False
    video_tubelet_depth: Optional[int] = None
    video_num_frames: Optional[int] = None

    # Initialization
    weight_type: str = "he"
    cls_std: float = 1e-6
    pos_std: float = 0.02

    # Numerics.  ``dtype`` is the compute/storage dtype of the main pass;
    # LayerNorm always computes in float32 (reference layer_norm.py:37-45).
    dtype: str = "float32"
    # jnp matmul precision ('default'|'float32'|'highest').  'default' passes
    # precision=None so the global `jax_default_matmul_precision` governs:
    # the test suite forces 'highest' there to hold atol=1e-4 vs the fp32
    # PyTorch reference, while the TPU speed path keeps hardware-native
    # matmuls.  Set 'highest' per-config to force exactness regardless.
    matmul_precision: str = "default"

    # Dropout rates (reference transformer_block.py:77-78).  Applied at the
    # reference's two pre-LN-block sites (:113, :132) when a ``dropout_key``
    # is passed to ``vit_forward``/``HookedViT.forward`` (train mode); with
    # no key the forward is the eval-mode program, dropout-free.
    attn_dropout_rate: float = 0.0
    mlp_dropout_rate: float = 0.0

    # Use the fused Pallas attention-mix kernel on the speed path (engaged
    # only when no attention-internal hooks are requested, no mask, no
    # split-qkv, and matmul_precision == 'default'; see models/layers.py).
    # Measured +15% full-forward throughput on CLIP-B/32 @ batch 256.
    use_fused_attention: bool = True

    # Fuse the pre-LN normalize into the following projection GEMMs' LHS
    # load (ln1 -> Q/K/V, ln2 -> W_in) via the ops/ln_matmul.py Pallas
    # kernel: the LN output never round-trips HBM.  Engages only on the
    # same hook-free speed path as use_fused_attention (additionally: no
    # ln1/ln2 hooks requested) and only where the weight stack fits VMEM;
    # numerics match the unfused path's fp32 LN island exactly.
    use_fused_ln_gemm: bool = False

    # Block-loop compilation strategy: 'auto' uses one lax.scan over the
    # stacked-by-layer params for deep models (n_layers >= 16, no
    # intervention hooks) so compile time is O(1) in depth; 'always'/'never'
    # force it.  Numerics are identical to the unrolled loop.
    scan_blocks: str = "auto"

    # Rematerialize each transformer block in the backward pass
    # (jax.checkpoint): activation memory drops from O(n_layers) residual
    # traces to O(1) at ~1/3 extra FLOPs — the standard TPU recipe for
    # training deep/bigG models that would otherwise exhaust HBM.
    # Identical numerics; no effect on inference-only programs (no
    # backward to rematerialize for).  Applies on the scan path when no
    # block hooks are cached (hook capture can't cross the checkpoint
    # boundary — models/vit.py _scan_blocks).
    remat_blocks: bool = False

    def __post_init__(self):
        if self.d_head is None and self.d_model is not None:
            object.__setattr__(self, "d_head", self.d_model // self.n_heads)
        if self.d_mlp is None and self.d_model is not None:
            object.__setattr__(self, "d_mlp", self.d_model * 4)

    # -- derived ---------------------------------------------------------
    @property
    def n_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_image_patches(self) -> int:
        n = self.n_patches_per_side ** 2
        if self.is_video_transformer:
            n *= self.video_num_frames // self.video_tubelet_depth
        return n

    @property
    def n_tokens(self) -> int:
        return self.n_image_patches + (1 if self.use_cls_token else 0)

    @property
    def jax_dtype(self):
        return resolve_dtype(self.dtype)

    @property
    def compute_in_fp32(self) -> bool:
        return self.jax_dtype not in (jnp.float32, jnp.float64)

    # -- (de)serialization ----------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ViTConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def replace(self, **kw) -> "ViTConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TextTransformerConfig(ViTConfig):
    """Config for the CLIP text encoder
    (reference: HookedTextTransformerConfig.py:10-15)."""

    context_length: int = 77
    vocab_size: int = 10_000
    # Causal mask on by default for text (reference base_text_transformer.py:92-99)
    causal_attention: bool = True
    use_cls_emb: bool = False

    @property
    def n_tokens(self) -> int:  # type: ignore[override]
        return self.context_length + (1 if self.use_cls_emb else 0)
