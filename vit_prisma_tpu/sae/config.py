"""SAE runner configuration.

Counterpart of ``/root/reference/src/vit_prisma/sae/config.py:288``
(``VisionModelSAERunnerConfig``): one frozen, hashable dataclass holding the
model/hook target, SAE architecture, token selection, store sizing, training
hyperparameters, dead-feature windows, and checkpointing — with the same
derived properties (``hook_point`` :429-436, ``d_sae`` :484,
``tokens_per_buffer``/``total_training_tokens``/``total_training_steps``
:444-481) and JSON round trip (:574-653).

Frozen+hashable so the whole config can be a jit static argument — every
SAE kernel specializes on it at compile time.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

from vit_prisma_tpu.configs.vit_config import DTYPE_MAP


@dataclass(frozen=True)
class SAERunnerConfig:
    # -- data-generating model + hook target -----------------------------
    model_class_name: str = "HookedViT"
    model_name: str = "open-clip:laion/CLIP-ViT-B-32-DataComp.XL-s13B-b90K"
    hook_point_layer: int = 9
    layer_subtype: str = "hook_resid_post"
    hook_point_head_index: Optional[int] = None
    context_size: int = 50
    use_cached_activations: bool = False
    cached_activations_path: Optional[str] = None
    use_patches_only: bool = False
    cls_token_only: bool = False
    image_size: int = 224
    # All-layer sweep: when set, the store harvests
    # blocks.{l}.{layer_subtype} for every listed layer in one forward and
    # sae_sweep_train_step trains one SAE per layer simultaneously.
    sweep_layers: Optional[Tuple[int, ...]] = None

    # -- SAE architecture -------------------------------------------------
    architecture: str = "standard"  # 'standard' | 'gated' | 'transcoder'
    d_in: int = 768
    expansion_factor: int = 16
    b_dec_init_method: str = "geometric_median"
    initialization_method: str = "independent"  # | 'encoder_transpose_decoder'
    activation_fn_str: str = "relu"  # 'relu' | 'tanh-relu' | 'topk'
    activation_fn_kwargs: Tuple[Tuple[str, Any], ...] = ()
    # Use the Pallas threshold kernel for TopK on TPU (ops/topk.py); exact
    # except that k-th-value ties keep >= k entries.
    fused_topk: bool = True
    # opt-in approx_max_k TopK threshold (~95% recall, ~2.4x faster than
    # the exact kernel; see ops/topk.py) — default exact
    topk_use_approx: bool = False
    normalize_activations: str = "none"  # | 'layer_norm' | 'constant_norm_rescale'

    # -- transcoder --------------------------------------------------------
    is_transcoder: bool = False
    transcoder_with_skip_connection: bool = True
    out_hook_point_layer: int = 9
    layer_out_subtype: str = "hook_mlp_out"
    d_out: int = 768

    # -- numerics ----------------------------------------------------------
    dtype: str = "float32"
    # Mixed-precision training: run the SAE forward/backward GEMMs and the
    # [B, d_sae] feature-activation traffic in this dtype while master
    # params, Adam moments, and loss reductions stay in ``dtype`` (fp32).
    # 'bfloat16' is the TPU production recipe (MXU-native GEMMs, half the
    # HBM traffic on the biggest tensors); None (default) keeps everything
    # in ``dtype`` — the reference-equivalent fp32 path the numerics tests
    # run against.
    compute_dtype: Optional[str] = None
    # Use the fused Pallas train-step kernel (ops/sae_step.py: encoder GEMM
    # -> ReLU -> counters -> decoder GEMM with the feature activations
    # VMEM-only, activations rematerialized in the backward).  Applies
    # automatically only to the standard-ReLU/no-ghost/no-norm config with
    # tile-aligned shapes; everything else falls back to the XLA path.
    fused_sae_step: bool = True
    # VJP strategy for the fused step (ops/sae_step.py stored-acts
    # section): True streams the feature acts to HBM in the forward and
    # skips the backward's encoder recompute; False rematerializes
    # tile-wise; None (default) decides by shape (store when the acts fit
    # the 2GiB cap).  Force False when the step must share HBM with other
    # resident state (e.g. a streaming store's interleaved harvest).
    fused_store_acts: Optional[bool] = None
    # Fuse clip -> W_dec parallel-projection -> Adam into single passes over
    # the parameter set (ops/opt_step.py: Pallas on TPU, identical-math XLA
    # twin on CPU/odd shapes).  Semantics match the optax path at fp32
    # rounding; the optax opt_state structure (and so checkpoints/resumes)
    # is unchanged.
    fused_optimizer: bool = True
    # Use the Pallas kernel inside the fused optimizer pass (vs its
    # identical-math XLA twin).  The GSPMD-sharded step wrappers
    # (parallel/mesh.py) turn this off — a pallas_call is a custom call
    # GSPMD can't partition — while the shard_map'd sweep path keeps it
    # (the kernel runs per-shard there).
    fused_opt_kernel: bool = True
    # Storage dtype for the Adam moments ('float32' | 'bfloat16').  bf16
    # halves the dominant optimizer-state HBM traffic; update math stays
    # fp32 (read-modify-write through the fused pass).  Quality gated by
    # the config-3 rehearsal (tests/test_config3_rehearsal.py).  Requires
    # fused_optimizer.
    adam_dtype: str = "float32"
    seed: int = 42

    # -- store -------------------------------------------------------------
    n_batches_in_buffer: int = 20
    store_batch_size: int = 32
    num_workers: int = 0
    # Override the derived buffer size (rows).  Useful for sweep stores,
    # where each row carries n_layers * d_in floats.
    buffer_tokens_override: Optional[int] = None
    # Host->device image wire format for the activation store: 'auto'
    # (uint8 datasets ship uint8 + on-device normalize; bf16 models ship
    # bf16 pixels), or 'float32' / 'bfloat16' / 'uint8' explicitly.
    store_wire_dtype: str = "auto"

    # -- training ----------------------------------------------------------
    num_epochs: int = 1
    total_training_images: Optional[int] = None  # default 1.3M * epochs
    l1_coefficient: float = 0.0002
    lp_norm: float = 1.0
    lr: float = 0.001
    lr_scheduler_name: str = "cosineannealingwarmup"
    lr_warm_up_steps: int = 500
    train_batch_size: int = 4096
    # Train steps fused into one XLA dispatch (lax.scan over pre-sliced
    # batches).  >1 amortizes host-dispatch latency — the TPU-native form
    # of the reference's tight eager loop (train_sae.py:792).  Numerics are
    # step-for-step equal to 1 at float32 rounding (tests/test_multistep.py).
    steps_per_dispatch: int = 1
    max_grad_norm: Optional[float] = 1.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999

    # -- resampling / dead features ---------------------------------------
    use_ghost_grads: bool = False
    feature_sampling_window: int = 1000
    dead_feature_window: int = 5000
    dead_feature_threshold: float = 1e-8

    # -- run tolerance (train_sae.py:637-644) -----------------------------
    min_l0: Optional[float] = None
    min_explained_variance: Optional[float] = None
    # in-training validation regression abort (train_sae.py:414-535):
    # if a val pass reports CE-recovered below this, the run aborts.
    min_ce_recovered: Optional[float] = None

    # -- dataset convenience (train_sae.py:149-209) ------------------------
    dataset_name: str = "imagenet1k"  # | 'cifar10' | <folder>
    dataset_path: str = ""
    dataset_train_path: Optional[str] = None
    dataset_val_path: Optional[str] = None
    # Feed the activation store through the C++ prefetching batch loader
    # (csrc/batch_loader.cpp): a worker pool decodes + preprocesses ahead
    # of the harvest, replacing the reference's DataLoader(num_workers=)
    use_native_loader: bool = False

    # -- logging / checkpointing ------------------------------------------
    verbose: bool = False
    log_to_wandb: bool = False
    wandb_project: str = "vit_prisma_tpu_sae"
    wandb_entity: Optional[str] = None
    wandb_log_frequency: int = 10
    n_validation_runs: int = 0
    n_checkpoints: int = 0
    checkpoint_path: str = "checkpoints"
    # upload each checkpoint as a wandb artifact (train_sae.py:697-746)
    wandb_checkpoint_artifacts: bool = False

    # -- derived -----------------------------------------------------------
    @property
    def jax_dtype(self):
        return DTYPE_MAP[self.dtype]

    @property
    def compute_jax_dtype(self):
        """Forward/backward compute dtype (None = use ``jax_dtype``)."""
        return None if self.compute_dtype is None \
            else DTYPE_MAP[self.compute_dtype]

    @property
    def hook_point(self) -> str:
        return f"blocks.{self.hook_point_layer}.{self.layer_subtype}"

    @property
    def out_hook_point(self) -> str:
        return f"blocks.{self.out_hook_point_layer}.{self.layer_out_subtype}"

    @property
    def d_sae(self) -> int:
        return self.d_in * self.expansion_factor

    @property
    def tokens_per_image(self) -> int:
        if self.cls_token_only:
            return 1
        if self.use_patches_only:
            return self.context_size - 1
        return self.context_size

    @property
    def tokens_per_buffer(self) -> int:
        if self.buffer_tokens_override is not None:
            return self.buffer_tokens_override
        return self.train_batch_size * self.tokens_per_image * self.n_batches_in_buffer

    @property
    def total_training_tokens(self) -> int:
        images = self.total_training_images
        if images is None:
            images = int(1_300_000 * self.num_epochs)
        return images * self.tokens_per_image

    @property
    def total_training_steps(self) -> int:
        return self.total_training_tokens // self.train_batch_size

    @property
    def num_patch(self) -> int:
        return int(math.sqrt(self.context_size - 1))

    @property
    def activation_fn_kwargs_dict(self) -> Dict[str, Any]:
        return dict(self.activation_fn_kwargs)

    @property
    def topk_k(self) -> Optional[int]:
        if self.activation_fn_str == "topk":
            return int(self.activation_fn_kwargs_dict.get("k", 64))
        return None

    @property
    def is_training(self) -> bool:
        # EVAL_MODE env override (reference config.py:515-519)
        return os.getenv("EVAL_MODE", "false").lower() not in ("true", "1")

    def __post_init__(self):
        if self.b_dec_init_method not in ("geometric_median", "mean", "zeros"):
            raise ValueError(
                f"b_dec_init_method must be geometric_median, mean, or zeros."
                f" Got {self.b_dec_init_method}")
        if self.cls_token_only and self.use_patches_only:
            raise ValueError("cls_token_only and use_patches_only are exclusive.")
        if isinstance(self.activation_fn_kwargs, dict):
            object.__setattr__(self, "activation_fn_kwargs",
                               tuple(sorted(self.activation_fn_kwargs.items())))

    # -- (de)serialization -------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["activation_fn_kwargs"] = dict(self.activation_fn_kwargs)
        return d

    def save_config(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SAERunnerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        if isinstance(d.get("activation_fn_kwargs"), dict):
            d["activation_fn_kwargs"] = tuple(sorted(d["activation_fn_kwargs"].items()))
        return cls(**d)

    @classmethod
    def load_config(cls, path: str) -> "SAERunnerConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def replace(self, **kw) -> "SAERunnerConfig":
        return dataclasses.replace(self, **kw)
