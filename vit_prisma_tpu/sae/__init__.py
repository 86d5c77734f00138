from vit_prisma_tpu.sae.config import SAERunnerConfig
from vit_prisma_tpu.sae.sae import (
    SparseAutoencoder, SAEOutput, sae_forward, init_sae_params, build_sae,
    set_decoder_norm_to_unit_norm, remove_gradient_parallel_to_decoder_directions,
)
from vit_prisma_tpu.sae.train import (
    VisionSAETrainer, SAETrainState, sae_train_step, sae_train_multistep,
    init_train_state, make_fused_cycle,
)
from vit_prisma_tpu.sae.store import VisionActivationsStore, CachedActivationsStore
from vit_prisma_tpu.sae.evals import (
    EvalConfig, evaluate, process_dataset, find_top_activations,
    make_replacement_hook, zero_ablate_hook,
)
from vit_prisma_tpu.sae.neuron_evals import (
    SparsecoderEval, eval_feature_list, find_top_neuron_activations,
)
from vit_prisma_tpu.sae.train import SAESweepTrainer, sae_sweep_train_step, sae_sweep_train_multistep, init_sweep_state
from vit_prisma_tpu.sae.checkpoint_import import (
    load_reference_sae_checkpoint, load_legacy_saelens_v2,
)
from vit_prisma_tpu.sae.train import save_train_state, load_train_state
from vit_prisma_tpu.sae.hub import (
    upload_to_huggingface, download_sae_from_huggingface,
    load_remote_sae_and_model,
)
from vit_prisma_tpu.sae.kandinsky_adapter import (
    DualEmbedder, adapter_forward, init_adapter_params, train_adapter,
    save_adapter, load_adapter,
)
from vit_prisma_tpu.sae.pretrained import (
    get_pretrained_sae_info, list_pretrained_saes, load_pretrained_sae,
)
