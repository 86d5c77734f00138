from vit_prisma_tpu.parallel.mesh import (
    make_mesh, make_multislice_mesh, multislice_device_array,
    distributed_init, replicated, batch_sharding,
    vit_param_shardings, shard_vit_forward,
    sae_param_shardings, sae_state_shardings, shard_sae_train_step,
    sweep_state_shardings, sweep_batch_sharding, shard_sae_sweep_step,
)
