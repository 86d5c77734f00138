from vit_prisma_tpu.training.trainer import (
    train, TrainerConfig, TrainState, PrismaCallback, EarlyStopping,
    make_train_step, calculate_loss, calculate_accuracy,
)
