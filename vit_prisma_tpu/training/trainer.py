"""Supervised ViT trainer.

Counterpart of ``/root/reference/src/vit_prisma/training/trainer.py:23-204``
(+ ``training_utils.py``, ``schedulers.py``, ``early_stopping.py``,
``training_dictionary.py``): AdamW/SGD, CE/MSE losses, warmup schedulers,
grad clipping, periodic train/val metrics, checkpointing with resume,
``PrismaCallback`` hooks, early stopping — with the train step as one jitted
donated XLA program.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_prisma_tpu.configs.vit_config import ViTConfig
from vit_prisma_tpu.models.vit import HookedViT, vit_forward


# ---------------------------------------------------------------------------
# Losses (training_dictionary.py)
# ---------------------------------------------------------------------------

def cross_entropy_loss(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def mse_loss(preds, targets):
    return jnp.mean(jnp.square(preds - targets))


LOSS_FUNCTIONS = {"CrossEntropy": cross_entropy_loss, "MSE": mse_loss}


# ---------------------------------------------------------------------------
# Schedulers (training/schedulers.py:6-46)
# ---------------------------------------------------------------------------

def warmup_then_step_schedule(warmup_steps: int, step_size: int, gamma: float):
    """WarmupThenStepLR: linear warmup then StepLR decay."""
    def sched(step):
        warm = (step + 1) / max(warmup_steps, 1)
        decay = gamma ** ((step - warmup_steps) // max(step_size, 1))
        return jnp.where(step < warmup_steps, jnp.minimum(warm, 1.0), decay)
    return sched


def warmup_cosine_schedule(warmup_steps: int, total_steps: int):
    """WarmupCosineAnnealingLR."""
    def sched(step):
        warm = (step + 1) / max(warmup_steps, 1)
        progress = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * jnp.clip(progress, 0, 1)))
        return jnp.where(step < warmup_steps, jnp.minimum(warm, 1.0), cos)
    return sched


# ---------------------------------------------------------------------------
# Callbacks & early stopping (training_utils.py:9-16, early_stopping.py:2)
# ---------------------------------------------------------------------------

class PrismaCallback:
    def on_step_end(self, step: int, model, metrics: Dict[str, float]):
        pass

    def on_epoch_end(self, epoch: int, model, metrics: Dict[str, float]):
        pass


class EarlyStopping:
    def __init__(self, patience: int = 2, min_delta: float = 0.0,
                 verbose: bool = False):
        self.patience = patience
        self.min_delta = min_delta
        self.verbose = verbose
        self.best = -float("inf")
        self.counter = 0
        self.early_stop = False

    def __call__(self, metric: float):
        if metric > self.best + self.min_delta:
            self.best = metric
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        return self.early_stop


# ---------------------------------------------------------------------------
# Train state + jitted step
# ---------------------------------------------------------------------------

class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_train_step(cfg: ViTConfig, optimizer, loss_name: str,
                    seed: int = 0):
    loss_fn_inner = LOSS_FUNCTIONS[loss_name]
    use_dropout = (cfg.attn_dropout_rate > 0 or cfg.mlp_dropout_rate > 0)
    base_key = jax.random.PRNGKey(seed)

    @partial(jax.jit, donate_argnames=("state",))
    def train_step(state: TrainState, images, labels):
        # Per-step dropout key derived from the step counter so the jitted
        # program stays step-agnostic (reference trains with nn.Dropout in
        # train mode, transformer_block.py:113,132).
        drop_key = (jax.random.fold_in(base_key, state.step)
                    if use_dropout else None)

        def loss_fn(params):
            logits = vit_forward(params, cfg, images, dropout_key=drop_key)
            return loss_fn_inner(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if getattr(cfg, "max_grad_norm", None):
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_eval_fns(cfg: ViTConfig, loss_name: str):
    loss_fn_inner = LOSS_FUNCTIONS[loss_name]

    @jax.jit
    def batch_loss(params, images, labels):
        logits = vit_forward(params, cfg, images)
        return loss_fn_inner(logits, labels)

    @jax.jit
    def batch_correct(params, images, labels):
        logits = vit_forward(params, cfg, images)
        return (jnp.argmax(logits, -1) == labels).sum()

    return batch_loss, batch_correct


def calculate_loss(batch_loss, params, data_iter) -> float:
    tot, n = 0.0, 0
    for images, labels in data_iter:
        tot += float(batch_loss(params, jnp.asarray(images),
                                jnp.asarray(labels))) * len(labels)
        n += len(labels)
    return tot / max(n, 1)


def calculate_accuracy(batch_correct, params, data_iter) -> float:
    correct, n = 0.0, 0
    for images, labels in data_iter:
        correct += float(batch_correct(params, jnp.asarray(images),
                                       jnp.asarray(labels)))
        n += len(labels)
    return correct / max(n, 1)


# ---------------------------------------------------------------------------
# Config knobs carried on ViTConfig in the reference; grouped here.
# ---------------------------------------------------------------------------

@dataclass
class TrainerConfig:
    optimizer_name: str = "AdamW"   # 'AdamW' | 'SGD'
    lr: float = 3e-4
    weight_decay: float = 0.01
    loss_fn_name: str = "CrossEntropy"
    batch_size: int = 512
    warmup_steps: int = 10
    scheduler_step: int = 200
    scheduler_gamma: float = 0.8
    scheduler_type: str = "WarmupThenStep"  # | 'CosineAnnealing'
    early_stopping: bool = False
    early_stopping_patience: int = 2
    num_epochs: int = 50
    max_grad_norm: Optional[float] = 1.0
    max_steps: Optional[int] = None
    log_frequency: int = 100
    save_checkpoints: bool = False
    save_cp_frequency: int = 5
    parent_dir: str = ""
    save_dir: str = "Checkpoints"
    seed: int = 666
    use_wandb: bool = False
    wandb_project_name: Optional[str] = None


def _make_optimizer(tcfg: TrainerConfig, total_steps: int):
    if tcfg.scheduler_type == "WarmupThenStep":
        sched = warmup_then_step_schedule(tcfg.warmup_steps,
                                          tcfg.scheduler_step,
                                          tcfg.scheduler_gamma)
    elif tcfg.scheduler_type == "CosineAnnealing":
        sched = warmup_cosine_schedule(tcfg.warmup_steps, total_steps)
    else:
        raise ValueError(f"Scheduler type {tcfg.scheduler_type} not supported")
    lr_fn = lambda step: tcfg.lr * sched(step)
    if tcfg.optimizer_name == "AdamW":
        return optax.adamw(lr_fn, weight_decay=tcfg.weight_decay)
    if tcfg.optimizer_name == "SGD":
        return optax.sgd(lr_fn)
    raise ValueError(f"Unknown optimizer {tcfg.optimizer_name}")


def _batches(dataset, batch_size: int, rng: np.random.Generator,
             shuffle: bool = True):
    n = len(dataset)
    order = rng.permutation(n) if shuffle else np.arange(n)
    for i in range(0, n - batch_size + 1, batch_size):
        idx = order[i:i + batch_size]
        items = [dataset[int(j)] for j in idx]
        images = np.stack([np.asarray(it[0]) for it in items])
        labels = np.asarray([it[1] for it in items])
        yield images, labels


def save_checkpoint(path: str, state: TrainState, epoch: int):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"params": jax.tree.map(np.asarray, state.params),
                     "opt_state": jax.tree.map(np.asarray, state.opt_state),
                     "step": int(state.step), "epoch": epoch}, f)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def train(model_function: Callable[[ViTConfig], HookedViT], cfg: ViTConfig,
          train_dataset, val_dataset=None, tcfg: Optional[TrainerConfig] = None,
          checkpoint_path: Optional[str] = None,
          callbacks: Optional[List[PrismaCallback]] = None) -> HookedViT:
    """Supervised training loop (trainer.py:23-204)."""
    tcfg = tcfg or TrainerConfig()
    callbacks = callbacks or []
    rng = np.random.default_rng(tcfg.seed)

    if val_dataset is None:
        n_val = max(1, len(train_dataset) // 5)
        idx = rng.permutation(len(train_dataset))
        val_dataset = [train_dataset[int(i)] for i in idx[:n_val]]
        train_dataset = [train_dataset[int(i)] for i in idx[n_val:]]

    model = model_function(cfg)
    batch_size = (len(train_dataset) if tcfg.batch_size == -1
                  else tcfg.batch_size)
    total_steps = max(1, tcfg.num_epochs * (len(train_dataset) // batch_size))
    optimizer = _make_optimizer(tcfg, total_steps)
    state = TrainState(model.params, optimizer.init(model.params),
                       jnp.zeros((), jnp.int32))
    start_epoch = 1
    if checkpoint_path and os.path.exists(checkpoint_path):
        ckpt = load_checkpoint(checkpoint_path)
        state = TrainState(
            jax.tree.map(jnp.asarray, ckpt["params"]),
            jax.tree.map(jnp.asarray, ckpt["opt_state"]),
            jnp.asarray(ckpt["step"], jnp.int32))
        start_epoch = ckpt["epoch"] + 1

    step_fn = make_train_step(cfg, optimizer, tcfg.loss_fn_name,
                              seed=tcfg.seed)
    batch_loss, batch_correct = make_eval_fns(cfg, tcfg.loss_fn_name)
    early = EarlyStopping(tcfg.early_stopping_patience) \
        if tcfg.early_stopping else None

    wandb_run = None
    if tcfg.use_wandb:
        try:
            import wandb
            wandb_run = wandb.init(project=tcfg.wandb_project_name)
        except Exception:
            wandb_run = None

    steps, num_samples = int(state.step), 0
    stop = False
    metrics: Dict[str, float] = {}
    for epoch in range(start_epoch, tcfg.num_epochs + 1):
        for images, labels in _batches(train_dataset, batch_size, rng):
            if steps % tcfg.log_frequency == 0:
                metrics = {
                    "train_loss": calculate_loss(
                        batch_loss, state.params,
                        _batches(train_dataset, batch_size, rng, shuffle=False)),
                    "test_loss": calculate_loss(
                        batch_loss, state.params,
                        _batches(val_dataset, batch_size, rng, shuffle=False)),
                }
                if tcfg.loss_fn_name != "MSE":
                    metrics["train_acc"] = calculate_accuracy(
                        batch_correct, state.params,
                        _batches(train_dataset, batch_size, rng, shuffle=False))
                    metrics["test_acc"] = calculate_accuracy(
                        batch_correct, state.params,
                        _batches(val_dataset, batch_size, rng, shuffle=False))
                if wandb_run is not None:
                    wandb_run.log(metrics, step=num_samples)

            state, loss = step_fn(state, jnp.asarray(images),
                                  jnp.asarray(labels))
            steps += 1
            num_samples += len(labels)

            if tcfg.save_checkpoints and steps % tcfg.save_cp_frequency == 0:
                save_checkpoint(
                    os.path.join(tcfg.parent_dir, tcfg.save_dir,
                                 f"model_{num_samples}.ckpt"), state, epoch)
            model.params = state.params
            for cb in callbacks:
                cb.on_step_end(steps, model, metrics)
            if tcfg.max_steps and steps >= tcfg.max_steps:
                stop = True
                break
        model.params = state.params
        for cb in callbacks:
            cb.on_epoch_end(epoch, model, metrics)
        if early is not None and "train_acc" in metrics:
            if early(metrics["train_acc"]):
                break
        if stop:
            break

    if wandb_run is not None:
        wandb_run.finish()
    model.params = state.params
    return model
