"""TinyCLIP -> Kandinsky embedding adapter.

Counterpart of
``/root/reference/src/vit_prisma/sae/evals/train_tinyclip_kadinsky_adapter.py:17-132``:
a 3-layer MLP that maps TinyCLIP image embeddings (512) into the Kandinsky
2.2 prior's image-embedding space (1280), so SAE-edited TinyCLIP embeddings
can drive Kandinsky generation.

TPU-native design: the adapter is a parameter pytree + pure forward, the
train step is one jitted donated XLA program, and the dual-embedding
"dataset" is precomputed in batches with the two hooked models (the
reference recomputes both embeddings per __getitem__ through eager torch).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Params = Dict[str, jax.Array]


def init_adapter_params(key: jax.Array, input_dim: int = 512,
                        hidden_dim: int = 2048, output_dim: int = 1280,
                        dtype=jnp.float32) -> Params:
    """3-layer MLP (train_tinyclip_kadinsky_adapter.py:17-35), torch
    nn.Linear default init (kaiming-uniform a=sqrt(5) + uniform bias)."""
    import math

    def linear(k, fan_in, fan_out):
        kw, kb = jax.random.split(k)
        bound_w = math.sqrt(1.0 / 3.0) * math.sqrt(3.0 / fan_in)
        bound_b = 1.0 / math.sqrt(fan_in)
        return (jax.random.uniform(kw, (fan_in, fan_out), dtype,
                                   -bound_w, bound_w),
                jax.random.uniform(kb, (fan_out,), dtype, -bound_b, bound_b))

    k1, k2, k3 = jax.random.split(key, 3)
    w1, b1 = linear(k1, input_dim, hidden_dim)
    w2, b2 = linear(k2, hidden_dim, hidden_dim)
    w3, b3 = linear(k3, hidden_dim, output_dim)
    return {"W1": w1, "b1": b1, "W2": w2, "b2": b2, "W3": w3, "b3": b3}


def adapter_forward(params: Params, x: jax.Array,
                    dropout_key: Optional[jax.Array] = None,
                    dropout_rate: float = 0.1) -> jax.Array:
    """linear->relu->dropout->linear->relu->dropout->linear (:27-35)."""
    def drop(h, key):
        if key is None or dropout_rate == 0.0:
            return h
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, h.shape)
        return jnp.where(keep, h / (1.0 - dropout_rate), 0.0).astype(h.dtype)

    k1 = k2 = None
    if dropout_key is not None:
        k1, k2 = jax.random.split(dropout_key)
    h = drop(jax.nn.relu(x @ params["W1"] + params["b1"]), k1)
    h = drop(jax.nn.relu(h @ params["W2"] + params["b2"]), k2)
    return h @ params["W3"] + params["b3"]


class DualEmbedder:
    """Precompute (source, target) embedding pairs with two image encoders
    (:39-48).  ``src_fn``/``tgt_fn`` map an image batch [B,C,H,W] to
    embeddings (e.g. a TinyCLIP HookedViT and a Kandinsky HookedViT built
    via ``convert_kandinsky_clip_weights``)."""

    def __init__(self, src_fn: Callable, tgt_fn: Callable):
        self.src_fn = src_fn
        self.tgt_fn = tgt_fn

    def get_embeddings(self, images) -> Tuple[jax.Array, jax.Array]:
        images = jnp.asarray(images)
        return self.src_fn(images), self.tgt_fn(images)

    def build_dataset(self, image_batches) -> Tuple[np.ndarray, np.ndarray]:
        srcs, tgts = [], []
        for batch in image_batches:
            s, t = self.get_embeddings(batch)
            srcs.append(np.asarray(s))
            tgts.append(np.asarray(t))
        return np.concatenate(srcs), np.concatenate(tgts)


class AdapterState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


@partial(jax.jit, donate_argnames=("state",), static_argnames=("lr",))
def _adapter_train_step(state: AdapterState, src, tgt, key, lr: float):
    opt = optax.adam(lr)

    def loss_fn(p):
        pred = adapter_forward(p, src, dropout_key=key)
        return jnp.mean(jnp.square(pred - tgt))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return AdapterState(params, opt_state, state.step + 1), loss


def train_adapter(src_embeds, tgt_embeds, num_epochs: int = 10,
                  batch_size: int = 256, lr: float = 1e-4,
                  hidden_dim: int = 2048, seed: int = 0,
                  verbose: bool = False) -> Tuple[Params, float]:
    """Adam + MSE training loop (:74-99).  Returns (params, final loss)."""
    src = np.asarray(src_embeds, np.float32)
    tgt = np.asarray(tgt_embeds, np.float32)
    key = jax.random.PRNGKey(seed)
    key, pkey = jax.random.split(key)
    params = init_adapter_params(pkey, src.shape[-1], hidden_dim,
                                 tgt.shape[-1])
    opt = optax.adam(lr)
    state = AdapterState(params, opt.init(params), jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(seed)
    n = len(src)
    loss = float("nan")
    for epoch in range(num_epochs):
        order = rng.permutation(n)
        total, batches = 0.0, 0
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            key, dkey = jax.random.split(key)
            state, loss = _adapter_train_step(
                state, jnp.asarray(src[idx]), jnp.asarray(tgt[idx]), dkey, lr)
            total += float(loss)
            batches += 1
        if verbose:
            print(f"epoch {epoch + 1}/{num_epochs} "
                  f"loss {total / max(batches, 1):.6f}")
    return jax.device_get(state.params), float(loss)


def save_adapter(path: str, params: Params):
    np.savez(path if path.endswith(".npz") else path + ".npz",
             **{k: np.asarray(v) for k, v in params.items()})


def load_adapter(path: str) -> Params:
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}
