"""EmbedVAE — multi-level token-embedding autoencoder.

Rebuild of the reference's EmbedVAE/VAE/MAEC (src/Manifold/EmbedVAE.cpp,
VAE.hpp — latent dims list ``token_embeds``): compress the token
embedding table through a stack of latent bottlenecks and reconstruct,
so a model can train/serve with low-dim embeddings. Kept functional and
standalone (the reference marks this low priority; SURVEY §2.2).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def init_embed_vae(key: jax.Array, dims: Sequence[int],
                   dtype=jnp.float32) -> Dict:
    """dims: [E, l1, l2, ...] — encoder E→l1→l2…, decoder mirrors."""
    enc, dec = [], []
    ks = jax.random.split(key, 2 * (len(dims) - 1))
    for i in range(len(dims) - 1):
        s = 1.0 / (dims[i] ** 0.5)
        enc.append({"w": jax.random.normal(ks[2 * i], (dims[i], dims[i + 1]),
                                           dtype) * s,
                    "b": jnp.zeros((dims[i + 1],), dtype)})
        s2 = 1.0 / (dims[i + 1] ** 0.5)
        dec.append({"w": jax.random.normal(ks[2 * i + 1],
                                           (dims[i + 1], dims[i]), dtype) * s2,
                    "b": jnp.zeros((dims[i],), dtype)})
    dec.reverse()
    return {"enc": enc, "dec": dec}


def encode(vae: Dict, x: jax.Array) -> jax.Array:
    for i, layer in enumerate(vae["enc"]):
        x = x @ layer["w"] + layer["b"]
        if i < len(vae["enc"]) - 1:
            x = jax.nn.gelu(x)
    return x


def decode(vae: Dict, z: jax.Array) -> jax.Array:
    for i, layer in enumerate(vae["dec"]):
        z = z @ layer["w"] + layer["b"]
        if i < len(vae["dec"]) - 1:
            z = jax.nn.gelu(z)
    return z


def reconstruction_loss(vae: Dict, x: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(decode(vae, encode(vae, x)) - x))


def train_embed_vae(wte: jax.Array, dims: Sequence[int], steps: int = 200,
                    lr: float = 1e-3, batch: int = 1024,
                    key=None) -> Tuple[Dict, List[float]]:
    """Fit the VAE to an embedding table [V, E]; returns (vae, loss curve)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    vae = init_embed_vae(key, dims)
    wte = wte.astype(jnp.float32)
    m = jax.tree_util.tree_map(jnp.zeros_like, vae)
    v = jax.tree_util.tree_map(jnp.zeros_like, vae)

    @jax.jit
    def step(vae, m, v, k, t):
        idx = jax.random.randint(k, (batch,), 0, wte.shape[0])
        x = wte[idx]
        loss, g = jax.value_and_grad(reconstruction_loss)(vae, x)
        m = jax.tree_util.tree_map(lambda a, b: 0.9 * a + 0.1 * b, m, g)
        v = jax.tree_util.tree_map(lambda a, b: 0.99 * a + 0.01 * b * b, v, g)
        vae = jax.tree_util.tree_map(
            lambda p, mm, vv: p - lr * (mm / (1 - 0.9 ** t))
            / (jnp.sqrt(vv / (1 - 0.99 ** t)) + 1e-8), vae, m, v)
        return vae, m, v, loss

    losses = []
    for t in range(1, steps + 1):
        key, k = jax.random.split(key)
        vae, m, v, loss = step(vae, m, v, k, t)
        losses.append(float(loss))
    return vae, losses


def compress_embeddings(wte: jax.Array, vae: Dict) -> jax.Array:
    """Encode the whole table to the latent dim (storage/serving form)."""
    return encode(vae, wte.astype(jnp.float32))
