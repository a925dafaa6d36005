"""Salmon diffusion LM: masked-reconstruction training + iterative-unmask
generation (reference src/Transformer/Salmon.cpp, XI_CARD)."""
import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard, TrainCard
from koifish_tpu.models import init_params
from koifish_tpu.models.salmon import (XICard, diffusion_generate,
                                       diffusion_loss, mask_id)
from koifish_tpu.train.trainer import init_train_state, make_train_step


def salmon_card():
    return ModelCard.from_arch("SALMON", vocab_size=128, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=32, max_pos=64)


def test_salmon_card_is_bidirectional():
    card = salmon_card()
    assert card.causal is False
    assert mask_id(card) == 127


def test_diffusion_loss_masks_only():
    card = salmon_card()
    params = init_params(card, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 64)
    loss, per = diffusion_loss(card, params, toks, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss)) and float(loss) > 0
    # per-position CE is zero on unmasked positions by construction
    assert float((per > 0).mean()) < 1.0


def test_salmon_trains_and_infills():
    """Diffusion training on the '+1 mod 64' stream learns the rule well
    enough that iterative unmasking continues a prompt correctly —
    the diffusion-LM analog of the reference's golden chat substrings."""
    card = salmon_card()
    tcard = TrainCard(batch=16, lr=0.01, warmup=5, optimizer="adamw", seed=42)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=300)
    key = jax.random.PRNGKey(0)
    losses = []
    # 500 steps (was 400): with r5's bf16 stochastic rounding default-on
    # the 400-step snapshot lands at hits=2 on the infill golden; by 500
    # steps the curve is past it (hits=4; 600->4, 700->3 — plateau noise)
    for _ in range(500):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (16, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(17)[None]) % 64)[None
                 ].astype(jnp.int32)}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # infilling golden (the training distribution): mask 4 of 16 positions,
    # reconstruct them from bidirectional context
    from koifish_tpu.models import model_forward
    seq = ((jnp.arange(16)[None] + 20) % 64).astype(jnp.int32)
    holes = jnp.zeros((1, 16), bool).at[:, jnp.array([3, 7, 10, 13])].set(True)
    noisy = jnp.where(holes, mask_id(card), seq)
    logits = model_forward(card, state.params, noisy)
    pred = jnp.argmax(logits.astype(jnp.float32), -1)
    recovered = jnp.where(holes, pred, seq)
    hits = int((recovered == seq).sum()) - 12     # 12 unmasked positions
    assert hits >= 3, (recovered[0].tolist(), seq[0].tolist())

    # free generation from a prompt: smoke — runs, fills every mask,
    # stays in the data vocab
    prompt = (jnp.arange(4)[None] + 20).astype(jnp.int32)
    out = diffusion_generate(card, state.params, prompt, total_len=12,
                             key=jax.random.PRNGKey(3), steps=8)
    assert out.shape == (1, 12)
    assert int((out == mask_id(card)).sum()) == 0
    assert int(out.max()) < 128
