"""Headline-step profile (the evidence behind DESIGN.md §8 "Round-5
profile"): decompose the B=12 train step into its time sinks, sub-profile
the generator, measure the honest B-scaling curve, and measure the
donation effect on a reference-scale epoch. Run solo on the real chip.

Two timing harnesses, deliberately:
  * full-step B-curve -> TRUE state-carry chain (state = step(state)),
    identical to bench.py measure_ours. This is the only honest way to
    time the whole step: an eps-perturbation chain that forces only the
    first output leaf lets XLA dead-code the D-update chain (~1.4 ms of
    the B=12 step — we measured exactly that gap, 12.74 vs 14.14 ms).
  * components -> the eps chain (`timeit`, bench.py _timeit style),
    fine for single-output functions whose first leaf depends on the
    whole computation (forwards, whole-tree gradients).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gan_danet_tpu.core.config import GeneratorConfig, LossConfig, TrainConfig
from gan_danet_tpu.models.discriminator import Discriminator1
from gan_danet_tpu.models.generator import FlexibleUpsamplingModule
from gan_danet_tpu.models.losses import GeneratorLoss
from gan_danet_tpu.train.gan import init_gan_state, make_train_step, build_inputs

BATCH = 12
H05, W05 = 44, 90
H25, W25 = 88, 180
N_AUX = 45


def timeit(fn, *args, iters=20, chain_idx=-1, reps=5):
    args = list(args)

    def body(carry, _):
        a = list(args)
        a[chain_idx] = carry
        out = fn(*a)
        leaf = next(l for l in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(l.dtype, jnp.inexact))
        eps = leaf.sum().astype(jnp.float32) * jnp.asarray(1e-30, jnp.float32)
        return jax.tree.map(
            lambda c: c + eps.astype(c.dtype)
            if jnp.issubdtype(c.dtype, jnp.inexact) else c, carry), None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])

    def force(tree):
        return np.asarray(jax.tree_util.tree_leaves(tree)[0].ravel()[0])

    _ = force(run(args[chain_idx]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = force(run(args[chain_idx]))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def fake_batch(rng, b):
    return {
        "lr05": jnp.asarray(rng.standard_normal((b, H05, W05, 1)), jnp.float32),
        "lr025": jnp.asarray(rng.standard_normal((b, H25, W25, 1)), jnp.float32),
        "aux": jnp.asarray(rng.standard_normal((b, H25, W25, N_AUX)), jnp.float32),
    }


def make_step(b):
    tc = TrainConfig()
    gen = FlexibleUpsamplingModule(
        GeneratorConfig(input_channels=N_AUX + 1, dtype=tc.dtype))
    disc = Discriminator1(input_hw=(H25, W25), dtype=tc.dtype)
    g_tx = optax.adamw(tc.lr_g, b1=tc.adam_b1, b2=tc.adam_b2,
                       weight_decay=tc.weight_decay)
    d_tx = optax.adamw(tc.lr_d, b1=tc.adam_b1, b2=tc.adam_b2,
                       weight_decay=tc.weight_decay)
    step = make_train_step(gen, disc, GeneratorLoss(
        LossConfig(use_perceptual=False)), g_tx, d_tx,
        (H25 // 4, W25 // 4), jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = fake_batch(rng, b)
    state = init_gan_state(gen, disc, g_tx, d_tx, batch, (H25 // 4, W25 // 4))
    return gen, disc, step, batch, state


out = {}

# ---- 1. B-scaling curve of the full fused step (honest state-carry
# chain — see module docstring for why the eps chain must NOT be used
# here) ------------------------------------------------------------------
for b in (12, 24, 48):
    gen, disc, step, batch, state = make_step(b)
    lw = jnp.float32(0.5)
    ITERS = 30

    def body(s, _):
        s, m = step.raw(s, batch, lw)
        return s, m["loss_g"]

    run = jax.jit(lambda s: jax.lax.scan(body, s, None, length=ITERS))
    _, losses = run(state)
    float(np.asarray(losses[-1]))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _, losses = run(state)
        float(np.asarray(losses[-1]))
        best = min(best, time.perf_counter() - t0)
    dt = best / ITERS
    out[f"full_step_B{b}"] = {"ms": round(dt * 1e3, 2),
                              "samples_per_sec": round(b / dt, 1)}
    print(f"full step B={b}: {dt*1e3:.2f} ms, {b/dt:.1f} samples/s",
          flush=True)

# ---- 2. component decomposition at B=12 --------------------------------
gen, disc, step, batch, state = make_step(BATCH)
lw = jnp.float32(0.5)
coarse_hw = (H25 // 4, W25 // 4)

# input construction
dt = timeit(lambda b_: build_inputs(b_, coarse_hw), batch, iters=50)
out["input_construction_ms"] = round(dt * 1e3, 2)
x = build_inputs(batch, coarse_hw)

# G forward (train mode, with BN mutation)
gvars = {"params": state.g_params, "batch_stats": state.g_batch_stats}


def g_fwd(v, x):
    return gen.apply(v, x, train=True, mutable=["batch_stats"])[0]


dt_fwd = timeit(g_fwd, gvars, x, iters=20)
out["g_forward_ms"] = round(dt_fwd * 1e3, 2)

# G fwd+bwd
def g_fwdbwd(v, x):
    def loss(p):
        y, _ = gen.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                         train=True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)
    return jax.grad(loss)(v["params"])


dt_fb = timeit(g_fwdbwd, gvars, x, iters=20)
out["g_fwd_bwd_ms"] = round(dt_fb * 1e3, 2)

# D fwd+bwd (batched real+fake)
dvars = {"params": state.d_params}
fake = jnp.zeros((BATCH, H25, W25, 1), jnp.float32)
both = jnp.concatenate([batch["lr025"], fake])


def d_fwdbwd(v, xx):
    def loss(p):
        return jnp.sum(disc.apply({"params": p}, xx).astype(jnp.float32) ** 2)
    return jax.grad(loss)(v["params"])


dt_d = timeit(d_fwdbwd, dvars, both, iters=20)
out["d_fwd_bwd_ms"] = round(dt_d * 1e3, 2)

# AdamW update cost alone (both models) — the optimizer's HBM traffic
g_tx = optax.adamw(2e-4, b1=0.5, b2=0.999, weight_decay=1e-4)
gp = state.g_params
go = g_tx.init(gp)
fake_g = jax.tree.map(jnp.ones_like, gp)


def adam_g(p, o):
    u, o2 = g_tx.update(fake_g, o, p)
    return optax.apply_updates(p, u), o2


dt_ag = timeit(adam_g, gp, go, iters=50, chain_idx=0)
dp_ = state.d_params
do_ = g_tx.init(dp_)
fake_d = jax.tree.map(jnp.ones_like, dp_)


def adam_d(p, o):
    u, o2 = g_tx.update(fake_d, o, p)
    return optax.apply_updates(p, u), o2


dt_ad = timeit(adam_d, dp_, do_, iters=50, chain_idx=0)
out["adamw_g_ms"] = round(dt_ag * 1e3, 2)
out["adamw_d_ms"] = round(dt_ad * 1e3, 2)

# generator WITHOUT attention: how much of G is PAM/CAM?
gen_na = FlexibleUpsamplingModule(
    GeneratorConfig(input_channels=N_AUX + 1, dtype="bfloat16",
                    attention_type="none"))
v_na = jax.jit(lambda k, x: gen_na.init(k, x, train=True))(
    jax.random.PRNGKey(0), x)


def g_fwd_na(v, x):
    return gen_na.apply(v, x, train=True, mutable=["batch_stats"])[0]


dt_na = timeit(g_fwd_na, v_na, x, iters=20)
out["g_forward_no_attention_ms"] = round(dt_na * 1e3, 2)

# param counts for context
out["g_param_mb"] = round(sum(
    l.size for l in jax.tree_util.tree_leaves(state.g_params)) * 4 / 1e6, 1)
out["d_param_mb"] = round(sum(
    l.size for l in jax.tree_util.tree_leaves(state.d_params)) * 4 / 1e6, 1)

# cost analysis of the fused step
lowered = jax.jit(lambda s, b_, w: step.raw(s, b_, w)).lower(state, batch, lw)
ca = lowered.compile().cost_analysis()
if ca:
    out["step_flops_G"] = round(float(ca.get("flops", 0)) / 1e9, 2)
    out["step_hbm_bytes_MB"] = round(
        float(ca.get("bytes accessed", 0)) / 1e6, 1)

print(json.dumps(out, indent=2), flush=True)

# ---- 3. donation effect on a reference-scale epoch ---------------------
from gan_danet_tpu.train.loops import batch_index_matrix

n = 543
rng = np.random.default_rng(1)
data = {
    "lr05": jnp.asarray(rng.standard_normal((n, H05, W05, 1)), jnp.float32),
    "lr025": jnp.asarray(rng.standard_normal((n, H25, W25, 1)), jnp.float32),
    "aux": jnp.asarray(rng.standard_normal((n, H25, W25, N_AUX)), jnp.float32),
}
idx = jnp.asarray(batch_index_matrix(np.arange(n), BATCH))


def epoch_fn(st, dd, ii, w, key):
    def body(carry, ids):
        s, k = carry
        bb = {kk: jnp.take(vv, ids, axis=0) for kk, vv in dd.items()}
        s, m = step.raw(s, bb, w)
        return (s, k), m["loss_g"]

    (st, _), gs = jax.lax.scan(body, (st, key), ii)
    return st, gs


key = jax.random.PRNGKey(0)
ep_plain = jax.jit(epoch_fn)
ep_don = jax.jit(epoch_fn, donate_argnums=(0,))

s1 = jax.tree.map(jnp.copy, state)
st, gs = ep_plain(s1, data, idx, lw, key)
float(np.asarray(gs[-1]))
s2 = jax.tree.map(jnp.copy, state)
st2, gs2 = ep_don(s2, data, idx, lw, key)
float(np.asarray(gs2[-1]))

walls = {"plain": [], "donated": []}
for _ in range(5):
    s = jax.tree.map(jnp.copy, state)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s, gs = ep_plain(s, data, idx, lw, key)
    float(np.asarray(gs[-1]))
    walls["plain"].append(time.perf_counter() - t0)

    s = jax.tree.map(jnp.copy, state)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s, gs = ep_don(s, data, idx, lw, key)
    float(np.asarray(gs[-1]))
    walls["donated"].append(time.perf_counter() - t0)

out["epoch_543_plain_s"] = round(min(walls["plain"]), 3)
out["epoch_543_donated_s"] = round(min(walls["donated"]), 3)
print(json.dumps({k: v for k, v in out.items()
                  if k.startswith("epoch")}), flush=True)

with open("/tmp/profile_step_out.json", "w") as f:
    json.dump(out, f, indent=2)
print("DONE")
