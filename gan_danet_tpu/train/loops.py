"""Device-resident loop builders shared by ModelTrainer and EnsembleTrainer.

Per-batch Python dispatch dominates wall time on remote/tunneled TPUs
(measured 1.37 s/step wall vs 19 ms compute — see trainer.py round-1 notes),
so every hot loop here compiles to ONE XLA program: the dataset lives in HBM
and a `lax.scan` gathers batches by index. The reference's per-batch
host->device DataLoader copies (GAN_DANet_train.ipynb cell 0 train loop;
SURVEY.md §3.1 "host->device copy at .to(device)") have no TPU-native
equivalent — this module is what replaces them.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from gan_danet_tpu.data.dataset import ArrayDataset, apply_augmentation


def dataset_to_device(ds: ArrayDataset, mesh=None) -> Dict[str, jnp.ndarray]:
    """Move a whole split into HBM as the {lr05, lr025, aux} batch dict.

    With a mesh the split is replicated across devices (reference-scale
    data is ~1.35 GiB f32 — BASELINE.md — well within one v5e chip's HBM):
    replication keeps the shuffled epoch gathers communication-free; the
    per-batch sharding constraint in make_epoch_fn then splits each
    gathered batch over 'data' so compute is data-parallel."""
    arrs = {
        "lr05": ds.lr_grace_05[..., None],
        "lr025": ds.lr_grace_025[..., None],
        "aux": ds.hr_aux,
    }
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in arrs.items()}
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    # device_put handles host numpy AND already-device-resident jax
    # arrays (device-to-device reshard — no host round-trip for the
    # to_host=False preprocessing handoff)
    return {k: jax.device_put(v, rep) for k, v in arrs.items()}


def batch_index_matrix(order: np.ndarray, batch_size: int) -> np.ndarray:
    """(n_batches, batch_size) gather indices reproducing Batcher semantics
    (fixed batch size, wrap-around final batch)."""
    n = len(order)
    n_batches = int(np.ceil(n / batch_size))
    total = n_batches * batch_size
    return np.resize(np.asarray(order), total).reshape(
        n_batches, batch_size).astype(np.int32)


def gather_batch(data: Dict[str, jnp.ndarray], idx: jnp.ndarray):
    return {k: jnp.take(v, idx, axis=0) for k, v in data.items()}


def make_stacked_step(single_step: Callable,
                      per_member_batch: bool = False) -> Callable:
    """Compose a single-member train step over a leading member axis via
    lax.scan (NOT vmap): vmapping member-stacked conv params lowers to
    grouped convolutions, which the TPU backend effectively serialises at
    a catastrophic constant — measured 558 ms for a 5-member step vs
    77.6 ms for this scan (7.2x) and ~71 ms for 5 independent steps
    (round-3, DESIGN.md §8). The scan is sequential per member but each
    member's step runs at full single-model efficiency; on a multi-chip
    mesh the member axis shards over 'ensemble' so each shard scans only
    its local members.

    single_step(state, batch, lw) -> (state, metrics);
    returns stacked(states, batch, lw) -> (states, metrics) with leading
    member axes. With per_member_batch=True the batch arrays carry a
    leading member axis too and each member consumes its own batch — the
    reference's members each draw an independent shuffled order from
    their own seed (deep_ensemble.ipynb set_seed(42+i) before each
    member's DataLoader)."""

    def stacked(states, batch, loss_weight):
        if per_member_batch:
            def body(carry, st_b):
                st, b = st_b
                ns, m = single_step(st, b, loss_weight)
                return carry, (ns, m)

            _, (new_states, metrics) = jax.lax.scan(body, None,
                                                    (states, batch))
        else:
            def body(carry, st):
                ns, m = single_step(st, batch, loss_weight)
                return carry, (ns, m)

            _, (new_states, metrics) = jax.lax.scan(body, None, states)
        return new_states, metrics

    return stacked


def make_stacked_eval(eval_single: Callable) -> Callable:
    """Member-axis composition of an eval forward, scan-based for the
    same grouped-conv reason as make_stacked_step.

    eval_single(params, stats, batch) -> pred;
    returns stacked(params, stats, batch) -> (members, ...) preds."""

    def stacked(params, stats, batch):
        def body(carry, ps):
            p, s = ps
            return carry, eval_single(p, s, batch)

        _, preds = jax.lax.scan(body, None, (params, stats))
        return preds

    return stacked


def make_epoch_fn(step_fn: Callable, augment: bool, mesh=None,
                  member_batches: bool = False) -> Callable:
    """One jitted program per training epoch.

    step_fn(state, batch, loss_weight) -> (state, metrics with loss_g/loss_d)
    may be the single-member GAN step or its member-stacked composition.
    Returns epoch_fn(state, data, idx_batches, loss_weight, aug_key)
    -> (state, loss_g_stack, loss_d_stack) where the stacks carry the
    per-batch metrics (leading axis = batch index).

    With a mesh, each gathered batch is sharding-constrained over the
    'data' axis so GSPMD partitions the whole D+G step data-parallel
    (gradient allreduce + cross-shard BN collectives over ICI, inserted by
    XLA) — semantics identical to single-device (global BN over the full
    batch), verified in tests/test_train.py.

    member_batches=True pairs with a per-member-batch stacked step:
    idx_batches is (n_batches, members, B), the gathered batch carries a
    leading member axis (sharded over 'ensemble' on a mesh), and
    augmentation draws one key per member.
    """
    constraint = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gan_danet_tpu.core.meshes import DATA_AXIS, ENSEMBLE_AXIS

        spec = (P(ENSEMBLE_AXIS, DATA_AXIS) if member_batches
                else P(DATA_AXIS))
        constraint = NamedSharding(mesh, spec)

    def epoch_fn(state, data, idx_batches, loss_weight, aug_key):
        def body(carry, idx):
            st, key = carry
            batch = gather_batch(data, idx)
            if constraint is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, {k: constraint for k in batch})
            if augment:
                key, k = jax.random.split(key)
                if member_batches:
                    n_members = idx.shape[0]
                    batch = jax.vmap(apply_augmentation)(
                        batch, jax.random.split(k, n_members))
                else:
                    batch = apply_augmentation(batch, k)
            st, metrics = step_fn(st, batch, loss_weight)
            return (st, key), (metrics["loss_g"], metrics["loss_d"])

        (state, _), (gs, ds) = jax.lax.scan(body, (state, aug_key),
                                            idx_batches)
        return state, gs, ds

    # donate the input train state: XLA reuses its buffers for the output
    # state instead of allocating a second full copy per epoch (params +
    # two Adam moment sets + BN stats — the largest allocation of a
    # reference-scale epoch). CALLER CONTRACT: the previous epoch's state
    # arrays are INVALIDATED by the next call — snapshots taken from a
    # returned state (best-weights tracking) must be jnp.copy'd, not
    # aliased (trainer.py/ensemble.py do). CPU ignores donation (tests
    # run there), so only TPU runs exercise the aliasing rule — hence the
    # explicit copies rather than reliance on test coverage.
    return jax.jit(epoch_fn, donate_argnums=(0,))


def make_scan_predict(eval_step: Callable, mesh=None) -> Callable:
    """One jitted program per full prediction pass.

    eval_step(params, stats, batch) -> pred; may be the single-member eval
    or its member-stacked composition. Returns
    predict_fn(params, stats, data, idx_batches) -> per-batch prediction
    stack with leading axis = batch index. With a mesh, each gathered
    batch is sharding-constrained over 'data' (same rationale as
    make_epoch_fn) so eval runs data-parallel too.
    """
    constraint = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gan_danet_tpu.core.meshes import DATA_AXIS

        constraint = NamedSharding(mesh, P(DATA_AXIS))

    def predict_fn(params, stats, data, idx_batches):
        def body(_, idx):
            batch = gather_batch(data, idx)
            if constraint is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, {k: constraint for k in batch})
            return None, eval_step(params, stats, batch)

        _, preds = jax.lax.scan(body, None, idx_batches)
        return preds

    return jax.jit(predict_fn)


def scan_predict_to_host(predict_fn, params, stats, data, order,
                         batch_size: int, batch_axis: int = 0) -> np.ndarray:
    """Run a make_scan_predict program over `order` and return host
    predictions in sample order with the wrap-around fill trimmed.

    batch_axis: position of the per-batch sample axis in eval_step's output
    (0 for the single-member eval, 1 when stacked over members)."""
    idx = jnp.asarray(batch_index_matrix(order, batch_size))
    preds = np.asarray(predict_fn(params, stats, data, idx))
    # (n_batches, ..., batch, ...) -> flatten scan+batch axes into samples
    preds = np.moveaxis(preds, batch_axis + 1, 1)
    flat = preds.reshape((preds.shape[0] * preds.shape[1],) + preds.shape[2:])
    flat = flat[: len(order)]
    if batch_axis != 0:
        flat = np.moveaxis(flat, 0, batch_axis)
    return flat
