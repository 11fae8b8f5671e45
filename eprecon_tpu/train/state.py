"""Train state, optimizer, LR schedule, and the (sharded) train step.

Reference training recipe (main.py:154-348): Adam(lr=1e-4, betas=(0.9,0.999),
wd=0), MultiStepLR '70,90:10', grad clip 1.0, gradient accumulation 8,
DDP gradient averaging, staged freezing (ONLY_INIT then freeze 'init').

TPU-native: optax chain (clip → adam → multisteps) under a 1-D data mesh;
gradients are averaged by `psum` inside the jitted step via shard_map.
Each device processes its own fragment stream and carries its own
RecurrentState (the DDP-rank analogue).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from eprecon_tpu.config import Config
from eprecon_tpu.models.eprecon import EPRecon


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    epoch: jnp.ndarray


def parse_lr_epochs(spec: str):
    """'70,90:10' → (milestones=[70, 90], gamma=1/10)
    (reference main.py:245-253)."""
    miles, gamma = spec.split(":")
    return [int(m) for m in miles.split(",")], 1.0 / float(gamma)


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    miles, gamma = parse_lr_epochs(cfg.train.lr_epochs)
    boundaries = {m * steps_per_epoch: gamma for m in miles}
    return optax.piecewise_constant_schedule(cfg.train.lr, boundaries)


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000,
                   freeze_mask: Optional[Any] = None) -> optax.GradientTransformation:
    lr = make_lr_schedule(cfg, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adam(lr, b1=cfg.train.betas[0], b2=cfg.train.betas[1]),
    )
    if cfg.train.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.train.accumulation_steps)
    # run Adam/clip/accumulation over ONE raveled vector instead of ~500
    # leaves: the per-leaf formulation emits thousands of tiny HLO ops
    # (update + MultiSteps select per leaf) that cost both step time
    # (round-4 trace: 37.7k ops/step) and minutes of XLA:CPU kernel
    # compiles in the driver's 8-device dryrun.
    tx = optax.flatten(tx)
    if freeze_mask is not None:
        # staged freezing by zeroing frozen GRADIENTS before the flattened
        # optimizer — exactly equivalent to the reference's param filtering
        # (main.py:221-230) and to multi_transform{set_to_zero}: Adam with
        # always-zero grads and zero-init moments emits zero updates, and
        # clip_by_global_norm sees the same norm (frozen grads contribute 0).
        # Keeps the heavy stateful ops on one vector even when freezing.
        frozen = jax.tree_util.tree_map(lambda l: l == "freeze", freeze_mask)
        tx = optax.chain(optax.masked(optax.set_to_zero(), frozen), tx)
    return tx


def freeze_mask_for(params, freeze: Optional[str]):
    """Map params → 'freeze'/'train' labels. freeze='init' freezes the
    occupancy-init stage + backbone2d (reference main.py:221-230)."""
    if freeze is None:
        return None
    frozen_prefixes = {
        "init": ("backbone2d", "neucon_net/initialization"),
    }[freeze]

    def label(path, _):
        p = "/".join(str(k.key) for k in path)
        return "freeze" if p.startswith(frozen_prefixes) else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def create_train_state(cfg: Config, rng, sample_args,
                       steps_per_epoch: int = 1000
                       ) -> Tuple[TrainState, EPRecon,
                                  optax.GradientTransformation]:
    """Initialize model + optimizer from one sample fragment's args.

    Returns (state, model, tx). Callers MUST step with the returned tx: it
    carries the staged-freezing mask (reference main.py:221-230) and the
    opt_state pytree in `state` matches it — a freshly built plain optimizer
    would mismatch (multi_transform vs chain) or silently un-freeze.
    """
    model = EPRecon(cfg.model)
    # init under jit: eager init dispatches thousands of ops individually
    # (minutes through the axon relay)
    variables = jax.jit(model.init)(rng, *sample_args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    buffers = variables.get("buffers", {})
    mask = freeze_mask_for(params, cfg.train.finetune_layer)
    tx = make_optimizer(cfg, steps_per_epoch, mask)
    opt_state = tx.init(params)
    state = TrainState(params, {"batch_stats": batch_stats, "buffers": buffers},
                       opt_state, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    return state, model, tx


def fragment_loss_fn(model: EPRecon, params, aux_vars, imgs, frag, targets,
                     rec_state, only_train_init: bool = False):
    """Forward one fragment; returns (loss, (metrics, new_aux, new_rec))."""
    variables = {"params": params, **aux_vars}
    (outputs, losses, new_rec), updates = model.apply(
        variables, imgs, frag, rec_state, targets,
        only_train_init=only_train_init, mutable=["batch_stats"])
    total = losses.get("total_loss", 0.0 * jnp.zeros(()))
    metrics = {k: v for k, v in losses.items()}
    # surface silent capacity truncation (reference warns + aborts at 1.5x cap,
    # neucon_network.py:462-484; here compaction keeps a deterministic subset)
    metrics["overflow"] = jnp.asarray(
        outputs.get("overflow", jnp.zeros((), jnp.int32)), jnp.float32)
    # fragment-abort visibility: frag_ok=0 means every stage/panoptic loss is
    # gated off (reference logs 'no valid points' warnings); a run of zeros in
    # the training log is an occupancy collapse, not convergence
    metrics["frag_ok"] = jnp.asarray(
        outputs.get("frag_ok", jnp.ones((), bool)), jnp.float32)
    new_aux = dict(aux_vars)
    new_aux["batch_stats"] = updates["batch_stats"]
    return total, (metrics, new_aux, new_rec)


def make_train_step(model: EPRecon, tx: optax.GradientTransformation,
                    cfg: Config, mesh=None):
    """Build the jitted (optionally mesh-sharded) train step.

    Single-device signature:
      step(state, imgs, frag, targets, rec) → (state', rec', metrics)
    With a mesh, per-device leading axes on (imgs, frag, targets, rec) are
    consumed by shard_map and gradients are psum-averaged over 'data'.
    """

    def single_step(state: TrainState, imgs, frag, targets, rec):
        grad_fn = jax.value_and_grad(
            lambda p: fragment_loss_fn(model, p, state.batch_stats, imgs, frag,
                                       targets, rec,
                                       cfg.train.only_init), has_aux=True)
        (loss, (metrics, new_aux, new_rec)), grads = grad_fn(state.params)
        return grads, loss, metrics, new_aux, new_rec

    if mesh is None:
        # donate the train state and recurrent state: without donation every
        # step copies each param/opt-state/global-map buffer to fresh device
        # memory (~3.5k copy ops, 135 ms/step at full scale — round-4 trace)
        @functools.partial(jax.jit, donate_argnums=(0, 4))
        def step(state, imgs, frag, targets, rec):
            grads, loss, metrics, new_aux, new_rec = single_step(
                state, imgs, frag, targets, rec)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(new_params, new_aux, new_opt,
                                   state.step + 1, state.epoch)
            return new_state, new_rec, metrics

        return step

    try:
        from jax import shard_map  # jax >= 0.8
        _sm_kwargs = {"check_vma": False}
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
        _sm_kwargs = {"check_rep": False}
    from jax.sharding import PartitionSpec as P

    @functools.partial(jax.jit, donate_argnums=(0, 4))
    def step(state, imgs, frag, targets, rec):
        def shard_fn(state, imgs, frag, targets, rec):
            # leading device axis of size 1 per shard
            sq = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
            grads, loss, metrics, new_aux, new_rec = single_step(
                state, sq(imgs), sq(frag), sq(targets), sq(rec))
            grads = jax.lax.pmean(grads, "data")
            metrics = jax.lax.pmean(metrics, "data")
            # batch_stats averaged across devices (DDP broadcast_buffers=False
            # keeps them per-rank; we average for determinism)
            new_aux = jax.lax.pmean(new_aux, "data")
            ex = lambda t: jax.tree_util.tree_map(lambda x: x[None], t)
            return grads, metrics, new_aux, ex(new_rec)

        grads, metrics, new_aux, new_rec = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
            out_specs=(P(), P(), P(), P("data")),
            **_sm_kwargs)(state, imgs, frag, targets, rec)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_aux, new_opt,
                               state.step + 1, state.epoch)
        return new_state, new_rec, metrics

    return step
