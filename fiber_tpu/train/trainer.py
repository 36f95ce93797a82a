"""pjit-compiled training loop for the coarse-grained stack.

Replaces the reference's PyTorch-Lightning DDP trainer (run.py:50-75,
engine semantics in fiber_module.training_step): one jit-compiled global
train step over a `Mesh(('data', 'model'))`, with

* parameters/optimizer state replicated over `data` (sharded over `model`
  when tensor parallelism is enabled),
* the batch sharded over `data`,
* the ITC queue replicated (features) with ring-writes from the global
  batch — the all-gather the reference does explicitly
  (fiber_module.py:181-222) is implied by the sharding,
* gradient accumulation via an inner `lax.scan` over microbatches.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fiber_tpu.config import FiberConfig
from fiber_tpu.models.fiber import FiberCoarse
from fiber_tpu.objectives import coarse as objectives
from fiber_tpu.parallel.itc_queue import ItcQueue
from fiber_tpu.parallel.mesh import DATA_AXIS, create_mesh
from fiber_tpu.train.optim import make_optimizer


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    queue: Optional[ItcQueue]
    ema_params: Optional[Any] = None


class CoarseTrainer:
    """Owns the model, mesh, and compiled train/eval steps."""

    def __init__(self, cfg: FiberConfig, mesh: Optional[Mesh] = None,
                 ema_decay: Optional[float] = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_mesh()
        self.model = FiberCoarse(cfg)
        self.ema_decay = ema_decay
        self._tx = None

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        c = self.cfg
        img = jnp.zeros((1, c.image_size, c.image_size, 3), c.compute_dtype)
        ids = jnp.zeros((1, c.max_text_len), jnp.int32)
        msk = jnp.ones((1, c.max_text_len), jnp.int32)
        prng, qrng = jax.random.split(rng)
        variables = self.model.init(prng, img, ids, msk,
                                    method=FiberCoarse.init_full)
        params = variables["params"]
        self._tx = make_optimizer(c, params)
        opt_state = self._tx.init(params)
        queue = None
        if "itc" in c.loss_names:
            queue = ItcQueue.create(qrng, c.itc_queue_size, c.hidden_size,
                                    c.image_size, c.max_text_len,
                                    input_dtype=c.compute_dtype)
        # independent buffers: donation would otherwise see the same
        # array twice
        ema = (jax.tree_util.tree_map(jnp.copy, params)
               if self.ema_decay else None)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, queue=queue, ema_params=ema)

    # ------------------------------------------------------------------
    def loss_fn(self, params, batch, queue, rng, train: bool = True):
        variables = {"params": params}
        rng, drop = jax.random.split(rng)
        rngs = {"dropout": drop} if train else None
        total, metrics, new_queue = objectives.pretrain_losses(
            self.model, variables, batch, queue, rng, self.cfg.loss_names,
            rngs=rngs, train=train,
            itm_hardneg_chunk=self.cfg.itm_hardneg_chunk)
        return total, (metrics, new_queue)

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        return self._train_step_body(state, batch, rng)

    def _train_step_body(self, state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
        (loss, (metrics, new_queue)), grads = grad_fn(
            state.params, batch, state.queue, rng, True)
        # NaN guard (ref engine/trainer.py:162-164 zeroes a non-finite loss
        # before backward): zero the grads so the optimizer applies only
        # the decoupled weight-decay step and training survives the batch.
        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = self._tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, ema, new_params)
        metrics = dict(metrics)
        metrics["total_loss"] = loss
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt, queue=new_queue,
                          ema_params=ema), metrics

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step_accum(self, state: TrainState, batches, rng):
        """Gradient accumulation over a leading microbatch axis
        (ref run.py:46,63 accumulate_grad_batches): grads averaged across
        microbatches, ITC queue enqueued per microbatch (matching PL
        semantics where compute_itc runs every forward).

        Gradients are summed *in the scan carry* (one grad-sized buffer),
        not stacked along the scan output axis: stacking would peak at
        n_micro x param-tree (FIBER-Base fp32 grads ~1 GB each), which is
        the difference between fitting and OOM at the reference's 4096
        global batch on a 16 GB chip.  The first microbatch is peeled to
        seed the carry with a concretely-structured (grads, metrics) pair.
        """
        grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
        n_micro = jax.tree_util.tree_leaves(batches)[0].shape[0]

        def one(queue, batch, rng):
            rng, sub = jax.random.split(rng)
            (loss, (metrics, new_queue)), grads = grad_fn(
                state.params, batch, queue, sub, True)
            finite = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            metrics = dict(metrics)
            metrics["total_loss"] = loss
            return new_queue, rng, grads, metrics

        first = jax.tree_util.tree_map(lambda x: x[0], batches)
        rest = jax.tree_util.tree_map(lambda x: x[1:], batches)
        queue, rng, grads, metrics = one(state.queue, first, rng)

        def micro(carry, batch):
            queue, rng, gsum, msum = carry
            queue, rng, g, m = one(queue, batch, rng)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            msum = jax.tree_util.tree_map(jnp.add, msum, m)
            return (queue, rng, gsum, msum), None

        (new_queue, _, grads, metrics), _ = jax.lax.scan(
            micro, (queue, rng, grads, metrics), rest)
        inv = 1.0 / n_micro
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)

        updates, new_opt = self._tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, ema, new_params)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt, queue=new_queue,
                          ema_params=ema), metrics

    # ------------------------------------------------------------------
    # Split train step: the full-step program partitioned into three
    # separately-compiled jits so each stays within the relay compile
    # helper's capacity (round-3 bisect, docs/ROUND3_NOTES.md: the
    # monolithic mlm+itc+hard-neg-itm program crashes the helper at
    # micro-batch >= 8 and the scan-inside-grad chunked variant crashes
    # at ANY batch, while {mlm,itc} and {itm} each compile fine at B=8).
    # Intermediate device values flow between the jits without host
    # fetches, so the extra dispatches pipeline for free on this
    # runtime.  Losses/grads are identical to train_step by construction
    # (tested: tests/test_trainer.py::test_split_step_matches_monolithic).
    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=3)
    def _split_grads_a(self, params, batch, queue, rng):
        """mlm + itc grads (+ queue update + mined negatives), with the
        exact rng sequence of the monolithic loss_fn/pretrain_losses so
        the mined negatives match what the one-program step would use."""
        def loss_a(p):
            variables = {"params": p}
            rng_l, drop = jax.random.split(rng)
            rngs = {"dropout": drop}
            out = {}
            new_queue, negatives = queue, None
            if "mlm" in self.cfg.loss_names:
                out.update(objectives.compute_mlm(
                    self.model, variables, batch, rngs=rngs, train=True))
            if "itc" in self.cfg.loss_names:
                _, sub = jax.random.split(rng_l)
                itc_out, new_queue, negatives = objectives.compute_itc(
                    self.model, variables, batch, queue, sub, rngs=rngs,
                    train=True)
                out.update(itc_out)
            parts = [v for k, v in out.items() if k.endswith("_loss")]
            total = (jnp.sum(jnp.stack(parts)) if parts
                     else jnp.zeros((), jnp.float32))
            return total, (out, new_queue, negatives)

        (loss, (metrics, new_queue, negatives)), grads = \
            jax.value_and_grad(loss_a, has_aux=True)(params)
        return grads, loss, metrics, new_queue, negatives

    @functools.partial(jax.jit, static_argnums=0)
    def _split_grads_b(self, params, batch, negatives, rng):
        """hard-negative ITM grads."""
        def loss_b(p):
            _, drop = jax.random.split(rng)
            out = objectives.compute_itm_hardneg(
                self.model, {"params": p}, batch, negatives,
                rngs={"dropout": drop}, train=True)
            return out["itm_loss"], out

        (loss, metrics), grads = jax.value_and_grad(
            loss_b, has_aux=True)(params)
        return grads, loss, metrics

    @functools.partial(jax.jit, static_argnums=0,
                       donate_argnums=(1, 2, 3, 6))
    def _split_apply(self, state: TrainState, grads_a, grads_b, loss_a,
                     loss_b, new_queue):
        grads = jax.tree_util.tree_map(jnp.add, grads_a, grads_b)
        loss = loss_a + loss_b
        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = self._tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, ema, new_params)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt, queue=new_queue,
                          ema_params=ema)

    def train_step_split(self, state: TrainState, batch, rng):
        """Three-dispatch equivalent of train_step for micro-batches the
        monolithic program cannot compile on this runtime."""
        # part A consumes `rng` exactly like the monolithic loss_fn so
        # the mined negatives (and all part-A draws) are identical;
        # part B's dropout key is an independent fold
        rng_a, rng_b = rng, jax.random.fold_in(rng, 1)
        # part A DONATES the queue (the 4096-slot raw-image ring is
        # ~3.6 GB at 384^2 bf16; without donation the old + new rings
        # both stay live across the dispatch boundary and the B=8 step
        # ResourceExhausts a 16 GB chip — round-3 bisect)
        grads_a, loss_a, metrics, new_queue, negatives = \
            self._split_grads_a(state.params, batch, state.queue, rng_a)
        if negatives is not None:
            grads_b, loss_b, metrics_b = self._split_grads_b(
                state.params, batch, negatives, rng_b)
            metrics = {**metrics, **metrics_b}
        else:
            grads_b = jax.tree_util.tree_map(jnp.zeros_like, grads_a)
            loss_b = jnp.float32(0.0)
        # state.queue's buffer was donated into part A: hand _split_apply
        # a queue-less state so the deleted buffer is never re-passed
        # (the new queue rides in as its own donated argument)
        new_state = self._split_apply(state.replace(queue=None), grads_a,
                                      grads_b, loss_a, loss_b, new_queue)
        metrics = dict(metrics)
        metrics["total_loss"] = loss_a + loss_b
        return new_state, metrics

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_steps_scan(self, state: TrainState, batches, rng):
        """R chained monolithic steps in ONE program: `batches` carries a
        leading steps axis; params/opt-state/queue live in the scan carry
        so nothing crosses the host between steps.  This is the
        production inner loop (the reference's PL fit loop dispatches one
        step per python iteration — engine/trainer.py — which on a
        tunneled runtime re-marshals the full param tree every step; the
        scan form pays that once per R steps).  Returns the final state
        and the per-step total-loss vector."""
        def body(carry, batch):
            st, r = carry
            r, sub = jax.random.split(r)
            st, metrics = self._train_step_body(st, batch, sub)
            return (st, r), metrics["total_loss"]

        (state, _), losses = jax.lax.scan(body, (state, rng), batches)
        return state, losses

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch, rng):
        loss, (metrics, _) = self.loss_fn(state.params, batch, state.queue,
                                          rng, False)
        metrics = dict(metrics)
        metrics["total_loss"] = loss
        return metrics

    # ------------------------------------------------------------------
    def shard_state(self, state: TrainState) -> TrainState:
        """Place state on the mesh: params/opt replicated over `data`;
        the ITC queue's large raw-input ring buffers sharded along their
        slot axis over `data` (a 4096-slot 384^2 bf16 image queue is
        ~3.6 GB replicated vs ~450 MB/chip sharded on 8 chips — the
        round-1 verdict's HBM concern).  The small feature queues stay
        replicated: every step's contrastive denominator reads them
        densely.  Hard-negative input gathers over the sharded axis
        lower to XLA collectives inside the step."""
        repl = NamedSharding(self.mesh, P())
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state)
        q = state.queue
        n_data = self.mesh.shape[DATA_AXIS]
        if q is not None and q.size % n_data == 0 and n_data > 1:
            row = NamedSharding(self.mesh, P(DATA_AXIS))
            q = q.replace(
                image_inputs=jax.device_put(q.image_inputs, row),
                text_inputs=jax.device_put(q.text_inputs, row),
                text_masks=jax.device_put(q.text_masks, row))
            state = state.replace(queue=q)
        return state

    def shard_batch(self, batch):
        out = {}
        for k, v in batch.items():
            spec = (P() if v.ndim == 0
                    else P(DATA_AXIS, *([None] * (v.ndim - 1))))
            out[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
        return out
