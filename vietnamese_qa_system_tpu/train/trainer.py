"""Training engine: pjit train step, grad accumulation, LoRA, checkpoints.

Capability of the reference's `train()` (reference src/models/trainer.py:283):
Accelerator init → model/optimizer prep → resume → epoch/step hot loop with
gradient accumulation, logging, step/time-triggered checkpoints → per-epoch
perplexity + generative eval → export.  TPU-first redesign:

- One SPMD program over a `jax.sharding.Mesh`; the distribution strategy is
  a *sharding rule set* (parallel/sharding.py), not a launcher wrapper —
  replacing DDP / ZeRO-2/3 / FSDP / DeepSpeed-TP engine selection
  (reference trainer.py:164-231 `prepare_any`).
- Gradient accumulation is a `lax.scan` over microbatches inside one jit
  step (capability of `accelerator.accumulate`, trainer.py:801).
- LoRA trains only the adapter pytree: the base is merged functionally
  under `stop_gradient` (capability of peft wrapping, trainer.py:604).
- The whole step is donated — parameters and optimizer state update
  in place in HBM.
"""

from __future__ import annotations

import dataclasses
import functools
import sys
import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.mesh import DATA_AXIS, create_mesh
from ..core.profiling import MemoryTracker
from ..models import LoraConfig, ModelConfig, causal_lm, init_lora, merge_lora, seq2seq
from ..models.encoder import init_encoder
from ..models.causal_lm import init_causal_lm
from ..models.seq2seq import init_seq2seq
from ..parallel.sharding import param_sharding
from ..utils.logging import dist_print, get_logger
from ..utils.trackers import make_tracker
from .checkpoint import CheckpointManager
from .optim import make_optimizer, make_schedule

logger = get_logger("vqa_tpu.train")


@dataclasses.dataclass
class TrainConfig:
    """Typed replacement for the reference's ~80-flag argparse surface
    (reference train.py:15-213) — training-loop subset."""

    model: ModelConfig
    lora: Optional[LoraConfig] = None
    optimizer: str = "adamw"
    lr: float = 2e-4
    weight_decay: float = 0.0
    max_grad_norm: Optional[float] = 1.0
    schedule: str = "linear"
    warmup_steps: int = 0
    epochs: int = 1
    grad_accum: int = 1  # microbatches per step (capability of --gradient_accumulation_steps)
    strategy: str = "dp"  # dp | zero2 | fsdp | tp | fsdp_tp
    mesh_axes: Optional[dict] = None  # e.g. {"data": -1} / {"data": 2, "model": 4}
    # ZeRO-3-offload capability (the reference's accelerate_ds_zero3_
    # cpu_offload_config.yaml): persist state in host memory via the
    # pinned_host memory kind and stream it through HBM inside the step.
    # "optimizer" | "params" | "all"
    host_offload: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    # per-host shard files instead of one monolithic npz (multi-host
    # topologies; restore reassembles onto the current mesh)
    sharded_checkpoint: bool = False
    save_every_steps: Optional[int] = None
    save_every_seconds: Optional[float] = None
    # fetch + write checkpoints in a background thread (on-device state
    # snapshot first), so saves never stall the step loop
    async_checkpoint: bool = False
    keep_checkpoints: int = 3
    resume: bool = False
    # quantize the frozen base to "int8", "nf4" or "nf4-dq" (double-quant
    # of the scales, bnb_4bit_use_double_quant) before sharding — LoRA
    # trains over the quantized base (capability of the reference's
    # BitsAndBytesConfig QLoRA path, trainer.py:470-487,590-605)
    quantize_base: Optional[str] = None
    # where the quantized base is dequantized in the QLoRA step:
    #   "fused" — at each matmul's point of use (recomputed in the bwd
    #             under per-layer remat; minimum live memory)
    #   "once"  — the whole frozen base is dequantized to bf16 before
    #             the forward (LoRA factors stay attached and apply
    #             lazily, keeping weight cotangents symbolically zero —
    #             see dequantize_tree's fold_lora note), so the VPU
    #             gather chain runs ONCE per microbatch instead of twice
    #             per matmul.
    #   "once_folded" — like "once" but the LoRA delta is folded into
    #             the bf16 weights, removing the lazy low-rank matmuls
    #             from the layers at the cost of a full-size stacked
    #             weight-cotangent tree in the backward (~4N extra f32
    #             bytes live).  Fastest when HBM is plentiful (llama1b
    #             B=8: 582.8 vs 605.3 ms) but OOMs where "once" fits
    #             (PhoGPT-4B).  Measured table in docs/BENCHMARKS.md.
    # Both non-fused modes cost one live bf16 copy of the weights (~2N
    # bytes) and trade gathers for HBM streaming (probe_mfu_decomp
    # attributed >=15% of the llama1b flagship step to fused dequant;
    # measured numbers in docs/BENCHMARKS.md).  Pair them with
    # scan_layers remat (the outer-loss remat would recompute the
    # dequant and cancel the win).
    qlora_dequant: str = "fused"
    seed: int = 42
    log_every: int = 10
    log_dir: str = "runs/logs"
    report_to: str = "jsonl"
    run_name: Optional[str] = None
    remat: bool = False  # jax.checkpoint the loss for memory
    # capture a jax.profiler device trace for the first N steps after
    # start/resume (TPU-native upgrade of the reference's wall-clock
    # instrumentation, SURVEY §5.1)
    profile_steps: int = 0
    profile_dir: str = "runs/profile"


def _factory_wants_epoch(factory: Callable) -> bool:
    """True if the batch factory accepts a positional epoch-index argument
    (the resume-safe contract; zero-arg factories remain supported)."""
    import inspect

    try:
        sig = inspect.signature(factory)
    except (TypeError, ValueError):
        return False
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD, p.VAR_POSITIONAL):
            return True
        if p.kind in (p.KEYWORD_ONLY,) and p.default is p.empty:
            return False
    return False


def init_model_params(cfg: ModelConfig, key):
    if cfg.arch == "causal":
        return init_causal_lm(key, cfg)
    if cfg.arch == "seq2seq":
        if cfg.seq2seq_family == "t5":
            from ..models import t5

            return t5.init_t5(key, cfg)
        if cfg.seq2seq_family == "bart":
            from ..models import bart

            return bart.init_bart(key, cfg)
        return init_seq2seq(key, cfg)
    if cfg.arch == "encoder":
        return init_encoder(key, cfg)
    raise ValueError(cfg.arch)


def model_loss_fn(cfg: ModelConfig) -> Callable:
    if cfg.arch == "causal":
        return functools.partial(causal_lm.loss_fn, cfg=cfg)
    if cfg.arch == "seq2seq":
        from ..models.families import s2s_module

        return functools.partial(s2s_module(cfg).loss_fn, cfg=cfg)
    raise ValueError(f"no training loss for arch {cfg.arch!r}")


def make_train_step(
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    *,
    in_shardings=None,
    out_shardings=None,
):
    """Build the jitted (state, batch) -> (state, metrics) step.

    state: {"params", "adapter", "opt_state", "step"}; batch leaves are
    (grad_accum, microbatch, ...) shaped.  Pass pinned in/out shardings
    (Trainer does) so no per-call resharding ever happens.
    """
    loss_of = model_loss_fn(cfg.model)
    use_lora = cfg.lora is not None
    lcfg = cfg.lora

    def loss_for(trainable, frozen_base, mb):
        if use_lora:
            params = merge_lora(jax.lax.stop_gradient(frozen_base), trainable, lcfg)
            if cfg.qlora_dequant != "fused" and cfg.quantize_base:
                # dequantize the whole frozen base before the forward:
                # the gather chain runs once per microbatch and the
                # scan-over-layers remat re-READS bf16 weights instead
                # of re-dequantizing (TrainConfig note; fold tradeoff
                # documented there)
                from ..models.quantize import dequantize_tree

                params = dequantize_tree(
                    params, dtype=jnp.bfloat16,
                    fold_lora=(cfg.qlora_dequant == "once_folded"),
                )
        else:
            params = trainable
        loss, n = loss_of(params, batch=mb)
        return loss, n

    if cfg.remat and not (
        cfg.model.scan_layers and cfg.model.remat_policy != "none"
    ):
        # Outer whole-loss remat — only when the scan-over-layers body is
        # not already checkpointed: stacking both forces an EXTRA full
        # forward recompute in the backward (outer re-runs the forward,
        # then every inner per-layer checkpoint re-runs its layer again)
        # — measured ~5F vs 4F FLOPs per step (scripts/probe_remat_ab.py).
        # scan_layers + remat_policy="none" keeps the outer wrap: it is
        # then the only remat.
        loss_for = jax.checkpoint(loss_for)

    grad_fn = jax.value_and_grad(loss_for, has_aux=True)

    def step_fn(state, batch):
        base = state["params"]
        trainable = state["adapter"] if use_lora else base

        def micro(carry, mb):
            g_acc, loss_acc, n_acc = carry
            (loss, n), grads = grad_fn(trainable, base, mb)
            g_acc = jax.tree.map(jnp.add, g_acc, grads)
            return (g_acc, loss_acc + loss * n, n_acc + n), None

        g0 = jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), trainable)
        (grads, loss_sum, n_sum), _ = jax.lax.scan(
            micro, (g0, jnp.float32(0.0), jnp.int32(0)), batch
        )
        grads = jax.tree.map(lambda g: g / cfg.grad_accum, grads)

        updates, new_opt = tx.update(grads, state["opt_state"], trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_state = dict(state)
        new_state["opt_state"] = new_opt
        new_state["step"] = state["step"] + 1
        if use_lora:
            new_state["adapter"] = new_trainable
        else:
            new_state["params"] = new_trainable
        metrics = {
            "loss": loss_sum / jnp.maximum(n_sum.astype(jnp.float32), 1.0),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    kwargs = {}
    if in_shardings is not None:
        kwargs["in_shardings"] = in_shardings
    if out_shardings is not None:
        kwargs["out_shardings"] = out_shardings
    return jax.jit(step_fn, donate_argnums=(0,), **kwargs)


class Trainer:
    """Orchestrates init → shard → resume → fit (capability of
    reference trainer.py train(); see module docstring)."""

    def __init__(
        self,
        cfg: TrainConfig,
        *,
        params=None,
        mesh=None,
        total_steps: Optional[int] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_mesh(
            cfg.mesh_axes or {DATA_AXIS: -1}
        )
        key = jax.random.key(cfg.seed)
        if (
            cfg.lora is None
            and cfg.model.use_flash_attention
            and (
                cfg.model.seq2seq_family == "t5"
                or cfg.model.relative_attention_buckets
            )
        ):
            raise ValueError(
                "full fine-tuning with use_flash_attention on a relative-"
                "bias family (T5/MPNet) would silently freeze the bias "
                "tables (the fused kernel's bias cotangent is zero) — "
                "disable flash attention or train with LoRA"
            )
        if params is None:
            params = init_model_params(cfg.model, key)
        if cfg.model.scan_layers:
            # externally-supplied params (HF import, old checkpoints) in
            # list form: convert to the scan-over-layers stacked layout
            if cfg.model.arch == "causal" and isinstance(
                params.get("blocks"), list
            ):
                if cfg.model.attention_layers is not None:
                    # same guard as init_causal_lm — a scan applies one
                    # (global) layer body, so alternating local layers
                    # would silently lose their windows
                    raise ValueError(
                        "scan_layers requires homogeneous layers "
                        "(attention_layers alternation cannot be scanned)"
                    )
                from ..models.causal_lm import stack_blocks

                params = stack_blocks(params)
            elif (
                cfg.model.arch == "seq2seq"
                and cfg.model.seq2seq_family == "t5"
                and isinstance(params.get("enc_blocks"), list)
            ):
                from ..models.t5 import stack_t5

                params = stack_t5(params)
        if cfg.qlora_dequant not in ("fused", "once", "once_folded"):
            raise ValueError(
                f"qlora_dequant must be 'fused', 'once' or 'once_folded',"
                f" got {cfg.qlora_dequant!r}"
            )
        if cfg.quantize_base is not None:
            if cfg.lora is None:
                raise ValueError(
                    "quantize_base requires LoRA: int8/nf4 codes cannot "
                    "take gradient updates (the reference's QLoRA path "
                    "likewise trains adapters only)"
                )
            from ..models.quantize import quantize_dense_tree

            params = quantize_dense_tree(params, cfg.quantize_base)
        from ..parallel.sharding import accum_batch_sharding, replicated

        # Every state leaf gets an explicit NamedSharding and the step is
        # jitted with pinned in/out shardings.  Mixing committed and
        # uncommitted leaves makes jax convert arrays on every call — on a
        # remote-attached TPU that per-call resharding dominated the step
        # (observed 100ms -> 6.6s per step).
        p_shardings = param_sharding(params, self.mesh, cfg.strategy)
        offload_params = cfg.host_offload in ("params", "all")
        offload_opt = cfg.host_offload in ("optimizer", "all")
        if cfg.host_offload and not (offload_params or offload_opt):
            raise ValueError(
                f"host_offload must be optimizer|params|all, got "
                f"{cfg.host_offload!r}"
            )

        def to_host(shardings, values):
            # scalar leaves stay in device memory: the SPMD partitioner
            # rejects host-placement annotations on rank-0 side effects,
            # and offloading scalars saves nothing anyway
            return jax.tree.map(
                lambda s, v: s.with_memory_kind("pinned_host")
                if getattr(v, "ndim", 0) >= 1
                else s,
                shardings,
                values,
            )

        self._offload = {}
        if offload_params:
            p_host = to_host(p_shardings, params)
            self._offload["params_dev"] = p_shardings
            self._offload["params_host"] = p_host
            p_shardings = p_host
        self.params = jax.device_put(params, p_shardings)

        self.adapter = None
        a_shardings = None
        if cfg.lora is not None:
            adapter = init_lora(jax.random.key(cfg.seed + 1), params, cfg.lora)
            a_shardings = param_sharding(adapter, self.mesh, "dp")
            self.adapter = jax.device_put(adapter, a_shardings)

        sched = make_schedule(
            cfg.schedule, cfg.lr, total_steps or 10_000, cfg.warmup_steps
        )
        self.tx = make_optimizer(
            cfg.optimizer,
            sched,
            weight_decay=cfg.weight_decay,
            max_grad_norm=cfg.max_grad_norm,
        )
        trainable = self.adapter if cfg.lora is not None else self.params
        opt_state = self.tx.init(trainable)
        # ZeRO-style optimizer-state sharding for zero2/fsdp strategies
        # (reference ZeRO-2/3 configs); replicated otherwise.
        opt_strategy = (
            "fsdp" if cfg.strategy in ("zero2", "fsdp", "fsdp_tp") else "dp"
        )
        o_shardings = param_sharding(opt_state, self.mesh, opt_strategy)
        if offload_opt:
            o_host = to_host(o_shardings, opt_state)
            self._offload["opt_dev"] = o_shardings
            self._offload["opt_host"] = o_host
            o_shardings = o_host
        opt_state = jax.device_put(opt_state, o_shardings)
        rep = replicated(self.mesh)
        # the jitted step always sees DEVICE-memory shardings; with
        # host_offload the persistent copy lives in pinned_host and is
        # staged through HBM around each call (_run_step) — this JAX/XLA
        # build cannot partition in-jit placement annotations under SPMD
        self._state_shardings = {
            "params": self._offload.get("params_dev", p_shardings),
            "adapter": a_shardings,
            "opt_state": self._offload.get("opt_dev", o_shardings),
            "step": rep,
        }
        self.state = {
            "params": self.params,
            "adapter": self.adapter,
            "opt_state": opt_state,
            "step": jax.device_put(jnp.zeros([], jnp.int32), rep),
        }
        self._batch_sharding = accum_batch_sharding(self.mesh)
        self._step_fn = make_train_step(
            cfg,
            self.tx,
            in_shardings=(self._state_shardings, self._batch_sharding),
            out_shardings=(
                self._state_shardings,
                {"loss": rep, "grad_norm": rep},
            ),
        )
        self.ckpt = (
            CheckpointManager(
                cfg.checkpoint_dir,
                cfg.keep_checkpoints,
                sharded=cfg.sharded_checkpoint,
            )
            if cfg.checkpoint_dir
            else None
        )
        self.tracker = make_tracker(cfg.report_to, cfg.log_dir, cfg.run_name)
        self.start_step = 0
        if cfg.resume and self.ckpt is not None:
            restored, meta = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                self.start_step = int(meta["step"])
                dist_print(f"resumed from step {self.start_step}")

    # ------------------------------------------------------------------ fit

    def _run_step(self, state, batch):
        """One optimizer step.  With host_offload, stage the host-resident
        components into HBM, run the jitted step (which donates and frees
        the staged copies), and move the updated state back to pinned
        host memory — the ZeRO-3-offload data motion, expressed as
        explicit memory-kind transfers."""
        if not self._offload:
            return self._step_fn(state, batch)
        staged = dict(state)
        if "params_dev" in self._offload:
            staged["params"] = jax.device_put(
                state["params"], self._offload["params_dev"]
            )
        if "opt_dev" in self._offload:
            staged["opt_state"] = jax.device_put(
                state["opt_state"], self._offload["opt_dev"]
            )
        new_state, metrics = self._step_fn(staged, batch)
        if "params_host" in self._offload:
            new_state["params"] = jax.device_put(
                new_state["params"], self._offload["params_host"]
            )
        if "opt_host" in self._offload:
            new_state["opt_state"] = jax.device_put(
                new_state["opt_state"], self._offload["opt_host"]
            )
        return new_state, metrics

    def _device_batch(self, batch: dict):
        """(global_b, ...) numpy → (accum, micro_b, ...) device arrays."""
        a = self.cfg.grad_accum

        n_data = self.mesh.shape.get("data", 1) if self.mesh else 1

        def shape(x):
            x = np.asarray(x)
            gb = x.shape[0]
            if gb % a:
                raise ValueError(f"global batch {gb} not divisible by accum {a}")
            if (gb // a) % n_data:
                # fail here with the actual knobs, not in the pjit
                # sharding checker's divisibility error
                raise ValueError(
                    f"micro-batch {gb // a} (global batch {gb} / "
                    f"grad_accum {a}) must be divisible by the data mesh "
                    f"axis ({n_data} devices) — raise --batch-size or "
                    f"shrink the data axis"
                )
            return x.reshape(a, gb // a, *x.shape[1:])

        return {k: jnp.asarray(shape(v)) for k, v in batch.items()}

    def fit(
        self,
        train_batches: Callable[..., Iterable[dict]],
        *,
        eval_fn: Optional[Callable[[Any, int], dict]] = None,
        max_steps: Optional[int] = None,
    ):
        """train_batches: factory returning one epoch's iterable of host
        batches {"input_ids","attention_mask","labels"} with a global batch
        dim.  A factory taking one positional argument receives the epoch
        index — required for per-epoch shuffles to survive resume: a
        call-counting closure would see one extra probe call on resumed
        runs (and none for already-completed epochs), silently changing
        the shuffle order vs the original run.  Resume fast-forwards
        within the epoch (capability of accelerate `skip_first_batches`,
        reference trainer.py:784-787)."""
        cfg = self.cfg
        wants_epoch = _factory_wants_epoch(train_batches)
        epoch_iter = (
            (lambda e: train_batches(e)) if wants_epoch else (lambda e: train_batches())
        )
        step = self.start_step
        last_save = time.time()
        profiling = False
        if cfg.profile_steps > 0:
            import os

            os.makedirs(cfg.profile_dir, exist_ok=True)
            jax.profiler.start_trace(cfg.profile_dir)
            profiling = True
            profile_until = step + cfg.profile_steps
        # Resume: derive (completed epochs, in-epoch offset) from start_step
        # and steps-per-epoch (capability of the reference's explicit resume
        # math, trainer.py:690-713 + accelerate skip_first_batches).  The
        # epoch length comes from len() when the iterable provides it;
        # otherwise the first resumed epoch counts batches while skipping
        # (host-side only, no device work).
        skip = self.start_step
        steps_per_epoch = None
        if skip > 0:
            probe = epoch_iter(0)
            if hasattr(probe, "__len__"):
                steps_per_epoch = len(probe)
        for epoch in range(cfg.epochs):
            if steps_per_epoch is not None and skip >= steps_per_epoch:
                skip -= steps_per_epoch
                continue  # epoch fully trained before the restart
            epoch_tokens, epoch_steps = 0, 0
            t0 = time.time()
            n_batches = 0
            with MemoryTracker() as mem:
                for i, batch in enumerate(epoch_iter(epoch)):
                    n_batches = i + 1
                    if skip > 0:
                        skip -= 1
                        continue  # fast-forward within the resume epoch
                    dev_batch = self._device_batch(batch)
                    n_tok = int(np.prod(dev_batch["input_ids"].shape))
                    self.state, metrics = self._run_step(self.state, dev_batch)
                    step += 1
                    epoch_steps += 1
                    epoch_tokens += n_tok
                    if profiling and step >= profile_until:
                        jax.profiler.stop_trace()
                        profiling = False
                        dist_print(f"profiler trace written to {cfg.profile_dir}")
                    if step % cfg.log_every == 0:
                        loss = float(metrics["loss"])
                        elapsed = time.time() - t0
                        self.tracker.log(
                            {
                                "loss": loss,
                                "grad_norm": float(metrics["grad_norm"]),
                                "epoch": epoch,
                                "tokens_per_s": epoch_tokens / max(elapsed, 1e-9),
                            },
                            step,
                        )
                    if self._should_save(step, last_save):
                        self.save(step)
                        last_save = time.time()
                    if max_steps is not None and step >= max_steps:
                        break
            if steps_per_epoch is None:
                steps_per_epoch = n_batches
            if n_batches == 0:
                # the loader dropped everything — most commonly a global
                # batch smaller than the data-axis device count (per-device
                # sharding needs batch % n_devices == 0), or every example
                # exceeding max_len.  Silent zero-step "training" is a trap.
                dist_print(
                    "WARNING: epoch produced 0 batches — check that the "
                    "global batch size is a multiple of the data-axis "
                    "device count and that examples fit --max-len",
                    file=sys.stderr,
                )
            if epoch_steps == 0 and n_batches > 0 and step == self.start_step:
                continue  # epoch consumed entirely by fast-forward counting
            dev_peak = (
                f"{mem.peaked}MB"
                if getattr(mem, "device_supported", True)
                else "n/a (backend reports no memory stats)"
            )
            dist_print(
                f"epoch {epoch}: steps={epoch_steps} "
                f"device_mem_peak={dev_peak} cpu_peak={mem.cpu_peaked}MB"
            )
            if eval_fn is not None:
                eval_metrics = eval_fn(self.state, epoch)
                self.tracker.log({f"eval_{k}": v for k, v in eval_metrics.items()}, step)
            if self.ckpt is not None:
                self.save(step)
            if max_steps is not None and step >= max_steps:
                break
        if profiling:
            jax.profiler.stop_trace()
        if self.ckpt is not None:
            self.ckpt.wait()  # drain any in-flight async save
        return self.state

    def _should_save(self, step: int, last_save: float) -> bool:
        if self.ckpt is None:
            return False
        if self.cfg.save_every_steps and step % self.cfg.save_every_steps == 0:
            return True
        if (
            self.cfg.save_every_seconds
            and time.time() - last_save > self.cfg.save_every_seconds
        ):
            return True
        return False

    def save(self, step: int) -> None:
        if self.ckpt is not None:
            meta = {"config": repr(self.cfg)}
            if self.cfg.async_checkpoint:
                self.ckpt.save_async(step, self.state, meta)
            else:
                self.ckpt.save(step, self.state, meta)

    # ---------------------------------------------------------------- export

    def merged_params(self):
        """Adapter merged into the base for inference/export — capability of
        reference merge_adapter/merge_and_unload (trainer.py:84-161)."""
        params = self.state["params"]
        if "params_dev" in self._offload:  # host-offloaded base: bring back
            params = jax.device_put(params, self._offload["params_dev"])
        if self.adapter is None:
            return params
        return merge_lora(params, self.state["adapter"], self.cfg.lora)
