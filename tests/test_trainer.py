"""Trainer tests: loss decreases on a memorization task, LoRA-only training,
8-bit optimizer parity, checkpoint/resume, and sharded (fsdp/tp) train steps
on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.core.mesh import create_mesh
from vietnamese_qa_system_tpu.models import LoraConfig, tiny_test
from vietnamese_qa_system_tpu.train import (
    TrainConfig,
    Trainer,
    dequantize_blockwise,
    make_optimizer,
    perplexity_eval,
    quantize_blockwise,
)


def _toy_batches(vocab, b=8, t=16, n=6, seed=0):
    """A tiny memorizable dataset: fixed random sequences."""
    rng = np.random.default_rng(seed)
    data = rng.integers(4, vocab, (n, b, t)).astype(np.int32)

    def factory():
        for i in range(n):
            ids = data[i]
            yield {
                "input_ids": ids,
                "attention_mask": np.ones_like(ids),
                "labels": ids,
            }

    return factory


def test_loss_decreases_full_finetune(tmp_path):
    cfg = TrainConfig(
        model=tiny_test("causal"),
        lr=1e-2,
        epochs=8,
        log_every=1,
        log_dir=str(tmp_path),
        mesh_axes={"data": 1},
    )
    trainer = Trainer(cfg, total_steps=48)
    batches = _toy_batches(cfg.model.vocab_size)
    losses = []

    def eval_fn(state, epoch):
        m = perplexity_eval(state["params"], cfg.model, batches())
        losses.append(m["eval_loss"])
        return m

    trainer.fit(batches, eval_fn=eval_fn)
    assert losses[-1] < losses[0] * 0.7, f"loss did not decrease: {losses}"


def test_lora_trains_only_adapter(tmp_path):
    cfg = TrainConfig(
        model=tiny_test("causal"),
        lora=LoraConfig(r=4),
        lr=5e-3,
        epochs=2,
        log_dir=str(tmp_path),
        mesh_axes={"data": 1},
    )
    trainer = Trainer(cfg, total_steps=12)
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.state["params"])
    adapter_before = jax.tree.map(
        lambda x: np.asarray(x).copy(), trainer.state["adapter"]
    )
    trainer.fit(_toy_batches(cfg.model.vocab_size))
    # base frozen
    for a, b in zip(
        jax.tree.leaves(base_before), jax.tree.leaves(trainer.state["params"])
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    # adapter moved
    moved = any(
        np.abs(a - np.asarray(b)).max() > 1e-7
        for a, b in zip(
            jax.tree.leaves(adapter_before), jax.tree.leaves(trainer.state["adapter"])
        )
    )
    assert moved
    # merged export differs from base
    merged = trainer.merged_params()
    diff = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-7
        for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(trainer.state["params"]))
    )
    assert diff


@pytest.mark.parametrize("opt", ["adamw8bit", "lion8bit"])
def test_8bit_optimizers_train(tmp_path, opt):
    cfg = TrainConfig(
        model=tiny_test("causal"),
        optimizer=opt,
        lr=1e-2 if opt == "adamw8bit" else 1e-3,
        epochs=8,
        log_dir=str(tmp_path),
        mesh_axes={"data": 1},
    )
    trainer = Trainer(cfg, total_steps=48)
    batches = _toy_batches(cfg.model.vocab_size)
    before = perplexity_eval(trainer.state["params"], cfg.model, batches())
    trainer.fit(batches)
    after = perplexity_eval(trainer.state["params"], cfg.model, batches())
    assert after["eval_loss"] < before["eval_loss"] * 0.85


def test_blockwise_quant_roundtrip(rng):
    """Log-magnitude int8: bounded RELATIVE error across a wide dynamic
    range (the property linear int8 lacks, and why bnb uses dynamic maps)."""
    x = rng.standard_normal((3, 70)).astype(np.float32)
    x[0, :10] *= 1e-6  # tiny values must survive with relative accuracy
    x[1, 0] = 0.0  # exact zero must round-trip exactly
    xj = jnp.asarray(x)
    q = quantize_blockwise(xj)
    x2 = np.asarray(dequantize_blockwise(q))
    assert x2.shape == x.shape
    assert x2[1, 0] == 0.0
    nz = np.abs(x) > np.abs(x).max() * 2.0**-29
    rel = np.abs(x2[nz] - x[nz]) / np.abs(x[nz])
    assert rel.max() <= 0.1, f"relative error {rel.max()}"


def test_checkpoint_resume(tmp_path):
    cfg = TrainConfig(
        model=tiny_test("causal"),
        lr=1e-3,
        epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        save_every_steps=3,
        log_dir=str(tmp_path),
        mesh_axes={"data": 1},
    )
    trainer = Trainer(cfg, total_steps=6)
    trainer.fit(_toy_batches(cfg.model.vocab_size))
    assert trainer.ckpt.latest_step() == 6

    cfg2 = TrainConfig(**{**cfg.__dict__, "resume": True})
    trainer2 = Trainer(cfg2, total_steps=6)
    assert trainer2.start_step == 6
    # restored params identical
    for a, b in zip(
        jax.tree.leaves(trainer.state["params"]),
        jax.tree.leaves(trainer2.state["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


@pytest.mark.parametrize("sized", [False, True])
def test_resume_mid_epoch(tmp_path, sized):
    """Resuming a run that died mid-epoch-2 replays exactly the remaining
    batches: total steps and final params match an uninterrupted run
    (capability of the reference's resume math, trainer.py:690-713)."""
    vocab = tiny_test("causal").vocab_size

    def make_batches():
        gen = _toy_batches(vocab, n=3)
        if not sized:
            return gen
        return lambda: list(gen())  # sized iterable exercises the len() path

    base = dict(
        model=tiny_test("causal"),
        lr=1e-3,
        epochs=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        save_every_steps=1,
        log_dir=str(tmp_path),
        mesh_axes={"data": 1},
    )
    straight = Trainer(TrainConfig(**base), total_steps=12)
    straight.fit(make_batches())
    assert int(straight.state["step"]) == 12

    base2 = dict(base, checkpoint_dir=str(tmp_path / "ckpt2"))
    t1 = Trainer(TrainConfig(**base2), total_steps=12)
    t1.fit(make_batches(), max_steps=8)  # dies mid-epoch 2 (epochs are 3 steps)
    assert int(t1.state["step"]) == 8

    t2 = Trainer(TrainConfig(**base2, resume=True), total_steps=12)
    assert t2.start_step == 8
    t2.fit(make_batches())
    assert int(t2.state["step"]) == 12
    for a, b in zip(
        jax.tree.leaves(straight.state["params"]),
        jax.tree.leaves(t2.state["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resume_epoch_aware_factory(tmp_path):
    """A factory taking the epoch index sees the SAME per-epoch shuffle on
    a resumed run as the original run saw: the trainer passes the epoch
    explicitly, so neither the resume len() probe nor fully-skipped epochs
    can drift the order (a call-counting closure drifts on both)."""
    vocab = tiny_test("causal").vocab_size
    rng = np.random.default_rng(0)
    data = rng.integers(4, vocab, (3, 8, 16)).astype(np.int32)

    def make_factory(trained_log):
        def factory(epoch):
            # per-epoch deterministic permutation — resume must reproduce it
            order = np.random.default_rng(epoch).permutation(3)
            return [
                {
                    "input_ids": data[i],
                    "attention_mask": np.ones_like(data[i]),
                    "labels": data[i],
                    "_tag": np.full((8,), epoch * 10 + i, np.int32),
                }
                for i in order
            ]

        return factory

    class TagTrainer(Trainer):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.seen = []

        def _device_batch(self, batch):
            batch = dict(batch)
            self.seen.append(int(batch.pop("_tag")[0]))
            return super()._device_batch(batch)

    base = dict(
        model=tiny_test("causal"),
        lr=1e-3,
        epochs=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        save_every_steps=1,
        log_dir=str(tmp_path),
        mesh_axes={"data": 1},
    )
    straight = TagTrainer(TrainConfig(**base), total_steps=12)
    straight.fit(make_factory(None))
    assert int(straight.state["step"]) == 12

    base2 = dict(base, checkpoint_dir=str(tmp_path / "ckpt2"))
    t1 = TagTrainer(TrainConfig(**base2), total_steps=12)
    t1.fit(make_factory(None), max_steps=8)  # dies mid-epoch 2
    t2 = TagTrainer(TrainConfig(**base2, resume=True), total_steps=12)
    t2.fit(make_factory(None))
    assert t1.seen + t2.seen == straight.seen, (
        f"resumed batch order diverged: {t1.seen} + {t2.seen} "
        f"!= {straight.seen}"
    )


@pytest.mark.parametrize(
    "strategy,axes",
    [
        ("dp", {"data": 8}),
        ("zero2", {"data": 8}),
        ("fsdp", {"data": 8}),
        ("tp", {"model": 8}),
        ("fsdp_tp", {"data": 2, "model": 4}),
    ],
)
def test_sharded_train_step(tmp_path, strategy, axes):
    """One real train step under each distribution strategy on the fake
    8-device mesh (SURVEY §2.2 parity: DDP/ZeRO/FSDP/TP)."""
    cfg = TrainConfig(
        model=tiny_test("causal"),
        lr=1e-3,
        epochs=1,
        strategy=strategy,
        mesh_axes=axes,
        grad_accum=2,
        log_dir=str(tmp_path),
    )
    trainer = Trainer(cfg, total_steps=2)
    state = trainer.fit(_toy_batches(cfg.model.vocab_size, b=16, n=2))
    assert int(state["step"]) == 2
    # params remain finite under sharded update
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(state["params"])
    )


def test_zero2_shards_optimizer_state_only(tmp_path):
    """ZeRO-2 capability: params replicated, optimizer moments sharded."""
    cfg = TrainConfig(
        model=tiny_test("causal"),
        strategy="zero2",
        mesh_axes={"data": 8},
        log_dir=str(tmp_path),
    )
    trainer = Trainer(cfg, total_steps=2)
    for leaf in jax.tree.leaves(trainer.state["params"]):
        assert leaf.sharding.is_fully_replicated
    opt_leaves = [
        x for x in jax.tree.leaves(trainer.state["opt_state"])
        if hasattr(x, "sharding") and x.ndim >= 2 and x.shape[0] % 8 == 0
    ]
    assert opt_leaves, "no shardable optimizer leaves found"
    assert any(not x.sharding.is_fully_replicated for x in opt_leaves), (
        "zero2 must shard optimizer state across the data axis"
    )


def test_fsdp_shards_params(tmp_path):
    cfg = TrainConfig(
        model=tiny_test("causal"),
        strategy="fsdp",
        mesh_axes={"data": 8},
        log_dir=str(tmp_path),
    )
    trainer = Trainer(cfg, total_steps=2)
    big = [
        x for x in jax.tree.leaves(trainer.state["params"]) if x.ndim == 2
    ]
    assert any(not x.sharding.is_fully_replicated for x in big), (
        "fsdp must shard parameters"
    )


def test_profiler_trace_written(tmp_path):
    cfg = TrainConfig(
        model=tiny_test("causal"),
        epochs=1,
        mesh_axes={"data": 1},
        log_dir=str(tmp_path),
        profile_steps=2,
        profile_dir=str(tmp_path / "prof"),
    )
    trainer = Trainer(cfg, total_steps=3)
    trainer.fit(_toy_batches(cfg.model.vocab_size, n=3))
    import os

    found = []
    for root, _, files in os.walk(tmp_path / "prof"):
        found += files
    assert found, "no profiler trace files written"
