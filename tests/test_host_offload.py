"""Host (CPU-memory) offload of optimizer state / params — capability of
the reference's ZeRO-3 CPU-offload accelerate config
(accelerate_ds_zero3_cpu_offload_config.yaml), TPU-native via the
pinned_host memory kind with streaming transfers inside the jitted step."""

import jax
import numpy as np
import pytest

from vietnamese_qa_system_tpu.models import LoraConfig, tiny_test
from vietnamese_qa_system_tpu.train import TrainConfig, Trainer

from tests.test_trainer import _toy_batches


def _memory_kinds(tree):
    """Memory kinds of the non-scalar leaves (scalars stay in device
    memory by design — offloading rank-0 saves nothing)."""
    return {
        getattr(x.sharding, "memory_kind", None)
        for x in jax.tree.leaves(tree)
        if getattr(x, "ndim", 0) >= 1
    }


def _run(tmp_path, **overrides):
    base = dict(
        model=tiny_test("causal"),
        lr=1e-3,
        epochs=2,
        log_dir=str(tmp_path),
        mesh_axes={"data": 2},
        strategy="fsdp",
    )
    base.update(overrides)
    trainer = Trainer(TrainConfig(**base), total_steps=12)
    trainer.fit(_toy_batches(base["model"].vocab_size))
    return trainer


def test_optimizer_offload_matches_device_run(tmp_path):
    """Offloaded optimizer state lives in pinned_host memory, and the
    training math is bit-equivalent to the on-device run (streaming
    through HBM is placement, not arithmetic)."""
    t_dev = _run(tmp_path / "a")
    t_off = _run(tmp_path / "b", host_offload="optimizer")
    assert _memory_kinds(t_off.state["opt_state"]) == {"pinned_host"}
    assert "pinned_host" not in _memory_kinds(t_off.state["params"])
    for a, b in zip(
        jax.tree.leaves(t_dev.state["params"]),
        jax.tree.leaves(t_off.state["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_full_offload_lora(tmp_path):
    """host_offload=all with a LoRA run: the frozen base and optimizer
    state persist in host memory; the adapter still trains."""
    t = _run(
        tmp_path, host_offload="all", lora=LoraConfig(r=4), lr=5e-3
    )
    assert _memory_kinds(t.state["params"]) == {"pinned_host"}
    assert _memory_kinds(t.state["opt_state"]) <= {"pinned_host", None}
    moved = any(
        np.abs(np.asarray(x)).max() > 0
        for x in jax.tree.leaves(t.state["adapter"])
    )
    assert moved
    # export path brings the base back to device memory and merges
    merged = t.merged_params()
    for leaf in jax.tree.leaves(merged):
        assert np.isfinite(np.asarray(leaf)).all()


def test_params_offload_full_finetune(tmp_path):
    """Full finetune with params offload: updated params land back in
    host memory each step and training still reduces the loss."""
    from vietnamese_qa_system_tpu.train import perplexity_eval

    model = tiny_test("causal")
    t = _run(tmp_path, host_offload="params", lr=1e-2, epochs=6)
    assert _memory_kinds(t.state["params"]) == {"pinned_host"}
    m = perplexity_eval(
        t.merged_params(), model, _toy_batches(model.vocab_size)()
    )
    t0 = Trainer(
        TrainConfig(
            model=model, log_dir=str(tmp_path), mesh_axes={"data": 2},
            strategy="fsdp",
        ),
        total_steps=1,
    )
    m0 = perplexity_eval(
        t0.state["params"], model, _toy_batches(model.vocab_size)()
    )
    assert m["eval_loss"] < m0["eval_loss"] - 0.3


def test_invalid_offload_value(tmp_path):
    with pytest.raises(ValueError, match="host_offload"):
        Trainer(
            TrainConfig(
                model=tiny_test("causal"), host_offload="gpu",
                log_dir=str(tmp_path), mesh_axes={"data": 1},
            ),
            total_steps=1,
        )
