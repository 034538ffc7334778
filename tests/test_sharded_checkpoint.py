"""Multi-host sharded checkpoint IO (SURVEY §5.4 TPU-equivalent row):
per-host shard files with orbax-style index metadata, reassembled and
re-sharded onto the current mesh on load.  Host topologies are simulated
by partitioning the 8 virtual devices (host_of = device.id // devices_per_host).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vietnamese_qa_system_tpu.core.mesh import create_mesh
from vietnamese_qa_system_tpu.models import LoraConfig, tiny_test
from vietnamese_qa_system_tpu.train import (
    CheckpointManager,
    TrainConfig,
    Trainer,
    load_pytree_sharded,
    save_pytree_sharded,
)


def _state(mesh):
    """A mixed pytree: fsdp-sharded 2-D leaf, model-sharded leaf,
    replicated leaf, bf16 leaf, and a scalar."""
    rng = np.random.default_rng(0)
    return {
        "w_fsdp": jax.device_put(
            jnp.asarray(rng.standard_normal((16, 8)), jnp.float32),
            NamedSharding(mesh, P("data", None)),
        ),
        "w_tp": jax.device_put(
            jnp.asarray(rng.standard_normal((8, 8)), jnp.bfloat16),
            NamedSharding(mesh, P(None, "model")),
        ),
        "rep": jax.device_put(
            jnp.asarray(rng.standard_normal((5,)), jnp.float32),
            NamedSharding(mesh, P()),
        ),
        "step": jax.device_put(jnp.int32(7), NamedSharding(mesh, P())),
    }


@pytest.mark.parametrize("n_hosts", [2, 4])
def test_roundtrip_across_host_topologies(tmp_path, n_hosts):
    mesh = create_mesh({"data": 2, "model": 4})
    state = _state(mesh)
    per_host = 8 // n_hosts
    host_of = lambda d: d.id // per_host
    for h in range(n_hosts):
        save_pytree_sharded(str(tmp_path), state, host_id=h, host_of=host_of)
    files = sorted(os.listdir(tmp_path))
    assert f"host_{n_hosts - 1}.npz" in files and "host_0.layout.json" in files

    # load back onto a DIFFERENT mesh topology and different sharding
    mesh2 = create_mesh({"data": 8})
    target = jax.tree.map(
        lambda x: jax.device_put(jnp.zeros_like(x), NamedSharding(mesh2, P())),
        state,
    )
    restored = load_pytree_sharded(str(tmp_path), target)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )
        # dtype follows the target (bf16 leaf restored as zeros_like -> bf16)
    assert restored["w_tp"].dtype == jnp.bfloat16


def test_replicated_leaves_written_once(tmp_path):
    mesh = create_mesh({"data": 8})
    state = _state(create_mesh({"data": 2, "model": 4}))
    host_of = lambda d: d.id // 4
    for h in range(2):
        save_pytree_sharded(str(tmp_path), state, host_id=h, host_of=host_of)
    import json

    total = {}
    for h in range(2):
        with open(tmp_path / f"host_{h}.layout.json") as f:
            for e in json.load(f)["entries"]:
                total.setdefault(e["leaf"], []).append(tuple(map(tuple, e["index"])))
    # replicated (5,) leaf: exactly one shard entry across all hosts
    leaves = jax.tree.leaves(state)
    rep_i = [i for i, x in enumerate(leaves) if x.shape == (5,)][0]
    assert len(total[rep_i]) == 1
    # fsdp (16, 8) leaf: every row range covered exactly once
    fsdp_i = [i for i, x in enumerate(leaves) if x.shape == (16, 8)][0]
    starts = sorted(idx[0][0] for idx in total[fsdp_i])
    assert starts == [0, 8]


def test_missing_host_file_fails_loudly(tmp_path):
    state = _state(create_mesh({"data": 2, "model": 4}))
    host_of = lambda d: d.id // 4
    save_pytree_sharded(str(tmp_path), state, host_id=0, host_of=host_of)
    target = jax.tree.map(lambda x: x, state)
    with pytest.raises(ValueError, match="incomplete"):
        load_pytree_sharded(str(tmp_path), target)


def test_trainer_sharded_checkpoint_resume(tmp_path):
    """End-to-end: sharded save during fit, auto-detected restore, and a
    monolithic-format run can also be resumed sharded (format detection)."""
    cfg = TrainConfig(
        model=tiny_test("causal"),
        lora=LoraConfig(r=4),
        strategy="fsdp",
        mesh_axes={"data": 8},
        epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        sharded_checkpoint=True,
        save_every_steps=2,
        log_dir=str(tmp_path),
    )
    trainer = Trainer(cfg, total_steps=4)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.model.vocab_size, (4, 8, 16)).astype(np.int32)

    def batches():
        for b in ids:
            yield {
                "input_ids": b,
                "attention_mask": np.ones_like(b),
                "labels": b,
            }

    trainer.fit(batches)
    step_dir = os.path.join(cfg.checkpoint_dir, "step_4")
    assert os.path.exists(os.path.join(step_dir, "host_0.npz"))
    assert not os.path.exists(os.path.join(step_dir, "state.npz"))

    cfg2 = TrainConfig(**{**cfg.__dict__, "resume": True})
    t2 = Trainer(cfg2, total_steps=4)
    assert t2.start_step == 4
    for a, b in zip(
        jax.tree.leaves(trainer.state["adapter"]),
        jax.tree.leaves(t2.state["adapter"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
