"""Async (non-blocking) checkpoint saves: the on-device snapshot decouples
the write from the donated train-step buffers, so saving never stalls the
step loop and the written state is the state AT save time."""

import jax
import jax.numpy as jnp
import numpy as np

from vietnamese_qa_system_tpu.models import tiny_test
from vietnamese_qa_system_tpu.train import (
    CheckpointManager,
    TrainConfig,
    Trainer,
)

from tests.test_trainer import _toy_batches


def test_snapshot_isolated_from_mutation(tmp_path):
    """Mutating (rebinding) the live state right after save_async must not
    leak into the written checkpoint."""
    ckpt = CheckpointManager(str(tmp_path))
    state = {"w": jnp.arange(8.0), "step": jnp.int32(3)}
    ckpt.save_async(3, state, {"step": 3})
    # simulate the next donated step finishing immediately
    state = {"w": state["w"] * 100.0, "step": jnp.int32(4)}
    ckpt.wait()
    restored, meta = ckpt.restore(
        {"w": jnp.zeros(8), "step": jnp.int32(0)}, step=3
    )
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(8.0))
    assert meta["step"] == 3


def test_overlapping_saves_serialize(tmp_path):
    ckpt = CheckpointManager(str(tmp_path), keep=10)
    for s in range(1, 5):
        ckpt.save_async(s, {"w": jnp.full((4,), float(s))}, {"step": s})
    assert ckpt.latest_step() == 4  # waits for the in-flight save
    for s in range(1, 5):
        restored, _ = ckpt.restore({"w": jnp.zeros(4)}, step=s)
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.full(4, s))


def test_trainer_async_checkpoint_resume(tmp_path):
    cfg = TrainConfig(
        model=tiny_test("causal"),
        lr=1e-3,
        epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        async_checkpoint=True,
        save_every_steps=2,
        log_dir=str(tmp_path),
        mesh_axes={"data": 1},
    )
    trainer = Trainer(cfg, total_steps=6)
    trainer.fit(_toy_batches(cfg.model.vocab_size))
    assert trainer.ckpt.latest_step() == 6
    t2 = Trainer(
        TrainConfig(**{**cfg.__dict__, "resume": True}), total_steps=6
    )
    assert t2.start_step == 6
    for a, b in zip(
        jax.tree.leaves(trainer.state["params"]),
        jax.tree.leaves(t2.state["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_crashed_partial_save_is_skipped_on_resume(tmp_path):
    """meta.json is the commit marker: a step dir left by a crash mid-save
    (truncated/missing files, no meta.json) must not be selected as the
    resume point — the previous intact checkpoint is."""
    mgr = CheckpointManager(str(tmp_path), keep=3)
    state = {"w": jnp.arange(4.0)}
    mgr.save(10, state, {"step": 10})

    # simulate a crash while saving step 20: dir exists, state truncated,
    # no meta.json commit marker
    crash = tmp_path / "step_20"
    crash.mkdir()
    (crash / "state.npz").write_bytes(b"PK\x03\x04 truncated")

    assert mgr.latest_step() == 10
    restored, meta = mgr.restore({"w": jnp.zeros(4)})
    assert meta["step"] == 10
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0))

    # the next completed save sweeps the crashed partial
    mgr.save(30, state, {"step": 30})
    assert not crash.exists()
    assert mgr.latest_step() == 30


def test_recommit_after_crash_clears_stale_partial(tmp_path):
    """Re-saving the SAME step after a crash must not mix stale partial
    files with the fresh write."""
    mgr = CheckpointManager(str(tmp_path), keep=3)
    crash = tmp_path / "step_5"
    crash.mkdir()
    (crash / "stale.bin").write_bytes(b"junk")
    mgr.save(5, {"w": jnp.ones(2)}, {"step": 5})
    assert not (crash / "stale.bin").exists()
    restored, meta = mgr.restore({"w": jnp.zeros(2)})
    assert meta["step"] == 5
