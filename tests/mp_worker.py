"""Worker for tests/test_multiprocess.py — runs as one of TWO real JAX
processes (jax.distributed.initialize over the CPU backend, 4 local
devices each) and exercises every `jax.process_count() > 1` branch that
is dead code under the single-process virtual mesh:

- perplexity_eval's process_allgather totals (train/evaluate.py:74-82)
- generative_eval's cross-host record gather (train/evaluate.py:149-162)
- CheckpointManager sharded save: per-host shard files + the
  sync_global_devices commit barrier + rank-0 meta marker
  (train/checkpoint.py:268-288), and a sharded restore round-trip

Reference capability: accelerate multi-rank gathers
(/root/reference/src/models/trainer.py:947-948,1028-1029,1067).

Usage: python mp_worker.py <pid> <port> <outdir>
NOT a test file (pytest collects test_*.py only).
"""

import json
import os
import sys


def main() -> None:
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    # axon sitecustomize forces JAX_PLATFORMS=axon; override in-process
    # (CLAUDE.md) BEFORE any backend/distributed init
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from vietnamese_qa_system_tpu.data.tokenizer import ByteTokenizer
    from vietnamese_qa_system_tpu.models import tiny_test
    from vietnamese_qa_system_tpu.train import (
        generative_eval,
        perplexity_eval,
    )
    from vietnamese_qa_system_tpu.train.checkpoint import CheckpointManager
    from vietnamese_qa_system_tpu.train.trainer import init_model_params

    cfg = tiny_test("causal")
    params = init_model_params(cfg, jax.random.key(0))

    # ---- perplexity: each host evals its half of 4 deterministic
    # batches; the allgather must produce the full-set totals on BOTH
    rng = np.random.default_rng(1)
    batches = []
    for _ in range(4):
        ids = rng.integers(4, 260, (4, 16)).astype(np.int32)
        batches.append({"input_ids": ids, "attention_mask": np.ones_like(ids),
                        "labels": ids})
    ppl = perplexity_eval(params, cfg, batches[pid::2])

    # ---- generative eval: one batch per host; flush all-gathers every
    # host's token blocks so each ends with the FULL prediction set
    tok = ByteTokenizer()
    rngg = np.random.default_rng(2)
    gbatches = []
    for _ in range(2):
        ids = rngg.integers(4, 260, (2, 8)).astype(np.int32)
        gbatches.append({"input_ids": ids,
                         "attention_mask": np.ones_like(ids)})
    gen = generative_eval(params, cfg, tok, [gbatches[pid]],
                          max_new_tokens=4)

    # ---- sharded checkpoint over the global 8-device mesh: each host
    # writes only its addressable shards; restore reassembles
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    full = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    w = jax.make_array_from_process_local_data(sh, full[pid * 4:(pid + 1) * 4])
    state = {"w": w, "bias": jnp.arange(3, dtype=jnp.bfloat16)}
    ckdir = os.path.join(outdir, "ck")
    mgr = CheckpointManager(ckdir, sharded=True)
    mgr.save(7, state, {"tag": "mp"})
    assert mgr.latest_step() == 7
    restored, meta = mgr.restore(state)
    assert meta["tag"] == "mp"
    ck_ok = True
    for shd in restored["w"].addressable_shards:
        ck_ok &= bool(
            (np.asarray(shd.data) == full[shd.index]).all()
        )
    ck_ok &= bool(
        (np.asarray(restored["bias"]).astype(np.float32)
         == np.arange(3, dtype=np.float32)).all()
    )
    # both hosts' shard files exist (each host wrote its own)
    step_dir = os.path.join(ckdir, "step_7")
    ck_ok &= os.path.exists(os.path.join(step_dir, "host_0.npz"))
    ck_ok &= os.path.exists(os.path.join(step_dir, "host_1.npz"))

    out = {
        "rank": pid,
        "process_count": jax.process_count(),
        "ppl": {"eval_loss": ppl["eval_loss"],
                "perplexity": ppl["perplexity"],
                "eval_tokens": ppl["eval_tokens"]},
        "gen_n": gen["n_examples"],
        "gen_records": [r["prediction"] for r in gen["records"]],
        "ckpt_ok": ck_ok,
    }
    with open(os.path.join(outdir, f"out_{pid}.json"), "w") as f:
        json.dump(out, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
