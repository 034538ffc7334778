"""Round-4 verify drive: rerank/IVF serving-path fixes on the real chip.

Flows (per .claude/skills/verify): kernel-vs-oracle, retrieval e2e over
flat int8_res (auto rerank) and IVF via Retriever, error-path probes.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from vietnamese_qa_system_tpu.core.mesh import SHARD_AXIS, create_mesh
from vietnamese_qa_system_tpu.engine.store import VectorStore
from vietnamese_qa_system_tpu.engine.ivf import IVFIndex
from vietnamese_qa_system_tpu.ops.topk import matmul_topk, matmul_topk_reference

rng = np.random.default_rng(0)
fails = []


def check(name, ok):
    print(("PASS " if ok else "FAIL ") + name, flush=True)
    if not ok:
        fails.append(name)


# 1. kernel vs oracle on-device
q = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
c = jnp.asarray(rng.standard_normal((4096, 128)), jnp.float32)
s, i = matmul_topk(q, c, 10)
sr, ir = matmul_topk_reference(q, c, 10)
check("kernel-vs-oracle ids", bool((np.asarray(i) == np.asarray(ir)).all()))

# 2. retrieval e2e: int8_res store with auto rerank (exact + fast modes)
vecs = rng.standard_normal((2000, 128)).astype(np.float32)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
qv = vecs[:16] + 0.01 * rng.standard_normal((16, 128)).astype(np.float32)
oracle = np.argsort(-(qv @ vecs.T), axis=1)[:, :10]
store = VectorStore(2048, 128, dtype="int8_res", tile_n=256)
store.add(vecs)
for mode in ("fast", "exact"):
    _, ids = store.topk(qv, 10, mode=mode)
    ids = np.asarray(ids)
    rec = np.mean([len(set(ids[r]) & set(oracle[r])) / 10 for r in range(16)])
    check(f"int8_res rerank recall mode={mode} ({rec:.3f})", rec >= 0.99)
    check(f"ids in range mode={mode}", ids.min() >= 0 and ids.max() < 2000)

# small store, exact mode: padding-resurrection regression on-chip
sm = VectorStore(256, 128, dtype="int8_res", tile_n=128)
sm.add(np.abs(vecs[:24]))
qneg = -np.abs(qv[:4])
_, ids = sm.topk(qneg, 8, mode="exact")
ids = np.asarray(ids)
check("small-store exact rerank ids<24", ids.min() >= 0 and ids.max() < 24)

# 3. IVF path through topk with rerank kwarg (the round-3 crash)
ivf = IVFIndex.build(store, n_clusters=16, nprobe=16, kmeans_iters=2,
                     sample_n=512)
s2, i2 = ivf.topk(qv, 10, rerank=None)
i2 = np.asarray(i2)
rec = np.mean([len(set(i2[r]) & set(oracle[r])) / 10 for r in range(16)])
check(f"IVF topk rerank=None recall ({rec:.3f})", rec >= 0.95)

# 4. error-path probes (round 5: a SET rerank now runs the two-stage
# exact re-score instead of raising — engine/ivf.py::topk)
s_rr, i_rr = ivf.topk(qv, 10, rerank=40)
i_rr = np.asarray(i_rr)
rec_rr = np.mean([len(set(i_rr[r]) & set(oracle[r])) / 10 for r in range(16)])
check(f"IVF rerank=40 recall ({rec_rr:.3f})", rec_rr >= rec - 1e-9)
try:
    ivf.topk(qv, 10, rerank=5)
    check("IVF rerank<k raises", False)
except ValueError as e:
    check("IVF rerank<k raises", "rerank" in str(e))
try:
    store.topk(qv, 10, rerank=512)
    check("explicit rerank>128 raises", False)
except ValueError as e:
    check("explicit rerank>128 raises", "lane cap" in str(e))
store.topk(qv, 10, mode="exact", rerank=512)  # exact: no cap
check("exact rerank=512 works", True)

print("RESULT:", "OK" if not fails else f"FAILED {fails}", flush=True)
sys.exit(1 if fails else 0)
