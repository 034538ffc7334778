"""HBM-resident sharded vector store — the index half of the retrieval
engine.

Replaces the reference's txtai embedding indexes + faiss
(`txtai.Embeddings(...).index(...)` / `.search(...)`, reference
inference_pipeline/db_utils/heavy_ranker.py:78-101).  TPU-first design:

- Vectors live on device as a ``(S, cap_per_shard, D)`` array sharded over
  the ``shard`` mesh axis (one slab per device).  bf16 by default; int8 with
  per-vector scales for 2x index compression (BASELINE config 3);
  ``int8_res`` stores primary+residual int8 codes (bf16-equal index
  memory) so the hot scan reads HALF the bytes of bf16 and a candidate
  re-rank restores ~15.7-bit precision (two-stage retrieval).
- Documents are assigned round-robin: global id ``g`` lives on shard
  ``g % S`` at slot ``g // S`` — shards stay balanced during streaming
  ingest, and writes of any batch are a single rectangular
  ``dynamic_update_slice`` per shard (no host round-trips).
- Queries run the fused matmul+top-k kernel per shard under ``shard_map``,
  then merge via an all-gather over ICI + a tiny (B, S*k) top-k
  (BASELINE config 4; SURVEY §2.2 corpus-sharding row).
- The store size is a dynamic scalar (SMEM-prefetched in the kernel), so
  streaming ingest never recompiles the query program.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import SHARD_AXIS, create_mesh
from ..ops.quant import quantize_int8_reference, quantize_int8_residual
from ..ops.topk import matmul_topk

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class VectorStore:
    """Fixed-capacity sharded inner-product index.

    capacity is rounded up so each shard slab is tile-aligned.  ``dtype``
    is "bf16" (default) or "int8" (per-vector symmetric scales, quantized
    at ingest on device).
    """

    def __init__(
        self,
        capacity: int,
        dim: int,
        *,
        mesh: Optional[Mesh] = None,
        dtype: str = "bf16",
        tile_n: int | None = None,
    ):
        if dtype not in ("bf16", "int8", "int8_global", "int8_res"):
            raise ValueError(
                "dtype must be bf16, int8, int8_global or int8_res, "
                f"got {dtype!r}"
            )
        if tile_n is None:
            # int8 scans are selection-bound: 4096-row tiles halve the
            # per-tile merge cost and measured ~12-20% faster than 2048
            # (docs/BENCHMARKS.md); bf16 is DMA-bound and indifferent
            tile_n = 4096 if dtype.startswith("int8") else 2048
        self.mesh = (
            mesh
            if mesh is not None
            else create_mesh({SHARD_AXIS: 1}, devices=jax.devices()[:1])
        )
        if SHARD_AXIS not in self.mesh.shape:
            raise ValueError(f"mesh must have a '{SHARD_AXIS}' axis")
        self.n_shards = self.mesh.shape[SHARD_AXIS]
        self.dim = dim
        self.dtype = dtype
        self.cap_per_shard = _round_up(
            max(_round_up(capacity, self.n_shards) // self.n_shards, tile_n),
            tile_n,
        )
        self.capacity = self.cap_per_shard * self.n_shards
        self.tile_n = min(tile_n, self.cap_per_shard)
        self.size = 0
        self._tail = np.zeros((0, dim), np.float32)  # < S pending re-write rows

        vec_dt = jnp.bfloat16 if dtype == "bf16" else jnp.int8
        # int8_global: one scalar scale for the whole index, calibrated on
        # the first add (abs-max * margin) — lets the kernel compare raw
        # int32 scores with all scaling deferred (ops/quant.py
        # quantize_int8_global).
        self.global_scale: float | None = None
        self._vec_sharding = NamedSharding(self.mesh, P(SHARD_AXIS, None, None))
        self._scale_sharding = NamedSharding(self.mesh, P(SHARD_AXIS, None))
        self.vectors = jax.device_put(
            jnp.zeros((self.n_shards, self.cap_per_shard, dim), vec_dt),
            self._vec_sharding,
        )
        self.scales = (
            jax.device_put(
                jnp.zeros((self.n_shards, self.cap_per_shard), jnp.float32),
                self._scale_sharding,
            )
            if dtype in ("int8", "int8_res")
            else None
        )
        # int8_res: residual codes+scales live in separate slabs so the
        # first-pass scan kernel streams ONLY the primary slab
        self.res_vectors = (
            jax.device_put(
                jnp.zeros((self.n_shards, self.cap_per_shard, dim), jnp.int8),
                self._vec_sharding,
            )
            if dtype == "int8_res"
            else None
        )
        self.res_scales = (
            jax.device_put(
                jnp.zeros((self.n_shards, self.cap_per_shard), jnp.float32),
                self._scale_sharding,
            )
            if dtype == "int8_res"
            else None
        )
        self._query_cache: dict = {}

    # ------------------------------------------------------------------ add

    def add(self, vectors) -> np.ndarray:
        """Append (E, D) float vectors.  Returns the assigned global ids.

        Arbitrary E: a partial trailing row (< S vectors) is kept on the
        host and transparently re-written by the next add, so the device
        index is always complete up to ``self.size``.
        """
        new = np.asarray(vectors, np.float32)
        if new.ndim != 2 or new.shape[1] != self.dim:
            raise ValueError(f"expected (E, {self.dim}) vectors, got {new.shape}")
        e = new.shape[0]
        if self.size + e > self.capacity:
            raise ValueError(
                f"store full: size={self.size} + {e} > capacity={self.capacity}"
            )
        ids = np.arange(self.size, self.size + e, dtype=np.int64)

        s = self.n_shards
        row_base = (self.size - len(self._tail)) // s
        combined = np.concatenate([self._tail, new], axis=0)
        n_total = combined.shape[0]
        rows = -(-n_total // s)
        # bucket the written row count to a power of two (capped at the
        # remaining capacity): _write_block/_write_scales compile per
        # distinct block SHAPE, and streaming ingest with naturally
        # varying batch sizes would otherwise pay a fresh (remote-tunnel)
        # compile per new size, serialized under the serving index lock.
        # Rows past the data are zeros written into not-yet-used capacity.
        cap_rows = self.cap_per_shard - row_base
        rows = min(1 << (rows - 1).bit_length(), cap_rows)
        padded = np.zeros((rows * s, self.dim), np.float32)
        padded[:n_total] = combined
        block = jnp.asarray(padded.reshape(rows, s, self.dim).transpose(1, 0, 2))

        if self.dtype == "int8":
            flat = block.reshape(s * rows, self.dim)
            qv, qs = quantize_int8_reference(flat)
            qblock = qv.reshape(s, rows, self.dim)
            sblock = qs.reshape(s, rows)
            self.vectors = _write_block(self.vectors, qblock, row_base)
            self.scales = _write_scales(self.scales, sblock, row_base)
        elif self.dtype == "int8_res":
            flat = block.reshape(s * rows, self.dim)
            q1, s1, q2, s2 = quantize_int8_residual(flat)
            self.vectors = _write_block(
                self.vectors, q1.reshape(s, rows, self.dim), row_base
            )
            self.scales = _write_scales(
                self.scales, s1.reshape(s, rows), row_base
            )
            self.res_vectors = _write_block(
                self.res_vectors, q2.reshape(s, rows, self.dim), row_base
            )
            self.res_scales = _write_scales(
                self.res_scales, s2.reshape(s, rows), row_base
            )
        elif self.dtype == "int8_global":
            if self.global_scale is None:
                absmax = float(np.abs(padded).max())
                self.global_scale = max(absmax, 1e-12) * 1.25 / 127.0
            q = jnp.clip(
                jnp.round(block / self.global_scale), -127, 127
            ).astype(jnp.int8)
            self.vectors = _write_block(self.vectors, q, row_base)
        else:
            self.vectors = _write_block(
                self.vectors, block.astype(jnp.bfloat16), row_base
            )

        self.size += e
        rem = n_total % s
        self._tail = combined[n_total - rem:] if rem else np.zeros((0, self.dim), np.float32)
        return ids

    # ---------------------------------------------------------------- query

    def topk(self, queries, k: int = 10, *, mode: str = "fast",
             rerank: int | None = None):
        """(B, D) queries → (scores (B, k), global ids (B, k)).

        Requires ``size >= k``.  Cross-shard score ties resolve by shard
        order (not strictly by global id) — set-level results match the
        brute-force oracle.  ``mode="turbo"`` selects the lighter kernel
        selection (recall ~0.999 — see ops/topk.py) for
        throughput-critical serving.

        ``rerank=K'`` enables two-stage retrieval: the scan kernel keeps
        ``K' >= k`` candidates per shard, which are re-scored EXACTLY
        against the stored representation (f32 gather + einsum over just
        ``B*K'`` rows) before the final top-k.  The re-score removes the
        fast/turbo bucket-selection losses AND the kernel's on-the-fly
        query-quantization error for any dtype; for ``int8_res`` it also
        applies the stored residual correction — the scan streams only
        the primary int8 slab (HALF the bytes of bf16) while the re-rank
        restores ~15.7-bit precision.  ``rerank=None`` defaults to ``4*k``
        on ``int8_res`` stores and off otherwise; ``rerank=0`` disables
        explicitly.  The auto-default is clamped to 128 (kernel lane
        limit); an explicit over-cap value raises.
        """
        if self.size < k:
            raise ValueError(f"store has {self.size} < k={k} vectors")
        explicit = rerank is not None
        if rerank == 0:  # explicit off: single-pass scan scores only
            rerank = None
        elif rerank is None and self.dtype == "int8_res":
            # int8_res is the recommended serving dtype: the residual
            # re-score lifts clustered near-tie recall 0.947 -> 1.000
            # (tests/test_recall_clustered.py) at int8 scan cost.  Plain
            # int8/int8_global do NOT auto-rerank — measured a wash there
            # (code rounding, which a re-score can't remove, dominates
            # the query-quantization error; docs/BENCHMARKS.md "Recall
            # by corpus type").
            rerank = 4 * k
        if rerank is not None:
            if rerank < k:
                raise ValueError(f"rerank={rerank} must be >= k={k}")
            # fast/turbo selection registers live in one vector lane;
            # exact mode has no lane cap so large-k re-ranks still work.
            # An EXPLICIT over-cap request raises (a silent clamp would
            # hand back fewer candidates than asked for); only the
            # int8_res auto-default 4*k is clamped quietly.
            if mode != "exact":
                if explicit and rerank > LANES:
                    raise ValueError(
                        f"rerank={rerank} exceeds the kernel lane cap "
                        f"{LANES}; use mode='exact' or rerank <= {LANES}"
                    )
                rerank = max(min(rerank, LANES), k)
                if rerank > LANES:  # k itself exceeds the lane cap
                    raise ValueError(
                        f"k={k} > {LANES} candidates requires mode='exact' "
                        "for the re-rank scan"
                    )
        b = queries.shape[0]
        key = (b, k, self.global_scale, mode, rerank)
        if key not in self._query_cache:
            self._query_cache[key] = self._build_query_fn(k, mode, rerank)
        q = jnp.asarray(queries, jnp.float32)
        if self.dtype == "int8_res":
            return self._query_cache[key](
                q, self.vectors, self.scales, self.res_vectors,
                self.res_scales, jnp.int32(self.size),
            )
        return self._query_cache[key](q, self.vectors, self.scales,
                                      jnp.int32(self.size))

    def _build_query_fn(self, k: int, mode: str = "fast",
                        rerank: int | None = None):
        s_axis = SHARD_AXIS
        n_shards = self.n_shards
        tile_n = self.tile_n
        dtype = self.dtype
        is_int8 = dtype in ("int8", "int8_res")

        g_scale = self.global_scale if dtype == "int8_global" else None
        kp = k if rerank is None else rerank
        # K' > k selection registers overflow the default 16M scoped-vmem
        # cap at 4096-row tiles on v5e (and the axon client rejects the
        # --xla_tpu_scoped_vmem_limit_kib override) — scan narrower tiles
        # when re-ranking
        q_tile = tile_n if rerank is None else min(tile_n, 2048)

        def local(q, vecs, scales, res_vecs, res_scales, size):
            shard = jax.lax.axis_index(s_axis)
            valid = (size - shard + n_shards - 1) // n_shards
            v = vecs[0]  # (cap, D) local slab
            if g_scale is not None:
                sc = jnp.float32(g_scale)
            elif is_int8:
                sc = scales[0]
            else:
                sc = None
            scores, slots = matmul_topk(
                q, v, kp, corpus_scales=sc, valid_n=valid, tile_n=q_tile,
                mode=mode,
            )
            if rerank is not None:
                # exact re-score of the K' candidates; all gathers are
                # SHARD-LOCAL (slots index the local slab), so the merge
                # collective below stays the only cross-shard traffic.
                # Exact-mode matmul_topk pads short shards with real
                # indices >= valid at score -inf; re-scoring those zero
                # rows would fabricate score 0.0, so mask on valid too.
                ok = (slots >= 0) & (slots < valid)
                safe = jnp.maximum(slots, 0)
                qf = q.astype(jnp.float32)
                rows = jnp.take(v, safe, axis=0).astype(jnp.float32)
                rs = jnp.einsum("bd,bkd->bk", qf, rows)
                if g_scale is not None:
                    rs = rs * jnp.float32(g_scale)
                elif is_int8:
                    rs = rs * jnp.take(scales[0], safe)
                if dtype == "int8_res":
                    rr = jnp.take(res_vecs[0], safe, axis=0)
                    rs = rs + jnp.einsum(
                        "bd,bkd->bk", qf, rr.astype(jnp.float32)
                    ) * jnp.take(res_scales[0], safe)
                rs = jnp.where(ok, rs, -jnp.inf)
                slots = jnp.where(ok, slots, -1)  # gid -1 downstream
                scores, pos = jax.lax.top_k(rs, k)
                slots = jnp.take_along_axis(slots, pos, axis=1)
            gids = slots * n_shards + shard
            gids = jnp.where(slots >= 0, gids, -1)
            all_s = jax.lax.all_gather(scores, s_axis)  # (S, B, k)
            all_g = jax.lax.all_gather(gids, s_axis)
            bsz = q.shape[0]
            all_s = jnp.transpose(all_s, (1, 0, 2)).reshape(bsz, n_shards * k)
            all_g = jnp.transpose(all_g, (1, 0, 2)).reshape(bsz, n_shards * k)
            vals, pos = jax.lax.top_k(all_s, k)
            ids = jnp.take_along_axis(all_g, pos, axis=1)
            return vals, ids

        if dtype == "int8_res":
            mapped = jax.shard_map(
                local,
                mesh=self.mesh,
                in_specs=(P(), P(s_axis, None, None), P(s_axis, None),
                          P(s_axis, None, None), P(s_axis, None), P()),
                out_specs=(P(), P()),
                check_vma=False,  # pallas_call outputs carry no vma info
            )
            return jax.jit(mapped)

        if is_int8:
            def fn8(q, vecs, scales, size):
                return local(q, vecs, scales, None, None, size)

            mapped = jax.shard_map(
                fn8,
                mesh=self.mesh,
                in_specs=(P(), P(s_axis, None, None), P(s_axis, None), P()),
                out_specs=(P(), P()),
                check_vma=False,  # pallas_call outputs carry no vma info
            )
            return jax.jit(mapped)

        def fn(q, vecs, size):
            return local(q, vecs, None, None, None, size)

        mapped = jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(P(), P(s_axis, None, None), P()),
            out_specs=(P(), P()),
            check_vma=False,  # pallas_call outputs carry no vma info
        )
        return jax.jit(lambda q, v, _s, n: mapped(q, v, n))

    def get_vectors(self, ids) -> np.ndarray:
        """Global ids -> (n, D) dequantized f32 vectors on the host.

        Small-gather path (hybrid fusion / debugging): round-robin id
        placement means id g lives at (shard g%S, slot g//S)."""
        ids = np.asarray(ids, np.int64)
        if ids.size and (ids.min() < 0 or ids.max() >= self.size):
            raise ValueError(f"ids out of range [0, {self.size})")
        shard = ids % self.n_shards
        slot = ids // self.n_shards
        vecs = np.asarray(self.vectors[shard, slot], np.float32)
        if self.dtype == "int8":
            vecs *= np.asarray(self.scales[shard, slot], np.float32)[:, None]
        elif self.dtype == "int8_res":
            vecs *= np.asarray(self.scales[shard, slot], np.float32)[:, None]
            vecs += (
                np.asarray(self.res_vectors[shard, slot], np.float32)
                * np.asarray(self.res_scales[shard, slot], np.float32)[:, None]
            )
        elif self.dtype == "int8_global":
            vecs *= self.global_scale
        return vecs

    # ------------------------------------------------------------ persist

    def save(self, path: str) -> None:
        """Host-side checkpoint: the index shards ARE the checkpoint
        (SURVEY §5.4 — embed-and-write output is restartable).

        Only rows holding data are written (``ceil(size / S)`` per
        shard), not the full capacity slab — a 40-doc index built with a
        1M-row capacity is a few KB on disk, not 512 MB.  Capacity is
        still recorded so a default ``load`` keeps the ingest headroom.
        """
        os.makedirs(path, exist_ok=True)
        used = -(-self.size // self.n_shards) if self.size else 0
        meta = {
            "capacity": self.capacity,
            "dim": self.dim,
            "dtype": self.dtype,
            "size": self.size,
            "n_shards": self.n_shards,
            "tile_n": self.tile_n,
            "global_scale": self.global_scale,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        np.save(os.path.join(path, "vectors.npy"),
                np.asarray(self.vectors[:, :used].astype(jnp.float32)))
        if self.scales is not None:
            np.save(os.path.join(path, "scales.npy"),
                    np.asarray(self.scales[:, :used]))
        if self.dtype == "int8_res":
            # residual codes stay int8 on disk (4x smaller than the old
            # f32 convention; load() casts to int8 either way so old f32
            # files still round-trip)
            np.save(os.path.join(path, "res_vectors.npy"),
                    np.asarray(self.res_vectors[:, :used]))
            np.save(os.path.join(path, "res_scales.npy"),
                    np.asarray(self.res_scales[:, :used]))
        np.save(os.path.join(path, "tail.npy"), self._tail)

    @classmethod
    def load(
        cls,
        path: str,
        *,
        mesh: Optional[Mesh] = None,
        capacity: Optional[int] = None,
    ) -> "VectorStore":
        """Restore a saved index.

        ``capacity=None`` keeps the build-time capacity (ingest-resume
        headroom).  Passing an int resizes to ``max(capacity, size)`` —
        ``capacity=0`` is shrink-to-fit, which serving uses so query cost
        scans the corpus, not the build-time headroom (the scan kernel's
        grid covers the whole slab; valid_n only masks).
        """
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        cap = meta["capacity"] if capacity is None else max(capacity, meta["size"])
        store = cls(
            cap, meta["dim"], mesh=mesh,
            dtype=meta["dtype"], tile_n=meta["tile_n"],
        )
        if meta["size"] == 0:
            # empty store: nothing to place (and int8_global has no
            # calibrated scale yet — `flat * None` would TypeError below)
            store.global_scale = meta.get("global_scale")
            store._tail = np.load(os.path.join(path, "tail.npy"))
            return store
        vecs = np.load(os.path.join(path, "vectors.npy"))
        # reshard onto the (possibly different) current mesh; slice to the
        # rows that hold data (old checkpoints saved the full slab)
        used = -(-meta["size"] // meta["n_shards"])
        flat = vecs.reshape(meta["n_shards"], -1, meta["dim"])[:, :used]
        if meta["n_shards"] != store.n_shards:
            # Round-robin ids are mesh-size dependent; re-add in id order.
            # vectors.npy holds *quantized codes* for the int8 dtypes, so
            # dequantize first — re-adding raw codes would re-quantize them
            # per-row and silently corrupt the scales.
            size = meta["size"]
            n_old = meta["n_shards"]
            if meta["dtype"] == "int8":
                scales = np.load(os.path.join(path, "scales.npy"))[:, :used]
                flat = flat * scales[:, :, None]
            elif meta["dtype"] == "int8_res":
                scales = np.load(os.path.join(path, "scales.npy"))[:, :used]
                rvecs = np.load(
                    os.path.join(path, "res_vectors.npy"))[:, :used]
                rscales = np.load(
                    os.path.join(path, "res_scales.npy"))[:, :used]
                flat = flat * scales[:, :, None] + rvecs * rscales[:, :, None]
            elif meta["dtype"] == "int8_global":
                # restoring the calibrated scale first makes the re-add
                # re-quantize the dequantized codes bit-identically
                store.global_scale = meta["global_scale"]
                flat = flat * meta["global_scale"]
            g = np.arange(size)
            store.add(flat[g % n_old, g // n_old])
            return store
        store.global_scale = meta.get("global_scale")
        vec_dt = jnp.bfloat16 if meta["dtype"] == "bf16" else jnp.int8
        pad = store.cap_per_shard - flat.shape[1]
        slab = np.pad(flat, ((0, 0), (0, pad), (0, 0)))
        store.vectors = jax.device_put(
            jnp.asarray(slab).astype(vec_dt), store._vec_sharding
        )
        if meta["dtype"] in ("int8", "int8_res"):
            sc = np.load(os.path.join(path, "scales.npy"))[:, :used]
            store.scales = jax.device_put(
                jnp.asarray(np.pad(sc, ((0, 0), (0, pad)), )),
                store._scale_sharding,
            )
        if meta["dtype"] == "int8_res":
            rv = np.load(os.path.join(path, "res_vectors.npy"))[:, :used]
            store.res_vectors = jax.device_put(
                jnp.asarray(np.pad(rv, ((0, 0), (0, pad), (0, 0)))).astype(
                    jnp.int8
                ),
                store._vec_sharding,
            )
            rs = np.load(os.path.join(path, "res_scales.npy"))[:, :used]
            store.res_scales = jax.device_put(
                jnp.asarray(np.pad(rs, ((0, 0), (0, pad)))),
                store._scale_sharding,
            )
        store.size = meta["size"]
        store._tail = np.load(os.path.join(path, "tail.npy"))
        return store


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_block(vectors, block, row_base):
    return jax.lax.dynamic_update_slice(
        vectors, block.astype(vectors.dtype), (0, row_base, 0)
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_scales(scales, sblock, row_base):
    return jax.lax.dynamic_update_slice(
        scales, sblock.astype(scales.dtype), (0, row_base)
    )
