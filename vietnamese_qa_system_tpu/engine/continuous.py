"""Continuous-batching scheduler over models/decode_engine.py.

The reference's serving loop admits a batch, decodes it to completion,
then admits the next batch (HF `generate` lockstep, reference
src/models/trainer.py:942-946; B=1 REPL in reference
src/models/model_utils/ds_inference.py:52-60).  With a live request
stream that leaves the chip idle twice over: short answers wait for the
longest row of their batch, and arrivals wait for the whole batch.

`ContinuousEngine` keeps ``n_slots`` sequences in flight at all times:

  submit() ──> pending queue ──admit──> prefill(bucketed) + insert(slot)
                                             │
                 host harvest <──fetch── decode_chunk (n_steps per
                 (eos / budget,           dispatch, ALL slots advance)
                  free the slot)

- Admission happens between chunks, so a new request starts decoding at
  most ``chunk_steps`` tokens after a slot frees — it never waits for
  other requests to finish.
- Prompt lengths are bucketed (powers of two by default) so prefill
  compiles a handful of programs total.
- The host syncs once per CHUNK, not per token: through the axon tunnel
  a dispatch costs ~1.3-1.8 ms, so per-token harvesting would dominate;
  the price is that eos is detected up to ``chunk_steps - 1`` tokens
  late (the device masks post-eos state updates, the host discards the
  fill, output is unaffected — only a little tail compute is wasted).
- Per-request streaming: ``submit(..., stream=cb)`` delivers tokens as
  each chunk is harvested.

This is a beyond-parity serving capability (the reference has nothing
like it); tests/test_continuous.py pins slot-isolation and equality with
``generate()`` greedy outputs under interleaved arrivals.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import numpy as np


@dataclass
class _Request:
    ids: list[int]
    max_new: int
    future: Future
    stream: Optional[Callable[[int], None]] = None
    out: list[int] = field(default_factory=list)
    remaining: int = 0  # tokens still expected from decode chunks
    slot: int = -1


class ContinuousEngine:
    """Slot-scheduled generation over a causal LM.

    ``params``/``cfg``: the model (any causal family, list or stacked
    blocks).  ``total`` cache columns per slot; prompts are left-padded
    to the smallest bucket that fits, decode headroom is what remains.
    Sampling knobs are engine-wide (one compiled program); greedy by
    default.
    """

    def __init__(
        self,
        params,
        cfg,
        *,
        n_slots: int = 8,
        total: Optional[int] = None,
        chunk_steps: int = 8,
        buckets: Optional[Sequence[int]] = None,
        eos_id: Optional[int] = None,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        default_max_new: int = 128,
    ):
        import jax

        from ..models import causal_lm
        from ..models import decode_engine as de

        if cfg.arch != "causal":
            raise ValueError(
                f"ContinuousEngine is causal-LM only, got arch={cfg.arch!r}"
            )
        self.params = params
        self.cfg = cfg
        self.total = int(total or min(cfg.max_seq_len, 1024))
        if self.total > cfg.max_seq_len:
            raise ValueError(
                f"total={self.total} exceeds cfg.max_seq_len={cfg.max_seq_len}"
            )
        if buckets is None:
            buckets, b = [], 32
            while b <= self.total // 2:
                buckets.append(b)
                b *= 2
            if not buckets:
                buckets = [max(self.total // 2, 1)]
        self.buckets = sorted(int(b) for b in buckets)
        if self.buckets[-1] >= self.total:
            raise ValueError(
                f"largest bucket {self.buckets[-1]} leaves no decode room "
                f"in total={self.total}"
            )
        self.n_slots = int(n_slots)
        self.chunk_steps = int(chunk_steps)
        self.eos_id = eos_id
        self.sampling = dict(temperature=temperature, top_k=top_k, top_p=top_p)
        self.default_max_new = int(default_max_new)
        self._de = de
        self._jax = jax
        self._base_key = jax.random.key(seed)
        self._chunk_counter = 0
        self._state = de.make_decode_state(
            cfg, self.n_slots, self.total,
            stacked=causal_lm.blocks_stacked(params),
        )
        self._by_slot: dict[int, _Request] = {}
        self._free = deque(range(self.n_slots))
        self._pending: deque[_Request] = deque()
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self.stats = {
            "requests": 0, "completed": 0, "tokens": 0,
            "chunks": 0, "occupancy_sum": 0, "prefills": 0,
        }
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---- public API ----------------------------------------------------

    def submit(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: Optional[int] = None,
        stream: Optional[Callable[[int], None]] = None,
    ) -> Future:
        """Queue a prompt; the Future resolves to
        ``{"ids": [generated...], "n_prompt": int}`` (generated ids only,
        first eos included when hit)."""
        ids = [int(t) for t in prompt_ids]
        if not ids:
            raise ValueError("empty prompt")
        if len(ids) > self.buckets[-1]:
            raise ValueError(
                f"prompt of {len(ids)} tokens exceeds the largest bucket "
                f"({self.buckets[-1]}); raise total/buckets or chunk the "
                "prompt"
            )
        max_new = int(
            self.default_max_new if max_new_tokens is None else max_new_tokens
        )
        if max_new < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new}")
        req = _Request(ids=ids, max_new=max_new, future=Future(),
                       stream=stream)
        with self._lock:
            if self._stop:
                raise RuntimeError("engine is closed")
            self._pending.append(req)
            self.stats["requests"] += 1
        self._wake.set()
        return req.future

    def close(self) -> None:
        with self._lock:
            self._stop = True
        self._wake.set()
        self._thread.join(timeout=30.0)
        with self._lock:
            failed = list(self._pending) + list(self._by_slot.values())
            self._pending.clear()
            self._by_slot.clear()
        for req in failed:
            if not req.future.done():
                req.future.set_exception(RuntimeError("engine closed"))

    # ---- scheduler loop --------------------------------------------------

    def _loop(self) -> None:
        while True:
            with self._lock:
                if self._stop:
                    return
                busy = bool(self._by_slot) or bool(self._pending)
            if not busy:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            try:
                self._admit()
                if self._by_slot:
                    self._decode_once()
            except Exception as exc:  # noqa: BLE001 — fail owners, keep serving
                with self._lock:
                    doomed = list(self._by_slot.values()) + list(self._pending)
                    self._by_slot.clear()
                    self._pending.clear()
                    self._free = deque(range(self.n_slots))
                for req in doomed:
                    if not req.future.done():
                        req.future.set_exception(exc)
                # a mid-update failure may have donated the old buffers
                # away — rebuild a clean all-free state before serving on
                from ..models import causal_lm

                self._state = self._de.make_decode_state(
                    self.cfg, self.n_slots, self.total,
                    stacked=causal_lm.blocks_stacked(self.params),
                )

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise AssertionError("submit() validated the length")

    def _admit(self) -> None:
        import jax.numpy as jnp

        while True:
            with self._lock:
                if not self._pending or not self._free:
                    return
                req = self._pending.popleft()
                slot = self._free.popleft()
            t = self._bucket(len(req.ids))
            ids = np.zeros((1, t), np.int32)
            mask = np.zeros((1, t), np.int32)
            ids[0, t - len(req.ids):] = req.ids
            mask[0, t - len(req.ids):] = 1
            key = self._jax.random.fold_in(
                self._base_key, 2 * self._chunk_counter + 1
            )
            self._chunk_counter += 1
            kv, first, n_prompt = self._de.prefill(
                self.params, self.cfg, jnp.asarray(ids), jnp.asarray(mask),
                key, **self.sampling,
            )
            self.stats["prefills"] += 1
            first_host = int(np.asarray(first)[0])
            req.out.append(first_host)
            self.stats["tokens"] += 1
            if req.stream is not None:
                req.stream(first_host)
            hit_eos = self.eos_id is not None and first_host == self.eos_id
            if hit_eos or req.max_new == 1:
                self._finish(req)
                with self._lock:
                    self._free.append(slot)
                continue
            # decode headroom: each emitted token consumes one cache column
            req.remaining = min(req.max_new - 1, self.total - t)
            req.slot = slot
            self._state = self._de.insert(
                self._state, kv, jnp.asarray(mask), first, n_prompt,
                jnp.int32(slot),
            )
            with self._lock:
                self._by_slot[slot] = req

    def _decode_once(self) -> None:
        key = self._jax.random.fold_in(
            self._base_key, 2 * self._chunk_counter
        )
        self._chunk_counter += 1
        self._state, toks = self._de.decode_chunk(
            self.params, self._state, key, self.cfg,
            n_steps=self.chunk_steps, eos_id=self.eos_id, **self.sampling,
        )
        toks_np = np.asarray(toks)  # (n_slots, chunk_steps) — tiny fetch
        self.stats["chunks"] += 1
        self.stats["occupancy_sum"] += len(self._by_slot)
        finished: list[int] = []
        for slot, req in list(self._by_slot.items()):
            for tok in toks_np[slot]:
                tok = int(tok)
                req.out.append(tok)
                req.remaining -= 1
                self.stats["tokens"] += 1
                if req.stream is not None:
                    req.stream(tok)
                if (self.eos_id is not None and tok == self.eos_id) or (
                    req.remaining <= 0
                ):
                    finished.append(slot)
                    break
        for slot in finished:
            req = self._by_slot.pop(slot)
            self._finish(req)
            self._state = self._de.release(self._state, self._jax.numpy.int32(slot))
            with self._lock:
                self._free.append(slot)

    def _finish(self, req: _Request) -> None:
        self.stats["completed"] += 1
        if not req.future.done():
            req.future.set_result(
                {"ids": list(req.out), "n_prompt": len(req.ids)}
            )

    # ---- conveniences ----------------------------------------------------

    def generate_ids(self, prompt_ids: Sequence[int],
                     max_new_tokens: Optional[int] = None,
                     timeout: float = 300.0) -> list[int]:
        """Blocking single-request helper (tests / simple callers)."""
        return self.submit(prompt_ids, max_new_tokens).result(
            timeout=timeout
        )["ids"]

    def snapshot_stats(self) -> dict:
        with self._lock:
            s = dict(self.stats)
            s["active_slots"] = len(self._by_slot)
            s["pending"] = len(self._pending)
        if s["chunks"]:
            s["avg_occupancy"] = round(s["occupancy_sum"] / s["chunks"], 2)
        return s
