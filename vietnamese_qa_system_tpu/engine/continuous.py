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
  most ~2 chunks after a slot frees — it never waits for other requests
  to finish.
- Prompt lengths are bucketed (powers of two by default) so prefill
  compiles a handful of programs total.
- The host syncs once per CHUNK, not per token, and the fetch is
  PIPELINED one chunk deep: chunk k+1 is dispatched before chunk k's
  tokens are fetched, so the host round-trip (~25 ms measured through
  the axon tunnel — far above the ~2 ms dispatch) overlaps device
  compute instead of serializing with it (measured 45.8 → 30.2 ms/chunk
  at gpt-125m, B=8, chunk 8).  Prefill first-token fetches are deferred
  to the same harvest point, so admission never syncs either.  The
  price: eos is detected up to ``2*chunk_steps - 1`` tokens late (the
  device masks post-eos state, the host discards the fill — output is
  unaffected, only tail compute is wasted), and a freed slot is reused
  one chunk later.
- A finished slot is NOT released on device: decode is static-shape over
  all slots, so a stale active row costs nothing, its emissions are
  ignored by the host, and the next insert fully resets the row
  (release() exists for explicit cleanup only).
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
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    adapter_ix: int = 0  # LoRA bank index (0 = base model)
    # device scalar from prefill, fetched lazily at the next harvest
    pending_first: object = None
    # first chunk index whose emissions belong to this request — earlier
    # chunks' rows hold the slot's previous occupant
    start_chunk: int = -1


def _validate_sampling(temperature, top_k, top_p) -> None:
    from ..models.decode_engine import TOPK_CAP

    if not (isinstance(temperature, (int, float))
            and not isinstance(temperature, bool) and 0.0 <= temperature):
        raise ValueError(f"temperature must be a float >= 0, got "
                         f"{temperature!r}")
    if not (isinstance(top_k, int) and not isinstance(top_k, bool)
            and 0 <= top_k <= TOPK_CAP):
        raise ValueError(f"top_k must be an int in [0, {TOPK_CAP}], got "
                         f"{top_k!r}")
    if not (isinstance(top_p, (int, float)) and not isinstance(top_p, bool)
            and 0.0 < top_p <= 1.0):
        raise ValueError(f"top_p must be a float in (0, 1], got {top_p!r}")


class _PrefixCache:
    """Host-managed LRU of device-resident prompt-KV prefixes.

    Keyed by (token tuple, adapter index) — LoRA changes K/V, so
    adapters never share entries.  ``lookup`` returns the LONGEST stored
    entry that is a strict prefix of the new prompt (strict: at least
    one suffix token must run so prefill_extend has logits to sample
    from).  Entries are whole prefill outputs normalized to the bucket
    grid; eviction is LRU by total KV bytes.
    """

    def __init__(self, max_bytes: int):
        self.max_bytes = int(max_bytes)
        self.bytes = 0
        self.tick = 0
        # key -> {"kv": pytree, "p": int, "width": int, "bytes": int,
        #          "tick": int}
        self._entries: dict[tuple, dict] = {}

    @staticmethod
    def _nbytes(kv) -> int:
        import jax

        return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(kv))

    def lookup(self, ids: Sequence[int], adapter_ix: int):
        """Longest usable prefix for ``ids``: a stored entry whose first
        ``p_eff = min(len(entry), len(ids) - 1)`` tokens match (capped at
        len-1 so at least one suffix token runs — this also lets an
        EQUAL stored prompt serve a repeat request).  Returns
        ``(entry, p_eff)`` or None."""
        best, best_p = None, 0
        for (toks, aix), ent in self._entries.items():
            if aix != adapter_ix:
                continue
            p_eff = min(len(toks), len(ids) - 1)
            if p_eff <= best_p:
                continue
            if tuple(ids[:p_eff]) == toks[:p_eff]:
                best, best_p = ent, p_eff
        if best is not None:
            self.tick += 1
            best["tick"] = self.tick
            return best, best_p
        return None

    def store(self, ids: Sequence[int], adapter_ix: int, kv,
              width: int) -> None:
        key = (tuple(ids), adapter_ix)
        if key in self._entries or self.max_bytes <= 0:
            return
        nb = self._nbytes(kv)
        if nb > self.max_bytes:
            return
        while self.bytes + nb > self.max_bytes and self._entries:
            victim = min(self._entries, key=lambda k: self._entries[k]["tick"])
            self.bytes -= self._entries.pop(victim)["bytes"]
        self.tick += 1
        self._entries[key] = {
            "kv": kv, "p": len(ids), "width": width, "bytes": nb,
            "tick": self.tick,
        }
        self.bytes += nb

    def __len__(self) -> int:
        return len(self._entries)


class ContinuousEngine:
    """Slot-scheduled generation over a causal LM.

    ``params``/``cfg``: the model (any causal family, list or stacked
    blocks).  ``total`` cache columns per slot; prompts are RIGHT-padded
    to the smallest bucket that fits (slot == position; pad columns past
    the true length are reclaimed by decode), so headroom is
    ``total - len(prompt)``.
    Sampling knobs are engine DEFAULTS, overridable per request in
    ``submit`` (per-slot runtime arrays — one compiled program serves
    mixed greedy/sampled traffic); greedy by default.
    """

    def __init__(
        self,
        params,
        cfg,
        *,
        n_slots: int = 8,
        total: Optional[int] = None,
        chunk_steps: int = 16,
        buckets: Optional[Sequence[int]] = None,
        eos_id: Optional[int] = None,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        default_max_new: int = 128,
        adapters=None,
        lora_config=None,
        prefix_cache_mb: float = 0.0,
        min_cached_prompt: int = 16,
        speculative: str = "ngram",
        draft_tokens: int = 8,
        draft_ngram: int = 3,
        spec_steps: int = 4,
        kv_dtype: str = "bf16",
        prefill_chunk: int = 0,
        bos_id: int = 0,
    ):
        import jax

        from ..models import causal_lm
        from ..models import decode_engine as de

        if cfg.arch not in ("causal", "seq2seq"):
            raise ValueError(
                f"ContinuousEngine serves causal or seq2seq LMs, got "
                f"arch={cfg.arch!r}"
            )
        self._s2s = cfg.arch == "seq2seq"
        self.bos_id = int(bos_id)
        if self._s2s:
            # encoder-decoder slots carry their own cross-KV + enc mask;
            # the causal-only extras are structurally inapplicable:
            # prompt KV never enters the decoder cache (no prefix reuse /
            # piece-wise prefill of it) and drafting reads the causal
            # token stream
            unsupported = []
            if adapters:
                unsupported.append("adapters (multi-LoRA)")
            if prefix_cache_mb > 0:
                unsupported.append("prefix_cache_mb")
            if prefill_chunk:
                unsupported.append("prefill_chunk")
            if kv_dtype != "bf16":
                unsupported.append("kv_dtype")
            if unsupported:
                raise ValueError(
                    "seq2seq continuous serving does not support: "
                    + ", ".join(unsupported)
                )
            speculative = "off"
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
        if not self._s2s and self.buckets[-1] >= self.total:
            # seq2seq exempt: buckets size the ENCODER side, total the
            # decoder cache — the two widths are independent there
            raise ValueError(
                f"largest bucket {self.buckets[-1]} leaves no decode room "
                f"in total={self.total}"
            )
        self.n_slots = int(n_slots)
        self.chunk_steps = int(chunk_steps)
        self.eos_id = eos_id
        # engine-level DEFAULTS; submit() overrides per request (dynamic
        # arrays in the compiled program — no recompiles, see
        # models/decode_engine.py::_sample_dynamic)
        self.sampling = dict(temperature=temperature, top_k=top_k, top_p=top_p)
        _validate_sampling(temperature, top_k, top_p)
        self.default_max_new = int(default_max_new)
        # multi-LoRA serving: `adapters` is {name: adapter pytree} from
        # LoRA fine-tunes of THIS base; requests pick one by name (or none
        # for the raw base) and every compiled program serves all of them
        # via per-slot bank indices (models/lora.py::stack_adapters)
        self._bank = None
        self._adapter_idx: dict[str, int] = {}
        if adapters:
            from ..models.lora import LoraConfig, stack_adapters

            names = list(adapters)
            self._bank = stack_adapters(
                [adapters[n] for n in names], lora_config or LoraConfig()
            )
            # bank slot 0 is the zero adapter (= base)
            self._adapter_idx = {n: i + 1 for i, n in enumerate(names)}
        # speculative decoding inside the slot engine: chunks draft
        # draft_tokens per slot by prompt-lookup and verify in one pass
        # (decode_chunk_spec) — greedy-only, so the scheduler falls back
        # to plain chunks while any sampled request holds a slot
        if speculative not in ("off", "none", "ngram"):
            raise ValueError(
                f"speculative must be off|ngram, got {speculative!r}"
            )
        self.speculative = speculative == "ngram"
        self.draft_tokens = int(draft_tokens)
        self.draft_ngram = int(draft_ngram)
        self.spec_steps = int(spec_steps)
        # prefix caching: keep prompt KV on device and prefill only the
        # suffix of later prompts that share a prefix (RAG system
        # prompts / retrieved contexts) — see models/decode_engine.py::
        # prefill_extend and _PrefixCache above
        self._pcache = (
            _PrefixCache(int(prefix_cache_mb * (1 << 20)))
            if prefix_cache_mb > 0 else None
        )
        self.min_cached_prompt = int(min_cached_prompt)
        # int8 KV cache (layers.kv_quantize): half the dominant decode
        # HBM stream and ~2x resident slots per chip; streams are pinned
        # token-identical to generate(kv_dtype="int8"), NOT to bf16 (the
        # quantization perturbs logits)
        if kv_dtype not in ("bf16", "int8"):
            raise ValueError(f"kv_dtype must be bf16|int8, got {kv_dtype!r}")
        self.kv_dtype = kv_dtype
        # chunked prefill: a long prompt admits in <= prefill_chunk-token
        # pieces (prefill_extend at its own cursor — the prefix-cache
        # machinery), ONE piece per scheduler turn, so live slots keep
        # decoding between pieces instead of stalling for the whole
        # prompt's forward.  0 = off (whole-prompt prefill at admission).
        self.prefill_chunk = int(prefill_chunk)
        if self.prefill_chunk and self._bucket(
            min(self.prefill_chunk, self.buckets[-1])
        ) != self.prefill_chunk:
            raise ValueError(
                f"prefill_chunk must be one of the prompt buckets "
                f"{self.buckets}, got {prefill_chunk}"
            )
        self._mid = None  # in-flight chunked prefill (one at a time)
        self._de = de
        self._jax = jax
        self._base_key = jax.random.key(seed)
        self._chunk_counter = 0  # RNG stream position (prefills + chunks)
        self._chunk_idx = 0  # ordinal of the next decode chunk
        self._state = self._fresh_state()
        self._by_slot: dict[int, _Request] = {}
        self._free = deque(range(self.n_slots))
        self._pending: deque[_Request] = deque()
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self.stats = {
            "requests": 0, "completed": 0, "tokens": 0,
            "chunks": 0, "occupancy_sum": 0, "prefills": 0,
            "prefix_hits": 0, "prefix_tokens_reused": 0,
            "spec_chunks": 0, "drafted_accepted": 0,
            "prefill_pieces": 0,
        }
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---- public API ----------------------------------------------------

    def submit(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: Optional[int] = None,
        stream: Optional[Callable[[int], None]] = None,
        *,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        adapter: Optional[str] = None,
    ) -> Future:
        """Queue a prompt; the Future resolves to
        ``{"ids": [generated...], "n_prompt": int}`` (generated ids only,
        first eos included when hit).

        ``temperature``/``top_k``/``top_p`` override the engine defaults
        for THIS request only (per-slot runtime arrays — mixed greedy and
        sampled requests share every compiled program).  Sampled requests
        draw from the engine's single RNG stream, so their outputs depend
        on scheduling; greedy requests (temperature 0) are deterministic.
        """
        s = self.sampling
        temperature = s["temperature"] if temperature is None else temperature
        top_k = s["top_k"] if top_k is None else top_k
        top_p = s["top_p"] if top_p is None else top_p
        _validate_sampling(temperature, top_k, top_p)
        adapter_ix = 0
        if adapter is not None:
            if adapter not in self._adapter_idx:
                raise ValueError(
                    f"unknown adapter {adapter!r}; available: "
                    f"{sorted(self._adapter_idx) or '(none configured)'}"
                )
            adapter_ix = self._adapter_idx[adapter]
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
                       stream=stream, temperature=float(temperature),
                       top_k=int(top_k), top_p=float(top_p),
                       adapter_ix=adapter_ix)
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
            if self._mid is not None:
                failed.append(self._mid["req"])
                self._mid = None
            self._pending.clear()
            self._by_slot.clear()
        for req in failed:
            if not req.future.done():
                req.future.set_exception(RuntimeError("engine closed"))

    # ---- scheduler loop --------------------------------------------------

    def _loop(self) -> None:
        # one-chunk-deep pipeline: `prev` is the not-yet-fetched output of
        # the last dispatched chunk; fetching it AFTER dispatching the
        # next chunk hides the host round-trip behind device compute
        prev: Optional[tuple[int, object]] = None
        while True:
            with self._lock:
                if self._stop:
                    return
                busy = (bool(self._by_slot) or bool(self._pending)
                        or self._mid is not None)
            try:
                if not busy:
                    if prev is not None:
                        self._harvest(*prev)
                        prev = None
                        continue  # the harvest may have freed work to do
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
                    continue
                self._admit()
                cur = None
                if self._by_slot:
                    cur = (self._chunk_idx, self._dispatch_chunk())
                if prev is not None:
                    self._harvest(*prev)
                prev = cur
            except Exception as exc:  # noqa: BLE001 — fail owners, keep serving
                prev = None
                with self._lock:
                    doomed = list(self._by_slot.values()) + list(self._pending)
                    if self._mid is not None:
                        doomed.append(self._mid["req"])
                        self._mid = None
                    self._by_slot.clear()
                    self._pending.clear()
                    self._free = deque(range(self.n_slots))
                for req in doomed:
                    if not req.future.done():
                        req.future.set_exception(exc)
                # a mid-update failure may have donated the old buffers
                # away — rebuild a clean all-free state before serving on
                self._state = self._fresh_state()

    def _fresh_state(self):
        if self._s2s:
            return self._de.make_decode_state_seq2seq(
                self.cfg, self.n_slots, self.total, self.buckets[-1],
                stacked=self._de._s2s_stacked(self.cfg, self.params),
            )
        from ..models import causal_lm

        return self._de.make_decode_state(
            self.cfg, self.n_slots, self.total,
            stacked=causal_lm.blocks_stacked(self.params),
            kv_dtype=self.kv_dtype,
        )

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise AssertionError("submit() validated the length")

    def _admit(self) -> None:
        import jax.numpy as jnp

        while True:
            if self.prefill_chunk and self._mid is not None:
                # advance the in-flight chunked prefill ONE piece, then
                # yield so a decode chunk runs for the live slots
                self._advance_prefill()
                return
            with self._lock:
                if not self._pending or not self._free:
                    return
                req = self._pending.popleft()
                slot = self._free.popleft()
            key = self._jax.random.fold_in(
                self._base_key, 2 * self._chunk_counter + 1
            )
            self._chunk_counter += 1
            samp = (
                jnp.asarray([req.temperature], jnp.float32),
                jnp.asarray([req.top_k], jnp.int32),
                jnp.asarray([req.top_p], jnp.float32),
            )
            aix = (
                jnp.asarray([req.adapter_ix], jnp.int32)
                if self._bank is not None else None
            )
            if self._s2s:
                self._admit_s2s(req, slot, key, samp)
                continue
            if self.prefill_chunk and len(req.ids) > self.prefill_chunk:
                self._mid = {
                    "req": req, "slot": slot, "key": key, "samp": samp,
                    "aix": aix, "kv": None, "done": 0,
                }
                continue  # first piece runs via the branch above
            kv, first, n_prompt, ids, mask = self._run_prefill(
                req, key, samp, aix
            )
            self._install(req, slot, kv, first, n_prompt, ids, mask, samp,
                          aix)

    def _admit_s2s(self, req, slot, key, samp) -> None:
        """Seq2seq admission: encode the prompt at its bucket, pad the
        cross-KV to the state's shared enc width, insert with the BOS
        decoder column."""
        import jax.numpy as jnp

        n = len(req.ids)
        t = self._bucket(n)
        ids = np.zeros((1, t), np.int32)
        mask = np.zeros((1, t), np.int32)
        ids[0, :n] = req.ids
        mask[0, :n] = 1
        ckv, dec_kv, first = self._de.prefill_seq2seq(
            self.params, self.cfg, jnp.asarray(ids), jnp.asarray(mask),
            key, *samp, bos_id=self.bos_id,
        )
        self.stats["prefills"] += 1
        enc_w = self.buckets[-1]
        if t != enc_w:
            ckv = self._de.crop_kv(ckv, width=enc_w)
        enc_mask = np.zeros((1, enc_w), np.int32)
        enc_mask[0, :n] = 1
        req.pending_first = first
        req.start_chunk = self._chunk_idx
        # decoder capacity: BOS holds column 0, generated tokens fill
        # 1..total-1 (the prompt never enters the decoder cache)
        req.remaining = min(req.max_new - 1, self.total - 1)
        req.slot = slot
        self._state = self._de.insert_seq2seq(
            self._state, ckv, jnp.asarray(enc_mask), dec_kv, first,
            jnp.int32(slot), *samp,
        )
        with self._lock:
            self._by_slot[slot] = req

    def _install(self, req, slot, kv, first, n_prompt, ids, mask, samp,
                 aix) -> None:
        """Insert a fully-prefilled request into its reserved slot."""
        import jax.numpy as jnp

        # the first token stays on device — fetched at the request's
        # first harvest so admission never syncs the pipeline
        req.pending_first = first
        req.start_chunk = self._chunk_idx
        # decode headroom: each emitted token consumes one cache column
        req.remaining = min(req.max_new - 1, self.total - len(req.ids))
        req.slot = slot
        self._state = self._de.insert(
            self._state, kv, jnp.asarray(ids), jnp.asarray(mask),
            first, n_prompt, jnp.int32(slot), *samp, adapter=aix,
        )
        with self._lock:
            self._by_slot[slot] = req

    def _advance_prefill(self) -> None:
        """Run one <= prefill_chunk-token piece of the in-flight chunked
        prefill (prefill for the head, prefill_extend at the running
        cursor for later pieces — the same jitted programs the prefix
        cache uses, so piece widths compile on the bucket grid).  The
        intermediate pieces' sampled token is discarded; the LAST piece's
        comes from the full prompt's final logits, exactly like a
        whole-prompt prefill."""
        import jax.numpy as jnp

        m = self._mid
        req = m["req"]
        n = len(req.ids)
        c = self.prefill_chunk
        if m["kv"] is None and self._pcache is not None:
            hit = self._pcache.lookup(req.ids, req.adapter_ix)
            if hit is not None:
                ent, p = hit
                m["kv"] = self._de.crop_kv(ent["kv"], width=self._bucket(p))
                m["done"] = p
                self.stats["prefix_hits"] += 1
                self.stats["prefix_tokens_reused"] += p
        take = min(c, n - m["done"])
        pb = self._bucket(take)
        piece_ids = np.zeros((1, pb), np.int32)
        piece_mask = np.zeros((1, pb), np.int32)
        piece_ids[0, :take] = req.ids[m["done"] : m["done"] + take]
        piece_mask[0, :take] = 1
        if m["kv"] is None:
            kv, first, n_done = self._de.prefill(
                self.params, self.cfg, jnp.asarray(piece_ids),
                jnp.asarray(piece_mask), m["key"], *m["samp"],
                bank=self._bank, adapter=m["aix"], kv_dtype=self.kv_dtype,
            )
            self.stats["prefills"] += 1
        else:
            kv, first, n_done = self._de.prefill_extend(
                self.params, self.cfg, m["kv"],
                jnp.asarray([m["done"]], jnp.int32),
                jnp.asarray(piece_ids), jnp.asarray(piece_mask),
                m["key"], *m["samp"], bank=self._bank, adapter=m["aix"],
            )
        m["done"] += take
        self.stats["prefill_pieces"] += 1
        m["kv"] = self._de.crop_kv(kv, width=self._bucket(m["done"]))
        if m["done"] < n:
            return  # next piece on the next scheduler turn
        b = self._bucket(n)
        ids = np.zeros((1, b), np.int32)
        ids[0, :n] = req.ids
        mask = (np.arange(b) < n)[None].astype(np.int32)
        self._store_kv(req, m["kv"], b)
        self._mid = None
        self._install(req, m["slot"], m["kv"], first, n_done, ids, mask,
                      m["samp"], m["aix"])

    def _run_prefill(self, req: _Request, key, samp, aix):
        """Prefill a request — through the prefix cache when a stored
        prompt KV is a strict prefix of this one, else cold.

        Returns ``(kv, first_tok_device, n_prompt (1,), mask np (1, W))``
        ready for insert().  Cold results (and extended ones) are stored
        back into the cache, width-normalized to the bucket grid.
        """
        import jax.numpy as jnp

        n = len(req.ids)
        hit = (
            self._pcache.lookup(req.ids, req.adapter_ix)
            if self._pcache is not None else None
        )
        if hit is not None:
            ent, p = hit
            sfx = req.ids[p:]
            sb = self._bucket(len(sfx))
            sfx_ids = np.zeros((1, sb), np.int32)
            sfx_mask = np.zeros((1, sb), np.int32)
            sfx_ids[0, : len(sfx)] = sfx
            sfx_mask[0, : len(sfx)] = 1
            kv, first, n_total = self._de.prefill_extend(
                self.params, self.cfg, ent["kv"],
                jnp.asarray([p], jnp.int32),
                jnp.asarray(sfx_ids), jnp.asarray(sfx_mask),
                key, *samp, bank=self._bank, adapter=aix,
            )
            self.stats["prefix_hits"] += 1
            self.stats["prefix_tokens_reused"] += p
            # normalize the (prefix_bucket + suffix_bucket) width back to
            # the bucket grid before insert/store: insert then only ever
            # compiles at |buckets| widths, not every emergent sum (the
            # transient extend width itself is unconstrained — only the
            # inserted width must fit the slot cache, and bucket(n) < total
            # is guaranteed by the constructor/submit validation)
            b = self._bucket(n)
            kv = self._de.crop_kv(kv, width=b)
            mask = (np.arange(b) < n)[None].astype(np.int32)
            ids = np.zeros((1, b), np.int32)
            ids[0, :n] = req.ids
            self._store_kv(req, kv, b)
            return kv, first, n_total, ids, mask
        t = self._bucket(n)
        ids = np.zeros((1, t), np.int32)
        mask = np.zeros((1, t), np.int32)
        ids[0, :n] = req.ids
        mask[0, :n] = 1
        kv, first, n_prompt = self._de.prefill(
            self.params, self.cfg, jnp.asarray(ids), jnp.asarray(mask),
            key, *samp, bank=self._bank, adapter=aix,
            kv_dtype=self.kv_dtype,
        )
        self.stats["prefills"] += 1
        self._store_kv(req, kv, t)
        return kv, first, n_prompt, ids, mask

    def _store_kv(self, req: _Request, kv, width: int) -> None:
        if self._pcache is None or len(req.ids) < self.min_cached_prompt:
            return
        b = self._bucket(len(req.ids))
        if width != b:
            kv = self._de.crop_kv(kv, width=b)
        self._pcache.store(req.ids, req.adapter_ix, kv, b)

    def _dispatch_chunk(self):
        """Dispatch one decode chunk (async) and account for it.

        Speculative (prompt-lookup) chunks run whenever enabled and every
        ACTIVE request is greedy — each step then emits up to
        draft_tokens+1 tokens per slot; one sampled co-rider falls the
        whole batch back to plain token-per-step chunks (exactness over
        throughput)."""
        self._chunk_idx += 1
        self.stats["chunks"] += 1
        self.stats["occupancy_sum"] += len(self._by_slot)
        if self._s2s:
            key = self._jax.random.fold_in(
                self._base_key, 2 * self._chunk_counter
            )
            self._chunk_counter += 1
            self._state, toks = self._de.decode_chunk_seq2seq(
                self.params, self._state, key, self.cfg,
                n_steps=self.chunk_steps, eos_id=self.eos_id,
            )
            return ("plain", toks)
        if self.speculative and all(
            r.temperature == 0.0 for r in self._by_slot.values()
        ):
            self.stats["spec_chunks"] += 1
            self._state, vals, counts = self._de.decode_chunk_spec(
                self.params, self._state, self.cfg,
                n_steps=self.spec_steps, eos_id=self.eos_id,
                gamma=self.draft_tokens, ngram=self.draft_ngram,
                bank=self._bank,
            )
            return ("spec", vals, counts)
        key = self._jax.random.fold_in(
            self._base_key, 2 * self._chunk_counter
        )
        self._chunk_counter += 1
        self._state, toks = self._de.decode_chunk(
            self.params, self._state, key, self.cfg,
            n_steps=self.chunk_steps, eos_id=self.eos_id, bank=self._bank,
        )
        return ("plain", toks)

    def _harvest(self, chunk_idx: int, payload) -> None:
        """Fetch a dispatched chunk's tokens and route them to requests.

        A slot's row belongs to its CURRENT request only from
        ``start_chunk`` on (earlier chunks ran the previous occupant);
        a request's deferred first token is emitted before its first
        harvested row.  Finished slots are freed host-side only — the
        next insert resets the device row (see module docstring).

        Plain chunks yield one token per step per slot; speculative
        chunks yield per-step windows plus per-step counts (the first
        ``count`` entries of each window are real, in order).
        """
        if payload[0] == "spec":
            vals = np.asarray(payload[1])    # (S, steps, gamma+1)
            counts = np.asarray(payload[2])  # (S, steps)
            per_slot = {
                s: [int(t) for j in range(counts.shape[1])
                    for t in vals[s, j, : counts[s, j]]]
                for s in self._by_slot
            }
            for s in self._by_slot:
                self.stats["drafted_accepted"] += int(
                    np.maximum(counts[s] - 1, 0).sum()
                )
        else:
            toks_np = np.asarray(payload[1])  # (S, chunk_steps)
            per_slot = {
                s: [int(t) for t in toks_np[s]] for s in self._by_slot
            }
        finished: list[int] = []
        for slot, req in list(self._by_slot.items()):
            if req.start_chunk > chunk_idx:
                continue  # dispatched before this request was inserted
            if req.pending_first is not None:
                first = int(np.asarray(req.pending_first)[0])
                req.pending_first = None
                req.out.append(first)
                self.stats["tokens"] += 1
                self._emit(req, first)
                if (self.eos_id is not None and first == self.eos_id) or (
                    req.remaining <= 0
                ):
                    finished.append(slot)
                    continue
            for tok in per_slot[slot]:
                req.out.append(tok)
                req.remaining -= 1
                self.stats["tokens"] += 1
                self._emit(req, tok)
                if (self.eos_id is not None and tok == self.eos_id) or (
                    req.remaining <= 0
                ):
                    finished.append(slot)
                    break
        for slot in finished:
            req = self._by_slot.pop(slot)
            self._finish(req)
            with self._lock:
                self._free.append(slot)

    @staticmethod
    def _emit(req: _Request, tok: int) -> None:
        """Deliver one token to a request's stream callback.  A raising
        callback must fail only ITS OWN request's consumer, never the
        scheduler (the loop's except would doom every in-flight
        request) — so errors are swallowed and the callback disabled."""
        if req.stream is None:
            return
        try:
            req.stream(tok)
        except Exception:  # noqa: BLE001 — user callback, not our state
            req.stream = None

    def _finish(self, req: _Request) -> None:
        self.stats["completed"] += 1
        if not req.future.done():
            req.future.set_result(
                {"ids": list(req.out), "n_prompt": len(req.ids)}
            )

    # ---- conveniences ----------------------------------------------------

    @property
    def adapter_names(self) -> list[str]:
        return sorted(self._adapter_idx)

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
        if self._pcache is not None:
            s["prefix_cache"] = {
                "entries": len(self._pcache),
                "mb": round(self._pcache.bytes / (1 << 20), 1),
            }
        return s
