"""Continuous batching engine (iteration-level scheduling).

The reference is strictly single-stream (one sequence, one token at a
time, llama2.f90:379-402). For TPU throughput, decode must be batched —
but requests arrive and finish at different times, so the batch is a set
of SLOTS: each step runs ONE jitted decode for all slots at their own
positions (vector ``offset``), and the host scheduler admits/retires
requests between steps (Orca-style iteration-level scheduling).

Admission uses teacher forcing: a newly admitted request's prompt tokens
are fed one per step (outputs ignored) while other slots keep generating
— exactly the reference's prompt handling, generalized to a batch. A
dedicated prefill pass for long prompts is a planned optimization; the
scheduler's correctness does not depend on it.

Everything device-side is fixed-shape: one compiled step per (B, max_seq)
regardless of which slots are live (dead slots decode garbage into their
own cache rows and are ignored — their writes can't leak into other rows).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_llm.runtime.engine import ModelAdapter, _select_token


@dataclasses.dataclass
class Request:
    prompt: List[int]
    max_new: int
    temperature: float = 0.0
    seed: int = 0
    stream: Optional[Callable[[int], None]] = None
    stop_at_eos: bool = False
    # filled by the engine:
    rid: int = -1
    tokens: List[int] = dataclasses.field(default_factory=list)  # generated only
    done: bool = False


@dataclasses.dataclass
class _Slot:
    req: Optional[Request] = None
    pos: int = 0                 # next cache write position
    fed: int = 0                 # prompt tokens already fed
    next_token: int = 0          # token to feed this step
    key: Any = None

    @property
    def free(self) -> bool:
        return self.req is None


class BatchEngine:
    def __init__(
        self,
        params: Any,
        adapter: ModelAdapter,
        batch: int = 8,
        max_seq: int = 1024,
        eos_id: int = 2,
    ):
        self.params = params
        self.adapter = adapter
        self.batch = batch
        self.max_seq = max_seq
        self.eos_id = eos_id
        self.slots = [_Slot() for _ in range(batch)]
        self.state = adapter.init_state(batch, max_seq)
        self._queue: List[Request] = []
        self._next_rid = 0
        self._step = jax.jit(self._step_impl, donate_argnums=(2,))
        # Zero one slot's state row (axis 1 = batch in both the KV cache
        # (L,B,S,H,D) and Mamba state (L,B,...)). Attention would mask
        # stale rows anyway; recurrent state would NOT — it must be reset
        # on admission.
        self._reset_slot = jax.jit(
            lambda state, i: jax.tree_util.tree_map(
                lambda a: a.at[:, i].set(jnp.zeros_like(a[:, i])), state
            ),
            donate_argnums=(0,),
        )

    def _step_impl(self, params, tokens, state, offsets, keys, temps):
        hidden, state = self.adapter.apply(
            params, tokens=tokens[:, None], state=state, offset=offsets
        )
        logits = self.adapter.lm_head(params, hidden=hidden)[:, 0, :]
        sampled = jax.vmap(_select_token)(logits, keys, temps)
        return sampled, state

    # -- public API -------------------------------------------------------

    def submit(self, req: Request) -> Request:
        req.rid = self._next_rid
        self._next_rid += 1
        if not req.prompt:
            raise ValueError("empty prompt")
        if len(req.prompt) + req.max_new > self.max_seq:
            raise ValueError("prompt + max_new exceeds max_seq")
        self._queue.append(req)
        return req

    @property
    def n_active(self) -> int:
        return sum(0 if s.free else 1 for s in self.slots)

    def _admit(self):
        for idx, slot in enumerate(self.slots):
            if slot.free and self._queue:
                req = self._queue.pop(0)
                slot.req = req
                self.state = self._reset_slot(self.state, jnp.int32(idx))
                slot.pos = 0
                slot.fed = 0
                # BOS then teacher-forced prompt, like the reference driver
                if self.adapter.bos_id >= 0:
                    slot.next_token = self.adapter.bos_id
                else:
                    slot.next_token = req.prompt[0]
                    slot.fed = 1
                slot.key = jax.random.PRNGKey(req.seed)

    def step(self) -> int:
        """One engine iteration. Returns number of live slots stepped."""
        self._admit()
        live = [i for i, s in enumerate(self.slots) if not s.free]
        if not live:
            return 0

        tokens = np.zeros((self.batch,), np.int32)
        offsets = np.zeros((self.batch,), np.int32)
        temps = np.zeros((self.batch,), np.float32)
        keys = []
        for i, slot in enumerate(self.slots):
            if slot.free:
                keys.append(jax.random.PRNGKey(0))
                continue
            tokens[i] = slot.next_token
            offsets[i] = slot.pos
            temps[i] = slot.req.temperature
            slot.key, sub = jax.random.split(slot.key)
            keys.append(sub)

        sampled, self.state = self._step(
            self.params,
            jnp.asarray(tokens),
            self.state,
            jnp.asarray(offsets),
            jnp.stack(keys),
            jnp.asarray(temps),
        )
        sampled = np.asarray(jax.device_get(sampled))

        for i, slot in enumerate(self.slots):
            if slot.free:
                continue
            req = slot.req
            slot.pos += 1
            if slot.fed < len(req.prompt):
                # still teacher-forcing the prompt; model output ignored
                slot.next_token = req.prompt[slot.fed]
                slot.fed += 1
                continue
            tok = int(sampled[i])
            req.tokens.append(tok)
            if req.stream:
                req.stream(tok)
            slot.next_token = tok
            ends = len(req.tokens) >= req.max_new or (
                req.stop_at_eos and tok == self.eos_id
            )
            if ends or slot.pos + 1 >= self.max_seq:
                req.done = True
                slot.req = None
        return len(live)

    def run(self) -> None:
        """Drive until all submitted requests complete."""
        while self._queue or self.n_active:
            self.step()
