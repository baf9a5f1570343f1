"""Paged (blocked) KV cache.

The dense cache preallocates (B, max_seq, Hkv*D) per layer — every slot
pays for the longest context it might ever reach, which is exactly the
reference's hard cap generalized to a batch (``llama2.f90:311-313``). A
paged cache allocates fixed-size BLOCKS from a shared pool and maps each
sequence to its blocks through an int32 block table, so HBM scales with
tokens actually resident, sequences can grow past any per-slot
preallocation, and blocks can be shared (prefix caching) or migrated.

TPU-first layout:
- pool: (n_blocks, block_size, Hkv*D) per layer — flat minor dim, so a
  single-token write touches one (1, 1, Hkv*D) lane row in place (the
  same in-place property the flat dense planes have, experiments/
  dus_alias.py).
- block_table: (B, max_blocks) int32 into the pool; lengths: (B,) valid
  token counts. Device-side ops are pure gathers/scatters on static
  shapes; block ALLOCATION is host-side scheduling (``BlockAllocator``),
  exactly like slot scheduling in the batching engine.

Attention path: gather the sequence's blocks to a contiguous
(B, max_blocks*block_size, Hkv*D) view and run the standard masked GQA
attention with ``kv_lengths`` — table entries beyond a sequence's length
point at freed/garbage blocks, so the length mask (not just causality)
is load-bearing here. A Pallas kernel that DMAs blocks by scalar-prefetch
indices (the structure flash_decode_attention already uses) is the
optimization path once gather shows up in profiles.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_llm.ops.attention import gqa_attention


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PagedKV:
    """One layer's paged KV state (a pytree; flows through jit/scan)."""

    k_pool: jax.Array       # (n_blocks, block_size, Hkv*D)
    v_pool: jax.Array
    block_table: jax.Array  # (B, max_blocks) int32 pool indices
    lengths: jax.Array      # (B,) int32 valid token count per sequence

    def tree_flatten(self):
        return (self.k_pool, self.v_pool, self.block_table, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def block_size(self) -> int:
        return self.k_pool.shape[1]

    @property
    def max_tokens(self) -> int:
        return self.block_table.shape[1] * self.block_size

    @classmethod
    def zeros(cls, n_blocks: int, block_size: int, batch: int,
              max_blocks: int, kv_dim: int, dtype=jnp.bfloat16) -> "PagedKV":
        return cls(
            k_pool=jnp.zeros((n_blocks, block_size, kv_dim), dtype),
            v_pool=jnp.zeros((n_blocks, block_size, kv_dim), dtype),
            block_table=jnp.zeros((batch, max_blocks), jnp.int32),
            lengths=jnp.zeros((batch,), jnp.int32),
        )


def paged_update(
    kv: PagedKV,
    k_new: jax.Array,     # (B, 1, Hkv, D) — decode-shaped single token
    v_new: jax.Array,
    positions: jax.Array,  # (B,) absolute write position per sequence
) -> PagedKV:
    """Write one token per sequence into its mapped block. Positions may
    differ per row (continuous batching). Updates ``lengths`` to
    max(lengths, position+1)."""
    B = k_new.shape[0]
    bs = kv.block_size
    kvd = kv.k_pool.shape[-1]
    kf = k_new.reshape(B, kvd)
    vf = v_new.reshape(B, kvd)

    block_idx = positions // bs                                  # (B,)
    block_ids = jnp.take_along_axis(
        kv.block_table, block_idx[:, None], axis=1)[:, 0]        # (B,)
    offs = positions % bs                                        # (B,)

    # scatter one lane row per sequence: pool[block, off] = new
    k_pool = kv.k_pool.at[block_ids, offs].set(kf.astype(kv.k_pool.dtype))
    v_pool = kv.v_pool.at[block_ids, offs].set(vf.astype(kv.v_pool.dtype))
    lengths = jnp.maximum(kv.lengths, positions + 1)
    return PagedKV(k_pool, v_pool, kv.block_table, lengths)


def paged_gather(kv: PagedKV) -> Tuple[jax.Array, jax.Array]:
    """Materialize each sequence's logical KV view:
    (B, max_blocks*block_size, Hkv*D). Entries past ``lengths`` are
    whatever the mapped (possibly garbage) blocks hold — callers MUST
    mask with ``lengths``."""
    k = jnp.take(kv.k_pool, kv.block_table, axis=0)   # (B, MB, bs, kvd)
    v = jnp.take(kv.v_pool, kv.block_table, axis=0)
    B, MB, bs, kvd = k.shape
    return k.reshape(B, MB * bs, kvd), v.reshape(B, MB * bs, kvd)


def paged_gqa_attention(
    q: jax.Array,          # (B, 1, H, D)
    kv: PagedKV,
    q_positions: jax.Array,  # (B, 1) absolute positions of the queries
) -> jax.Array:
    """Decode attention over the paged cache: gather blocks to the flat
    logical view, then masked GQA attention. ``kv_lengths`` carries the
    per-sequence valid extent — the mask that keeps garbage blocks
    invisible."""
    D = q.shape[-1]
    k, v = paged_gather(kv)
    B, S, kvd = k.shape
    k = k.reshape(B, S, kvd // D, D)
    v = v.reshape(B, S, kvd // D, D)
    return gqa_attention(q, k, v, q_positions, kv_lengths=kv.lengths)


class BlockAllocator:
    """Host-side free-list allocator over the shared pool (serving-side
    scheduling, like slot admission in the batching engine). Block 0 is
    reserved as the null block every table entry starts pointing at."""

    def __init__(self, n_blocks: int):
        self.free: List[int] = list(range(n_blocks - 1, 0, -1))

    @property
    def n_free(self) -> int:
        return len(self.free)

    def alloc(self, n: int = 1) -> List[int]:
        if n > len(self.free):
            raise MemoryError(f"paged KV pool exhausted ({n} > {len(self.free)})")
        return [self.free.pop() for _ in range(n)]

    def release(self, blocks) -> None:
        for b in blocks:
            if b != 0:
                self.free.append(int(b))
