"""Model configuration dataclasses.

The reference hardcodes model dims at compile time (``llama2.f90:102-108``)
or pulls them from GGUF metadata (``read_ggml.f90:133-152``); Mamba derives
dims from a packed header (``ssm/mamba.f90:106-109,177-179``). Here every
model constant — including the ones the reference buries as literals (rope
theta 10000 at ``llama2.f90:545``, rms eps 1e-5 at ``llama2.f90:454``) — is
an explicit config field.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional


# RoPE variants (see SURVEY.md §2 #12 and tpu_llm/ops/rope.py):
#   "interleaved"  — llama2.c-style: pairs (2i, 2i+1), theta_i = base^(-2i/d),
#                    positions 0-based. This is the numerically-correct layout
#                    for GGUF llama checkpoints ("rope type NORM").
#   "neox"         — half-rotation: pairs (i, i+d/2). Used by phi-2 et al.
#   "llmf90"       — bit-exact reproduction of the reference's quirky inline
#                    loop (llama2.f90:543-559): 1-based positions (first token
#                    pos=1) and odd frequency exponents head_dim=mod(i,hs) for
#                    1-based odd i, i.e. theta exponents 1,3,...,hs-1 instead
#                    of 0,2,...,hs-2. Kept for parity testing vs the Fortran.
ROPE_VARIANTS = ("interleaved", "neox", "llmf90")


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Llama-family transformer config (TinyLlama, Llama-2, ...).

    Mirrors the GGUF hparams the reference reads (``read_ggml.f90:133-152``):
    llama.block_count / embedding_length / attention.head_count /
    attention.head_count_kv / context_length / feed_forward_length.
    """

    dim: int = 2048                 # llama.embedding_length
    hidden_dim: int = 5632          # llama.feed_forward_length
    n_layers: int = 22              # llama.block_count
    n_heads: int = 32               # llama.attention.head_count
    n_kv_heads: int = 4             # llama.attention.head_count_kv
    vocab_size: int = 32000
    seq_len: int = 2048             # llama.context_length (max context)
    rope_theta: float = 10000.0     # llama2.f90:545 literal
    norm_eps: float = 1e-5          # llama2.f90:454 literal, eps INSIDE sqrt
    rope_variant: str = "interleaved"
    # Partial RoPE (phi-2): number of head dims that get rotated; None = all.
    rope_dims: Optional[int] = None
    # phi-2-style architecture switches (SURVEY.md §7 step 8):
    parallel_block: bool = False    # attn and MLP read the same norm output
    use_layernorm: bool = False     # LayerNorm-with-bias instead of RMSNorm
    use_bias: bool = False          # biases on qkv/o/mlp projections
    act: str = "silu"               # "silu" (SwiGLU) or "gelu" (phi-2 MLP;
    #                                 with gated_mlp=True -> GeGLU, gemma)
    gated_mlp: bool = True          # SwiGLU gate/up vs plain up
    tie_embeddings: bool = False    # classifier shares the embedding table
    # explicit per-head width (gemma-7b: 256 with dim 3072 — the q/k/v
    # projection width n_heads*head_dim then differs from dim); None =
    # the usual dim // n_heads
    head_dim_: Optional[int] = None
    # embedding output scale (gemma: sqrt(dim))
    emb_scale: float = 1.0
    # RoPE context-extension scaling (GGUF <arch>.rope.scaling.type/factor/
    # original_context_length; legacy <arch>.rope.scale_linear). The
    # reference hardcodes theta and has no scaling (llama2.f90:545).
    rope_scaling_type: str = "none"     # "none" | "linear" | "yarn"
    rope_scaling_factor: float = 1.0
    rope_orig_ctx: int = 0              # yarn original_context_length
    # Mixture-of-experts (Mixtral-family GGUFs: llama.expert_count /
    # expert_used_count; 0 = dense FFN). Top-k router over softmaxed
    # logits, selected weights renormalized to sum 1 (llama.cpp
    # build_moe_ffn with norm_w for LLM_ARCH_LLAMA).
    n_experts: int = 0
    n_experts_used: int = 2

    @property
    def head_dim(self) -> int:
        return (self.head_dim_ if self.head_dim_ is not None
                else self.dim // self.n_heads)

    @property
    def rope_scaling(self):
        """(type, factor, orig_ctx) for ops.rope, or None when unscaled."""
        if self.rope_scaling_type == "none" or self.rope_scaling_factor == 1.0:
            return None
        return (self.rope_scaling_type, self.rope_scaling_factor,
                self.rope_orig_ctx or self.seq_len)

    @property
    def q_dim(self) -> int:
        # width of the q projection / attention output (== dim unless
        # head_dim is explicit)
        return self.n_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        # "kv_head_size" in the reference (llama2.f90:154): n_kv_heads * head_dim
        return self.n_kv_heads * self.head_dim

    @property
    def kv_groups(self) -> int:
        # "kv_mul" (llama2.f90:572)
        return self.n_heads // self.n_kv_heads

    def __post_init__(self):
        if self.head_dim_ is None and self.dim % self.n_heads:
            raise ValueError(f"dim {self.dim} not divisible by n_heads {self.n_heads}")
        if self.n_heads % self.n_kv_heads:
            raise ValueError(
                f"n_heads {self.n_heads} not divisible by n_kv_heads {self.n_kv_heads}"
            )
        if self.rope_variant not in ROPE_VARIANTS:
            raise ValueError(f"unknown rope_variant {self.rope_variant!r}")
        if self.rope_scaling_type not in ("none", "linear", "yarn"):
            raise ValueError(
                f"unknown rope_scaling_type {self.rope_scaling_type!r}")


def tinyllama_1_1b() -> LlamaConfig:
    """TinyLlama-1.1B — the reference's hardcoded config (llama2.f90:102-108)."""
    return LlamaConfig()


def llama2_7b() -> LlamaConfig:
    return LlamaConfig(
        dim=4096, hidden_dim=11008, n_layers=32, n_heads=32, n_kv_heads=32,
        vocab_size=32000, seq_len=4096,
    )


def phi2_2_7b() -> LlamaConfig:
    """Phi-2 2.7B (dev/phi2 capability, SURVEY.md §7 step 8)."""
    return LlamaConfig(
        dim=2560, hidden_dim=10240, n_layers=32, n_heads=32, n_kv_heads=32,
        vocab_size=51200, seq_len=2048, rope_variant="neox", rope_dims=32,
        parallel_block=True, use_layernorm=True, use_bias=True,
        act="gelu", gated_mlp=False,
    )


@dataclasses.dataclass(frozen=True)
class MambaConfig:
    """Mamba SSM config.

    Constants d_conv=4, expand=2, d_state=16 are the reference's hardcoded
    values (``ssm/mamba.f90:106-108``); d_inner and dt_rank are derived the
    same way (``ssm/mamba.f90:177-179``).
    """

    d_model: int = 768
    n_layers: int = 24
    vocab_size: int = 50280
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    norm_eps: float = 1e-5          # ssm/mamba.f90:493
    dt_rank: Optional[int] = None   # default ceil(d_model/16)

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def dt_rank_(self) -> int:
        return self.dt_rank if self.dt_rank is not None else math.ceil(self.d_model / 16)


def mamba_130m() -> MambaConfig:
    return MambaConfig(d_model=768, n_layers=24, vocab_size=50280)


def mamba_790m() -> MambaConfig:
    return MambaConfig(d_model=1536, n_layers=48, vocab_size=50280)
